package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Pipeline
import graft.RuleTables
import graft.model.PipelineConf
import graft.operators._

/** Marginal-cost probe for the bench pipeline: times each stage prefix so the
  * serial fraction seen in ScalingBench can be attributed. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = if (args.length > 0) args(0) else "/tmp/bench"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val turns = graft.sources.Source.readTable(spark, graft.model.PipelineConf(), s"$benchDir/transcripts")
    val tables = graft.sources.Source.readRuleTables(spark, graft.model.PipelineConf(), benchDir)
    val conf = PipelineConf()

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    t("raw_scan")(turns)
    t("parse")(Parse(turns, conf))
    t("parse+dedup")(Dedup(Parse(turns, conf), conf))
    t("..+whitelist+enrich") {
      RefCheck(SigRules(IocEnrich(
        Whitelist(Dedup(Parse(turns, conf), conf), tables.whitelist),
        tables.ioc), tables.sigRules), tables.ref, conf)
    }
    t("..+first_seen") {
      FirstSeen(RefCheck(SigRules(IocEnrich(
        Whitelist(Dedup(Parse(turns, conf), conf), tables.whitelist),
        tables.ioc), tables.sigRules), tables.ref, conf), conf)
    }
    t("full_no_persist")(Pipeline.enrich(turns, tables, conf))
    val (e, cleanup) = Pipeline.enrichPlanned(turns, tables, conf)
    t("full_persisted")(e)
    t("full_persisted_2nd")(e)
    cleanup()
    spark.stop()
  }
}
