package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.RuleTables
import graft.model.PipelineConf
import graft.operators._

/** Narrow attribution: which enrich component burns the time? */
object PhaseProbe2 {
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
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    val parsed = Parse(turns, conf)
    t("parse_forced")(parsed.filter(col("parse_ok")))
    t("parse_all_fields")(parsed.filter(
      col("action").isNotNull || col("user").isNotNull || col("uri").isNotNull))
    t("parse+ioc")(IocEnrich(parsed, tables.ioc).filter(size(col("hits_ioc")) >= 0))
    t("parse+sig")(SigRules(parsed, tables.sigRules).filter(size(col("hits_sig")) >= 0))
    t("parse+ref")(RefCheck(parsed, tables.ref, conf).filter(size(col("hits_ref")) >= 0))
    t("parse+wl")(Whitelist(parsed, tables.whitelist))
    t("parse+all_enrich") {
      RefCheck(SigRules(IocEnrich(Whitelist(parsed, tables.whitelist),
        tables.ioc), tables.sigRules), tables.ref, conf)
        .filter(size(col("hits_ref")) >= 0)
    }
    val cached = parsed.persist()
    t("parse_cache_build")(cached.filter(col("parse_ok")))
    t("cached+all_enrich") {
      RefCheck(SigRules(IocEnrich(Whitelist(cached, tables.whitelist),
        tables.ioc), tables.sigRules), tables.ref, conf)
        .filter(size(col("hits_ref")) >= 0)
    }
    spark.stop()
  }
}
