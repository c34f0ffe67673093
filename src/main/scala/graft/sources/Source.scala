package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.RuleTables
import graft.model.{PipelineConf, SigRule, WhitelistRule}

/** Input-format seam (SURVEY §7.6): the contract's transcripts live in an
  * Iceberg table at target; this sandbox ships no Iceberg runtime jar, so
  * "parquet" is the local default and any other value maps onto the
  * DataSource V2 `format(...).load(...)` path ("iceberg" included — with the
  * runtime jar + catalog conf on the cluster it resolves to an Iceberg scan
  * with the same downstream plan). ALL pipeline-path input reads go through
  * here; `spark.read.parquet` appears only for engine-owned checkpoint state
  * (Incremental's snapshot layout, which is ours, not the user's table
  * format). */
object Source {

  def readTable(spark: SparkSession, format: String, path: String): DataFrame =
    format match {
      case "parquet" => spark.read.parquet(path)
      case other => spark.read.format(other).load(path)
    }

  def readTable(spark: SparkSession, conf: PipelineConf, path: String): DataFrame =
    readTable(spark, conf.format, path)

  /** Rule/lookup tables of a pipeline dir (ioc / sig_rules / ref_baseline /
    * whitelist sub-tables). Rule and whitelist clauses are collected to the
    * driver BY CONTRACT (broadcast-small; they compile into the plan). */
  def readRuleTables(spark: SparkSession, conf: PipelineConf, dir: String): RuleTables = {
    import spark.implicits._
    RuleTables(
      ioc = readTable(spark, conf, s"$dir/ioc"),
      sigRules = readTable(spark, conf, s"$dir/sig_rules").as[SigRule].collect().toSeq,
      ref = readTable(spark, conf, s"$dir/ref_baseline"),
      whitelist = readTable(spark, conf, s"$dir/whitelist")
        .as[WhitelistRule].collect().toSeq)
  }
}
