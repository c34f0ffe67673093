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

  /** json's default timestampFormat truncates to milliseconds; a
    * routeViaTable round-trip through a json sink would silently lose
    * microsecond precision in the enriched table (ADVICE r3). Pin a
    * microsecond pattern on BOTH write and read so the seam is lossless for
    * every format. Parquet/orc/iceberg ignore the option. */
  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def readTable(spark: SparkSession, format: String, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    // The pinned pattern alone would DISABLE Spark's default datetime-parse
    // fallback for json/csv, so externally-produced ISO timestamps without
    // exactly 6 fractional digits (e.g. "…T00:00:00Z") would silently null
    // out in permissive mode (ADVICE r4). Re-enable the fallback: our own
    // round-trip still parses via the pinned pattern (losslessly), foreign
    // input falls back to the standard parser instead of nulling.
    val r0 = spark.read.option("timestampFormat", TsFmt)
      .option("enableDateTimeParsingFallback", "true")
    val r = schema.fold(r0)(r0.schema)
    format match {
      case "parquet" => r.parquet(path)
      case other => r.format(other).load(path)
    }
  }

  def readTable(spark: SparkSession, conf: PipelineConf, path: String): DataFrame =
    readTable(spark, conf.format, path)

  /** Sink side of the format seam, mirroring [[readTable]]: user-facing sink
    * writes (`Pipeline.route`/`routeViaTable` alert + rollup tables) go
    * through here so `conf.sinkFormat` can point them at any DSv2 format
    * ("iceberg" on the cluster; orc and json exercised in-sandbox by
    * RouteSpec — schema-light formats like json need the read-back schema
    * `routeViaTable` supplies, or inference drifts types and drops
    * all-null columns). Engine-owned checkpoint state stays parquet
    * (Incremental's snapshot layout and its dynamic-partition-overwrite
    * idempotency contract are parquet-path-based by design). */
  def writeTable(df: DataFrame, format: String, path: String,
      partitionCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w0 = df.write.mode(mode).option("timestampFormat", TsFmt)
    val w = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0
    format match {
      case "parquet" => w.parquet(path)
      case other => w.format(other).save(path)
    }
  }

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
