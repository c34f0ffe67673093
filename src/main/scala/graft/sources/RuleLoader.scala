package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.RuleTables
import graft.model.{IocEntry, PipelineConf, SigRule, WhitelistRule}

/** JSON rule-file loader — the configuration surface of the reference
  * (SURVEY §1.1 [R]: the sig filter reads rules.json / ioc.json / ref.json;
  * users ship rule FILES, not code). File shapes:
  *
  * {{{
  * rules.json:     [{"id": 3, "name": "exfil-5xx", "score": 60,
  *                   "clauses": [{"field": "action", "op": "eq", "value": "exfil"},
  *                               {"field": "status", "op": "gt", "value": "499"}]}, …]
  * ioc.json:       [{"kind": "ip", "value": "203.0.113.7", "score": 30}, …]
  * whitelist.json: [{"field": "action", "op": "eq", "value": "ping"}, …]
  * ref.json:       [{"key": "user", "field": "action", "value": "login"}, …]
  * }}}
  *
  * Parsed with Spark's multiLine JSON reader (no extra deps); clause arrays
  * explode into the flat SigRule clause rows the compiled tier consumes
  * (clauses of one rule AND together; the rule's score rides on the first
  * clause, matching the fixture convention). Rule files are driver-side by
  * contract (broadcast-small). */
object RuleLoader {

  private def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  def sigRules(spark: SparkSession, path: String): Seq[SigRule] = {
    import spark.implicits._
    readJson(spark, path)
      .select(col("id").cast("int").as("rule_id"), col("name"),
        col("score").cast("int").as("score"),
        posexplode(col("clauses")).as(Seq("pos", "c")))
      .select(col("rule_id"), col("name"), col("c.field").as("field"),
        col("c.op").as("op"), col("c.value").as("arg"),
        // AND-of-clauses carries the rule score once (on clause 0)
        when(col("pos") === 0, col("score")).otherwise(0).as("score"))
      .as[SigRule].collect().toSeq
      .sortBy(r => (r.rule_id, r.score * -1))
  }

  def ioc(spark: SparkSession, path: String): Seq[IocEntry] = {
    import spark.implicits._
    readJson(spark, path)
      .select(col("kind"), col("value"), col("score").cast("int").as("score"))
      .as[IocEntry].collect().toSeq
  }

  def whitelist(spark: SparkSession, path: String): Seq[WhitelistRule] = {
    import spark.implicits._
    readJson(spark, path)
      .select(col("field"), col("op"), col("value").as("arg"))
      .as[WhitelistRule].collect().toSeq
  }

  def refBaseline(spark: SparkSession, path: String): DataFrame =
    readJson(spark, path)
      .select(col("key").as("ref_key"), col("field"), col("value"))

  /** Eval-set table for the contamination screen (r5, VERDICT r4 #3): one
    * `text` row per eval item. `eval.json` (multiLine array of
    * {"text": …}) for hand-shipped sets, or a parquet dir for large ones —
    * unlike the rule files this is NOT broadcast-small by contract (real
    * eval suites run to millions of rows), so it stays a distributed
    * DataFrame end-to-end; the screens hash-equijoin its 8-grams. Queries
    * pick it up via the `spark.graft.eval.path` session conf; unset keeps
    * the deterministic pseudo-set fixture. */
  def evalTexts(spark: SparkSession, path: String): DataFrame =
    (if (path.endsWith(".json")) readJson(spark, path)
     else spark.read.parquet(path)).select(col("text"))

  /** Optional mappings.json — the sig filter's FIELD-MAPPING config surface:
    * which fields compose the C1 fingerprint, which event field each IOC
    * kind probes (C3), which fields the C5 ref check compares, which fields
    * the C6 new-value check tracks, and the C7 frequency key. A user whose
    * logs carry different field names configures this in the rule dir
    * instead of changing code. Shape:
    *
    * {{{
    * mappings.json: {"fingerprint_fields": ["text"],
    *                 "ioc_fields": {"ip": "src_ip", "domain": "dst_host"},
    *                 "ref_fields": ["action"],
    *                 "tracked_fields": ["user"],
    *                 "freq_key": "conv_id",
    *                 "freq_window_sec": 60, "freq_threshold": 5,
    *                 "freq_reset_sec": 60, "dedup_delay_sec": 300,
    *                 "fir_threshold": 50,
    *                 "new_value_score": 15, "freq_score": 20, "ref_score": 10,
    *                 "severity_bands": [{"min": 0, "name": "low"},
    *                                    {"min": 50, "name": "high"}],
    *                 "grok_pattern": "%{WORD:action} ...",
    *                 "grok_fallbacks": ["%{WORD:action} %{GREEDYDATA:rest}"],
    *                 "format": "iceberg", "sink_format": "iceberg"}
    * }}}
    *
    * Missing file or missing key ⇒ the base conf's value is kept. */
  def confWithMappings(spark: SparkSession, path: String,
      base: PipelineConf): PipelineConf = {
    import org.apache.spark.sql.types._
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return base
    val schema = StructType(Seq(
      StructField("fingerprint_fields", ArrayType(StringType)),
      StructField("ioc_fields", MapType(StringType, StringType)),
      StructField("ref_fields", ArrayType(StringType)),
      StructField("tracked_fields", ArrayType(StringType)),
      StructField("freq_key", StringType),
      StructField("freq_window_sec", LongType),
      StructField("freq_threshold", IntegerType),
      StructField("freq_reset_sec", LongType),
      StructField("dedup_delay_sec", LongType),
      StructField("fir_threshold", IntegerType),
      StructField("new_value_score", IntegerType),
      StructField("freq_score", IntegerType),
      StructField("ref_score", IntegerType),
      StructField("severity_bands", ArrayType(StructType(Seq(
        StructField("min", IntegerType), StructField("name", StringType))))),
      StructField("grok_pattern", StringType),
      StructField("grok_fallbacks", ArrayType(StringType)),
      StructField("format", StringType),
      StructField("sink_format", StringType)))
    val row = spark.read.schema(schema).option("multiLine", "true")
      .json(path).head()
    // resolve by NAME, never ordinal: a future field insertion in the schema
    // above must not silently shift every knob after it (ADVICE r3)
    def at(name: String): Int = row.fieldIndex(name)
    def arr(name: String, dflt: Seq[String]): Seq[String] = {
      val i = at(name); if (row.isNullAt(i)) dflt else row.getSeq[String](i)
    }
    def lng(name: String, dflt: Long): Long = {
      val i = at(name); if (row.isNullAt(i)) dflt else row.getLong(i)
    }
    def int(name: String, dflt: Int): Int = {
      val i = at(name); if (row.isNullAt(i)) dflt else row.getInt(i)
    }
    def str(name: String, dflt: String): String = {
      val i = at(name); if (row.isNullAt(i)) dflt else row.getString(i)
    }
    val bands =
      if (row.isNullAt(at("severity_bands"))) base.severityBands
      else row.getSeq[org.apache.spark.sql.Row](at("severity_bands"))
        .map(b => b.getInt(0) -> b.getString(1)).sortBy(_._1)
    require(bands.nonEmpty, s"$path: severity_bands must not be empty")
    val gp = str("grok_pattern", base.grokPattern)
    val gf = arr("grok_fallbacks", base.grokFallbacks)
    // malformed grok must fail at CONFIG LOAD, not mid-job on an executor
    (gp +: gf).foreach(p => graft.functions.GrokCompiler.compile(p))
    base.copy(
      fingerprintFields = arr("fingerprint_fields", base.fingerprintFields),
      iocKindFields =
        if (row.isNullAt(at("ioc_fields"))) base.iocKindFields
        else row.getMap[String, String](at("ioc_fields")).toSeq.sortBy(_._1),
      refFields = arr("ref_fields", base.refFields),
      trackedFields = arr("tracked_fields", base.trackedFields),
      freqKey = str("freq_key", base.freqKey),
      freqWindowSec = lng("freq_window_sec", base.freqWindowSec),
      freqThreshold = int("freq_threshold", base.freqThreshold),
      freqResetSec = lng("freq_reset_sec", base.freqResetSec),
      dedupDelaySec = lng("dedup_delay_sec", base.dedupDelaySec),
      firThreshold = int("fir_threshold", base.firThreshold),
      newValueScore = int("new_value_score", base.newValueScore),
      freqScore = int("freq_score", base.freqScore),
      refScore = int("ref_score", base.refScore),
      severityBands = bands,
      grokPattern = gp,
      grokFallbacks = gf,
      format = str("format", base.format),
      sinkFormat = str("sink_format", base.sinkFormat))
  }

  /** Conf for a config dir: `base` + the dir's mappings.json (if present). */
  def confFromDir(spark: SparkSession, dir: String,
      base: PipelineConf = PipelineConf()): PipelineConf =
    confWithMappings(spark, s"$dir/mappings.json", base)

  /** All four files from one config dir (missing whitelist/ref allowed). */
  def fromDir(spark: SparkSession, dir: String): RuleTables = {
    import spark.implicits._
    def exists(p: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    RuleTables(
      ioc = ioc(spark, s"$dir/ioc.json").toDF(),
      sigRules = sigRules(spark, s"$dir/rules.json"),
      ref = if (exists(s"$dir/ref.json")) refBaseline(spark, s"$dir/ref.json")
        else Seq.empty[graft.model.RefEntry].toDF(),
      whitelist = if (exists(s"$dir/whitelist.json"))
        whitelist(spark, s"$dir/whitelist.json") else Seq.empty)
  }
}
