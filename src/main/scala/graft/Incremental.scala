package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators._

/** Batch-incremental runner (SURVEY §3.4 / §7.5): each run processes one
  * ascending, non-overlapping time range of the transcripts table, carries
  * first-seen / fingerprint / frequency state across runs, and records a
  * manifest with per-partition lineage + per-stage metrics.
  *
  * Layout under `stateDir`:
  * {{{
  *   run-<id>/seen_values/   (field, value)
  *   run-<id>/fp_seen/       (fp, fp_bucket)
  *   run-<id>/freq_counts/   (key, sec, cnt)
  *   run-<id>/fired/         (key, reset_bucket)
  *   manifest/run-<id>.json  (written LAST — a run without a manifest is
  *                            invisible to readers, so crashes are safe and
  *                            re-runs are idempotent)
  * }}}
  * The analogue of the sig filter's periodic state-DB save/restore
  * («sig.rb» drop/new-value DB persistence, SURVEY §2.1 S6) — but exactly
  * once and resumable instead of best-effort in-memory. */
object Incremental {

  final case class RunResult(
      runId: String,
      sinkCounts: Map[String, Long],
      metrics: Map[String, Long],
      inputFiles: Seq[String])

  /** Manifested (completed) run ids, ascending. */
  def completedRuns(stateDir: String): Seq[String] = {
    val dir = Paths.get(stateDir, "manifest")
    if (!Files.isDirectory(dir)) return Seq.empty
    val it = Files.list(dir).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next().getFileName.toString
      if (f.startsWith("run-") && f.endsWith(".json"))
        out += f.stripPrefix("run-").stripSuffix(".json")
    }
    out.sorted.toSeq
  }

  /** Union a state table across all completed runs. */
  private def loadState(spark: SparkSession, stateDir: String,
      table: String): Option[DataFrame] = {
    val runs = completedRuns(stateDir)
    val paths = runs.map(r => s"$stateDir/run-$r/$table")
      .filter(p => Files.isDirectory(Paths.get(p)))
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*))
  }

  def loadFullState(spark: SparkSession, stateDir: String): Pipeline.State =
    Pipeline.State(
      seenValues = loadState(spark, stateDir, "seen_values")
        .map(_.select("field", "value").distinct()),
      fpSeen = loadState(spark, stateDir, "fp_seen")
        .map(_.select("fp", "fp_bucket").distinct()),
      freqCounts = loadState(spark, stateDir, "freq_counts")
        .map(_.groupBy("key", "sec").agg(sum("cnt").cast("long").as("cnt"))),
      firedBuckets = loadState(spark, stateDir, "fired")
        .map(_.select("key", "reset_bucket").distinct()))

  /** Run one batch with state, write sinks + state delta + manifest. */
  def run(spark: SparkSession, turns: DataFrame, tables: RuleTables,
      conf: PipelineConf, stateDir: String, outDir: String,
      runId: String): RunResult = {
    import spark.implicits._
    val state = loadFullState(spark, stateDir)

    // --- plan with observe() metrics at each stage boundary
    val obsIn = Observation(s"in-$runId")
    val obsDedup = Observation(s"dedup-$runId")
    val obsSurv = Observation(s"surv-$runId")
    val obsOut = Observation(s"out-$runId")

    val parsed = Parse(turns, conf)
      .withColumn("_file", input_file_name())
      .observe(obsIn, count(lit(1)).as("n_input"),
        sum(when(col("parse_ok"), 1L).otherwise(0L)).as("n_parse_ok"))
    val deduped = Dedup(parsed, conf, state.fpSeen)
      .observe(obsDedup, count(lit(1)).as("n_after_dedup"))
    // the one persisted boundary (see Pipeline.enrichPlanned)
    val survivors = Whitelist(deduped, tables.whitelist)
      .observe(obsSurv, count(lit(1)).as("n_survivors"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val enriched0 = RefCheck(
      SigRules(IocEnrich(survivors, tables.ioc), tables.sigRules),
      tables.ref, conf)
    val withFirst = FirstSeen(enriched0, conf, state.seenValues,
      aux = Some(survivors))
    val stateful = Frequency(withFirst, conf,
      state.freqCounts, state.firedBuckets, aux = Some(survivors))
    val severities = conf.severityBands.map(_._2)
    val sinkAggs = severities.map(s =>
      sum(when(col("routed") && col("severity") === s, 1L).otherwise(0L))
        .as(s"sink_$s"))
    val enriched = Scoring(stateful, conf)
      .observe(obsOut, count(lit(1)).as("n_enriched"), sinkAggs: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      // --- sinks: alerts partitioned by severity, appended per run,
      // salted so a hot severity band doesn't serialize into one task
      Pipeline.saltedBySeverity(enriched.filter(col("routed")).drop("_file"),
        conf.saltBuckets)
        .write.mode(SaveMode.Append).partitionBy("severity")
        .parquet(s"$outDir/alerts_all")

      // --- state deltas under run dir (invisible until manifest lands)
      val runDir = s"$stateDir/run-$runId"
      val trackedVals = conf.trackedFields.map(f =>
        enriched.filter(col("parse_ok") && col(f).isNotNull && col(f) =!= "")
          .select(lit(f).as("field"), col(f).as("value"))).reduce(_ unionByName _)
        .distinct()
      val seenDelta = state.seenValues match {
        case Some(st) => trackedVals.join(st, Seq("field", "value"), "left_anti")
        case None => trackedVals
      }
      seenDelta.write.mode(SaveMode.Overwrite).parquet(s"$runDir/seen_values")

      enriched.select(col("fp"), col("fp_bucket")).distinct()
        .write.mode(SaveMode.Overwrite).parquet(s"$runDir/fp_seen")

      Frequency.perSecCounts(enriched, conf)
        .select(col("_k").as("key"), col("_s").as("sec"), col("_c").cast("long").as("cnt"))
        .write.mode(SaveMode.Overwrite).parquet(s"$runDir/freq_counts")

      enriched.filter(col("freq_hit"))
        .select(col(conf.freqKey).as("key"),
          floor(col("ts_sec") / conf.freqResetSec).as("reset_bucket")).distinct()
        .write.mode(SaveMode.Overwrite).parquet(s"$runDir/fired")

      // --- lineage: exact input files this run consumed
      val files = enriched.select("_file").distinct().as[String].collect().toSeq.sorted

      val m = obsIn.get ++ obsDedup.get ++ obsSurv.get ++ obsOut.get
      val metrics = m.map { case (k, v) => k -> v.asInstanceOf[Long] }
      val sinkCounts = severities.map(s => s -> metrics(s"sink_$s")).toMap

      writeManifest(stateDir, runId, metrics, files)
      RunResult(runId, sinkCounts, metrics, files)
    } finally {
      enriched.unpersist(); survivors.unpersist()
    }
  }

  /** Manifest written atomically (tmp + move) and LAST. */
  private def writeManifest(stateDir: String, runId: String,
      metrics: Map[String, Long], files: Seq[String]): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"run_id": ${q(runId)},
         | "metrics": {${metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: $v" }.mkString(", ")}},
         | "input_files": [${files.map(q).mkString(", ")}],
         | "completed": true}""".stripMargin
    val dir = Paths.get(stateDir, "manifest")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".run-$runId.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve(s"run-$runId.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }
}
