package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.fixtures.Gen
import graft.model._
import graft.operators._
import graft.streaming.StreamPipeline

/** Streaming twin vs batch: stateless enrich must agree row-for-row; C6 via
  * flatMapGroupsWithState and C7 via windowed aggs agree with their batch
  * formulations. Uses Trigger.AvailableNow over fixture parquet. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val fx = Gen.fixture(150)
  private lazy val tb = RuleTables(fx.ioc.toDF(), fx.rules, fx.ref.toDF(), fx.whitelist)
  private lazy val inDir: String = {
    val d = Files.createTempDirectory("graft-stream-in").toString
    spark.createDataset(fx.turns).toDF().write.mode("overwrite").parquet(d)
    d
  }
  private def streamTurns: DataFrame =
    spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .parquet(inDir)

  private def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  /** Batch per-row notes WITHOUT dedup: (conv_id, turn_idx) → (fp, note).
    * dropDuplicatesWithinWatermark keeps an ARBITRARY row per fp (no order
    * guarantee), so streaming assertions must be row-identity-based, not
    * tied to which duplicate the batch tie-break would keep. */
  private lazy val perRowNotes: Map[(String, Int), (String, Int)] = {
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
      .withColumn("fp", sha2(col("text"), 256))
    val enr = RefCheck(SigRules(IocEnrich(
      Whitelist(parsed, fx.whitelist), tb.ioc), fx.rules), tb.ref, fx.conf)
    enr.withColumn("note",
      aggregate(concat(col("hits_ioc"), col("hits_sig"), col("hits_ref")),
        lit(0), (a, h) => a + h.getField("score")))
      .select("conv_id", "turn_idx", "fp", "note")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3))))
      .toMap
  }

  test("streaming stateless enrich: one row per fp, each row's note == its batch note") {
    val got = runToMemory(
      StreamPipeline.enrichStream(streamTurns, tb, fx.conf, "1 hour")
        .select("fp", "conv_id", "turn_idx", "note"), "enr")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSeq

    // exactly one surviving row per fingerprint
    assert(got.map(_._1).distinct.size === got.size)
    // the whitelist outcome is text-determined in this fixture, so the fp SET
    // is invariant to which duplicate the stream kept
    assert(got.map(_._1).toSet === perRowNotes.values.map(_._1).toSet)
    // and every kept row carries ITS OWN batch-computed note
    got.foreach { case (fp, c, t, n) =>
      val (bfp, bn) = perRowNotes((c, t))
      assert(bfp === fp && bn === n, s"row ($c,$t): stream note $n vs batch $bn")
    }
    assert(got.nonEmpty)
  }

  test("streaming first-seen (flatMapGroupsWithState) == batch first occurrences") {
    val parsed = StreamPipelineTestAccess.parsedStream(streamTurns, fx.conf)
    val got = runToMemory(StreamPipeline.firstSeenStream(parsed, fx.conf).toDF(), "fs")
      .select("field", "value", "conv_id", "turn_idx")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    val bp = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    val want = fx.conf.trackedFields.flatMap { f =>
      bp.filter(col("parse_ok") && col(f).isNotNull && col(f) =!= "")
        .select(lit(f).as("field"), col(f).as("value"),
          col("conv_id"), col("turn_idx"), col("ts_us"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getInt(3), r.getLong(4)))
    }.groupBy(t => (t._1, t._2)).map { case (_, g) =>
      val first = g.minBy(t => (t._5, t._3, t._4))
      (first._1, first._2, first._3, first._4)
    }.toSeq.sortBy(t => (t._1, t._2))

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming trailing-window frequency (FMGWS) == batch Frequency fire set exactly") {
    val parsed = StreamPipelineTestAccess.parsedStream(streamTurns, fx.conf)
    val got = runToMemory(
      StreamPipeline.freqTrailingStream(parsed, fx.conf).toDF(), "ftw")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sorted.toSeq

    val bp = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    val want = Frequency(bp, fx.conf).filter(col("freq_hit"))
      .select(col(fx.conf.freqKey), col("ts_sec")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

    assert(got === want)
    assert(got.nonEmpty, "fixture must contain bursts")
  }

  test("streaming tumbling freq alerts == batch tumbling counts") {
    val parsed = StreamPipelineTestAccess.parsedStream(streamTurns, fx.conf)
    // Complete mode: Append would hold back windows newer than the final
    // watermark, which AvailableNow never advances past the last batch.
    val got = runToMemory(StreamPipeline.freqAlerts(parsed, fx.conf, "1 hour"),
      "fa", OutputMode.Complete)
      .select(col("key"), unix_timestamp(col("win_start")).as("w"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

    val bp = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    val want = bp.groupBy(col(fx.conf.freqKey).as("key"),
      (floor(col("ts_sec") / fx.conf.freqWindowSec) * fx.conf.freqWindowSec).as("w"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= fx.conf.freqThreshold)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

    assert(got === want)
    assert(got.nonEmpty, "fixture must contain at least one burst")
  }

  test("streaming fan-out sink (foreachBatch, AvailableNow) writes severity-partitioned alert docs") {
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val enr = StreamPipeline.enrichStream(streamTurns, tb, fx.conf, "1 hour")
    StreamPipeline.routeAvailableNow(spark, enr, fx.conf, outDir, ckpt)
    val written = spark.read.parquet(s"$outDir/alerts_all")
    assert(written.count() > 0)
    assert(written.select("severity").distinct().collect()
      .map(_.getString(0)).forall(Set("high", "critical")))
    // FIR alert-doc projection present
    assert(Set("subject", "category").subsetOf(written.columns.toSet))
    val rows = written.select("fp", "conv_id", "turn_idx", "note").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    // one alert per fingerprint; every written row routes with ITS OWN
    // batch-computed note (which duplicate survived is stream-arbitrary)
    assert(rows.map(_._1).distinct.size === rows.size)
    rows.foreach { case (fp, c, t, n) =>
      val (bfp, bn) = perRowNotes((c, t))
      assert(bfp === fp && bn === n && n >= fx.conf.firThreshold)
    }
    // completeness lower bound: a fp ALL of whose duplicates route must be
    // written, no matter which one the stream kept
    val mustRoute = perRowNotes.values.groupBy(_._1)
      .filter(_._2.forall(_._2 >= fx.conf.firThreshold)).keySet
    assert(mustRoute.subsetOf(rows.map(_._1).toSet))
    assert(mustRoute.nonEmpty, "fixture must contain always-routing fingerprints")
  }

  test("composed end-to-end stream (ONE readStream → C1→C9 per micro-batch with state) == batch pipeline EXACTLY") {
    // three time-ordered files → three ascending micro-batches (the
    // Incremental contract); distinct mtimes pin FileStreamSource order
    val base = Files.createTempDirectory("graft-e2e-in").toString
    val sorted = fx.turns.sortBy(t => (t.ts.getTime, t.conv_id, t.turn_idx))
    val n = sorted.size
    val parts = Seq(sorted.slice(0, n / 3), sorted.slice(n / 3, 2 * n / 3),
      sorted.slice(2 * n / 3, n))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = Files.createTempDirectory("graft-e2e-part").toString
      spark.createDataset(p).toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(base, f"part-$i%03d.parquet")
      Files.move(src.toPath, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      ()
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(base).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(base)
    val stateDir = Files.createTempDirectory("graft-e2e-state").toString
    val outDir = Files.createTempDirectory("graft-e2e-out").toString
    val ckpt = Files.createTempDirectory("graft-e2e-ckpt").toString
    val ran = StreamPipeline.runFull(spark, stream, tb, fx.conf,
      stateDir, outDir, ckpt)
    assert(ran.size === 3, s"expected 3 micro-batches, ran $ran")

    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3), r.getString(4))
    val got = Incremental.readAlerts(spark, stateDir, outDir)
      .select("conv_id", "turn_idx", "note", "severity", "category")
      .collect().map(key).sortBy(t => (t._1, t._2)).toSeq
    val want = Pipeline.alertDocs(
      Pipeline.enrich(spark.createDataset(fx.turns).toDF(), tb, fx.conf)
        .filter(col("routed")))
      .select("conv_id", "turn_idx", "note", "severity", "category")
      .collect().map(key).sortBy(t => (t._1, t._2)).toSeq
    assert(got.nonEmpty && got === want)

    // restart idempotency: replaying the stream from a fresh checkpoint must
    // skip every manifested batch (manifest = commit marker), changing nothing
    val stream2 = spark.readStream
      .schema(spark.read.parquet(base).schema)
      .option("maxFilesPerTrigger", "1").parquet(base)
    val ran2 = StreamPipeline.runFull(spark, stream2, tb, fx.conf,
      stateDir, outDir, Files.createTempDirectory("graft-e2e-ckpt2").toString)
    assert(ran2.isEmpty, s"replayed batches must be skipped, ran $ran2")
    val got2 = Incremental.readAlerts(spark, stateDir, outDir)
      .select("conv_id", "turn_idx", "note", "severity", "category")
      .collect().map(key).sortBy(t => (t._1, t._2)).toSeq
    assert(got2 === want)
  }

  test("streaming sessionize (session_window + watermark): closed sessions == batch sessions past the final watermark") {
    val gapSec = 3600L
    def key(df: DataFrame) = df
      .select("conv_id", "session_start", "session_last", "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    val got = key(runToMemory(
      StreamPipeline.sessionizeStream(streamTurns, "1 hour",
        lateness = "0 seconds"), "sess"))

    val batch = spark.createDataset(fx.turns).toDF()
      .groupBy(col("conv_id"), session_window(col("ts"), "1 hour").as("w"))
      .agg(min(unix_timestamp(col("ts"))).as("session_start"),
        max(unix_timestamp(col("ts"))).as("session_last"),
        count(lit(1)).as("n_events"))
    val maxTs = fx.turns.map(_.ts.getTime / 1000L).max
    // Append emits a session once the final watermark (= max event time,
    // 0s delay) passes its end = last + gap; later sessions stay open
    val wantClosed = key(batch.filter(col("session_last") + gapSec <= maxTs))

    assert(got.nonEmpty, "no sessions closed — fixture too short for the gap")
    assert(got === wantClosed)
    // and the open tail really exists (the watermark is doing something)
    assert(key(batch).size > wantClosed.size)
  }
}

/** Exposes the parse step on a streaming DF for the targeted C6/C7 tests. */
object StreamPipelineTestAccess {
  def parsedStream(turns: DataFrame, conf: PipelineConf): DataFrame =
    Parse(turns, conf)
}
