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

  test("streaming stateless enrich == batch (ioc+sig+ref note), with fp-dedup") {
    val got = runToMemory(
      StreamPipeline.enrichStream(streamTurns, tb, fx.conf, "1 hour")
        .select("conv_id", "turn_idx", "note"), "enr")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq

    // batch equivalent: global fp-dedup (keep first), whitelist, C3–C5 note
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
      .withColumn("fp", sha2(col("text"), 256))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      .orderBy("ts_us", "conv_id", "turn_idx")
    val dedup = parsed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val enr = RefCheck(SigRules(IocEnrich(
      Whitelist(dedup, fx.whitelist), tb.ioc), fx.rules), tb.ref, fx.conf)
    val want = enr.withColumn("note",
      aggregate(concat(col("hits_ioc"), col("hits_sig"), col("hits_ref")),
        lit(0), (a, h) => a + h.getField("score")))
      .select("conv_id", "turn_idx", "note")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq

    assert(got === want)
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

  test("streaming fan-out sink (foreachBatch, AvailableNow) writes severity-partitioned alerts") {
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val enr = StreamPipeline.enrichStream(streamTurns, tb, fx.conf, "1 hour")
    StreamPipeline.routeAvailableNow(spark, enr, fx.conf, outDir, ckpt)
    val written = spark.read.parquet(s"$outDir/alerts_all")
    val n = written.count()
    assert(n > 0)
    assert(written.select("severity").distinct().collect()
      .map(_.getString(0)).forall(Set("high", "critical")))
    // routed set == stateless-batch equivalent (note >= firThreshold)
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
      .withColumn("fp", sha2(col("text"), 256))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      .orderBy("ts_us", "conv_id", "turn_idx")
    val dedup = parsed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val batch = RefCheck(SigRules(IocEnrich(
      Whitelist(dedup, fx.whitelist), tb.ioc), fx.rules), tb.ref, fx.conf)
      .withColumn("note",
        aggregate(concat(col("hits_ioc"), col("hits_sig"), col("hits_ref")),
          lit(0), (a, h) => a + h.getField("score")))
      .filter(col("note") >= fx.conf.firThreshold)
    assert(n === batch.count())
  }
}

/** Exposes the parse step on a streaming DF for the targeted C6/C7 tests. */
object StreamPipelineTestAccess {
  def parsedStream(turns: DataFrame, conf: PipelineConf): DataFrame =
    Parse(turns, conf)
}
