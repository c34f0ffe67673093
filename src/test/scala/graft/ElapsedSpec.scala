package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Gen
import graft.operators.{Elapsed, Parse}
import graft.oracle.RefModel

/** P20 elapsed (cross-event correlation): batch pairing vs a naive in-memory
  * oracle, and the Incremental-style boundary contract
  * run(A ∪ B) == run(B, state(A)). */
class ElapsedSpec extends SparkSuite {
  import spark.implicits._

  private val timeout = 6L * 3600L

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq

  test("batch pairing matches the naive per-key oracle") {
    val fx = Gen.fixture(150)
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    val got = rows(Elapsed(parsed, "conv_id",
      col("action") === "login", col("action") === "upload", timeout))

    val want = fx.turns.groupBy(_.conv_id).toSeq.flatMap { case (cid, ts0) =>
      val evs = ts0.sortBy(t => (t.ts.getTime, t.turn_idx))
        .map(t => (t, RefModel.parseFields(t, fx.conf)._1.get("action")))
      evs.find(_._2.contains("login")).map { case (st, _) =>
        val sMs = st.ts.getTime
        val end = evs.find { case (t, a) =>
          a.contains("upload") && t.ts.getTime >= sMs }
        end match {
          case Some((en, _)) if en.ts.getTime - sMs <= timeout * 1000L =>
            (cid, sMs / 1000L, en.ts.getTime / 1000L,
              en.ts.getTime / 1000L - sMs / 1000L, "matched")
          case _ => (cid, sMs / 1000L, -1L, -1L, "expired")
        }
      }
    }.sortBy(_._1)
    assert(got === want)
    assert(got.exists(_._5 == "matched"), "fixture must produce matched pairs")
    assert(got.exists(_._5 == "expired"), "fixture must produce expired starts")
  }

  test("boundary: state(A) then B == single run over A ∪ B (exact)") {
    val fx = Gen.fixture(150)
    def parsedOf(ts: Seq[graft.model.Turn]) =
      Parse(spark.createDataset(ts).toDF(), fx.conf)
    val isStart = col("action") === "login"
    val isEnd = col("action") === "upload"

    val cut = fx.turns.map(_.ts.getTime).sorted.apply(fx.turns.size / 2)
    val a = fx.turns.filter(_.ts.getTime < cut)
    val b = fx.turns.filter(_.ts.getTime >= cut)
    assert(a.nonEmpty && b.nonEmpty)

    val stA = Elapsed.state(parsedOf(a), "conv_id", isStart, isEnd)
    val resumed = rows(Elapsed.finish(
      Elapsed.state(parsedOf(b), "conv_id", isStart, isEnd, Some(stA)),
      "conv_id", timeout))
    val single = rows(Elapsed(parsedOf(fx.turns), "conv_id", isStart, isEnd, timeout))
    assert(resumed === single)
    // the boundary must actually split transactions (a start in A whose end
    // falls in B), otherwise this test proves nothing
    val aKeys = rows(Elapsed.finish(stA, "conv_id", timeout))
      .filter(_._5 == "expired").map(_._1).toSet
    val healed = single.filter(r => aKeys(r._1) && r._5 == "matched")
    assert(healed.nonEmpty, "no cross-boundary transaction in fixture split")
  }

  test("streaming twin (FMGWS, event-time timeout): matched == batch exactly, expired is a prefix") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamPipeline
    import spark.implicits._

    val fx = Gen.fixture(150)
    // three ascending-time files → ascending micro-batches (same contract as
    // the composed pipeline stream); distinct mtimes pin source order
    val base = Files.createTempDirectory("graft-elapsed-in").toString
    val sorted = fx.turns.sortBy(t => (t.ts.getTime, t.conv_id, t.turn_idx))
    val n = sorted.size
    Seq(sorted.slice(0, n / 3), sorted.slice(n / 3, 2 * n / 3), sorted.slice(2 * n / 3, n))
      .zipWithIndex.foreach { case (p, i) =>
        val tmp = Files.createTempDirectory("graft-elapsed-part").toString
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
      .option("maxFilesPerTrigger", "1").parquet(base)
    // 10-min timeout: the fixture spans ~100 minutes, so both resolution
    // paths (late end inline, no-end via event-time timeout once a later
    // file advances the watermark) actually occur in-stream
    val streamTimeout = 600L
    val out = StreamPipeline.elapsedStream(Parse(stream, fx.conf), "conv_id",
      col("action") === "login", col("action") === "upload", streamTimeout)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("elap").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("elap").collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4))).toSeq
    assert(got.map(_._1).distinct.size === got.size, "one resolution per key")
    val batch = rows(Elapsed(Parse(spark.createDataset(fx.turns).toDF(), fx.conf),
      "conv_id", col("action") === "login", col("action") === "upload", streamTimeout))
    val batchMatched = batch.filter(_._5 == "matched").toSet
    val batchExpired = batch.filter(_._5 == "expired").toSet
    val gotMatched = got.filter(_._5 == "matched").toSet
    val gotExpired = got.filter(_._5 == "expired").toSet
    assert(gotMatched === batchMatched)
    // expired: the stream can only have resolved what its final watermark
    // reached (trailing timeouts fire on the NEXT data) — prefix, not equal
    assert(gotExpired.subsetOf(batchExpired), s"extra expired: ${gotExpired -- batchExpired}")
    assert(gotMatched.nonEmpty && gotExpired.nonEmpty,
      "fixture must exercise both resolutions through the stream")
  }
}
