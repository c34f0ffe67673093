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
}
