package graft

import graft.fixtures.Gen
import graft.model._
import graft.oracle.RefModel

/** Skew mode (SURVEY §2.9 R1): one conversation holds ~30% of all turns.
  * Correctness must be unaffected — the frequency stage's per-(key, sec)
  * pre-aggregation and (key, reset-bucket) window partitioning, and the
  * first-seen min-key aggregation, are the skew defenses under test. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("hot-key fixture: pipeline == oracle (hit-level)") {
    val fx = Gen.fixture(150, hotKey = true)
    val hot = fx.turns.groupBy(_.conv_id).view.mapValues(_.size).toMap
    assert(hot("conv-000000") >= fx.turns.size * 2 / 10, "fixture must actually be skewed")

    val turns = spark.createDataset(fx.turns).toDF().repartition(16)
    val tb = RuleTables(fx.ioc.toDF(), fx.rules, fx.ref.toDF(), fx.whitelist)
    val got = Pipeline.enrich(turns, tb, fx.conf)
      .selectExpr("conv_id", "turn_idx", "note", "severity", "freq_hit",
        "array_join(transform(hits, h -> concat(h.kind, ':', h.name, ':', h.score)), ';') as hk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getBoolean(4), r.getString(5))).sortBy(t => (t._1, t._2)).toSeq

    val want = RefModel(fx.turns, fx.ioc, fx.rules, fx.ref, fx.whitelist, fx.conf)
      .map(o => (o.turn.conv_id, o.turn.turn_idx, o.note, o.severity, o.freqHit,
        o.hits.map(h => s"${h.kind}:${h.name}:${h.score}").mkString(";")))
      .sortBy(t => (t._1, t._2))

    assert(got.size === want.size)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }
}
