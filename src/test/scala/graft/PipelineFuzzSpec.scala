package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.fixtures.Gen
import graft.model._
import graft.oracle.RefModel

/** Randomized FULL-CHAIN differential: the distributed C1→C9 pipeline must
  * equal the single-threaded RefModel oracle row-for-row under MANY random
  * configurations at once — every knob of PipelineConf (field mappings,
  * thresholds, scores, severity bands, frequency key/window) drawn from a
  * seeded pool, over a fresh random corpus per config.
  *
  * ClauseEquivalenceSpec fuzzes clause semantics cell-by-cell;
  * PipelineOracleSpec pins the default conf; this spec closes the gap between
  * them: INTERACTIONS of non-default mappings across the whole chain.
  */
class PipelineFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val bandsPool = Seq(
    Seq(0 -> "low", 20 -> "medium", 50 -> "high", 100 -> "critical"),
    Seq(0 -> "info", 25 -> "notice", 60 -> "crit"),
    Seq(0 -> "a", 10 -> "b", 30 -> "c", 70 -> "d"))
  private val fpPool = Seq(
    Seq("text"), Seq("conv_id", "text"), Seq("action", "user", "uri"),
    Seq("role", "text"))
  private val trackedPool = Seq(
    Seq("user", "dst_host"), Seq("user"), Seq("dst_host", "action"),
    Seq("user", "dst_host", "uri"))
  private val refPool = Seq(
    Seq("action", "dst_host"), Seq("action"), Seq("dst_host"))
  private val iocPool = Seq(
    Seq("domain" -> "dst_host", "hash" -> "hashv", "ip" -> "src_ip", "user" -> "user"),
    Seq("domain" -> "dst_host", "ip" -> "src_ip"),
    Seq("hash" -> "hashv", "user" -> "user"))
  private val freqKeyPool = Seq("conv_id", "conv_id", "user")

  private def randConf(rng: Random): PipelineConf = {
    def pick[T](xs: Seq[T]): T = xs(rng.nextInt(xs.size))
    PipelineConf(
      trackedFields = pick(trackedPool),
      fingerprintFields = pick(fpPool),
      iocKindFields = pick(iocPool),
      refFields = pick(refPool),
      freqKey = pick(freqKeyPool),
      freqWindowSec = pick(Seq(30L, 60L, 120L)),
      freqThreshold = pick(Seq(3, 5, 8)),
      freqResetSec = pick(Seq(30L, 60L, 120L)),
      dedupDelaySec = pick(Seq(60L, 300L, 900L)),
      firThreshold = pick(Seq(30, 50, 70)),
      severityBands = pick(bandsPool),
      newValueScore = 5 + rng.nextInt(30),
      freqScore = 5 + rng.nextInt(30),
      refScore = 5 + rng.nextInt(20))
  }

  private def sparkRows(enriched: DataFrame) =
    enriched.selectExpr("conv_id", "turn_idx", "text", "note", "severity",
      "routed", "first_seen", "freq_hit",
      "array_join(transform(hits, h -> concat(h.kind, ':', h.name, ':', h.rule_id, ':', h.score)), ';') as hk")
      .collect().toSeq.map { r =>
        (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3), r.getString(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getString(8))
      }.sortBy(t => (t._1, t._2))

  private def oracleRows(rows: Seq[RefModel.OracleRow]) =
    rows.map { o =>
      (o.turn.conv_id, o.turn.turn_idx, o.turn.text, o.note, o.severity,
        o.routed, o.firstSeen, o.freqHit,
        o.hits.map(h => s"${h.kind}:${h.name}:${h.rule_id}:${h.score}").mkString(";"))
    }.sortBy(t => (t._1, t._2))

  test("pipeline == RefModel under 6 random confs × random corpora (full-row + hit-level)") {
    for (seed <- 1 to 6) {
      val rng = new Random(seed * 7919L)
      val conf = randConf(rng)
      val turns = Gen.transcripts(nConvs = 120, seed = 1000L + seed)
      val tables = RuleTables(Gen.iocTable.toDF(), Gen.sigRules,
        Gen.refBaseline.toDF(), Gen.whitelistRules)
      val enriched = Pipeline.enrich(spark.createDataset(turns).toDF(), tables, conf)
      val got = sparkRows(enriched)
      val want = oracleRows(
        RefModel(turns, Gen.iocTable, Gen.sigRules, Gen.refBaseline,
          Gen.whitelistRules, conf))
      assert(got.size === want.size,
        s"seed=$seed conf=$conf: row counts got ${got.size} want ${want.size}")
      got.zip(want).foreach { case (g, w) =>
        assert(g === w, s"seed=$seed conf=$conf")
      }
      // the fixture must actually exercise routing under this conf
      assert(want.exists(_._6) || conf.firThreshold > 50,
        s"seed=$seed: no routed rows — fixture too weak for conf=$conf")
    }
  }
}
