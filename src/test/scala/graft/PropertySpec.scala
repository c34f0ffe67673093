package graft

import org.scalacheck.{Gen => SCGen, Prop, Properties}

import graft.fixtures.Gen
import graft.model._
import graft.oracle.RefModel

/** Property-based invariants (SURVEY §5.4), RefModel-level fuzz — fast, no
  * Spark; Spark-vs-oracle equality on adversarial inputs lives in
  * PipelineOracleSpec/SkewSpec. Run natively by the ScalaCheck framework. */
object PropertySpec extends Properties("RefModel") {

  private val fx = Gen.fixture(0) // tables only

  private val garbageText: SCGen[String] =
    SCGen.listOfN(6, SCGen.oneOf("zz", "user", "src=", "%{", "\\", "'", "\"",
      "héllo", "统一", "a" * 50, "", " ")).map(_.mkString(" "))

  private val lineText: SCGen[String] = for {
    a <- SCGen.oneOf("login", "exfil", "ping", "read")
    u <- SCGen.oneOf("u001", "admin", "monitor", "newx")
    st <- SCGen.oneOf(100, 200, 503)
  } yield s"$a user=$u src=10.0.0.1 dst=host1.corp.example status=$st " +
    s"hash=${Gen.md5("x")} uri=/api/v1/r1"

  private val turnGen: SCGen[Turn] = for {
    c <- SCGen.choose(0, 5)
    ti <- SCGen.choose(0, 50)
    role <- SCGen.oneOf("user", "assistant", "tool", "system")
    text <- SCGen.frequency(3 -> lineText, 2 -> garbageText)
    tool <- SCGen.oneOf("", "bash", "mail")
    ts <- SCGen.choose(0L, 100000L)
  } yield Turn(f"conv-$c%06d", ti, role, text, tool,
    new java.sql.Timestamp((Gen.BaseEpochSec + ts) * 1000L))

  private val turnsGen: SCGen[Seq[Turn]] = SCGen.listOf(turnGen)
    .map(_.groupBy(t => (t.conv_id, t.turn_idx)).map(_._2.head).toSeq)

  property("total; note == Σ scores; severity banding; routing threshold") =
    Prop.forAll(turnsGen) { turns =>
      val rows = RefModel(turns, fx.ioc, fx.rules, fx.ref, fx.whitelist, fx.conf)
      rows.forall { r =>
        r.note == r.hits.map(_.score).sum &&
          Set("low", "medium", "high", "critical").contains(r.severity) &&
          r.routed == (r.note >= fx.conf.firThreshold)
      }
    }

  property("severity sinks partition the routed set") =
    Prop.forAll(turnsGen) { turns =>
      val rows = RefModel(turns, fx.ioc, fx.rules, fx.ref, fx.whitelist, fx.conf)
      RefModel.sinkCounts(rows).values.sum == rows.count(_.routed).toLong
    }

  property("resume: run(A ∪ B) == run(A) ++ run(B, state-of-A) (non-freq fields)") =
    Prop.forAll(turnsGen, SCGen.choose(0L, 100000L)) { (turns, cutRel) =>
      val cut = (Gen.BaseEpochSec + cutRel) * 1000L
      val a = turns.filter(_.ts.getTime < cut)
      val b = turns.filter(_.ts.getTime >= cut)
      val single = RefModel(turns, fx.ioc, fx.rules, fx.ref, fx.whitelist, fx.conf)
      val ra = RefModel(a, fx.ioc, fx.rules, fx.ref, fx.whitelist, fx.conf)
      val seenV = ra.flatMap(r => fx.conf.trackedFields.flatMap(f =>
        r.fields.get(f).filter(_.nonEmpty).map(f -> _))).toSet
      val fps = a.map(t =>
        (t.text, t.ts.getTime / 1000L / fx.conf.dedupDelaySec)).toSet
      val rb = RefModel(b, fx.ioc, fx.rules, fx.ref, fx.whitelist, fx.conf,
        seenValues = seenV, seenFps = fps)
      // freq state is deliberately not seeded at oracle level (Spark-side
      // equivalence incl. freq is proven in IncrementalSpec) — compare all
      // non-freq detection fields.
      def key(r: RefModel.OracleRow) =
        (r.turn.conv_id, r.turn.turn_idx, r.parseOk,
          r.hits.filter(_.kind != "freq").map(h => (h.kind, h.name, h.score)),
          r.firstSeen)
      (ra ++ rb).map(key).sortBy(_.toString) == single.map(key).sortBy(_.toString)
    }
}
