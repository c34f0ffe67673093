package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Gen
import graft.model.Turn
import graft.operators.{ClauseCompiler, Parse}
import graft.oracle.RefModel

/** Spark-vs-oracle clause-semantics fuzz: 200 seeded random clauses (every
  * field incl. the tags array and status numerics, every op, padded /
  * zero-prefixed / non-numeric args) evaluated BOTH as compiled Catalyst
  * predicates (ClauseCompiler) over the parsed DataFrame and by
  * RefModel.clauseMatches per row — results must agree cell-for-cell.
  * This is the contract that keeps C2/C4 and the oracle from drifting. */
class ClauseEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  test("ClauseCompiler == RefModel.clauseMatches on 200 random clauses × fixture rows") {
    val rng = new scala.util.Random(7)
    val fields = Seq("action", "user", "src_ip", "dst_host", "hashv", "uri",
      "role", "tool", "conv_id", "status", "tags", "text")
    val rxPats = Seq("^ex", "host[0-9]+", "\\d+", "tool:", "^nu", "e", "a.c",
      "corp\\.example$", "_grok")
    val strArgs = Seq("exfil", "login", "u001", "tool:bash", "_grokparsefailure",
      "host1.corp.example", "", "monitor", "10.0.0.1", "assistant")
    val intArgs = Seq("200", " 503", "0301", "404", "100", "-1")
    val numArgs = Seq("0", " 503", "0301", "200", "499.5", "-1", "150.0")

    def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.size))
    def genClause(): (String, String, String) = {
      val f = pick(fields)
      val op = pick(Seq("rx", "eq", "in", "lt", "gt", "exists"))
      val arg = op match {
        case "rx" => pick(rxPats)
        case "eq" => if (f == "status") pick(intArgs) else pick(strArgs)
        case "in" =>
          val pool = if (f == "status") intArgs else strArgs.filter(_.nonEmpty)
          Seq.fill(1 + rng.nextInt(3))(pick(pool)).mkString(",")
        case "lt" | "gt" => pick(numArgs)
        case "exists" => ""
      }
      (f, op, arg)
    }

    val clauses = Seq.fill(200)(genClause())
    val fx = Gen.fixture(80)
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    val cols = clauses.zipWithIndex.map { case ((f, o, a), i) =>
      coalesce(ClauseCompiler.predicate(f, o, a), lit(false)).as(s"c$i")
    }
    val got = parsed
      .select((Seq(col("conv_id"), col("turn_idx")) ++ cols): _*)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        clauses.indices.map(i => r.getBoolean(2 + i)))
      .toMap

    val byKey: Map[(String, Int), Turn] =
      fx.turns.map(t => (t.conv_id, t.turn_idx) -> t).toMap
    assert(got.size === byKey.size)
    var checked = 0
    byKey.foreach { case (k, t) =>
      val (flds, ok) = RefModel.parseFields(t, fx.conf)
      val want = clauses.map { case (f, o, a) =>
        RefModel.clauseMatches(t, flds, ok, f, o, a)
      }
      val g = got(k)
      clauses.indices.foreach { i =>
        checked += 1
        assert(g(i) === want(i),
          s"clause ${clauses(i)} on turn $k (ok=$ok): spark=${g(i)} oracle=${want(i)} text='${t.text.take(80)}'")
      }
    }
    assert(checked > 100000, s"fuzz must cover a real matrix, got $checked")
  }
}
