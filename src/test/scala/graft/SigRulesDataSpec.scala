package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Gen
import graft.operators.{Parse, SigRules, SigRulesData}

/** The data-driven rule tier (broadcast theta-join, C4b) must produce exactly
  * the compiled tier's hits on the same input. */
class SigRulesDataSpec extends SparkSuite {
  import spark.implicits._

  test("data-driven tier == compiled tier (hit arrays, fixture corpus)") {
    val fx = Gen.fixture(200)
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
      .persist()
    def hitsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, String)] =
      df.selectExpr("conv_id", "turn_idx",
        "array_join(transform(hits_sig, h -> concat(h.rule_id, ':', h.name, ':', h.score, ':', h.kind)), ';') as hk")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq

    val compiled = hitsOf(SigRules(parsed, fx.rules))
    val dataTier = hitsOf(SigRulesData(parsed, fx.rules.toDF(), fx.conf))
    parsed.unpersist()
    assert(compiled.size === dataTier.size)
    compiled.zip(dataTier).foreach { case (c, d) => assert(c === d) }
    assert(compiled.exists(_._3.nonEmpty), "fixture must produce sig hits")
  }

  test("status clause normalization: padded / zero-prefixed args match in both tiers") {
    import graft.model.SigRule
    val fx = Gen.fixture(150)
    val rules = Seq(
      SigRule(1, "padded-eq", "status", "eq", " 503", 10),
      SigRule(2, "zeroed-eq", "status", "eq", "0503", 10),
      SigRule(3, "padded-in", "status", "in", "404, 503 ,0301", 10))
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf).persist()
    def hitsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, String)] =
      df.selectExpr("conv_id", "turn_idx",
        "array_join(transform(hits_sig, h -> concat(h.rule_id, ':', h.score)), ';') as hk")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val compiled = hitsOf(SigRules(parsed, rules))
    val dataTier = hitsOf(SigRulesData(parsed, rules.toDF(), fx.conf))
    parsed.unpersist()
    assert(compiled === dataTier)
    assert(compiled.exists(_._3.nonEmpty), "padded status rules must fire")
  }

  test("array-field rules are rejected loudly (compiled tier handles those)") {
    import graft.model.SigRule
    val fx = Gen.fixture(5)
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    intercept[IllegalArgumentException] {
      SigRulesData(parsed, Seq(SigRule(1, "t", "tags", "eq", "tool:bash", 5)).toDF(), fx.conf)
    }
  }
}
