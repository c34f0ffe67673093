package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.Gen
import graft.model._
import graft.operators.{Parse, SigRules, Whitelist}
import graft.sources.RuleLoader

/** The reference's config surface: rule FILES (rules.json / ioc.json /
  * whitelist.json / ref.json) must load into exactly the tables the compiled
  * stages consume, and drive the pipeline identically to code-built rules. */
class RuleLoaderSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: java.nio.file.Path, name: String, body: String): Unit = {
    Files.writeString(dir.resolve(name), body); ()
  }

  private lazy val cfgDir = {
    val d = Files.createTempDirectory("graft-rules")
    write(d, "rules.json",
      """[
        |  {"id": 1, "name": "exfil-action", "score": 40,
        |   "clauses": [{"field": "action", "op": "eq", "value": "exfil"}]},
        |  {"id": 3, "name": "exfil-5xx", "score": 60,
        |   "clauses": [{"field": "action", "op": "eq", "value": "exfil"},
        |               {"field": "status", "op": "gt", "value": "499"}]},
        |  {"id": 7, "name": "debug-uri", "score": 20,
        |   "clauses": [{"field": "uri", "op": "rx", "value": "^/debug"}]}
        |]""".stripMargin)
    write(d, "ioc.json",
      """[{"kind": "ip", "value": "203.0.113.7", "score": 30},
        |  {"kind": "user", "value": "mal3", "score": 35}]""".stripMargin)
    write(d, "whitelist.json",
      """[{"field": "action", "op": "eq", "value": "ping"},
        |  {"field": "role", "op": "eq", "value": "system"}]""".stripMargin)
    write(d, "ref.json",
      """[{"key": "user", "field": "action", "value": "login"}]""".stripMargin)
    d
  }

  test("files load into the exact table shapes the stages consume") {
    val tb = RuleLoader.fromDir(spark, cfgDir.toString)
    assert(tb.sigRules === Seq(
      SigRule(1, "exfil-action", "action", "eq", "exfil", 40),
      SigRule(3, "exfil-5xx", "action", "eq", "exfil", 60),
      SigRule(3, "exfil-5xx", "status", "gt", "499", 0),
      SigRule(7, "debug-uri", "uri", "rx", "^/debug", 20)))
    assert(tb.whitelist === Seq(
      WhitelistRule("action", "eq", "ping"), WhitelistRule("role", "eq", "system")))
    assert(tb.ioc.as[IocEntry].collect().toSet ===
      Set(IocEntry("ip", "203.0.113.7", 30), IocEntry("user", "mal3", 35)))
    assert(tb.ref.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq === Seq(("user", "action", "login")))
  }

  test("file-loaded rules drive the stages identically to code-built rules") {
    val fx = Gen.fixture(60)
    val parsed = Parse(spark.createDataset(fx.turns).toDF(), fx.conf)
    val tb = RuleLoader.fromDir(spark, cfgDir.toString)
    val codeRules = Seq(
      SigRule(1, "exfil-action", "action", "eq", "exfil", 40),
      SigRule(3, "exfil-5xx", "action", "eq", "exfil", 60),
      SigRule(3, "exfil-5xx", "status", "gt", "499", 0),
      SigRule(7, "debug-uri", "uri", "rx", "^/debug", 20))
    def sigOut(rules: Seq[SigRule]) =
      SigRules(parsed, rules).selectExpr("conv_id", "turn_idx",
        "array_join(transform(hits_sig, h -> concat(h.rule_id, ':', h.score)), ';') as hk")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(sigOut(tb.sigRules) === sigOut(codeRules))
    assert(sigOut(tb.sigRules).exists(_._3.nonEmpty), "rules must fire")
    val wlN = Whitelist(parsed, tb.whitelist).count()
    assert(wlN === Whitelist(parsed,
      Seq(WhitelistRule("action", "eq", "ping"),
        WhitelistRule("role", "eq", "system"))).count())
    assert(wlN < parsed.count(), "whitelist must drop fixture ping rows")
  }
}
