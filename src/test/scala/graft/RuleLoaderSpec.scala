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

  test("mappings.json drives NON-DEFAULT field mappings end-to-end (Spark == RefModel)") {
    import graft.oracle.RefModel
    val d = Files.createTempDirectory("graft-mappings")
    write(d, "mappings.json",
      """{"fingerprint_fields": ["action", "user", "dst_host"],
        | "ioc_fields": {"host": "dst_host", "ip": "src_ip"},
        | "ref_fields": ["uri"],
        | "tracked_fields": ["src_ip"],
        | "freq_key": "user",
        | "freq_threshold": 7, "fir_threshold": 45, "ref_score": 12,
        | "severity_bands": [{"min": 0, "name": "info"}, {"min": 45, "name": "alert"}],
        | "grok_fallbacks": ["%{WORD:action} %{GREEDYDATA:uri}"],
        | "sink_format": "orc"}""".stripMargin)
    val fx = Gen.fixture(120)
    val conf = RuleLoader.confFromDir(spark, d.toString, fx.conf)
    assert(conf.fingerprintFields === Seq("action", "user", "dst_host"))
    assert(conf.iocKindFields === Seq("host" -> "dst_host", "ip" -> "src_ip"))
    assert(conf.refFields === Seq("uri"))
    assert(conf.trackedFields === Seq("src_ip"))
    assert(conf.freqKey === "user")
    assert(conf.freqThreshold === 7 && conf.firThreshold === 45 && conf.refScore === 12)
    assert(conf.severityBands === Seq(0 -> "info", 45 -> "alert"))
    assert(conf.sinkFormat === "orc" && conf.format === "parquet")
    assert(conf.freqWindowSec === fx.conf.freqWindowSec, "unset keys keep base values")
    assert(conf.grokFallbacks === Seq("%{WORD:action} %{GREEDYDATA:uri}"))
    assert(conf.grokPattern === fx.conf.grokPattern, "unset grok_pattern keeps base")
    // conf without a mappings file is untouched
    assert(RuleLoader.confFromDir(spark,
      Files.createTempDirectory("graft-nomap").toString, fx.conf) === fx.conf)
    // malformed grok fails at load time, not mid-job
    val bad = Files.createTempDirectory("graft-badgrok")
    write(bad, "mappings.json", """{"grok_pattern": "%{NOSUCHPAT:x}"}""")
    intercept[Exception](RuleLoader.confFromDir(spark, bad.toString, fx.conf))

    // IOC/ref tables aligned with the REMAPPED fields so every remapped
    // check actually fires on the fixture
    val ioc = Seq(IocEntry("host", "host3.corp.example", 30),
      IocEntry("host", "host7.corp.example", 40)) ++ fx.ioc.filter(_.kind == "ip")
    val ref = for {
      role <- Seq("user", "assistant", "tool"); i <- 0 until 10
    } yield RefEntry(role, "uri", s"/api/v1/r$i")
    val tb = RuleTables(ioc.toDF(), fx.rules, ref.toDF(), fx.whitelist)

    val enriched = Pipeline.enrich(spark.createDataset(fx.turns).toDF(), tb, conf)
    val got = enriched.selectExpr("conv_id", "turn_idx", "note", "severity",
      "routed", "first_seen", "freq_hit",
      "array_join(transform(hits, h -> concat(h.kind, ':', h.name, ':', h.score)), ';') as hk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getString(7)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = RefModel(fx.turns, ioc, fx.rules, ref, fx.whitelist, conf).map { o =>
      (o.turn.conv_id, o.turn.turn_idx, o.note, o.severity, o.routed,
        o.firstSeen, o.freqHit,
        o.hits.map(h => s"${h.kind}:${h.name}:${h.score}").mkString(";"))
    }.sortBy(t => (t._1, t._2))
    assert(got.size === want.size, s"rows: got ${got.size} want ${want.size}")
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    // the remapped checks must all actually fire
    val allHits = got.map(_._8).mkString(";")
    for (h <- Seq("ioc:ioc:host", "ioc:ioc:ip", "ref:ref:uri", "new:new:src_ip"))
      assert(allHits.contains(h), s"expected remapped hit $h to fire")
  }
}
