package graft.entry

import org.apache.spark.sql.SparkSession

import graft.RuleTables
import graft.fixtures.Gen.md5
import graft.model._

/** Rule/lookup tables used by the driver-harness queries over /root/testdata.
  * Values align with [[TestdataAdapter]]'s synthesized text (e.g. IOC ips are
  * the 203.0.113.x block the adapter emits for event_id % 23 == 0).
  *
  * Each table exists twice by construction: as a Scala Seq (broadcast side of
  * the Spark joins) and as a generated SQL VALUES CTE (DuckDB oracle side) —
  * single source, zero drift. */
object TestdataTables {

  val ioc: Seq[IocEntry] =
    (1 to 80).map(i => IocEntry("ip", s"203.0.113.$i", 30 + (i % 6) * 10)) ++
      (0 until 60).map(i => IocEntry("domain", s"evil$i.example.net", 30 + (i % 6) * 10)) ++
      (0 until 40).map(i => IocEntry("hash", md5(s"mal$i"), 40 + (i % 5) * 10)) ++
      Seq(IocEntry("user", "u13", 35), IocEntry("user", "u27", 35), IocEntry("user", "u41", 35))

  val sigRules: Seq[SigRule] = Seq(
    SigRule(1, "exfil-action", "action", "eq", "exfil", 40),
    SigRule(2, "5xx-status", "status", "gt", "499", 10),
    SigRule(3, "exfil-5xx", "action", "eq", "exfil", 60),
    SigRule(3, "exfil-5xx", "status", "gt", "499", 0),
    SigRule(4, "secret-uri", "uri", "rx", "secret", 30),
    SigRule(5, "debug-uri", "uri", "rx", "^/debug", 20),
    SigRule(6, "not-found", "status", "in", "404,410", 15),
    SigRule(7, "new-account", "user", "rx", "^nu[0-9]+$", 25),
    SigRule(8, "tool-error-exfil", "tool", "eq", "bash", 45),
    SigRule(8, "tool-error-exfil", "action", "eq", "exfil", 0))

  val refBaseline: Seq[RefEntry] = {
    val actions = Seq(
      RefEntry("user", "action", "click"), RefEntry("user", "action", "view"),
      RefEntry("assistant", "action", "purchase"), RefEntry("assistant", "action", "signup"),
      RefEntry("tool", "action", "error"))
    val hosts = for {
      role <- Seq("user", "assistant", "tool"); i <- 0 until 25
    } yield RefEntry(role, "dst_host", s"host$i.corp.example")
    actions ++ hosts
  }

  val whitelist: Seq[WhitelistRule] = Seq(WhitelistRule("action", "eq", "signup"))

  val conf: PipelineConf = PipelineConf()

  def rules(spark: SparkSession): RuleTables = {
    import spark.implicits._
    graft.RuleTables(ioc.toDF(), sigRules, refBaseline.toDF(), whitelist)
  }

  // ---- DuckDB VALUES CTEs (generated from the same Seqs) ----
  private def esc(s: String) = s.replace("'", "''")

  val iocCte: String = ioc
    .map(e => s"('${esc(e.kind)}','${esc(e.value)}',${e.score})")
    .mkString("ioc(kind, value, score) AS (SELECT * FROM (VALUES ", ", ", "))")

  val refCte: String = refBaseline
    .map(r => s"('${esc(r.ref_key)}','${esc(r.field)}','${esc(r.value)}')")
    .mkString("ref_baseline(ref_key, field, value) AS (SELECT * FROM (VALUES ", ", ", "))")
}
