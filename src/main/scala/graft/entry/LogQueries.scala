package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Pipeline
import graft.functions.GrokCompiler
import graft.model._
import graft.operators._

/** Driver-harness queries for every log-pipeline operator of SURVEY §2,
  * exercised over /root/testdata via [[TestdataAdapter]], each with a DuckDB
  * oracle. Names index into SURVEY §2 rows (p* = §2.2 transforms, c* = §2.4
  * check chain, agg/win/set = §2.6–2.7, q* = general join/agg surface). */
object LogQueries {

  /** Pipeline conf tuned to the events table's time density (max 1-day burst
    * per conversation is ~11 → threshold 8; dedup bucket = 1 day). */
  val tconf: PipelineConf = PipelineConf(
    freqWindowSec = 86400L, freqThreshold = 8, freqResetSec = 86400L,
    dedupDelaySec = 86400L)

  private val rx = GrokCompiler.compile(PipelineConf.DefaultGrok).regex

  // ---------- shared Spark-side inputs ----------
  private[entry] def T(s: SparkSession, d: String): DataFrame = TestdataAdapter.turns(s, d)
  private[entry] def P(s: SparkSession, d: String): DataFrame = Parse(T(s, d), tconf)

  // ---------- shared DuckDB CTEs ----------
  private val parsedCte: String = s"""parsed AS (
  SELECT conv_id, turn_idx, role, text, NULLIF(tool, '') AS tool, ts,
    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
    NULLIF(regexp_extract(text, '$rx', 1), '') AS action,
    NULLIF(regexp_extract(text, '$rx', 2), '') AS usr,
    NULLIF(regexp_extract(text, '$rx', 3), '') AS src_ip,
    NULLIF(regexp_extract(text, '$rx', 4), '') AS dst_host,
    CAST(NULLIF(regexp_extract(text, '$rx', 5), '') AS INT) AS status,
    NULLIF(regexp_extract(text, '$rx', 6), '') AS hashv,
    NULLIF(regexp_extract(text, '$rx', 7), '') AS uri,
    regexp_matches(text, '$rx') AS parse_ok,
    list_filter([
      CASE WHEN NOT regexp_matches(text, '$rx') THEN '_grokparsefailure' END,
      CASE WHEN tool IS NOT NULL AND tool != '' THEN 'tool:' || tool END
    ], x -> x IS NOT NULL) AS tags
  FROM turns
)"""

  private[entry] def sqlT(body: String): String =
    s"WITH ${TestdataAdapter.turnsCte}\n$body"
  private[entry] def sqlP(body: String): String =
    s"WITH ${TestdataAdapter.turnsCte},\n$parsedCte\n$body"
  private def sqlFull(body: String): String =
    s"WITH ${TestdataAdapter.turnsCte},\n$parsedCte,\n${TestdataTables.iocCte},\n" +
      s"${TestdataTables.refCte},\n$enrichedCtes\n$body"
  private def sqlFullFor(conf: PipelineConf)(body: String): String =
    s"WITH ${TestdataAdapter.turnsCte},\n$parsedCte,\n${TestdataTables.iocCte},\n" +
      s"${TestdataTables.refCte},\n${enrichedCtesFor(conf)}\n$body"

  /** DuckDB rendering of one rule clause — mirror of ClauseCompiler. */
  private def clauseSql(field: String, op: String, arg: String): String = {
    val f = if (field == "user") "usr" else field
    op match {
      case "rx" => s"regexp_matches($f, '${arg.replace("'", "''")}')"
      case "eq" => if (field == "status") s"$f = $arg" else s"$f = '$arg'"
      case "in" =>
        if (field == "status") s"$f IN (${arg})"
        else s"$f IN (${arg.split(",").map(a => s"'$a'").mkString(",")})"
      case "lt" => s"TRY_CAST($f AS DOUBLE) < $arg"
      case "gt" => s"TRY_CAST($f AS DOUBLE) > $arg"
      case "exists" => s"($f IS NOT NULL AND $f != '')"
    }
  }

  private def rulePredSql(clauses: Seq[SigRule]): String =
    clauses.map(c => clauseSql(c.field, c.op, c.arg)).mkString("(parse_ok AND ", " AND ", ")")

  private val ruleGroups = TestdataTables.sigRules.groupBy(_.rule_id).toSeq.sortBy(_._1)

  private val sigScoreSql: String = ruleGroups.map { case (_, cl) =>
    s"(CASE WHEN ${rulePredSql(cl)} THEN ${cl.map(_.score).sum} ELSE 0 END)"
  }.mkString(" + ")

  /** DuckDB rendering of Scoring.severityExpr: highest band floor ≤ note. */
  private def severityCaseSql(conf: PipelineConf): String =
    conf.severityBands.sortBy(-_._1).init
      .map { case (minNote, name) => s"WHEN note >= $minNote THEN '$name'" }
      .mkString("CASE ", " ", s" ELSE '${conf.severityBands.head._2}' END")

  /** The whole C1→C8 chain in DuckDB — the cross-engine differential of the
    * full pipeline (dedup → whitelist → ioc/sig/ref → first-seen → freq →
    * score/severity). Mirrors Pipeline.enrich with the given conf (same
    * fixture field mappings; thresholds/scores/bands parameterized). */
  private def enrichedCtesFor(tconf: PipelineConf): String = s"""dd AS (
  SELECT * FROM (
    SELECT p.*, row_number() OVER (PARTITION BY text, ts_sec // ${tconf.dedupDelaySec}
      ORDER BY ts, conv_id, turn_idx) AS _rn FROM parsed p) WHERE _rn = 1
),
sv AS (SELECT * FROM dd WHERE NOT coalesce(action = 'signup', false)),
en AS (
  SELECT sv.*,
    coalesce(iip.score, 0) + coalesce(idm.score, 0) + coalesce(ihs.score, 0)
      + coalesce(ius.score, 0) AS ioc_score,
    ($sigScoreSql) AS sig_score,
    (CASE WHEN parse_ok AND action IS NOT NULL AND ra.value IS NULL THEN ${tconf.refScore} ELSE 0 END
     + CASE WHEN parse_ok AND dst_host IS NOT NULL AND rh.value IS NULL THEN ${tconf.refScore} ELSE 0 END) AS ref_score
  FROM sv
  LEFT JOIN (SELECT lower(value) AS value, max(score) AS score FROM ioc WHERE kind = 'ip' GROUP BY 1) iip ON lower(sv.src_ip) = iip.value
  LEFT JOIN (SELECT lower(value) AS value, max(score) AS score FROM ioc WHERE kind = 'domain' GROUP BY 1) idm ON lower(sv.dst_host) = idm.value
  LEFT JOIN (SELECT lower(value) AS value, max(score) AS score FROM ioc WHERE kind = 'hash' GROUP BY 1) ihs ON lower(sv.hashv) = ihs.value
  LEFT JOIN (SELECT lower(value) AS value, max(score) AS score FROM ioc WHERE kind = 'user' GROUP BY 1) ius ON lower(sv.usr) = ius.value
  LEFT JOIN (SELECT DISTINCT ref_key, value FROM ref_baseline WHERE field = 'action') ra ON sv.role = ra.ref_key AND sv.action = ra.value
  LEFT JOIN (SELECT DISTINCT ref_key, value FROM ref_baseline WHERE field = 'dst_host') rh ON sv.role = rh.ref_key AND sv.dst_host = rh.value
),
fs AS (
  SELECT en.*,
    (usr IS NOT NULL AND row_number() OVER (PARTITION BY usr ORDER BY ts, conv_id, turn_idx) = 1) AS new_user,
    (dst_host IS NOT NULL AND row_number() OVER (PARTITION BY dst_host ORDER BY ts, conv_id, turn_idx) = 1) AS new_host
  FROM en
),
fr AS (
  SELECT fs.*, (count(*) OVER (PARTITION BY conv_id ORDER BY ts_sec
    RANGE BETWEEN ${tconf.freqWindowSec} PRECEDING AND CURRENT ROW) >= ${tconf.freqThreshold}) AS _raw
  FROM fs
),
fr2 AS (
  SELECT fr.*, (_raw AND sum(CASE WHEN _raw THEN 1 ELSE 0 END) OVER (
    PARTITION BY conv_id, ts_sec // ${tconf.freqResetSec}
    ORDER BY ts, conv_id, turn_idx ROWS UNBOUNDED PRECEDING) = 1) AS freq_hit
  FROM fr
),
sev AS (
  SELECT conv_id, turn_idx,
    ioc_score + sig_score + ref_score
      + (CASE WHEN new_user THEN ${tconf.newValueScore} ELSE 0 END)
      + (CASE WHEN new_host THEN ${tconf.newValueScore} ELSE 0 END)
      + (CASE WHEN freq_hit THEN ${tconf.freqScore} ELSE 0 END) AS note
  FROM fr2
),
scored AS (
  SELECT conv_id, turn_idx, note,
    ${severityCaseSql(tconf)} AS severity,
    note >= ${tconf.firThreshold} AS routed
  FROM sev
)"""

  private val enrichedCtes: String = enrichedCtesFor(tconf)

  /** P24 fixture UAs — one per family/os/device combination the parser
    * distinguishes, picked per turn by `turn_idx % size` in both engines. */
  private val uaTemplates: Seq[String] = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:125.0) Gecko/20100101 Firefox/125.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Edg/124.0.2478.51",
    "curl/8.5.0",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.6367.54 Mobile Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Mobile/15E148 Safari/604.1",
    "FancyAnalyzer/2.1")

  /** C8b conf: every numeric knob off its default (scores, FIR threshold,
    * bands) — what a rule dir's mappings.json would set. */
  val confB: PipelineConf = tconf.copy(
    newValueScore = 25, freqScore = 35, refScore = 15, firThreshold = 40,
    severityBands = Seq(0 -> "info", 25 -> "notice", 60 -> "crit"))

  /** RFC 5424 syslog facility / severity label tables (P26). */
  private val SyslogFacilities: Seq[String] = Seq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "logaudit", "logalert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7")
  private val SyslogSeverities: Seq[String] = Seq(
    "emergency", "alert", "critical", "error", "warning", "notice",
    "informational", "debug")

  // =====================================================================
  val all: Seq[Q] = Seq(

    Q("p1_grok_parse", sqlP(
      """SELECT conv_id, turn_idx, action, usr, src_ip, dst_host, status, hashv, uri, parse_ok
        |FROM parsed ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).select(col("conv_id"), col("turn_idx"), col("action"),
        col("user").as("usr"), col("src_ip"), col("dst_host"), col("status"),
        col("hashv"), col("uri"), col("parse_ok"))
        .orderBy("conv_id", "turn_idx")
    },

    // P1 multi-pattern fallback: Logstash grok takes a pattern LIST, first
    // match wins; '_grokparsefailure' only when ALL miss. The fallback below
    // catches the adapter's unstructured "noise …" lines that the primary
    // pattern rejects.
    Q("p1b_grok_multi", {
      val rx2 = GrokCompiler.compile("%{WORD:action} %{GREEDYDATA:uri}").regex
      sqlT(
        s"""SELECT conv_id, turn_idx,
           |  CASE WHEN regexp_matches(text, '$rx') THEN NULLIF(regexp_extract(text, '$rx', 1), '')
           |       WHEN regexp_matches(text, '$rx2') THEN NULLIF(regexp_extract(text, '$rx2', 1), '') END AS action,
           |  CASE WHEN regexp_matches(text, '$rx') THEN NULLIF(regexp_extract(text, '$rx', 7), '')
           |       WHEN regexp_matches(text, '$rx2') THEN NULLIF(regexp_extract(text, '$rx2', 2), '') END AS uri,
           |  (regexp_matches(text, '$rx') OR regexp_matches(text, '$rx2')) AS parse_ok
           |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)
    }) { (s, d) =>
      val conf2 = tconf.copy(grokFallbacks = Seq("%{WORD:action} %{GREEDYDATA:uri}"))
      Parse(T(s, d), conf2).select(col("conv_id"), col("turn_idx"),
        nullif(col("action"), lit("")).as("action"),
        nullif(col("uri"), lit("")).as("uri"), col("parse_ok"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p2_dissect", sqlT(
      """SELECT conv_id, turn_idx, split_part(text, ' ', 1) AS tok0, split_part(text, ' ', 2) AS tok1
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d).select(col("conv_id"), col("turn_idx"),
        element_at(split(col("text"), " "), 1).as("tok0"),
        element_at(split(col("text"), " "), 2).as("tok1"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p3_mutate", sqlP(
      """SELECT conv_id, turn_idx, upper(role) AS role_up, CAST(status AS BIGINT) AS status_l,
        |  regexp_replace(uri, '[0-9]+', '#', 'g') AS uri_norm,
        |  role || '|' || coalesce(action, '-') AS merged
        |FROM parsed ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).select(col("conv_id"), col("turn_idx"),
        upper(col("role")).as("role_up"),
        col("status").cast("long").as("status_l"),
        regexp_replace(col("uri"), "[0-9]+", "#").as("uri_norm"),
        concat(col("role"), lit("|"), coalesce(col("action"), lit("-"))).as("merged"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p4_date", sqlT(
      """SELECT conv_id, turn_idx, strftime(ts, '%Y-%m-%d %H') AS hour_s,
        |  CAST(ts AS DATE) AS day, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d).select(col("conv_id"), col("turn_idx"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour_s"),
        to_date(col("ts")).as("day"),
        unix_timestamp(col("ts")).as("ts_sec"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p4b_date_parse", sqlT(
      """SELECT conv_id, turn_idx, raw,
        |  coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
        |           try_strptime(raw, '%d/%m/%Y %H:%M:%S')) AS parsed_ts
        |FROM (SELECT conv_id, turn_idx,
        |  CASE WHEN turn_idx % 2 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |       ELSE strftime(ts, '%d/%m/%Y %H:%M:%S') END AS raw FROM turns)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      // Logstash `date` filter: try formats in order, first hit wins
      T(s, d).select(col("conv_id"), col("turn_idx"),
        when(col("turn_idx") % 2 === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .otherwise(date_format(col("ts"), "dd/MM/yyyy HH:mm:ss")).as("raw"))
        .withColumn("parsed_ts", coalesce(
          try_to_timestamp(col("raw"), lit("yyyy-MM-dd HH:mm:ss")),
          try_to_timestamp(col("raw"), lit("dd/MM/yyyy HH:mm:ss"))))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p5_kv", sqlT(
      """SELECT conv_id, turn_idx,
        |  NULLIF(regexp_extract(text, 'user=([^ ]+)', 1), '') AS kv_user,
        |  NULLIF(regexp_extract(text, 'status=([^ ]+)', 1), '') AS kv_status
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val kv = str_to_map(regexp_replace(col("text"), "^\\w+ ", ""), lit(" "), lit("="))
      T(s, d).select(col("conv_id"), col("turn_idx"),
        element_at(kv, "user").as("kv_user"),
        element_at(kv, "status").as("kv_status"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p6_json", s"""SELECT event_id, CAST(json_extract_string(props, '$$.k') AS INT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      s.read.parquet(s"$d/events.parquet")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")
    },

    Q("p7_conditionals", sqlP(
      """SELECT conv_id, turn_idx,
        |  CASE WHEN status >= 500 THEN 'err5' WHEN status >= 400 THEN 'err4'
        |       WHEN parse_ok THEN 'ok' ELSE 'unparsed' END AS route
        |FROM parsed ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).select(col("conv_id"), col("turn_idx"),
        when(col("status") >= 500, "err5").when(col("status") >= 400, "err4")
          .when(col("parse_ok"), "ok").otherwise("unparsed").as("route"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p8_drop", sqlP(
      """SELECT role, count(*) AS n FROM parsed WHERE parse_ok GROUP BY role ORDER BY role""")) { (s, d) =>
      P(s, d).filter(col("parse_ok")).groupBy("role").agg(count(lit(1)).as("n"))
        .orderBy("role")
    },

    Q("p9_clone", sqlT(
      """SELECT c.copy, count(*) AS n FROM turns, (VALUES ('a'), ('b')) c(copy)
        |GROUP BY c.copy ORDER BY c.copy""".stripMargin)) { (s, d) =>
      T(s, d).select(explode(array(lit("a"), lit("b"))).as("copy"))
        .groupBy("copy").agg(count(lit(1)).as("n")).orderBy("copy")
    },

    Q("p10_split_explode", sqlT(
      """SELECT u AS token, count(*) AS n
        |FROM (SELECT unnest(str_split(text, ' ')) AS u FROM turns)
        |GROUP BY u ORDER BY n DESC, token LIMIT 20""".stripMargin)) { (s, d) =>
      T(s, d).select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token")).limit(20)
    },

    Q("p11_prune", sqlT(
      """SELECT conv_id, turn_idx, role FROM turns WHERE role = 'tool'
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d).filter(col("role") === "tool").select("conv_id", "turn_idx", "role")
        .orderBy("conv_id", "turn_idx")
    },

    Q("p12_fingerprint", sqlT(
      """SELECT conv_id, turn_idx, sha256(text) AS fp, md5(role || text) AS fp2
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d).select(col("conv_id"), col("turn_idx"),
        sha2(col("text"), 256).as("fp"),
        md5(concat(col("role"), col("text"))).as("fp2"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p13_anonymize", sqlP(
      """SELECT conv_id, turn_idx,
        |  CASE WHEN usr IS NOT NULL THEN sha256('s#' || usr) END AS user_anon,
        |  CASE WHEN src_ip IS NOT NULL THEN regexp_replace(src_ip, '\.[0-9]+$', '.x') END AS ip_masked
        |FROM parsed ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).select(col("conv_id"), col("turn_idx"),
        sha2(concat(lit("s#"), col("user")), 256).as("user_anon"),
        regexp_replace(col("src_ip"), "\\.[0-9]+$", ".x").as("ip_masked"))
        .orderBy("conv_id", "turn_idx")
    },

    // P14: arbitrary-prefix CIDR membership, subnet strings compiled at plan
    // time by graft.functions.Cidr (incl. a non-octet-aligned /15 and a
    // multi-subnet OR list). The DuckDB side recomputes the ip number from
    // octets and uses the compiled (lo, hi) literals.
    Q("p14_cidr", {
      val subs = Seq(
        "in_10_8" -> Seq("10.0.0.0/8"),
        "in_testnet" -> Seq("203.0.113.0/24"),
        "in_10_2_15" -> Seq("10.2.0.0/15"),
        "in_any" -> Seq("203.0.113.64/26", "10.3.0.0/16"))
      val conds = subs.map { case (n, cs) =>
        cs.map { c => val (lo, hi) = graft.functions.Cidr.range(c)
          s"ipn BETWEEN $lo AND $hi" }.mkString("(", " OR ", s") AS $n")
      }
      sqlP(
        s"""SELECT conv_id, turn_idx,
           |  ${conds.mkString(",\n  ")}
           |FROM (
           |  SELECT conv_id, turn_idx,
           |    CAST(split_part(src_ip, '.', 1) AS BIGINT) * 16777216
           |    + CAST(split_part(src_ip, '.', 2) AS BIGINT) * 65536
           |    + CAST(split_part(src_ip, '.', 3) AS BIGINT) * 256
           |    + CAST(split_part(src_ip, '.', 4) AS BIGINT) AS ipn
           |  FROM parsed WHERE parse_ok)
           |ORDER BY conv_id, turn_idx""".stripMargin)
    }) { (s, d) =>
      import graft.functions.Cidr
      P(s, d).filter(col("parse_ok"))
        .select(col("conv_id"), col("turn_idx"),
          Cidr.inSubnet(col("src_ip"), "10.0.0.0/8").as("in_10_8"),
          Cidr.inSubnet(col("src_ip"), "203.0.113.0/24").as("in_testnet"),
          Cidr.inSubnet(col("src_ip"), "10.2.0.0/15").as("in_10_2_15"),
          Cidr.inAnySubnet(col("src_ip"),
            Seq("203.0.113.64/26", "10.3.0.0/16")).as("in_any"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("p15_translate", sqlP(
      """SELECT coalesce(CASE action WHEN 'click' THEN 'nav' WHEN 'view' THEN 'nav'
        |    WHEN 'purchase' THEN 'commerce' WHEN 'signup' THEN 'account'
        |    WHEN 'error' THEN 'fault' WHEN 'exfil' THEN 'attack' END, 'other') AS category,
        |  count(*) AS n
        |FROM parsed GROUP BY 1 ORDER BY category""".stripMargin)) { (s, d) =>
      val dict = typedlit(Map("click" -> "nav", "view" -> "nav",
        "purchase" -> "commerce", "signup" -> "account",
        "error" -> "fault", "exfil" -> "attack"))
      P(s, d).select(coalesce(element_at(dict, col("action")), lit("other")).as("category"))
        .groupBy("category").agg(count(lit(1)).as("n")).orderBy("category")
    },

    // P15b: translate's dictionary-FILE mode (csv → broadcast join) and
    // regex-key mode (first-match-wins when-chain), in one differential.
    Q("p15b_translate_file_regex", sqlP(
      """SELECT conv_id, turn_idx,
        |  coalesce(d.value, 'other') AS category,
        |  CASE WHEN action IS NOT NULL AND regexp_matches(action, '^ex') THEN 'attack'
        |       WHEN action IS NOT NULL AND regexp_matches(action, 'up') THEN 'transfer'
        |       WHEN action IS NOT NULL AND regexp_matches(action, 'e') THEN 'has-e'
        |       ELSE 'none' END AS rx_cat
        |FROM parsed
        |LEFT JOIN (VALUES ('click','nav'), ('view','nav'), ('purchase','commerce'),
        |                  ('signup','account'), ('error','fault')) d(key, value)
        |  ON parsed.action = d.key
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      // dictionary TABLE (the translate filter's dictionary_path analogue):
      // built driver-side like every rule table — broadcast-small by
      // contract. The csv-file ingest path of Translate.byTable is covered
      // by TranslateSpec over a test temp dir; a query fn must not depend on
      // the driver's local filesystem (executors can't see it on a cluster).
      import s.implicits._
      val dict = Seq("click" -> "nav", "view" -> "nav", "purchase" -> "commerce",
        "signup" -> "account", "error" -> "fault").toDF("key", "value")
      val base = Translate.byTable(P(s, d), dict, col("action"), "category", "other")
      Translate.byRegex(base,
        Seq("^ex" -> "attack", "up" -> "transfer", "e" -> "has-e"),
        col("action"), "rx_cat", "none")
        .select("conv_id", "turn_idx", "category", "rx_cat")
        .orderBy("conv_id", "turn_idx")
    },

    Q("p16_geoip_range", sqlP(
      """SELECT 'r' || CAST((ipn // 16777216) % 10 AS VARCHAR) AS region, count(*) AS n
        |FROM (
        |  SELECT CAST(split_part(src_ip, '.', 1) AS BIGINT) * 16777216
        |    + CAST(split_part(src_ip, '.', 2) AS BIGINT) * 65536
        |    + CAST(split_part(src_ip, '.', 3) AS BIGINT) * 256
        |    + CAST(split_part(src_ip, '.', 4) AS BIGINT) AS ipn
        |  FROM parsed WHERE parse_ok)
        |GROUP BY 1 ORDER BY region""".stripMargin)) { (s, d) =>
      // geoip-style enrichment (SURVEY P16): BUCKETED broadcast range join —
      // each (lo, hi) range explodes into the /8 buckets it covers (dim stays
      // broadcast-small), probe equi-joins on its bucket (BroadcastHashJoin,
      // not a nested-loop range scan — 256× less comparison work at any
      // scale), and a residual BETWEEN filter keeps exactness for ranges
      // that are not bucket-aligned. The canonical 100-TB range-join shape.
      import s.implicits._
      val geo = broadcast((0 until 256).map(b =>
        (b.toLong * 16777216L, (b + 1).toLong * 16777216L - 1, s"r${b % 10}"))
        .toDF("lo", "hi", "region")
        .withColumn("bucket", explode(sequence(
          floor(col("lo") / 16777216L), floor(col("hi") / 16777216L)))))
      val part = (i: Int) => element_at(split(col("src_ip"), "\\."), i).cast("long")
      // cache boundary on the narrow src_ip projection: the join-key
      // null-constraint inference otherwise substitutes the full grok parse
      // into the filter ~9× (measured 5.8s → 0.6s at sf0.1)
      QueryCache.cycle(P(s, d).filter(col("parse_ok")).select("src_ip"))
        .withColumn("ipn",
          part(1) * 16777216L + part(2) * 65536L + part(3) * 256L + part(4))
        .withColumn("bucket", floor(col("ipn") / 16777216L))
        .join(geo, Seq("bucket"))
        .filter(col("ipn").between(col("lo"), col("hi")))
        .groupBy("region").agg(count(lit(1)).as("n"))
        .orderBy("region")
    },

    // P18: Logstash `throttle` filter — pass at most K events per (key,
    // period); later ones get tagged/dropped. row_number over the stable
    // order inside each (key, period-bucket).
    Q("p18_throttle", sqlT(
      """SELECT conv_id, turn_idx, throttled FROM (
        |  SELECT conv_id, turn_idx,
        |    row_number() OVER (PARTITION BY conv_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600
        |      ORDER BY ts, turn_idx) > 3 AS throttled
        |  FROM turns)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val w = Window.partitionBy(col("conv_id"), floor(unix_timestamp(col("ts")) / 3600L))
        .orderBy(col("ts"), col("turn_idx"))
      T(s, d).withColumn("throttled", row_number().over(w) > 3)
        .select("conv_id", "turn_idx", "throttled")
        .orderBy("conv_id", "turn_idx")
    },

    // P19: Logstash `csv` filter — parse a delimited line into typed columns
    // (from_csv, codegen'd). The csv line is synthesized from events columns
    // so the differential also proves the round-trip.
    Q("p19_csv", sqlT(
      """SELECT conv_id, turn_idx,
        |  split_part(csvline, ';', 1) AS f_role,
        |  CAST(split_part(csvline, ';', 2) AS INT) AS f_idx,
        |  split_part(csvline, ';', 3) AS f_head
        |FROM (SELECT conv_id, turn_idx,
        |        role || ';' || CAST(turn_idx AS VARCHAR) || ';' || split_part(text, ' ', 1) AS csvline
        |      FROM turns)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val csvline = concat_ws(";", col("role"), col("turn_idx"),
        element_at(split(col("text"), " "), 1))
      T(s, d).withColumn("csvline", csvline)
        .withColumn("c", from_csv(col("csvline"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "f_role string, f_idx int, f_head string"),
          Map("sep" -> ";")))
        .select(col("conv_id"), col("turn_idx"),
          col("c.f_role").as("f_role"), col("c.f_idx").as("f_idx"),
          col("c.f_head").as("f_head"))
        .orderBy("conv_id", "turn_idx")
    },

    // P20: cross-event correlation — Logstash `elapsed` filter analogue.
    // First 'click' of each conversation pairs with the first 'purchase' at
    // or after it; pairs beyond the 30-day timeout (or with no end) are
    // 'expired'. See operators/Elapsed for the skew-proof agg+join shape.
    Q("p20_elapsed", sqlP(
      """, st AS (
        |  SELECT conv_id, epoch_us(ts) AS s_us, ts_sec AS start_sec,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY epoch_us(ts)) AS rn
        |  FROM parsed WHERE action = 'click'),
        |st1 AS (SELECT conv_id, s_us, start_sec FROM st WHERE rn = 1),
        |en AS (
        |  SELECT p.conv_id, epoch_us(p.ts) AS e_us, p.ts_sec AS end_sec,
        |    row_number() OVER (PARTITION BY p.conv_id ORDER BY epoch_us(p.ts)) AS rn
        |  FROM parsed p JOIN st1 ON p.conv_id = st1.conv_id
        |  WHERE p.action = 'purchase' AND epoch_us(p.ts) >= st1.s_us),
        |en1 AS (SELECT conv_id, e_us, end_sec FROM en WHERE rn = 1)
        |SELECT st1.conv_id, start_sec,
        |  CASE WHEN e_us IS NOT NULL AND e_us - s_us <= 2592000000000 THEN end_sec END AS end_sec,
        |  CASE WHEN e_us IS NOT NULL AND e_us - s_us <= 2592000000000 THEN end_sec - start_sec END AS elapsed_sec,
        |  CASE WHEN e_us IS NOT NULL AND e_us - s_us <= 2592000000000 THEN 'matched' ELSE 'expired' END AS status
        |FROM st1 LEFT JOIN en1 ON st1.conv_id = en1.conv_id
        |ORDER BY st1.conv_id""".stripMargin)) { (s, d) =>
      Elapsed(P(s, d), "conv_id",
        col("action") === "click", col("action") === "purchase", 2592000L)
        .orderBy("conv_id")
    },

    // P20b: MULTI-transaction elapsed — the full state machine (new
    // transaction per key after each completed pair, extra starts counted,
    // ends-without-start ignored). Oracle renders the same run-collapse
    // identity: first event of each same-type run survives, leading end-run
    // dropped, survivors alternate S,E pairing as txn = ceil(rank/2).
    Q("p20b_elapsed_multi", sqlP(
      """, ev AS (
        |  SELECT conv_id, epoch_us(ts) AS ts_us, ts_sec,
        |    CASE WHEN action = 'click' THEN 1 ELSE 0 END AS is_s
        |  FROM parsed WHERE action IN ('click', 'purchase')),
        |r1 AS (
        |  SELECT *, CASE WHEN lag(is_s) OVER w IS NULL
        |      OR lag(is_s) OVER w != is_s THEN 1 ELSE 0 END AS chg
        |  FROM ev WINDOW w AS (PARTITION BY conv_id ORDER BY ts_us, is_s DESC)),
        |r2 AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY conv_id
        |    ORDER BY ts_us, is_s DESC ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM r1),
        |r3 AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id, run_id
        |      ORDER BY ts_us, is_s DESC) AS rif,
        |    count(*) OVER (PARTITION BY conv_id, run_id) AS run_len
        |  FROM r2),
        |eff AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id
        |    ORDER BY ts_us, is_s DESC) AS rn2
        |  FROM r3 WHERE rif = 1 AND NOT (run_id = 1 AND is_s = 0)),
        |tx AS (
        |  SELECT conv_id, CAST(floor((rn2 + 1) / 2) AS BIGINT) AS txn,
        |    max(CASE WHEN is_s = 1 THEN ts_sec END) AS start_sec,
        |    max(CASE WHEN is_s = 1 THEN ts_us END) AS s_us,
        |    max(CASE WHEN is_s = 0 THEN ts_sec END) AS e_sec,
        |    max(CASE WHEN is_s = 0 THEN ts_us END) AS e_us,
        |    max(CASE WHEN is_s = 1 THEN run_len - 1 END) AS n_extra_starts
        |  FROM eff GROUP BY conv_id, txn)
        |SELECT conv_id, txn, start_sec,
        |  CASE WHEN e_us IS NOT NULL AND e_us - s_us <= 2592000000000 THEN e_sec END AS end_sec,
        |  CASE WHEN e_us IS NOT NULL AND e_us - s_us <= 2592000000000 THEN e_sec - start_sec END AS elapsed_sec,
        |  n_extra_starts,
        |  CASE WHEN e_us IS NOT NULL AND e_us - s_us <= 2592000000000
        |    THEN 'matched' ELSE 'expired' END AS status
        |FROM tx ORDER BY conv_id, txn""".stripMargin)) { (s, d) =>
      Elapsed.multi(P(s, d), "conv_id",
        col("action") === "click", col("action") === "purchase", 2592000L)
        .orderBy("conv_id", "txn")
    },

    // P21: Logstash `urldecode` filter — Spark's generic url_decode vs the
    // known decoding of the synthesized escapes (%2F, %20). Narrow, codegen'd.
    Q("p21_urldecode", sqlP(
      """SELECT conv_id, turn_idx, encoded,
        |  replace(replace(encoded, '%2F', '/'), '%20', ' ') AS decoded
        |FROM (SELECT conv_id, turn_idx, replace(uri, '/', '%2F') || '%20v' AS encoded
        |      FROM parsed WHERE parse_ok)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("parse_ok"))
        .withColumn("encoded",
          concat(regexp_replace(col("uri"), "/", "%2F"), lit("%20v")))
        .select(col("conv_id"), col("turn_idx"), col("encoded"),
          url_decode(col("encoded")).as("decoded"))
        .orderBy("conv_id", "turn_idx")
    },

    // P22: Logstash `xml` filter — from_xml (Spark 4 native) parses a
    // synthesized per-event XML doc into typed fields; the oracle extracts
    // the same fields with regexes (DuckDB has no XML reader).
    Q("p22_xml", sqlP(
      """SELECT conv_id, turn_idx,
        |  regexp_extract(x, '<a>([^<]*)</a>', 1) AS xa,
        |  CAST(regexp_extract(x, '<s>([0-9]+)</s>', 1) AS INT) AS xs,
        |  regexp_extract(x, '<u>([^<]*)</u>', 1) AS xu
        |FROM (SELECT conv_id, turn_idx,
        |        '<e><a>' || action || '</a><s>' || CAST(status AS VARCHAR)
        |          || '</s><u>' || uri || '</u></e>' AS x
        |      FROM parsed WHERE parse_ok)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val xmlSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "a string, s int, u string")
      P(s, d).filter(col("parse_ok"))
        .withColumn("x", concat(lit("<e><a>"), col("action"), lit("</a><s>"),
          col("status").cast("string"), lit("</s><u>"), col("uri"), lit("</u></e>")))
        .withColumn("p", from_xml(col("x"), xmlSchema))
        .select(col("conv_id"), col("turn_idx"),
          col("p.a").as("xa"), col("p.s").as("xs"), col("p.u").as("xu"))
        .orderBy("conv_id", "turn_idx")
    },

    // P23: Logstash `dns` filter (reverse lookup) as a broadcast lookup join
    // against a resolver dim table — the relational form of the resolver
    // cache, same join shape as P16 geoip.
    Q("p23_dns", {
      val vals = (1 to 80)
        .map(i => s"('203.0.113.$i','testnet-$i.rev.example')").mkString(", ")
      sqlP(
        s"""SELECT conv_id, turn_idx, coalesce(d.host, 'unresolved') AS rev_host
           |FROM parsed LEFT JOIN (VALUES $vals) d(ip, host)
           |  ON parsed.src_ip = d.ip
           |WHERE parse_ok ORDER BY conv_id, turn_idx""".stripMargin)
    }) { (s, d) =>
      import s.implicits._
      val dim = broadcast((1 to 80)
        .map(i => (s"203.0.113.$i", s"testnet-$i.rev.example")).toDF("ip", "host"))
      P(s, d).filter(col("parse_ok"))
        .join(dim, col("src_ip") === col("ip"), "left_outer")
        .select(col("conv_id"), col("turn_idx"),
          coalesce(col("host"), lit("unresolved")).as("rev_host"))
        .orderBy("conv_id", "turn_idx")
    },

    // P24: Logstash `useragent` filter — ordered family/os pattern list,
    // first match wins (UserAgent.FamilyPatterns renders BOTH the Spark CASE
    // chain and the DuckDB mirror below, so the two stay in lockstep by
    // construction). Input UAs synthesized deterministically per turn.
    Q("p24_useragent", {
      import graft.functions.UserAgent
      val tpl = uaTemplates.map(t => s"'$t'").mkString("[", ", ", "]")
      val famSql = UserAgent.FamilyPatterns
        .map { case (n, det, _) => s"WHEN regexp_matches(ua, '$det') THEN '$n'" }
        .mkString("CASE ", " ", " ELSE 'other' END")
      val majSql = UserAgent.FamilyPatterns
        .map { case (_, det, maj) =>
          s"WHEN regexp_matches(ua, '$det') THEN CAST(NULLIF(regexp_extract(ua, '$maj', 1), '') AS INT)" }
        .mkString("CASE ", " ", " END")
      val osSql = UserAgent.OsPatterns
        .map { case (n, det) => s"WHEN regexp_matches(ua, '$det') THEN '$n'" }
        .mkString("CASE ", " ", " ELSE 'other' END")
      sqlT(
        s"""SELECT conv_id, turn_idx,
           |  $famSql AS family, $majSql AS major, $osSql AS os,
           |  CASE WHEN regexp_matches(ua, 'Mobile') THEN 'mobile'
           |       WHEN regexp_matches(ua, 'curl/') THEN 'other'
           |       ELSE 'desktop' END AS device
           |FROM (SELECT conv_id, turn_idx, $tpl[turn_idx % ${uaTemplates.size} + 1] AS ua
           |      FROM turns)
           |ORDER BY conv_id, turn_idx""".stripMargin)
    }) { (s, d) =>
      import graft.functions.UserAgent
      T(s, d)
        .withColumn("ua", element_at(
          array(uaTemplates.map(lit): _*), (col("turn_idx") % uaTemplates.size) + 1))
        .withColumn("p", UserAgent.parse(col("ua")))
        .select(col("conv_id"), col("turn_idx"), col("p.family").as("family"),
          col("p.major").as("major"), col("p.os").as("os"), col("p.device").as("device"))
        .orderBy("conv_id", "turn_idx")
    },

    // P25: Logstash `aggregate` filter — task-scoped accumulation keyed by
    // conv_id, emitted once per task on the end event or after ~7 quiet
    // hours before the batch high-water mark ('exfil' + 25000s chosen so
    // the fixture exercises BOTH completed and timeout emission). See
    // operators/TaskAggregate for the map-side-combine shape.
    Q("p25_aggregate", sqlP(
      """, tk AS (
        |  SELECT conv_id, count(*) AS n_events, min(ts_sec) AS first_sec,
        |    max(ts_sec) AS last_sec,
        |    max(CASE WHEN action = 'exfil' THEN ts_sec END) AS end_sec,
        |    CAST(coalesce(sum(status), 0) AS BIGINT) AS status_sum,
        |    count(DISTINCT action) AS n_actions
        |  FROM parsed GROUP BY conv_id),
        |hw AS (SELECT max(ts_sec) AS hwm FROM parsed)
        |SELECT conv_id, n_events, first_sec, last_sec, end_sec, status_sum,
        |  n_actions,
        |  CASE WHEN end_sec IS NOT NULL THEN 'completed' ELSE 'timeout' END AS status
        |FROM tk, hw
        |WHERE end_sec IS NOT NULL OR last_sec + 25000 < hwm
        |ORDER BY conv_id""".stripMargin)) { (s, d) =>
      TaskAggregate(P(s, d), "conv_id", col("action") === "exfil", 25000L,
        Seq(coalesce(sum(col("status")), lit(0L)).cast("long").as("status_sum"),
          countDistinct(col("action")).as("n_actions")))
        .select("conv_id", "n_events", "first_sec", "last_sec", "end_sec",
          "status_sum", "n_actions", "status")
        .orderBy("conv_id")
    },

    // P26: Logstash `syslog_pri` filter — split a syslog priority into
    // facility/severity codes + labels (pri synthesized per turn; the
    // label tables are the RFC 5424 constants). Pure integer math +
    // array indexing, codegen'd.
    Q("p26_syslog_pri", {
      val fac = SyslogFacilities.map(f => s"'$f'").mkString("[", ", ", "]")
      val sev = SyslogSeverities.map(f => s"'$f'").mkString("[", ", ", "]")
      sqlP(
        s"""SELECT conv_id, turn_idx, pri,
           |  CAST(pri // 8 AS INT) AS facility, CAST(pri % 8 AS INT) AS sev_code,
           |  $fac[pri // 8 + 1] AS facility_label,
           |  $sev[pri % 8 + 1] AS severity_label
           |FROM (SELECT conv_id, turn_idx,
           |        CAST((turn_idx * 13 + coalesce(status, 0)) % 192 AS INT) AS pri
           |      FROM parsed)
           |ORDER BY conv_id, turn_idx""".stripMargin)
    }) { (s, d) =>
      val pri = ((col("turn_idx") * 13 + coalesce(col("status"), lit(0))) % 192)
        .cast("int")
      P(s, d).withColumn("pri", pri)
        .withColumn("facility", floor(col("pri") / 8).cast("int"))
        .withColumn("sev_code", (col("pri") % 8).cast("int"))
        .select(col("conv_id"), col("turn_idx"), col("pri"), col("facility"),
          col("sev_code"),
          element_at(array(SyslogFacilities.map(lit): _*),
            col("facility") + 1).as("facility_label"),
          element_at(array(SyslogSeverities.map(lit): _*),
            col("sev_code") + 1).as("severity_label"))
        .orderBy("conv_id", "turn_idx")
    },

    // P28: Logstash `metrics` filter — windowed event-rate rollups via
    // Spark's native time-window operator (1-hour tumbling windows aligned
    // to the epoch, exactly ts_sec // 3600 in the oracle); rate kept as
    // integer micro-events/sec so the differential is float-free.
    Q("p28_metrics", sqlP(
      """SELECT action, CAST((ts_sec // 3600) * 3600 AS BIGINT) AS win_start,
        |  count(*) AS n,
        |  CAST(count(*) * 1000000 // 3600 AS BIGINT) AS rate_micro_eps
        |FROM parsed WHERE action IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("action").isNotNull)
        .groupBy(col("action"), window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("action"), unix_timestamp(col("w.start")).as("win_start"),
          col("n"), expr("CAST(n * 1000000 DIV 3600 AS BIGINT)").as("rate_micro_eps"))
        .orderBy("action", "win_start")
    },

    Q("agg_udaf_stats", sqlP(
      """SELECT role, count(status) AS n_status,
        |  CAST(coalesce(sum(status), 0) AS BIGINT) AS sum_status, max(status) AS max_status
        |FROM parsed GROUP BY role ORDER BY role""".stripMargin)) { (s, d) =>
      // SURVEY §2.6: custom typed Aggregator via functions.udaf
      val stats = graft.functions.StatusStatsAggregator.udafColumn
      P(s, d).groupBy("role")
        .agg(stats(coalesce(col("status"), lit(0)),
          col("status").isNotNull).as("s"))
        .select(col("role"), col("s.n").as("n_status"),
          col("s.sum").as("sum_status"), col("s.max").as("max_status"))
        .orderBy("role")
    },

    // ---------- the sig-filter check chain on testdata ----------
    Q("c1_dedup_fp", sqlP(
      s"""SELECT count(*) AS n FROM (
         |  SELECT row_number() OVER (PARTITION BY text, ts_sec // ${tconf.dedupDelaySec}
         |    ORDER BY ts, conv_id, turn_idx) AS rn FROM parsed) WHERE rn = 1""".stripMargin)) { (s, d) =>
      Dedup(P(s, d), tconf).agg(count(lit(1)).as("n"))
    },

    // C1b: CONFIG-DRIVEN fingerprint fields (the sig filter lets rule files
    // choose which fields compose the dedup fingerprint) — here semantic
    // identity (action, user, dst_host) instead of raw text. chr(0) join in
    // the oracle mirrors Dedup.fpExpr's NUL-separated concat_ws (both skip
    // nulls; sha256 is injective over the joined key, so partitioning by the
    // key ≡ partitioning by the hash).
    Q("c1b_dedup_fields", sqlP(
      s"""SELECT count(*) AS n FROM (
         |  SELECT row_number() OVER (
         |    PARTITION BY concat_ws(chr(0), action, usr, dst_host),
         |                 ts_sec // ${tconf.dedupDelaySec}
         |    ORDER BY ts, conv_id, turn_idx) AS rn FROM parsed) WHERE rn = 1""".stripMargin)) { (s, d) =>
      val confB = tconf.copy(fingerprintFields = Seq("action", "user", "dst_host"))
      Dedup(P(s, d), confB).agg(count(lit(1)).as("n"))
    },

    Q("c2_whitelist", sqlP(
      """SELECT action, count(*) AS n FROM parsed
        |WHERE NOT coalesce(action = 'signup', false)
        |GROUP BY action ORDER BY action NULLS FIRST""".stripMargin)) { (s, d) =>
      Whitelist(P(s, d), TestdataTables.whitelist)
        .groupBy("action").agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("action"))
    },

    // C2b/C4c: ARRAY-valued field clauses — a clause on `tags` matches when
    // ANY element matches (ClauseCompiler.ArrayFields, mirrored in RefModel)
    Q("c2b_whitelist_array", sqlP(
      """SELECT role, count(*) AS n FROM parsed
        |WHERE NOT coalesce(len(list_filter(tags, x -> x = 'tool:bash')) > 0, false)
        |GROUP BY role ORDER BY role""".stripMargin)) { (s, d) =>
      Whitelist(P(s, d), Seq(WhitelistRule("tags", "eq", "tool:bash")))
        .groupBy("role").agg(count(lit(1)).as("n"))
        .orderBy("role")
    },

    Q("c4c_clause_array", sqlP(
      """SELECT conv_id, turn_idx,
        |  coalesce(len(list_filter(tags, x -> regexp_matches(x, '^tool:'))) > 0, false) AS has_tool,
        |  coalesce(list_contains(tags, '_grokparsefailure'), false) AS unparsed
        |FROM parsed ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).select(col("conv_id"), col("turn_idx"),
        coalesce(ClauseCompiler.predicate("tags", "rx", "^tool:"), lit(false)).as("has_tool"),
        coalesce(ClauseCompiler.predicate("tags", "eq", "_grokparsefailure"), lit(false)).as("unparsed"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("c3_ioc", sqlFull(
      """SELECT conv_id, turn_idx, ioc_score FROM en WHERE ioc_score > 0
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      import s.implicits._
      val enr = IocEnrich(Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        TestdataTables.ioc.toDF())
      enr.select(col("conv_id"), col("turn_idx"),
        aggregate(col("hits_ioc"), lit(0), (a, h) => a + h.getField("score")).as("ioc_score"))
        .filter(col("ioc_score") > 0)
        .orderBy("conv_id", "turn_idx")
    },

    // C3b: CONFIG-DRIVEN IOC kind→field mapping (ioc.json mapping config,
    // VERDICT r2 #1): a custom IOC table whose kinds probe NON-default event
    // fields — 'host' probes dst_host, 'path' probes uri. Hit order stays
    // kind-alphabetical (host, path) in both engines.
    Q("c3b_ioc_mapped", sqlFull(
      """SELECT conv_id, turn_idx,
        |  coalesce(ht.score, 0) + coalesce(ph.score, 0) AS ioc_score,
        |  concat_ws(',', CASE WHEN ht.score IS NOT NULL THEN 'ioc:host' END,
        |                 CASE WHEN ph.score IS NOT NULL THEN 'ioc:path' END) AS names
        |FROM sv
        |LEFT JOIN (SELECT lower(value) AS v, max(score) AS score FROM ioc
        |           WHERE kind = 'domain' GROUP BY 1) ht ON lower(sv.dst_host) = ht.v
        |LEFT JOIN (VALUES ('/api/secret/keys', 50), ('/debug/trace', 25)) ph(v, score)
        |  ON lower(sv.uri) = ph.v
        |WHERE ht.score IS NOT NULL OR ph.score IS NOT NULL
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      import s.implicits._
      val iocB =
        TestdataTables.ioc.filter(_.kind == "domain").map(_.copy(kind = "host")) ++
          Seq(IocEntry("path", "/api/secret/keys", 50), IocEntry("path", "/debug/trace", 25))
      val confB = tconf.copy(iocKindFields = Seq("host" -> "dst_host", "path" -> "uri"))
      val enr = IocEnrich(Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        iocB.toDF(), confB)
      enr.select(col("conv_id"), col("turn_idx"),
        aggregate(col("hits_ioc"), lit(0), (a, h) => a + h.getField("score")).as("ioc_score"),
        array_join(transform(col("hits_ioc"), h => h.getField("name")), ",").as("names"))
        .filter(col("ioc_score") > 0)
        .orderBy("conv_id", "turn_idx")
    },

    Q("c4_sig_rules", sqlFull(
      s"""SELECT conv_id, turn_idx, sig_score, ${ruleGroups.map { case (rid, cl) =>
        s"(CASE WHEN ${rulePredSql(cl)} THEN '$rid' END)"
      }.mkString("concat_ws(',', ", ", ", ")")} AS rule_ids
         |FROM en WHERE sig_score > 0 ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val enr = SigRules(Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        TestdataTables.sigRules)
      enr.select(col("conv_id"), col("turn_idx"),
        aggregate(col("hits_sig"), lit(0), (a, h) => a + h.getField("score")).as("sig_score"),
        array_join(transform(col("hits_sig"), h => h.getField("rule_id").cast("string")), ",").as("rule_ids"))
        .filter(col("sig_score") > 0)
        .orderBy("conv_id", "turn_idx")
    },

    Q("c4b_sig_rules_data", sqlFull(
      s"""SELECT conv_id, turn_idx, sig_score, ${ruleGroups.map { case (rid, cl) =>
        s"(CASE WHEN ${rulePredSql(cl)} THEN '$rid' END)"
      }.mkString("concat_ws(',', ", ", ", ")")} AS rule_ids
         |FROM en WHERE sig_score > 0 ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      import s.implicits._
      val enr = SigRulesData(Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        TestdataTables.sigRules.toDF(), tconf)
      enr.select(col("conv_id"), col("turn_idx"),
        aggregate(col("hits_sig"), lit(0), (a, h) => a + h.getField("score")).as("sig_score"),
        array_join(transform(col("hits_sig"), h => h.getField("rule_id").cast("string")), ",").as("rule_ids"))
        .filter(col("sig_score") > 0)
        .orderBy("conv_id", "turn_idx")
    },

    Q("c5_ref_check", sqlFull(
      """SELECT conv_id, turn_idx,
        |  (parse_ok AND action IS NOT NULL AND ra.value IS NULL) AS dev_action,
        |  (parse_ok AND dst_host IS NOT NULL AND rh.value IS NULL) AS dev_host
        |FROM sv
        |LEFT JOIN (SELECT DISTINCT ref_key, value FROM ref_baseline WHERE field = 'action') ra
        |  ON sv.role = ra.ref_key AND sv.action = ra.value
        |LEFT JOIN (SELECT DISTINCT ref_key, value FROM ref_baseline WHERE field = 'dst_host') rh
        |  ON sv.role = rh.ref_key AND sv.dst_host = rh.value
        |WHERE (parse_ok AND action IS NOT NULL AND ra.value IS NULL)
        |   OR (parse_ok AND dst_host IS NOT NULL AND rh.value IS NULL)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      import s.implicits._
      val enr = RefCheck(Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        TestdataTables.refBaseline.toDF(), tconf)
      enr.select(col("conv_id"), col("turn_idx"),
        exists(col("hits_ref"), h => h.getField("name") === "ref:action").as("dev_action"),
        exists(col("hits_ref"), h => h.getField("name") === "ref:dst_host").as("dev_host"))
        .filter(col("dev_action") || col("dev_host"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("c6_first_seen", sqlFull(
      """SELECT conv_id, turn_idx, new_user, new_host FROM fs
        |WHERE new_user OR new_host ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      import s.implicits._
      val base = RefCheck(SigRules(IocEnrich(
        Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        TestdataTables.ioc.toDF()), TestdataTables.sigRules),
        TestdataTables.refBaseline.toDF(), tconf)
      FirstSeen(base, tconf)
        .select(col("conv_id"), col("turn_idx"),
          exists(col("hits_new"), h => h.getField("name") === "new:user").as("new_user"),
          exists(col("hits_new"), h => h.getField("name") === "new:dst_host").as("new_host"))
        .filter(col("new_user") || col("new_host"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("c7_frequency", sqlFull(
      """SELECT conv_id, turn_idx FROM fr2 WHERE freq_hit ORDER BY conv_id, turn_idx""")) { (s, d) =>
      import s.implicits._
      val base = RefCheck(SigRules(IocEnrich(
        Whitelist(Dedup(P(s, d), tconf), TestdataTables.whitelist),
        TestdataTables.ioc.toDF()), TestdataTables.sigRules),
        TestdataTables.refBaseline.toDF(), tconf)
      Frequency(FirstSeen(base, tconf), tconf)
        .filter(col("freq_hit")).select("conv_id", "turn_idx")
        .orderBy("conv_id", "turn_idx")
    },

    Q("c8_scoring", sqlFull(
      """SELECT conv_id, turn_idx, note, severity, routed FROM scored
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      Pipeline.enrichManaged(T(s, d), TestdataTables.rules(s), tconf)
        .select("conv_id", "turn_idx", "note", "severity", "routed")
        .orderBy("conv_id", "turn_idx")
    },

    // C8b: the SAME chain under a fully NON-DEFAULT scoring conf — the
    // numeric config surface (per-hit scores, FIR threshold, severity
    // bands, cf. RuleLoader mappings.json) proven end-to-end: both engines
    // re-derive note/severity/routed from the conf, so a stage silently
    // ignoring the conf fails the differential. Uncached enrich on purpose
    // (a second conf must not evict the c8/c9 shared chain cache).
    Q("c8b_scoring_conf", sqlFullFor(confB)(
      """SELECT severity, count(*) AS n, count(*) FILTER (WHERE routed) AS n_routed,
        |  CAST(sum(note) AS BIGINT) AS note_sum
        |FROM scored GROUP BY severity ORDER BY severity""".stripMargin)) { (s, d) =>
      Pipeline.enrich(T(s, d), TestdataTables.rules(s), confB)
        .groupBy("severity")
        .agg(count(lit(1)).as("n"),
          count(when(col("routed"), 1)).as("n_routed"),
          sum(col("note")).cast("long").as("note_sum"))
        .orderBy("severity")
    },

    Q("c9_route_counts", sqlFull(
      """SELECT severity, count(*) AS n FROM scored WHERE routed
        |GROUP BY severity ORDER BY severity""".stripMargin)) { (s, d) =>
      Pipeline.rollupBySink(
        Pipeline.enrichManaged(T(s, d), TestdataTables.rules(s), tconf))
        .orderBy("severity")
    },

    // C9b: the FIR alert-document projection over routed rows — category =
    // hit kind with the max score mass (priority sig>ioc>ref>new>freq on
    // ties), subject = compact human line. Differential on the full chain.
    Q("c9b_alert_docs", sqlFull(
      s"""SELECT s.conv_id, s.turn_idx, s.note, s.severity, cat AS category,
         |  '[' || s.severity || '] ' || cat || ' conv=' || s.conv_id || '#'
         |    || CAST(s.turn_idx AS VARCHAR) || ' note=' || CAST(s.note AS VARCHAR) AS subject
         |FROM (
         |  SELECT scored.*, f.sig_s, f.ioc_s, f.ref_s, f.new_s, f.freq_s,
         |    CASE WHEN f.sig_s >= greatest(f.ioc_s, f.ref_s, f.new_s, f.freq_s) THEN 'sig'
         |         WHEN f.ioc_s >= greatest(f.ref_s, f.new_s, f.freq_s) THEN 'ioc'
         |         WHEN f.ref_s >= greatest(f.new_s, f.freq_s) THEN 'ref'
         |         WHEN f.new_s >= f.freq_s THEN 'new' ELSE 'freq' END AS cat
         |  FROM scored
         |  JOIN (
         |    SELECT conv_id, turn_idx, sig_score AS sig_s, ioc_score AS ioc_s,
         |      ref_score AS ref_s,
         |      (CASE WHEN new_user THEN ${tconf.newValueScore} ELSE 0 END
         |       + CASE WHEN new_host THEN ${tconf.newValueScore} ELSE 0 END) AS new_s,
         |      (CASE WHEN freq_hit THEN ${tconf.freqScore} ELSE 0 END) AS freq_s
         |    FROM fr2) f
         |  ON scored.conv_id = f.conv_id AND scored.turn_idx = f.turn_idx) s
         |WHERE s.routed
         |ORDER BY s.conv_id, s.turn_idx""".stripMargin)) { (s, d) =>
      Pipeline.alertDocs(
        Pipeline.enrichManaged(T(s, d), TestdataTables.rules(s), tconf)
          .filter(col("routed")))
        .select("conv_id", "turn_idx", "note", "severity", "category", "subject")
        .orderBy("conv_id", "turn_idx")
    },

    // ---------- aggregations / windows / set ops ----------
    Q("agg_rollup_signature", sqlP(
      ruleGroups.map { case (rid, cl) =>
        s"""SELECT $rid AS rule_id, '${cl.head.name}' AS name, count(*) AS n_hits,
           |  CAST(count(*) * ${cl.map(_.score).sum} AS BIGINT) AS score_sum
           |FROM parsed WHERE ${rulePredSql(cl)} HAVING count(*) > 0""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rule_id"))) { (s, d) =>
      // persist the parsed projection: Catalyst alias substitution would
      // otherwise duplicate the adapter's synthesized-text expression (md5
      // concat chain) into every rule-clause reference (22 copies measured).
      // r6: narrowed to the columns the rule clauses actually probe —
      // text/tags/ts and the unused parsed fields no longer materialize
      SigRules(QueryCache.cycle(P(s, d)
        .select("parse_ok", "action", "status", "uri", "user", "tool")),
        TestdataTables.sigRules)
        .select(explode(col("hits_sig")).as("h"))
        .groupBy(col("h.rule_id").as("rule_id"), col("h.name").as("name"))
        .agg(count(lit(1)).as("n_hits"), sum(col("h.score")).cast("long").as("score_sum"))
        .orderBy("rule_id")
    },

    // SURVEY §2.6: the combined per-sink × per-hit-kind report table —
    // ROLLUP(severity, kind) over routed rows, kind presence per row (a row
    // counts once per kind that fired on it).
    Q("agg_rollup_sev_kind", sqlFull(
      s"""SELECT coalesce(severity, '(all)') AS severity_g,
         |  coalesce(kind, '(all)') AS kind_g, count(*) AS n
         |FROM (
         |  SELECT s.severity, k.kind
         |  FROM scored s
         |  JOIN (
         |    SELECT conv_id, turn_idx, unnest(list_filter([
         |      CASE WHEN ioc_score > 0 THEN 'ioc' END,
         |      CASE WHEN sig_score > 0 THEN 'sig' END,
         |      CASE WHEN ref_score > 0 THEN 'ref' END,
         |      CASE WHEN new_user OR new_host THEN 'new' END,
         |      CASE WHEN freq_hit THEN 'freq' END], x -> x IS NOT NULL)) AS kind
         |    FROM fr2) k
         |  ON s.conv_id = k.conv_id AND s.turn_idx = k.turn_idx
         |  WHERE s.routed)
         |GROUP BY ROLLUP(severity, kind)
         |ORDER BY severity_g, kind_g""".stripMargin)) { (s, d) =>
      val enr = Pipeline.enrichManaged(T(s, d), TestdataTables.rules(s), tconf)
      val kindCases = Seq("ioc", "sig", "ref", "new", "freq")
        .map(k => s"CASE WHEN exists(hits, h -> h.kind = '$k') THEN '$k' END")
        .mkString(", ")
      // through a temp view: ROLLUP over the cached chain's Dataset-tagged
      // attributes trips DetectAmbiguousSelfJoin; SQL resolution is clean
      enr.filter(col("routed")).createOrReplaceTempView("graft_routed")
      s.sql(
        s"""SELECT coalesce(sev0, '(all)') AS severity_g,
           |  coalesce(kind0, '(all)') AS kind_g, count(*) AS n
           |FROM (SELECT severity AS sev0,
           |        explode(array_compact(array($kindCases))) AS kind0
           |      FROM graft_routed)
           |GROUP BY ROLLUP(sev0, kind0)
           |ORDER BY severity_g, kind_g""".stripMargin)
    },

    Q("agg_rollup_cube", sqlP(
      """SELECT coalesce(role, '(all)') AS role_g,
        |  coalesce(CAST(parse_ok AS VARCHAR), '(all)') AS parse_ok_g, count(*) AS n
        |FROM parsed GROUP BY ROLLUP(role, parse_ok)
        |ORDER BY role_g, parse_ok_g""".stripMargin)) { (s, d) =>
      P(s, d).rollup("role", "parse_ok").agg(count(lit(1)).as("n"))
        .select(coalesce(col("role"), lit("(all)")).as("role_g"),
          coalesce(col("parse_ok").cast("string"), lit("(all)")).as("parse_ok_g"),
          col("n"))
        .orderBy("role_g", "parse_ok_g")
    },

    Q("agg_distinct", sqlP(
      """SELECT role, count(DISTINCT usr) AS n_users, count(*) AS n
        |FROM parsed GROUP BY role ORDER BY role""".stripMargin)) { (s, d) =>
      P(s, d).groupBy("role")
        .agg(countDistinct(col("user")).as("n_users"), count(lit(1)).as("n"))
        .orderBy("role")
    },

    Q("win_lag_delta", sqlP(
      """SELECT conv_id, turn_idx,
        |  ts_sec - lag(ts_sec) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        |FROM parsed ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      P(s, d).select(col("conv_id"), col("turn_idx"),
        (col("ts_sec") - lag("ts_sec", 1).over(w)).as("gap"))
        .orderBy("conv_id", "turn_idx")
    },

    Q("win_topk", sqlT(
      """SELECT conv_id, count(*) AS n FROM turns GROUP BY conv_id
        |ORDER BY n DESC, conv_id LIMIT 10""".stripMargin)) { (s, d) =>
      T(s, d).groupBy("conv_id").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("conv_id")).limit(10)
    },

    Q("set_except", sqlP(
      """SELECT * FROM (
        |  SELECT conv_id, turn_idx FROM parsed WHERE status = 503
        |  EXCEPT ALL
        |  SELECT conv_id, turn_idx FROM parsed WHERE action = 'exfil')
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val p = P(s, d)
      p.filter(col("status") === 503).select("conv_id", "turn_idx")
        .exceptAll(p.filter(col("action") === "exfil").select("conv_id", "turn_idx"))
        .orderBy("conv_id", "turn_idx")
    },

    // ---------- general join/agg surface on the TPC-H-ish tables ----------
    Q("q1_lineitem_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    Q("q2_join_broadcast",
      """SELECT o_orderstatus, count(*) AS n, count(DISTINCT c.c_nationkey) AS n_nations
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy("o_orderstatus")
    },

    Q("q3_join_multi",
      """SELECT n_name, count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      val l = s.read.parquet(s"$d/lineitem.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      val n = s.read.parquet(s"$d/nation.parquet")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy("n_name")
    })
}
