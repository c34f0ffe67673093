package graft.model

import java.sql.Timestamp

/** Core schemas for the graft log-pipeline engine.
  *
  * Input shape is normative, from BASELINE.json `input_hint`:
  * `(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)`
  * — an Iceberg/Parquet table of multi-turn conversation / agent transcripts.
  *
  * The reference (lprat/logstash-plugins, see SURVEY.md §0 — mount empty at survey
  * time, semantics reconstructed per §0/§2) processes open-schema Logstash events;
  * we pin a fixed wide schema so Catalyst can prune/push down (SURVEY.md §1.1).
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Grok-parse product (SURVEY.md §1.2). Null field = extract miss;
  * parse_ok=false mirrors Logstash's `_grokparsefailure` tag semantics. */
case class Parsed(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    action: String,
    user: String,
    src_ip: String,
    dst_host: String,
    status: Option[Int],
    hashv: String,
    uri: String,
    parse_ok: Boolean)

/** One IOC (indicator-of-compromise) list entry; analogue of the sig filter's
  * ioc.json lists («logstash-filter-sig/.../sig.rb» check_ioc, SURVEY §2.4 C3). */
case class IocEntry(kind: String, value: String, score: Int)

/** One clause of a signature rule; clauses sharing rule_id AND together
  * ([]«sig.rb» check_sig, SURVEY §2.4 C4). op ∈ rx|eq|in|lt|gt|exists. */
case class SigRule(rule_id: Int, name: String, field: String, op: String, arg: String, score: Int)

/** Known-good (key, field, value) baseline; deviations raise the anomaly hit
  * («sig.rb» check_ref, SURVEY §2.4 C5). ref_key is matched against `role`. */
case class RefEntry(ref_key: String, field: String, value: String)

/** Whitelist / first-stop rule («sig.rb» rules_first, SURVEY §2.4 C2). */
case class WhitelistRule(field: String, op: String, arg: String)

/** One detection hit. kind ∈ ioc|sig|ref|new|freq. */
case class Hit(rule_id: Int, name: String, score: Int, kind: String)

/** All pipeline thresholds in one place so tests can pin them (FIXTURES.md §3). */
case class PipelineConf(
    grokPattern: String = PipelineConf.DefaultGrok,
    /** Fallback grok patterns, tried in order after `grokPattern` — Logstash
      * `match` list semantics: first match wins, `_grokparsefailure` only
      * when all miss. */
    grokFallbacks: Seq[String] = Nil,
    /** C6: fields whose never-before-seen values raise the `new:` hit —
      * configurable in the reference's rule files (sig filter new-value
      * options, SURVEY §1.1). */
    trackedFields: Seq[String] = Seq("user", "dst_host"),
    /** C1: fields composing the dedup fingerprint (sig filter fingerprint
      * source config). fp = sha256 of the NUL-joined non-null values. */
    fingerprintFields: Seq[String] = Seq("text"),
    /** C3: IOC kind → event field it probes (ioc.json mapping config).
      * Hit order in `hits_ioc` is alphabetical by kind — keep RefModel in
      * lockstep. */
    iocKindFields: Seq[(String, String)] = Seq(
      "domain" -> "dst_host", "hash" -> "hashv", "ip" -> "src_ip", "user" -> "user"),
    /** C5: fields checked against the (role, field, value) ref baseline. */
    refFields: Seq[String] = Seq("action", "dst_host"),
    freqKey: String = "conv_id",
    freqWindowSec: Long = 60L,
    freqThreshold: Int = 5,
    freqResetSec: Long = 60L,
    dedupDelaySec: Long = 300L,
    firThreshold: Int = 50,
    /** (minNote, name) ascending; severity = name of highest band ≤ note. */
    severityBands: Seq[(Int, String)] =
      Seq(0 -> "low", 20 -> "medium", 50 -> "high", 100 -> "critical"),
    newValueScore: Int = 15,
    freqScore: Int = 20,
    refScore: Int = 10,
    saltBuckets: Int = 8,
    format: String = "parquet",
    /** Format for the user-facing sink tables (alerts + rollups) — the sink
      * side of the Source format seam. Engine checkpoint state is always
      * parquet (see graft.sources.Source.writeTable). */
    sinkFormat: String = "parquet")

object PipelineConf {
  /** Fixture grok pattern (FIXTURES.md §1). */
  val DefaultGrok: String =
    "%{WORD:action} user=%{USER:user} src=%{IP:src_ip} dst=%{HOST:dst_host} " +
      "status=%{INT:status} hash=%{HASH:hashv} uri=%{URIPATH:uri}"
}
