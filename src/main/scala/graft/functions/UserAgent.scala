package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P24: the Logstash `useragent` filter analogue — parse a browser
  * User-Agent string into (family, major, os, device) with an ordered
  * pattern list, first-match-wins (the ua-parser regexes approach reduced
  * to the major families).
  *
  * Every pattern is RE2-safe (no lookaround, non-capturing groups only) so
  * the DuckDB oracle mirrors them verbatim; the column is a pure codegen'd
  * CASE chain of regexp matches — no UDF, narrow, embarrassingly parallel.
  *
  * Ordering is load-bearing, exactly as in the filter's pattern file:
  * an Edge UA contains "Chrome/" and "Safari/", a Chrome UA contains
  * "Safari/", an Android UA contains "Linux", an iOS UA contains
  * "like Mac OS X" — each family/os is listed before the families whose
  * tokens it embeds. */
object UserAgent {

  /** (family, detect regex, major-version regex with capture group 1),
    * first match wins. */
  val FamilyPatterns: Seq[(String, String, String)] = Seq(
    ("edge", "Edg(?:e|A|iOS)?/", "Edg(?:e|A|iOS)?/([0-9]+)"),
    ("opera", "OPR/", "OPR/([0-9]+)"),
    ("chrome", "Chrome/", "Chrome/([0-9]+)"),
    ("firefox", "Firefox/", "Firefox/([0-9]+)"),
    ("safari", "Safari/", "Version/([0-9]+)"),
    ("curl", "curl/", "curl/([0-9]+)"))

  /** (os, detect regex), first match wins. */
  val OsPatterns: Seq[(String, String)] = Seq(
    ("windows", "Windows NT"),
    ("android", "Android"),
    ("ios", "iPhone|iPad|iPod"),
    ("macos", "Mac OS X"),
    ("linux", "Linux"))

  def family(ua: Column): Column =
    FamilyPatterns.foldLeft(None: Option[Column]) { case (acc, (name, det, _)) =>
      Some(acc match {
        case None => when(ua.rlike(det), name)
        case Some(c) => c.when(ua.rlike(det), name)
      })
    }.get.otherwise("other")

  def major(ua: Column): Column = {
    val raw = FamilyPatterns.foldLeft(None: Option[Column]) { case (acc, (_, det, maj)) =>
      Some(acc match {
        case None => when(ua.rlike(det), regexp_extract(ua, maj, 1))
        case Some(c) => c.when(ua.rlike(det), regexp_extract(ua, maj, 1))
      })
    }.get
    nullif(raw, lit("")).cast("int")
  }

  def os(ua: Column): Column =
    OsPatterns.foldLeft(None: Option[Column]) { case (acc, (name, det)) =>
      Some(acc match {
        case None => when(ua.rlike(det), name)
        case Some(c) => c.when(ua.rlike(det), name)
      })
    }.get.otherwise("other")

  /** mobile if the UA advertises Mobile, other for non-browser agents
    * (curl etc. carry no device), desktop otherwise. */
  def device(ua: Column): Column =
    when(ua.rlike("Mobile"), "mobile")
      .when(ua.rlike("curl/"), "other")
      .otherwise("desktop")

  /** struct<family,major,os,device> — the filter's target-field object. */
  def parse(ua: Column): Column = struct(
    family(ua).as("family"), major(ua).as("major"),
    os(ua).as("os"), device(ua).as("device"))
}
