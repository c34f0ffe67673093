package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GrokCompiler
import graft.model.PipelineConf

class GrokCompilerSpec extends AnyFunSuite {

  test("compiles fixture pattern with ordered capture groups") {
    val g = GrokCompiler.compile(PipelineConf.DefaultGrok)
    assert(g.fields === Seq("action", "user", "src_ip", "dst_host", "status", "hashv", "uri"))
    val m = java.util.regex.Pattern.compile(g.regex).matcher(
      "login user=u007 src=10.0.1.2 dst=host3.corp.example status=200 " +
        "hash=0123456789abcdef0123456789abcdef uri=/api/v1/r7")
    assert(m.find())
    assert(m.group(g.groupOf("action")) === "login")
    assert(m.group(g.groupOf("user")) === "u007")
    assert(m.group(g.groupOf("src_ip")) === "10.0.1.2")
    assert(m.group(g.groupOf("status")) === "200")
    assert(m.group(g.groupOf("uri")) === "/api/v1/r7")
  }

  test("miss on garbage (no ' user=' literal)") {
    val g = GrokCompiler.compile(PipelineConf.DefaultGrok)
    assert(!java.util.regex.Pattern.compile(g.regex).matcher("zz qx blort ??").find())
  }

  test("unknown pattern rejected; uncaptured refs are non-capturing") {
    intercept[IllegalArgumentException](GrokCompiler.compile("%{NOPE:x}"))
    val g = GrokCompiler.compile("%{WORD} id=%{INT:id}")
    assert(g.fields === Seq("id"))
    val m = java.util.regex.Pattern.compile(g.regex).matcher("abc id=42")
    assert(m.find() && m.group(1) === "42")
  }

  test("pattern-list fallback: first match wins, unified fields, failure only when all miss") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GrokMatcher
    val mg = GrokCompiler.compileMulti(
      Seq(PipelineConf.DefaultGrok, "%{WORD:action} %{GREEDYDATA:rest}"))
    assert(mg.fields === Seq("action", "user", "src_ip", "dst_host", "status",
      "hashv", "uri", "rest"))
    assert(mg.groupMaps(0) === Seq(0, 1, 2, 3, 4, 5, 6))
    assert(mg.groupMaps(1) === Seq(0, 7))

    val m = new GrokMatcher(mg.patterns.map(_.regex), mg.groupMaps, mg.fields.size)
    def str(r: org.apache.spark.sql.catalyst.InternalRow, i: Int): String =
      if (r.isNullAt(i)) null else r.getUTF8String(i).toString

    // primary wins when it matches (fallback would match too)
    val full = m.matchRow(UTF8String.fromString(
      "login user=u007 src=10.0.1.2 dst=host3.corp.example status=200 " +
        "hash=0123456789abcdef0123456789abcdef uri=/api/v1/r7"))
    assert(full != null)
    assert(str(full, 0) === "login")
    assert(str(full, 1) === "u007")
    assert(str(full, 7) === null) // 'rest' undefined by the primary pattern

    // fallback catches what the primary rejects
    val fb = m.matchRow(UTF8String.fromString("noise {\"k\": 42}"))
    assert(fb != null)
    assert(str(fb, 0) === "noise")
    assert(str(fb, 7) === "{\"k\": 42}")
    assert(str(fb, 1) === null) // 'user' undefined by the fallback

    // all patterns miss -> null row (_grokparsefailure)
    assert(m.matchRow(UTF8String.fromString("??? !!! ...")) == null)
  }

  test("composite library patterns expand recursively (COMBINEDAPACHELOG)") {
    val g = GrokCompiler.compile("%{COMBINEDAPACHELOG}")
    assert(g.fields === Seq("clientip", "ident", "auth", "timestamp", "verb",
      "request", "httpversion", "rawrequest", "response", "bytes",
      "referrer", "agent"))
    val line = "203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /apache_pb.gif HTTP/1.0\" 200 2326 " +
      "\"http://www.example.com/start.html\" \"Mozilla/4.08 (Macintosh)\""
    val m = java.util.regex.Pattern.compile(g.regex).matcher(line)
    assert(m.find(), s"COMBINEDAPACHELOG must match:\n${g.regex}")
    assert(m.group(g.groupOf("clientip")) === "203.0.113.9")
    assert(m.group(g.groupOf("auth")) === "frank")
    assert(m.group(g.groupOf("timestamp")) === "10/Oct/2000:13:55:36 -0700")
    assert(m.group(g.groupOf("verb")) === "GET")
    assert(m.group(g.groupOf("request")) === "/apache_pb.gif")
    assert(m.group(g.groupOf("httpversion")) === "1.0")
    assert(m.group(g.groupOf("response")) === "200")
    assert(m.group(g.groupOf("bytes")) === "2326")
    assert(m.group(g.groupOf("referrer")) === "\"http://www.example.com/start.html\"")
    assert(m.group(g.groupOf("agent")) === "\"Mozilla/4.08 (Macintosh)\"")
    // outer-before-inner capture order: a FIELD-named composite ref captures
    // the whole expansion as its own group, nested fields follow
    val g2 = GrokCompiler.compile("%{TIME:t} up")
    val m2 = java.util.regex.Pattern.compile(g2.regex).matcher("13:55:36 up")
    assert(m2.find() && m2.group(g2.groupOf("t")) === "13:55:36")
  }

  test("library entries with more date/uri shapes match and stay RE2-safe") {
    def one(pat: String, s: String): Boolean = {
      val g = GrokCompiler.compile(pat)
      java.util.regex.Pattern.compile(g.regex).matcher(s).find()
    }
    assert(one("%{TIMESTAMP_ISO8601:ts}", "2026-08-17T01:55:36.123+02:00"))
    assert(one("%{SYSLOGTIMESTAMP:ts}", "Jan  1 00:00:09"))
    assert(one("%{URI:u}", "https://user@www.example.com:8443/a/b?q=1"))
    assert(one("%{UUID:u}", "123e4567-e89b-42d3-a456-426614174000"))
    assert(one("%{MAC:m}", "0a:1b:2c:3d:4e:5f"))
    assert(one("%{IPV6:i}", "2001:db8:85a3::8a2e:370:7334"))
    assert(one("%{IPV6:i}", "::1"))
    assert(one("%{IPV6:i}", "::"))
    assert(one("%{IPV6:i}", "fe80::"))
    assert(one("%{LOGLEVEL:l} boom", "ERROR boom"))
    // no backreferences / lookaround anywhere in the library (RE2-safe)
    GrokCompiler.Library.values.foreach { p =>
      assert(!p.contains("(?<") && !p.contains("(?=") && !p.contains("(?!")
        && !p.contains("\\1") && !p.contains("(?>"), s"non-RE2-safe: $p")
    }
  }

  test("unterminated quoted string fails fast (no exponential backtracking)") {
    val g = GrokCompiler.compile("%{COMBINEDAPACHELOG}")
    // agent quote never closes; an ambiguous (X+)* QUOTEDSTRING would hang
    // here for hours — the single-char-alternative form must reject in
    // linear time
    val line = "203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /x HTTP/1.0\" 200 10 \"-\" \"Mozilla/5.0 (X11; Linux x86_64" +
      "a" * 120
    val t0 = System.nanoTime()
    assert(!java.util.regex.Pattern.compile(g.regex).matcher(line).find())
    assert((System.nanoTime() - t0) / 1e9 < 5.0,
      "regex must not backtrack exponentially")
  }

  test("reference cycles fail at compile with a clear error") {
    val lib = GrokCompiler.Library ++ Map("LOOPA" -> "%{LOOPB}", "LOOPB" -> "%{LOOPA}")
    val e = intercept[IllegalArgumentException](GrokCompiler.compile("%{LOOPA:x}", lib))
    assert(e.getMessage.contains("cycle"))
  }
}
