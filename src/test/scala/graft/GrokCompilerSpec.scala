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
}
