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
}
