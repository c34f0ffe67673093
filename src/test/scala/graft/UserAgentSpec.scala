package graft

import org.apache.spark.sql.functions._

import graft.functions.UserAgent

/** P24 useragent parse: first-match-wins ordering on the token-containment
  * traps (Edge ⊃ Chrome ⊃ Safari tokens, Opera ⊃ Chrome, Android ⊃ Linux,
  * iOS ⊃ "Mac OS X"). */
class UserAgentSpec extends SparkSuite {
  import spark.implicits._

  private def parse(ua: String): (String, Integer, String, String) = {
    val r = Seq(ua).toDF("ua")
      .select(UserAgent.parse(col("ua")).as("p"))
      .select("p.family", "p.major", "p.os", "p.device")
      .head()
    (r.getString(0), if (r.isNullAt(1)) null else Int.box(r.getInt(1)),
      r.getString(2), r.getString(3))
  }

  test("edge wins over the chrome and safari tokens it embeds") {
    assert(parse("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Edg/124.0.2478.51")
      === (("edge", 124, "windows", "desktop")))
  }

  test("opera wins over chrome; chrome wins over safari") {
    assert(parse("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0")
      === (("opera", 106, "linux", "desktop")))
    assert(parse("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36")
      === (("chrome", 124, "windows", "desktop")))
  }

  test("safari major comes from the Version/ token") {
    assert(parse("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) " +
      "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Safari/605.1.15")
      === (("safari", 17, "macos", "desktop")))
  }

  test("android beats the Linux token, iOS beats the Mac OS X token") {
    assert(parse("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/124.0.6367.54 Mobile Safari/537.36")
      === (("chrome", 124, "android", "mobile")))
    assert(parse("Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) " +
      "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Mobile/15E148 Safari/604.1")
      === (("safari", 17, "ios", "mobile")))
  }

  test("non-browser and unknown agents") {
    assert(parse("curl/8.5.0") === (("curl", 8, "other", "other")))
    assert(parse("FancyAnalyzer/2.1") === (("other", null, "other", "desktop")))
  }
}
