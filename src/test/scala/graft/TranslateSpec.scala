package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Translate

/** P15 translate filter surface: the dictionary-FILE ingest path (csv read →
  * broadcast join — kept OUT of the driver query fns, which must not touch
  * the driver-local filesystem on a cluster), duplicate-key rejection, and
  * regex-key first-match-wins. */
class TranslateSpec extends SparkSuite {
  import spark.implicits._

  private def events = Seq(
    ("c1", 0, "click"), ("c1", 1, "purchase"), ("c2", 0, "exfil"),
    ("c2", 1, null.asInstanceOf[String])).toDF("conv_id", "turn_idx", "action")

  test("dictionary csv file loads and translates via broadcast join") {
    val dir = Files.createTempDirectory("graft-translate")
    Files.writeString(dir.resolve("dict.csv"),
      "key,value\nclick,nav\npurchase,commerce\nerror,fault\n")
    val dict = spark.read.option("header", "true").csv(dir.toString)
    val out = Translate.byTable(events, dict, col("action"), "category", "other")
      .select("conv_id", "turn_idx", "category")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(out === Set(("c1", 0, "nav"), ("c1", 1, "commerce"),
      ("c2", 0, "other"), ("c2", 1, "other")))
  }

  test("duplicate dictionary keys are rejected loudly") {
    val dict = Seq("a" -> "1", "a" -> "2").toDF("key", "value")
    val e = intercept[IllegalArgumentException] {
      Translate.byTable(events, dict, col("action"), "category", "other")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("regex-key mode is first-match-wins with default for misses and nulls") {
    val out = Translate.byRegex(events,
      Seq("^ex" -> "attack", "c" -> "has-c"), col("action"), "cat", "none")
      .select("conv_id", "turn_idx", "cat")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(out === Set(("c1", 0, "has-c"), ("c1", 1, "has-c"),
      ("c2", 0, "attack"), ("c2", 1, "none")))
  }
}
