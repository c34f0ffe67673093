package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayDot
import graft.model.PipelineConf

/** SQL-facing surface: grok_struct registered via GraftExtensions, and the
  * ArrayDot native expression vs the higher-order-function formulation. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("grok_struct callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("login user=u01 src=10.0.0.1 dst=h1.corp.example status=200 " +
      s"hash=${graft.fixtures.Gen.md5("x")} uri=/api/v1/r1", 1),
      ("garbage line", 2)).toDF("text", "id").createOrReplaceTempView("t")
    val p = PipelineConf.DefaultGrok
    val rows = spark.sql(
      s"SELECT id, grok_struct(text, '$p').action AS a, " +
        s"grok_struct(text, '$p') IS NULL AS miss FROM t ORDER BY id")
      .collect()
    assert(rows(0).getString(1) === "login" && !rows(0).getBoolean(2))
    assert(rows(1).isNullAt(1) && rows(1).getBoolean(2))
  }

  test("grok_struct SQL pattern list: first match wins, unified fields") {
    GraftExtensions.register(spark)
    Seq(("login user=u01 src=10.0.0.1 dst=h1.corp.example status=200 " +
      s"hash=${graft.fixtures.Gen.md5("x")} uri=/api/v1/r1", 1),
      ("noise {\"k\": 9}", 2),
      ("??? !!!", 3)).toDF("text", "id").createOrReplaceTempView("t2")
    val p = PipelineConf.DefaultGrok
    val rows = spark.sql(
      s"""SELECT id, grok_struct(text, '$p', '%{WORD:action} %{GREEDYDATA:rest}').action AS a,
         |  grok_struct(text, '$p', '%{WORD:action} %{GREEDYDATA:rest}').rest AS r,
         |  grok_struct(text, '$p', '%{WORD:action} %{GREEDYDATA:rest}') IS NULL AS miss
         |FROM t2 ORDER BY id""".stripMargin).collect()
    assert(rows(0).getString(1) === "login" && rows(0).isNullAt(2)) // primary won
    assert(rows(1).getString(1) === "noise" && rows(1).getString(2) === "{\"k\": 9}")
    assert(rows(2).getBoolean(3)) // all patterns missed
  }

  test("ArrayDot == aggregate(zip_with(...)) on float vectors") {
    val df = spark.createDataset(Seq(
      (1L, Seq(1.0f, 2.0f, -3.5f), Seq(0.5f, -1.0f, 2.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)))).toDF("id", "a", "b")
    val got = df.select(col("id"), ArrayDot.dot(col("a"), col("b")).as("d"),
      ArrayDot.cosine(col("a"), col("b")).as("c")).collect()
    val want = df.selectExpr("id",
      "aggregate(zip_with(transform(a, x -> cast(x as double)), transform(b, x -> cast(x as double)), (x, y) -> x * y), 0D, (s, x) -> s + x) as d")
      .collect()
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g.getDouble(1) - w.getDouble(1)) < 1e-12)
    }
    assert(got(1).getDouble(2) === 0.0) // zero-norm guard
  }
}
