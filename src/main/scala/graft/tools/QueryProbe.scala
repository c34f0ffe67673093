package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing probe: `QueryProbe <queryName> [sfDir] [runs]` —
  * same session settings as graft.Bench, times one registry query in
  * isolation (count() action) so a bench outlier can be attributed to the
  * plan vs neighbors/cache effects. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name run $i: $sec%.2f s ($n rows)")
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      val df = fn(spark, sfDir)
      df.foreach(_ => ()) // executed plan: AQE final + codegen annotations
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
