package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // headline metric (BASELINE.md): end-to-end pipeline turns/sec over the
    // events-as-turns mapping of this sf dir (warm: second run timed)
    val e2e = {
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val (enriched, cleanup) = Pipeline.enrichPlanned(
          graft.entry.TestdataAdapter.turns(spark, sfDir),
          graft.entry.TestdataTables.rules(spark), graft.entry.LogQueries.tconf)
        try {
          val n = enriched.count()
          (n, (System.nanoTime() - t0) / 1e9)
        } finally cleanup()
      }
      once(); val (n, w) = once()
      n / w
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""e2e_turns_per_sec":$e2e,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
