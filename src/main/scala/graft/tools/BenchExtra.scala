package graft.tools

import org.apache.spark.sql.SparkSession

/** Subset bench with graft.Bench's exact methodology (same session settings,
  * name-sorted order, one untimed warmup query, min-of-N count() timings) —
  * the sanctioned extra-benchmark main for optimization A/B runs so the
  * frozen harness never changes. Usage:
  *   BenchExtra <q1,q2,...|all> [sfDir] [runs]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nRuns = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    val sel =
      if (names == "all") all.toSeq.sortBy(_._1)
      else names.split(",").map(_.trim).filter(_.nonEmpty).sorted.toSeq
        .map(n => n -> all(n))
    try { sel.head._2(spark, sfDir).count() } catch { case _: Throwable => }
    val results = sel.map { case (name, fn) =>
      val times = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchextra] $name%-26s min=${times.min}%.3f  " +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]"))
      name -> times.min
    }
    println(f"[benchextra] TOTAL(min) = ${results.map(_._2).sum}%.3f s over " +
      s"${results.size} queries")
    spark.stop()
  }
}
