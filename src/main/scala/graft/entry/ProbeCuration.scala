package graft.entry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r6 phase attribution for the curation family: times each building block
  * of ta_curation / dd_cluster_cc / dd_ngram_jaccard in isolation so the
  * bench total can be decomposed (the composed query costs far more than
  * the sum of its parts — this pins where).
  * Usage: runMain graft.entry.ProbeCuration [sfDir] */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup session
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    t("jaccardVerified.count") {
      DataPipeQueries.jaccardVerified(spark, sfDir).count()
    }
    t("ccLabels(loop+labels.count)") {
      DataPipeQueries.ccLabels(
        DataPipeQueries.jaccardVerified(spark, sfDir)).count()
    }
    t("evalSplit contamination") {
      val (ev, tr) = DataPipeQueries.evalSplit(spark, sfDir)
      tr.join(ev, "h").select("doc_id").distinct().count()
    }
    t("ta_curation full #1") {
      graft.SparkEntry.queries("ta_curation")(spark, sfDir).count()
    }
    t("ta_curation full #2") {
      graft.SparkEntry.queries("ta_curation")(spark, sfDir).count()
    }
    t("dd_cluster_cc full") {
      graft.SparkEntry.queries("dd_cluster_cc")(spark, sfDir).count()
    }
    spark.stop()
  }
}
