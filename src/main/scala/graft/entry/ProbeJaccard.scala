package graft.entry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r6 stage attribution inside jaccardVerified: times each sub-pipeline
  * cumulatively (docsh materialize → dfreq → prefix → cand → verify) so the
  * dominant stage is measurable. Usage: runMain graft.entry.ProbeJaccard */
object ProbeJaccard {
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
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/documents.parquet").count() // session warmup
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val wordsCol = split(col("text"), " ")
      val shinglesExpr = expr(
        """element_at(transform(array(split(text, ' ')), ws ->
          |  array_distinct(transform(sequence(0, size(ws) - 3),
          |    i -> concat(element_at(ws, i + 1), ' ',
          |                element_at(ws, i + 2), ' ',
          |                element_at(ws, i + 3))))), 1)""".stripMargin)
      val docsh = docs.filter(size(wordsCol) >= 3)
        .select(col("doc_id"), shinglesExpr.as("shs"))
        .select(col("doc_id"), col("shs"), size(col("shs")).as("nsh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("docsh materialize")(docsh.count())
      val tok = docsh.select(col("doc_id"), col("nsh"), explode(col("shs")).as("sh"))
        .select(col("doc_id"), col("nsh"), xxhash64(col("sh")).as("shh"))
      t("tok count")(tok.count())
      val dfreq = tok.groupBy("shh").agg(count(lit(1)).as("df"))
      t("dfreq")(dfreq.count())
      val prefix = tok.join(dfreq, "shh")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("shh"))))
        .filter(col("rk") <= floor(col("nsh") / 2) + 1)
        .select("doc_id", "shh")
      t("prefix")(prefix.count())
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          col("a.shh") === col("b.shh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
      t("cand")(cand.count())
      val full = cand
        .join(docsh.select(col("doc_id").as("i"), col("shs").as("sa"),
          col("nsh").as("na")), "i")
        .join(docsh.select(col("doc_id").as("j"), col("shs").as("sb"),
          col("nsh").as("nb")), "j")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .filter(lit(3) * col("inter") >= col("na") + col("nb"))
      t("verify(full)")(full.count())
      val joinsOnly = cand
        .join(docsh.select(col("doc_id").as("i"), col("shs").as("sa"),
          col("nsh").as("na")), "i")
        .join(docsh.select(col("doc_id").as("j"), col("shs").as("sb"),
          col("nsh").as("nb")), "j")
      t("verify joins only")(joinsOnly.count())
      t("verify full again")(full.count())
      val candB = broadcast(cand)
      val fullB = candB
        .join(docsh.select(col("doc_id").as("i"), col("shs").as("sa"),
          col("nsh").as("na")), "i")
        .join(docsh.select(col("doc_id").as("j"), col("shs").as("sb"),
          col("nsh").as("nb")), "j")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .filter(lit(3) * col("inter") >= col("na") + col("nb"))
      t("verify w/ broadcast cand")(fullB.count())
      docsh.unpersist()
    }
    spark.stop()
  }
}
