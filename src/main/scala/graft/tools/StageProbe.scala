package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Pipeline, RuleTables}
import graft.model.PipelineConf

/** Stage-level attribution of the bench pass: per-stage wall, task count and
  * summed task time — finds low-parallelism / long-tail stages. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = if (args.length > 0) args(0) else "/tmp/bench"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    final case class St(id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long, gcMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
          .getOrElse(-1L)
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks,
          wall, i.taskMetrics.executorRunTime, i.taskMetrics.jvmGCTime)
      }
    })

    val turns = graft.sources.Source.readTable(spark, graft.model.PipelineConf(), s"$benchDir/transcripts")
    val tables = graft.sources.Source.readRuleTables(spark, graft.model.PipelineConf(), benchDir)

    def pass(): Double = {
      val t0 = System.nanoTime()
      val (enriched, cleanup) = Pipeline.enrichPlanned(turns, tables, PipelineConf())
      try {
        enriched.agg(count(lit(1)), sum(when(col("routed"), 1L).otherwise(0L))).collect()
        Pipeline.rollupBySignature(enriched).count()
      } finally cleanup()
      (System.nanoTime() - t0) / 1e9
    }
    pass() // warm
    stages.clear()
    val wall = pass()
    Thread.sleep(2000)
    println(f"TOTAL wall = $wall%.2f s ; taskSum=${stages.map(_.taskMs).sum / 1e3}%.2f s gcSum=${stages.map(_.gcMs).sum / 1e3}%.2f s")
    stages.sortBy(-_.wallMs).take(25).foreach { s =>
      println(f"stage ${s.id}%4d tasks=${s.tasks}%4d wall=${s.wallMs / 1e3}%7.2f s taskSum=${s.taskMs / 1e3}%8.2f s gc=${s.gcMs / 1e3}%7.2f s  ${s.name}")
    }
    spark.stop()
  }
}
