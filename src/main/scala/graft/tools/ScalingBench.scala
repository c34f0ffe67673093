package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Pipeline, RuleTables}
import graft.fixtures.Gen
import graft.model.PipelineConf

/** M6 scaling bench (BASELINE.json): run the identical end-to-end
  * parse→enrich→route→aggregate job on the same input at parallelism N and
  * 4N (the sandbox stand-in for N vs 4N executors), report throughput at both
  * and the scaling efficiency (thrₘ/thrₙ)/(m/n).
  *
  * `ScalingBench [benchDir] [nConvs] [n] [m]` — generates the corpus once
  * (chunked, deterministic), then times each level twice and keeps the warm
  * run. Prints one JSON line; paste results into BENCH.md.
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full pipeline pass; returns (rows, routedRows, wallSec). */
  private def onePass(spark: SparkSession, benchDir: String): (Long, Long, Double) = {
    import spark.implicits._
    val conf = PipelineConf()
    val turns = graft.sources.Source.readTable(spark, conf, s"$benchDir/transcripts")
    val tables = graft.sources.Source.readRuleTables(spark, conf, benchDir)
    val persist = sys.env.getOrElse("SPARK_GRAFT_PERSIST", "true").toBoolean
    val t0 = System.nanoTime()
    val (enriched, cleanup) = Pipeline.enrichPlanned(turns, tables, conf,
      persistIntermediates = persist)
    try {
      // the FULL pipeline is in the timed pass: Pipeline.route writes the
      // per-severity alert sinks + both rollups (the metric label
      // 'parse→enrich→route→aggregate throughput' must mean what it says)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft-scaling-route").toString
      val counts = Pipeline.route(spark, enriched, conf, outDir)
      val wall = (System.nanoTime() - t0) / 1e9
      val routed = (counts - "total").values.sum
      require(routed > 0, "route produced no alerts")
      (counts("total"), routed, wall)
    } finally cleanup()
  }

  def main(args: Array[String]): Unit = {
    val benchDir = if (args.length > 0) args(0) else "target/fixtures/bench"
    val nConvs = if (args.length > 1) args(1).toInt else 500000
    val nLow = if (args.length > 2) args(2).toInt else 8
    val nHigh = if (args.length > 3) args(3).toInt else 32
    val nPasses = if (args.length > 4) args(4).toInt else 3
    val cores = Runtime.getRuntime.availableProcessors

    // ---- generate once (chunked, parallel: one generator task per chunk)
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$benchDir/transcripts"))) {
      val gen = session(cores)
      import gen.implicits._
      val chunkConvs = 50000
      val chunks = math.max(1, nConvs / chunkConvs)
      gen.range(0, chunks).repartition(math.min(chunks, cores))
        .flatMap(c => Gen.transcriptsChunk(c.toInt, chunkConvs).iterator)
        .toDF()
        .write.mode(SaveMode.Overwrite).parquet(s"$benchDir/transcripts")
      System.err.println(s"$chunks chunks written")
      val fx = Gen.fixture(0)
      gen.createDataset(fx.ioc).toDF().coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$benchDir/ioc")
      gen.createDataset(fx.rules).toDF().coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$benchDir/sig_rules")
      gen.createDataset(fx.ref).toDF().coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$benchDir/ref_baseline")
      gen.createDataset(fx.whitelist).toDF().coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$benchDir/whitelist")
      gen.stop()
    }

    // ---- time each level: cold + warm, keep warm
    /** warmup + 3 timed passes, keep the fastest (robust to the sandbox's
      * run-to-run noise — first pass pays janino codegen for the large plan). */
    def timeLevel(cpus: Int): (Long, Long, Double) = {
      val s = session(cpus)
      try {
        val w = onePass(s, benchDir)
        System.err.println(s"level $cpus warmup: ${w._3}")
        val passes = (1 to nPasses).map { i =>
          val r = onePass(s, benchDir)
          System.err.println(s"level $cpus pass$i: ${r._3}")
          r
        }
        passes.minBy(_._3)
      } finally s.stop()
    }
    val (n1, r1, w1) = timeLevel(nLow)
    val (n2, r2, w2) = timeLevel(nHigh)
    require(n1 == n2 && r1 == r2, s"results differ across levels: $n1/$r1 vs $n2/$r2")

    val thrLow = n1 / w1
    val thrHigh = n2 / w2
    val eff = (thrHigh / thrLow) / (nHigh.toDouble / nLow)
    println(
      s"""{"metric":"pipeline_throughput","rows":$n1,"routed":$r1,"cores_available":$cores,""" +
        s""""n_low":$nLow,"n_high":$nHigh,"wall_low_sec":$w1,"wall_high_sec":$w2,""" +
        s""""thr_low_rows_per_sec":$thrLow,"thr_high_rows_per_sec":$thrHigh,""" +
        s""""scaling_efficiency":$eff}""")
  }
}
