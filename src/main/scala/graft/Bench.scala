package graft
import org.apache.spark.sql.SparkSession

object Bench {
  private def jq(s: String): String = graft.util.Json.quote(s)

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
    // DETERMINISTIC ordering: queries sorted by name (HashMap order varied
    // across rounds, making per-query BENCH diffs noise), plus one UNTIMED
    // warmup query so the first timed entry doesn't eat session/codegen
    // warmup (the r2 "p2_dissect 0.51→4.51s regression" was exactly this).
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    try { ordered.head._2(spark, sfDir).count() } catch { case _: Throwable => }
    // fail-loud per query: a broken query must NOT look like a fast query —
    // it is excluded from the timing sum and reported in "errors"
    val errors = scala.collection.mutable.SortedMap.empty[String, String]
    // min-of-N per query (default 2): the sandbox has ±2× run-to-run noise,
    // and min is the right estimator for "what this plan costs" — the slow
    // samples measure the machine, not the query
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // dev loop: skip the ~100-query suite to iterate on the e2e
    // decomposition alone (the driver's mode runs everything)
    val e2eOnly = sys.env.contains("SPARK_GRAFT_BENCH_E2E_ONLY")
    val results = (if (e2eOnly) Seq.empty else ordered).map { case (name, fn) =>
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors(name) = e.toString
          System.err.println(s"[bench] $name FAILED:")
          e.printStackTrace()
          None
        }
      }
      name -> (if (times.size == nRuns) times.min else -1.0)
    }
    // headline metric (BASELINE.md): end-to-end parse→enrich→ROUTE→aggregate
    // turns/sec over the events-as-turns mapping of this sf dir — the sink
    // fan-out write is INSIDE the timed pass (warm: second run timed).
    // r5 (VERDICT r4 #1): the metric is also DECOMPOSED via a second
    // measurement on a deterministic ~1/16 conv-hash slice (same plan shape
    // and parallelism — a filter, not a limit): two points on
    // wall = fixed + rows·cost give the fixed session/write overhead vs the
    // marginal per-row cost, so a slide in the headline number is
    // attributable on the record.
    val outDir = java.nio.file.Files.createTempDirectory("graft-bench-route").toString
    def e2eOnce(turns: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (enriched, cleanup) = Pipeline.enrichPlanned(
        turns, graft.entry.TestdataTables.rules(spark), graft.entry.LogQueries.tconf)
      try {
        val counts = Pipeline.route(spark, enriched, graft.entry.LogQueries.tconf, outDir)
        require((counts - "total").values.sum > 0, "route produced no alerts")
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] e2e pass rows=${counts("total")} wall=$w%.3f")
        (counts("total"), w)
      } finally cleanup()
    }
    // INTERLEAVED full/slice passes (after one untimed warmup each),
    // min per point — the same discipline as ScalingBench's A/B bests: a
    // host-degradation window then hits both points instead of poisoning
    // one side of the fit (a single timed slice pass measured 3.5–42 s on
    // this host; min-of-interleaved-3 is stable)
    val fullTurns = graft.entry.TestdataAdapter.turns(spark, sfDir)
    val sliceTurns = fullTurns.filter(
      org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.hash(
        org.apache.spark.sql.functions.col("conv_id")), org.apache.spark.sql.functions.lit(16)) === 0)
    e2eOnce(fullTurns); e2eOnce(sliceTurns)
    val passes = (1 to math.max(nRuns, 3)).map(_ => (e2eOnce(fullTurns), e2eOnce(sliceTurns)))
    val (nFull, wFull) = passes.map(_._1).minBy(_._2)
    val e2e = nFull / wFull
    val (nSlice, wSlice) = passes.map(_._2).minBy(_._2)
    val perRowSec = (wFull - wSlice) / (nFull - nSlice).toDouble
    // a non-positive slope means fixed overhead swamps the row cost at this
    // sf and the fit is noise — report the points, not a nonsense rate
    val decompOk = perRowSec > 0
    val fixedSec = if (decompOk) wFull - nFull * perRowSec else wFull
    val qs = results.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jq(k) + ":" + jq(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_failed":${errors.size},""" +
      s""""errors":$errJson,"queries":$qs,""" +
      s""""e2e_turns_per_sec":$e2e,"e2e_rows":$nFull,"e2e_wall_sec":$wFull,""" +
      s""""e2e_slice_rows":$nSlice,"e2e_slice_wall_sec":$wSlice,""" +
      s""""e2e_fixed_sec_est":$fixedSec,"e2e_marginal_rows_per_sec":${
        if (decompOk) (1.0 / perRowSec).toString else "null"},""" +
      s""""cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
