package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures this machine's achievable Spark-local scaling ceiling with a
  * pure-CPU job (no shuffle, no memory traffic) — context for BENCH.md. */
object CpuCeiling {
  def main(args: Array[String]): Unit = {
    def run(cpus: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      // ~3e10 cheap ops, embarrassingly parallel
      spark.range(0, 30000000000L, 1, cpus * 4)
        .selectExpr("sum(id % 7)").collect()
      val w = (System.nanoTime() - t0) / 1e9
      spark.stop()
      w
    }
    run(8) // warm JIT
    val w2 = run(2)
    val w8 = run(8)
    val w32 = run(32)
    println(f"cpu-only: local[2]=$w2%.2f s local[8]=$w8%.2f s " +
      f"local[32]=$w32%.2f s eff_2_8=${(w2 / w8) / 4.0}%.3f " +
      f"eff_8_32=${(w8 / w32) / 4.0}%.3f")
  }
}
