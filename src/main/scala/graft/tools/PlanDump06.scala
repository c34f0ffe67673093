package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 optimization evidence: dump `explain("formatted")` of EXECUTED
  * plans for the named harness queries to plans/r06/<query>_<suffix>.txt.
  *
  * Usage: runMain graft.tools.PlanDump06 <suffix> <q1,q2,...> [sfDir]
  * (executed post-AQE plans — pre-execution AQE plans hide runtime join
  * conversions and carry no codegen annotation, same rationale as
  * ExplainDump). */
object PlanDump06 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)
    val byName = graft.SparkEntry.queries
    names.foreach { n =>
      val df =
        if (n == "e2e_enrich")
          graft.Pipeline.enrichPlanned(
            graft.entry.TestdataAdapter.turns(spark, sfDir),
            graft.entry.TestdataTables.rules(spark),
            graft.entry.LogQueries.tconf)._1
        else byName(n)(spark, sfDir)
      df.foreach(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val win = "Window".r.findAllIn(plan).size
      println(f"[plandump] $n%-24s Exchange=$ex BHJ=$bhj SMJ=$smj Window=$win")
    }
    spark.stop()
  }
}
