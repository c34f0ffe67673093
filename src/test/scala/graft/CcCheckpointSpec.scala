package graft

/** VERDICT r4 #7: `spark.graft.cc.checkpointDir` switches the CC loop's
  * per-round lineage truncation from localCheckpoint (executor-block-backed,
  * not fault-tolerant) to reliable checkpoint (dir-backed — the form a real
  * cluster needs). Pin that the reliable path (a) yields byte-identical
  * labels and (b) actually writes checkpoint data to the configured dir. */
class CcCheckpointSpec extends SparkSuite {

  test("reliable-checkpoint cc loop == localCheckpoint cc loop") {
    val d = "/root/testdata/sf0.001"
    def run(): Seq[Seq[Any]] =
      SparkEntry.queries("dd_cluster_cc")(spark, d)
        .collect().map(_.toSeq.toList).toList
    val base = run()
    assert(base.nonEmpty, "cc fixture must produce clusters")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.conf.set("spark.graft.cc.checkpointDir", dir)
    try {
      assert(run() == base)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(wrote > 0, "reliable path wrote no checkpoint data")
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }
}
