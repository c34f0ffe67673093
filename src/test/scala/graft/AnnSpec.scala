package graft

/** ANN quality floors over the driver testdata (cancelled cleanly when the
  * testdata mount is absent). ann_recall is itself a DuckDB-differential
  * query; this pins the MEANING of its numbers: Hamming-1 multi-probing
  * never loses recall vs single-probe (its candidate set is a superset and
  * anything displacing a true neighbor from a top-10 must itself be a true
  * neighbor), and IVF nprobe=2 — the recommended 100-TB path — clears a 0.5
  * recall@10 floor where sign-LSH is structurally weak on near-uniform
  * embeddings. */
class AnnSpec extends SparkSuite {
  test("recall@10: lsh_mp >= lsh1, lsh_mp > 0, ivf >= 0.50 (sf0.001 embeddings)") {
    assume(new java.io.File("/root/testdata/sf0.001/embeddings.parquet").exists,
      "driver testdata not mounted")
    val rows = SparkEntry.queries("ann_recall")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(rows.keySet === Set("ivf", "lsh1", "lsh_mp"))
    assert(rows("lsh_mp") >= rows("lsh1"), s"multi-probe lost recall: $rows")
    assert(rows("lsh_mp") > 0, s"multi-probe found nothing: $rows")
    assert(rows("ivf") >= 5000, s"IVF recall@10 floor 0.50 violated: $rows")
  }
}
