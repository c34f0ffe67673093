package graft

import org.apache.spark.sql.functions._

/** Sequence-packing invariants (r5, `ta_pack_sequences` — the differential
  * pins cross-engine hash equality; this spec pins the packing SEMANTICS):
  * within every shard the token tape tiles exactly (next start = prev
  * start + prev len, first start = 0) and each doc's block span is the
  * arithmetic consequence of its offset — so decoding a block b of shard s
  * touches exactly the docs with seq_first <= b <= seq_last. */
class PackSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("per-shard tape tiles exactly; block spans consistent with offsets") {
    val out = graft.SparkEntry.queries("ta_pack_sequences")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
      .groupBy(_._1)

    assert(out.keySet == Set(0, 1, 2, 3))
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._4 == 0L, "first doc of a shard starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._4 + a._3, s"tape gap between ${a._2} and ${b._2}")
        case _ =>
      }
      sorted.foreach { case (_, id, nTok, start, first, last) =>
        assert(nTok >= 1)
        assert(first == (start / 256).toInt, s"doc $id seq_first")
        assert(last == ((start + nTok - 1) / 256).toInt, s"doc $id seq_last")
        assert(first <= last)
      }
    }
  }
}
