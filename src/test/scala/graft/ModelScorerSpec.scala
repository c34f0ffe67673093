package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel
import graft.operators.QualityModel.{DocIn, LinearScorer, StubScorer}

/** VERDICT r4 #6: the model-scorer seam's loadable-model leg. The stub leg is
  * the `ta_model_score` hash differential; here the SAME seam runs an
  * integer linear model whose weights come from a FILE — an in-repo fixture
  * (the Bpe-merges pattern) so the leg runs ungated in-sandbox, plus an
  * env-gated leg for an externally-supplied weights file. */
class ModelScorerSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private def docsDf = spark.read.parquet(s"$d/documents.parquet")

  private def fixturePath: String = {
    val u = getClass.getResource("/quality_weights.json")
    assert(u != null, "in-repo weights fixture missing")
    java.nio.file.Paths.get(u.toURI).toString
  }

  test("LinearScorer.fromFile loads the fixture and scores through the seam") {
    val m = LinearScorer.fromFile(spark, fixturePath)
    assert(m == LinearScorer(bias = 120, wUniq = 1, wNw = 25, wLen = 7))
    val got = QualityModel.score(docsDf, m)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // oracle: recompute every score driver-side from the raw text
    val want = docsDf.select("doc_id", "text").collect().map { r =>
      val (nw, uniqBp, nchars) = QualityModel.features(r.getString(1))
      val raw = 120L + 1L * uniqBp + 25L * math.min(nw, 100) + 7L * (nchars % 100)
      r.getLong(0) -> math.max(0L, math.min(10000L, raw)).toInt
    }.toMap
    assert(got == want)
    assert(got.values.toSet.size > 1, "degenerate fixture: all scores equal")
  }

  test("clamping: extreme weights pin scores to [0, 10000]") {
    val lo = QualityModel.score(docsDf, LinearScorer(0, -1000, -1000, -1000))
      .agg(min("score_bp"), max("score_bp")).first()
    assert(lo.getInt(0) == 0 && lo.getInt(1) == 0)
    val hi = QualityModel.score(docsDf, LinearScorer(0, 1000, 1000, 1000))
      .agg(min("score_bp"), max("score_bp")).first()
    assert(hi.getInt(0) == 10000 && hi.getInt(1) == 10000)
  }

  test("stub scorer matches its closed form on crafted edge docs") {
    // empty text → 1 empty word; repeated words; >100 words; multi-space
    val docs = Seq(
      DocIn(1L, ""), DocIn(2L, "a a a a a"),
      DocIn(3L, Seq.tabulate(150)(i => s"w$i").mkString(" ")),
      DocIn(4L, "x  y"))
    docs.foreach { di =>
      val (nw, uniqBp, nchars) = QualityModel.features(di.text)
      val want = math.min(10000, uniqBp / 2 + math.min(nw, 100) * 30 + nchars % 100)
      assert(StubScorer.scoreOne(di).score_bp == want, s"doc ${di.doc_id}")
    }
    // the empty doc: one empty word, uniq_bp = 10000, nchars = 0
    assert(StubScorer.scoreOne(DocIn(1L, "")).score_bp == 5000 + 30)
  }

  test("externally-supplied weights file (gated)") {
    val path = sys.env.get("SPARK_GRAFT_SCORER_WEIGHTS")
    assume(path.isDefined,
      "SPARK_GRAFT_SCORER_WEIGHTS not set — external-model leg skipped")
    val m = LinearScorer.fromFile(spark, path.get)
    val n = QualityModel.score(docsDf, m)
      .filter(col("score_bp").between(0, 10000)).count()
    assert(n == docsDf.count())
  }
}
