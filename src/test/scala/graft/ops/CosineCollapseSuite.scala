package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content collapse for the cosine pair family (r13 — the HammingBands
  * signature-collapse insight applied to vectors): a duplicate-flooded
  * corpus must produce BIT-IDENTICAL pairs through the collapsed plans,
  * a duplicate-free corpus must skip the collapse outright (plan pin),
  * and the auto dispatch must measure the same full-corpus histogram
  * either way. */
class CosineCollapseSuite extends SparkSessionSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** Exact-bits canonical form — NO rounding: the collapse contract is
    * bit-identity, not tolerance. */
  private def canon(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("v1"), col("v2"), col("rawcos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  /** sf0.001 embeddings unioned with `copies-1` shifted exact twins —
    * the synth_scale densification shape (every vector gains twins,
    * ids disjoint). */
  private def floodedPrep(copies: Int): DataFrame = {
    val base = graft.Tables.embeddings(spark, sfDir)
    val corpus = (0 until copies)
      .map(k => base.select((col("vec_id") + k * 1000000L).as("vec_id"),
        col("embedding")))
      .reduce(_ unionAll _)
    Similarity.prepared(corpus)
  }

  test("collapsed brute kernel ≡ uncollapsed kernel bit-for-bit on a " +
      "duplicate flood") {
    val prep = floodedPrep(3).persist()
    try {
      val collapsed = Similarity.collapsedCosinePairs(
        prep, "test_kernel", intraMin = Some(0.35))(
        Similarity.pairCosineKernel(_, 0.35))
      val reference = Similarity.pairCosineKernel(prep, 0.35)
      val got = canon(collapsed)
      got shouldBe canon(reference)
      // twins exist, so intra pairs (cos exactly 1.0) must be present
      got.count(_._3 == 1.0) should be >= 500
    } finally { prep.unpersist(); graft.InternalCaches.releaseAll() }
  }

  test("collapsed banded candidates ≡ uncollapsed banded bit-for-bit on " +
      "a duplicate flood") {
    val prep = floodedPrep(3).persist()
    try {
      val collapsed = Similarity.collapsedCosinePairs(
          prep, "test_banded")(Similarity.bandedPairCosine(_))
        .filter(col("rawcos") >= 0.35)
      val reference = Similarity.bandedPairCosine(prep)
        .filter(col("rawcos") >= 0.35)
      canon(collapsed) shouldBe canon(reference)
    } finally { prep.unpersist(); graft.InternalCaches.releaseAll() }
  }

  test("rangeSearchPairs on a flood matches the uncollapsed route picked " +
      "by the full-corpus decision") {
    val prep = floodedPrep(3).persist()
    try {
      // the decision the collapsed path must reproduce via weights
      val d = Similarity.rangeDispatchDecision(prep)
      // 1500 rows <= minLshVectors=4096 → brute; the collapsed path
      // derives the SAME n from the weighted unique histogram
      d.useBrute shouldBe true
      d.n shouldBe 1500L
      canon(Similarity.rangeSearchPairs(prep, 0.35)) shouldBe
        canon(Similarity.pairCosineKernel(prep, 0.35))
    } finally { prep.unpersist(); graft.InternalCaches.releaseAll() }
  }

  test("weighted unique histogram reproduces the full-corpus dispatch " +
      "decision above the size floor") {
    val prep = floodedPrep(10).persist() // 5000 rows, 500 uniques
    try {
      val direct = Similarity.rangeDispatchDecision(prep,
        minLshVectors = Some(1000L))
      // a uniform flood scales lsh AND brute volumes ~×copies², so the
      // share stays at the corpus's spread value (<90%) and the
      // full-corpus decision routes BANDED; the collapsed path must
      // reach the same decision from the weighted unique histogram and
      // its expansion must equal the uncollapsed banded plan bit-for-bit
      direct.n shouldBe 5000L
      direct.useBrute shouldBe false
      val got = canon(Similarity.rangeSearchPairs(prep, 0.35,
        minLshVectors = Some(1000L)))
      got shouldBe canon(Similarity.bandedPairCosine(prep)
        .filter(col("rawcos") >= 0.35))
    } finally { prep.unpersist(); graft.InternalCaches.releaseAll() }
  }

  test("duplicate-free corpus skips the collapse: no Window node in the " +
      "plan") {
    val prep = Similarity.prepared(graft.Tables.embeddings(spark, sfDir))
    val plan = Similarity.collapsedCosinePairs(
        prep, "test_skip", intraMin = Some(0.35))(
        Similarity.pairCosineKernel(_, 0.35))
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    // and a flooded corpus DOES take the collapse path
    val plan2 = Similarity.collapsedCosinePairs(
        floodedPrep(2), "test_collapse", intraMin = Some(0.35))(
        Similarity.pairCosineKernel(_, 0.35))
      .queryExecution.executedPlan.toString
    plan2 should include("Window")
    graft.InternalCaches.releaseAll()
  }

  test("duplicated degenerate vectors: self-cosine 0 is excluded by the " +
      "threshold, identically to the uncollapsed plan") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      (i, Seq.fill(8)((rng.nextDouble() * 2 - 1).toFloat))
    } ++ Seq( // three byte-identical zero vectors: selfcos = 0/1 = 0
      (100L, Seq.fill(8)(0.0f)),
      (101L, Seq.fill(8)(0.0f)),
      (102L, Seq.fill(8)(0.0f)))
    val prep = Similarity.prepared(rows.toDF("vec_id", "embedding"))
      .persist()
    try {
      val collapsed = Similarity.collapsedCosinePairs(
        prep, "test_zero", intraMin = Some(0.35))(
        Similarity.pairCosineKernel(_, 0.35))
      val got = canon(collapsed)
      got shouldBe canon(Similarity.pairCosineKernel(prep, 0.35))
      got.map(t => (t._1, t._2)) should not contain ((100L, 101L))
    } finally { prep.unpersist(); graft.InternalCaches.releaseAll() }
  }
}
