package graft.fm

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions.col

class ScoringPathsSuite extends SparkSessionSuite {

  test("carry-through scoring equals join-back scoring on all edge cases") {
    val s = spark
    import s.implicits._
    val input = Seq(
      (100, Vectors.dense(1.0, 2.0, 1.5, -1.0)), // dense, all learned
      (101, Vectors.sparse(4, Seq((0, 0.5), (2, -1.5)))), // sparse
      (102, Vectors.sparse(6, Seq((0, 2.0), (4, 1.5)))), // one unlearned dim
      (103, Vectors.sparse(4, Seq())), // empty -> raw bias fallback
      (104, Vectors.sparse(6, Seq((4, 1.0), (5, 2.0)))) // ALL dims unlearned
    ).toDF("rowId", "features")

    def score(carry: Boolean, lo: Double, hi: Double): Map[Int, Double] =
      FmQueries.goldenModel(s)
        .setCarryThroughScoring(carry).setMinLabel(lo).setMaxLabel(hi)
        .transform(input)
        .select(col("rowId"), col("prediction")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap

    // unclipped and clipped variants
    for ((lo, hi) <- Seq(
        (Double.NegativeInfinity, Double.PositiveInfinity), (5.5, 10.0))) {
      val joinBack = score(carry = false, lo, hi)
      val carry = score(carry = true, lo, hi)
      joinBack.keySet shouldBe carry.keySet
      joinBack.foreach { case (k, v) => carry(k) shouldBe v +- 1e-12 }
    }

    // all-unseen sample (104) behaves like empty: raw bias even when the
    // bias is outside the clip bounds.
    score(carry = true, 5.5, 10.0)(104) shouldBe 5.0
    score(carry = false, 5.5, 10.0)(104) shouldBe 5.0
  }

  test("carry-through tolerates input columns named like internals") {
    val s = spark
    import s.implicits._
    // 'id' and 'strength' collide with the raw param-table columns; the
    // reserved __fm_ prefix must keep both paths working and agreeing.
    val input = Seq((7L, 0.5, Vectors.dense(1.0, 2.0, 1.5, -1.0)))
      .toDF("id", "strength", "features")
    val joinBack = FmQueries.goldenModel(s).transform(input)
      .select(col("prediction")).collect()(0).getDouble(0)
    val carry = FmQueries.goldenModel(s).setCarryThroughScoring(true)
      .transform(input)
      .select(col("prediction")).collect()(0).getDouble(0)
    joinBack shouldBe 23.77 +- 1e-8
    carry shouldBe joinBack +- 1e-12
  }

  test("input colliding with sampleIdCol is rejected with a clear error") {
    val s = spark
    import s.implicits._
    val input = Seq((1L, Vectors.dense(1.0, 0.0, 0.0, 0.0)))
      .toDF("sampleId", "features")
    val e = intercept[IllegalArgumentException] {
      FmQueries.goldenModel(s).transform(input)
    }
    e.getMessage should include("sampleId")
  }

  test("carry-through preserves input columns and their values") {
    val s = spark
    import s.implicits._
    val input = Seq((1, "payload-a", Vectors.dense(1.0, 0.0, 0.0, 0.0)))
      .toDF("rowId", "extra", "features")
    val out = FmQueries.goldenModel(s).setCarryThroughScoring(true)
      .transform(input)
    out.columns.toSeq shouldBe Seq("rowId", "extra", "features", "prediction")
    val row = out.collect()(0)
    row.getAs[String]("extra") shouldBe "payload-a"
  }
}
