package graft.functions

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

class DotProductRewriteSuite extends SparkSessionSuite {

  test("HOF dot product is rewritten to the codegen'd kernel, same values") {
    val s = spark
    // spark.range, not a Seq: ConvertToLocalRelation would fold a
    // LocalRelation-backed projection away before the plan can be
    // inspected.
    val df = s.range(50).select(
        transform(sequence(lit(0), lit(15)),
          i => i.cast("double") * 0.25 + col("id")).as("a"),
        transform(sequence(lit(0), lit(15)),
          i => i.cast("double") * 0.5 - col("id")).as("b"))
      .select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
          (acc, v) => acc + v).as("hof"),
        expr("dot_product(a, b)").as("native"))

    // the optimizer must have swapped the HOF chain for DotProduct
    val optimized = df.queryExecution.optimizedPlan
    val nDot = optimized.expressions
      .map(_.collect { case d: DotProduct => d }.size).sum
    withClue(optimized.toString) { nDot shouldBe 2 }

    // and the values are identical (both sequential folds)
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("rewrite does not fire on nullable-element arrays") {
    val s = spark
    import s.implicits._
    // Option[Double] elements => containsNull = true => no rewrite
    val df = Seq((Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(2.0), Some(3.0))))
      .toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    val nDot = df.queryExecution.optimizedPlan.expressions
      .map(_.collect { case d: DotProduct => d }.size).sum
    nDot shouldBe 0
    // null element poisons the fold -> null result, untouched semantics
    df.collect().head.isNullAt(0) shouldBe true
  }
}
