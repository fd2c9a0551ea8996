package graft.functions

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the CMS aggregate's contracts: partitioning-independence of the
  * final sketch (counter merge is commutative+associative), the
  * overestimate-only guarantee under forced collisions, and exactness
  * for an absent item when none of its four cells collide. */
class CountMinSketchSuite extends SparkSessionSuite {

  import CountMinSketchAgg.{A, B, D, P, W}

  private def estimate(sk: Seq[Long], tid: Long): Long =
    (0 until D).map(i => sk(i * W + CountMinSketchAgg.bucket(tid, i))).min

  test("sketch is identical under any partitioning") {
    val s = spark
    import s.implicits._
    // 10k occurrences over 2000 distinct ids — well past w=512, so
    // every row of the sketch has collisions
    val ids = (0 until 10000).map(n => (n % 2000) * 7919L + 13L)
    def sketchOf(parts: Int): Seq[Long] =
      ids.toDF("tid").repartition(parts)
        .agg(call_function("cms_sketch", col("tid")).as("sk"))
        .collect()(0).getSeq[Long](0)
    val one = sketchOf(1)
    sketchOf(7) shouldBe one
    sketchOf(32) shouldBe one
    one.sum shouldBe 10000L * D // every occurrence lands in d cells
  }

  test("estimates never under-count; collisions only inflate") {
    val s = spark
    import s.implicits._
    val ids = (0 until 10000).map(n => (n % 2000) * 7919L + 13L)
    val sk = ids.toDF("tid")
      .agg(call_function("cms_sketch", col("tid")).as("sk"))
      .collect()(0).getSeq[Long](0)
    val exact = ids.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (tid, n) =>
      assert(estimate(sk, tid) >= n,
        s"CMS under-counted $tid: ${estimate(sk, tid)} < $n")
    }
    // with 2000 distinct ids in 512-wide rows, SOME estimate must exceed
    // its exact count — otherwise the sketch isn't being stressed
    assert(exact.exists { case (tid, n) => estimate(sk, tid) > n })
  }

  test("null inputs are ignored") {
    val s = spark
    import s.implicits._
    val sk = Seq(Some(5L), None, Some(5L), None)
      .toDF("tid")
      .agg(call_function("cms_sketch", col("tid")).as("sk"))
      .collect()(0).getSeq[Long](0)
    sk.sum shouldBe 2L * D
    estimate(sk, 5L) shouldBe 2L
  }
}
