package graft.relational

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzzes the chunk-replication range-join shape against a naive
  * in-memory reference: interval endpoints are drawn ON and AROUND
  * chunk boundaries (the off-by-one hotspot — an interval ending
  * exactly at a boundary must not match a point in the next chunk, one
  * starting at a boundary must). */
class RangeJoinPropertySuite extends SparkSessionSuite {

  private val Chunk = 100L

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(777L + i)))

  // values clustered near multiples of the chunk width
  private val nearBoundary: Gen[Long] = for {
    base <- Gen.choose(0L, 5L)
    off <- Gen.oneOf(-2L, -1L, 0L, 1L, 2L, 37L)
  } yield base * Chunk + off + 2 // keep >= 0

  test("bucketized containment matches the naive reference at boundaries") {
    val s = spark
    import s.implicits._
    val cases = samples(
      for {
        nIv <- Gen.choose(0, 12)
        ivs <- Gen.listOfN(nIv, for {
          st <- nearBoundary
          len <- Gen.oneOf(1L, Chunk - 1, Chunk) // width <= chunk
        } yield (st, st + len))
        nPt <- Gen.choose(0, 40)
        pts <- Gen.listOfN(nPt, nearBoundary)
      } yield (ivs.zipWithIndex, pts), 40)

    cases.zipWithIndex.foreach { case ((ivs, pts), ci) =>
      val expected = ivs.map { case ((st, en), id) =>
        id.toLong -> pts.count(p => p >= st && p < en).toLong
      }.toMap

      val iv = ivs.map { case ((st, en), id) => (id.toLong, st, en) }
        .toDF("ok", "s", "e")
      val ivc = iv.select(col("ok"), col("s"), col("e"),
        explode(array_distinct(array(
          expr(s"s DIV ${Chunk}L"), expr(s"(e - 1) DIV ${Chunk}L")))).as("c"))
      val ptsDf = pts.toDF("p").withColumn("c", expr(s"p DIV ${Chunk}L"))
      val joined = ivc.join(ptsDf, Seq("c"))
        .filter(col("p") >= col("s") && col("p") < col("e"))
        .groupBy(col("ok")).agg(count(lit(1)).as("n"))
      val got = iv.select(col("ok")).join(joined, Seq("ok"), "left_outer")
        .select(col("ok"), coalesce(col("n"), lit(0L)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      withClue(s"case $ci ivs=$ivs pts=$pts\n") {
        got shouldBe expected
      }
    }
  }
}
