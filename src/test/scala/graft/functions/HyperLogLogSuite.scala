package graft.functions

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the HLL aggregate's contracts: register merge is
  * commutative+associative+IDEMPOTENT (so the sketch is identical under
  * any partitioning AND under input duplication — the property that
  * makes it a distinct counter), the estimate error bound, and null
  * handling. */
class HyperLogLogSuite extends SparkSessionSuite {

  import HyperLogLogAgg.{M, RhoCap}

  private def sketchOf(ids: Seq[Long], parts: Int): Seq[Long] = {
    val s = spark
    import s.implicits._
    ids.toDF("id").repartition(parts)
      .agg(call_function("hll_sketch", col("id")).as("sk"))
      .collect()(0).getSeq[Long](0)
  }

  private def estimate(regs: Seq[Long]): Double = {
    val zeros = regs.count(_ == 0L)
    val raw = 0.709 * M * M / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }

  test("registers are identical under any partitioning") {
    val ids = (0 until 5000).map(n => n * 7919L + 13L)
    val one = sketchOf(ids, 1)
    sketchOf(ids, 7) shouldBe one
    sketchOf(ids, 32) shouldBe one
    one.length shouldBe M
    all(one) should be <= RhoCap
  }

  test("duplication never moves a register (idempotent max)") {
    val ids = (0 until 3000).map(n => n * 104729L + 7L)
    // each id repeated 5x must give the SAME registers as once each:
    // this is what makes the sketch a DISTINCT counter
    sketchOf(ids ++ ids ++ ids ++ ids ++ ids, 16) shouldBe sketchOf(ids, 16)
  }

  test("estimate lands within the 1.04/sqrt(m) error regime") {
    // independent spreads at three cardinalities; 3 sigma ≈ 39 %
    Seq(500, 5000, 50000).foreach { n =>
      val ids = (0 until n).map(k => k * 6364136223846793005L + 1442695040888963407L)
      val est = estimate(sketchOf(ids, 8))
      val err = math.abs(est - n) / n
      assert(err < 0.39, s"HLL err $err at n=$n (est $est)")
    }
  }

  test("null inputs are ignored; empty input estimates zero") {
    val s = spark
    import s.implicits._
    val sk = Seq[Option[Long]](Some(5L), None, Some(5L))
      .toDF("id")
      .agg(call_function("hll_sketch", col("id")).as("sk"))
      .collect()(0).getSeq[Long](0)
    sk.count(_ > 0L) shouldBe 1 // one distinct value touches one register

    val empty = Seq.empty[Long]
    val skE = sketchOf(empty, 1)
    skE shouldBe Seq.fill(M)(0L)
    estimate(skE) shouldBe 0.0 // small-range: 64·ln(64/64)
  }
}
