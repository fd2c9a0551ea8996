package graft.functions

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** The native FM array expressions must be BIT-identical to the
  * higher-order-function constructions they replace — the SGD/score
  * oracles gate exact doubles, so "close" is not enough. Compared via
  * the raw bits of every element over adversarial values (negative,
  * zero, ±subnormal-scale, large magnitudes, shrinkage above/below
  * |c|). */
class FmArrayOpsSuite extends SparkSessionSuite {

  private def randArr(rng: scala.util.Random, n: Int): Seq[Double] =
    (0 until n).map { _ =>
      val m = rng.nextInt(5) match {
        case 0 => 0.0
        case 1 => -0.0
        case 2 => rng.nextDouble() * 1e-12
        case 3 => rng.nextDouble() * 1e9
        case _ => rng.nextGaussian()
      }
      if (rng.nextBoolean()) m else -m
    }

  test("fm_arr_scale / fm_sq_sum / fm_grad_v / fm_soft_update equal the HOF forms bitwise") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(31)
    val rows = (0 until 400).map { i =>
      val k = 1 + rng.nextInt(8)
      (i.toLong, randArr(rng, k), randArr(rng, k),
        rng.nextGaussian() * 10, rng.nextGaussian() * 100,
        math.abs(rng.nextGaussian()))
    }
    val df = rows.toDF("id", "vec", "vfs", "x", "r", "shrink")

    // Compare through collected doubles' raw bits (driver-side), which
    // avoids needing a bits() SQL function.
    val got = df.select(
      col("id"),
      expr("fm_arr_scale(vec, x)").as("n_scale"),
      transform(col("vec"), v => v * col("x")).as("h_scale"),
      expr("fm_sq_sum(vec)").as("n_sq"),
      aggregate(col("vec"), lit(0.0), (a, v) => a + v * v).as("h_sq"),
      expr("fm_grad_v(vec, vfs, x, r)").as("n_gv"),
      // scalatest Matchers also defines `size`; qualify Spark's.
      transform(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("vec")) - 1),
        f => (col("x") * element_at(col("vfs"), f + 1)
          - element_at(col("vec"), f + 1) * col("x") * col("x")) * col("r"))
        .as("h_gv"),
      expr("fm_soft_update(vec, vfs, shrink)").as("n_soft"),
      zip_with(col("vec"), col("vfs"), (v, g) => {
        val c = v - g
        signum(c) * greatest(lit(0.0), abs(c) - col("shrink"))
      }).as("h_soft")).collect()

    def b(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    got.foreach { row =>
      val id = row.getLong(0)
      withClue(s"row $id scale: ") {
        row.getSeq[Double](1).map(b) shouldBe row.getSeq[Double](2).map(b)
      }
      withClue(s"row $id sq_sum: ") {
        b(row.getDouble(3)) shouldBe b(row.getDouble(4))
      }
      withClue(s"row $id grad_v: ") {
        row.getSeq[Double](5).map(b) shouldBe row.getSeq[Double](6).map(b)
      }
      withClue(s"row $id soft_update: ") {
        row.getSeq[Double](7).map(b) shouldBe row.getSeq[Double](8).map(b)
      }
    }
  }
}
