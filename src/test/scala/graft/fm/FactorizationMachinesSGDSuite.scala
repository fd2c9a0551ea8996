package graft.fm

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions.col

class FactorizationMachinesSGDSuite extends SparkSessionSuite {

  /** One SGD step against an independent plain-Scala implementation of
    * the FM gradient (correct `deltaWi·(pred − label)` form, SURVEY §7):
    * tiny batch, fixed params, no randomness on either side. */
  test("single step matches hand-computed gradient update") {
    val s = spark
    import s.implicits._

    val k = 2
    val w = Map(0 -> 0.1, 1 -> -0.2, 2 -> 0.3)
    val v = Map(
      0 -> Array(0.5, -0.5),
      1 -> Array(1.0, 0.25),
      2 -> Array(-0.75, 0.1))
    // Samples: (label, active features)
    val samples = Seq(
      (1.0, Seq(0 -> 1.0, 1 -> 2.0)),
      (0.0, Seq(1 -> 0.5, 2 -> -1.0)),
      (2.0, Seq(0 -> 1.5)))

    val est = new FactorizationMachinesSGD("t")
      .setDimFactorization(k).setStepSize(0.5).setRegParam(0.1)
      .setInitialSd(0.01).setSeed(7L)

    val params = w.keys.toSeq.sorted
      .map(id => (id, w(id), v(id)))
      .toDF("id", "strength", "vecArr")
    val batch = samples
      .map { case (l, fs) => (l, Vectors.sparse(3, fs)) }
      .toDF("label", "features")

    val Some((newParams, loss)) = est.step(params, batch, iter = 1)
    val got = newParams.collect()
      .map(r => r.getAs[Int]("id") ->
        (r.getAs[Double]("strength"), r.getAs[Seq[Double]]("vecArr").toArray))
      .toMap

    // --- independent reference implementation in plain Scala ---
    val lr = 0.5 / math.sqrt(1.0)
    val shrink = lr * 0.1
    val n = samples.size
    var expLoss = 0.0
    val gW = collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val gV = collection.mutable.Map[Int, Array[Double]]()
    samples.foreach { case (label, fs) =>
      val wixi = fs.map { case (i, x) => w(i) * x }.sum
      val vfx = Array.tabulate(k)(f => fs.map { case (i, x) => v(i)(f) * x }.sum)
      val v2x2 = fs.map { case (i, x) => v(i).map(d => d * d).sum * x * x }.sum
      val pred = 0.0 + wixi + 0.5 * (vfx.map(d => d * d).sum - v2x2)
      val r = pred - label
      expLoss += r * r
      fs.foreach { case (i, x) =>
        gW(i) += x * r
        val arr = gV.getOrElseUpdate(i, Array.fill(k)(0.0))
        (0 until k).foreach(f => arr(f) += (x * vfx(f) - v(i)(f) * x * x) * r)
      }
    }
    def soft(c: Double): Double = math.signum(c) * math.max(0.0, math.abs(c) - shrink)
    val expected = w.keys.map { i =>
      val nw = soft(w(i) - lr * gW(i) / n)
      val nv = Array.tabulate(k)(f => soft(v(i)(f) - lr * gV(i)(f) / n))
      i -> (nw, nv)
    }.toMap

    loss shouldBe expLoss +- 1e-9
    expected.foreach { case (i, (ew, ev)) =>
      got(i)._1 shouldBe ew +- 1e-9
      (0 until k).foreach(f => got(i)._2(f) shouldBe ev(f) +- 1e-9)
    }
  }

  /** E2E: loss decreases on synthetic rank-k data with known structure
    * (SURVEY §5.4). Deterministic: seeded generation + seeded training. */
  test("training reduces loss on synthetic rank-k data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    val k = 2
    val dim = 20
    val trueW = Array.fill(dim)(rng.nextGaussian() * 0.5)
    val trueV = Array.fill(dim, k)(rng.nextGaussian() * 0.3)
    val data = (0 until 400).map { _ =>
      val active = rng.shuffle((0 until dim).toList).take(3)
      val xs = active.map(_ -> (rng.nextInt(3) + 1.0)).sortBy(_._1)
      val wpart = xs.map { case (i, x) => trueW(i) * x }.sum
      val vfx = Array.tabulate(k)(f => xs.map { case (i, x) => trueV(i)(f) * x }.sum)
      val v2x2 = xs.map { case (i, x) => trueV(i).map(d => d * d).sum * x * x }.sum
      val y = wpart + 0.5 * (vfx.map(d => d * d).sum - v2x2)
      (y, Vectors.sparse(dim, xs))
    }
    val df = data.toDF("label", "features")

    val est = new FactorizationMachinesSGD()
      .setDimFactorization(k)
      .setMaxIter(10)
      .setStepSize(0.2)
      .setRegParam(1e-6)
      .setInitialSd(0.01)
      .setSeed(99L)
    val model = est.fit(df)
    val losses = est.lastLossHistory
    losses.size shouldBe 10

    // Each iteration's loss is on a different disjoint mini-batch, so the
    // sequence is noisy — the robust learning signal is full-data MSE
    // against the predict-zero baseline (initial weights ~ N(0, 0.01)).
    val scored = model.transform(df)
      .select(col("label"), col("prediction")).collect()
    val mse = scored.map { r =>
      val d = r.getDouble(0) - r.getDouble(1); d * d
    }.sum / scored.length
    val baseline = data.map { case (y, _) => y * y }.sum / data.size

    mse should be < baseline * 0.5

    // Warm start: continuing from the trained model must not be worse
    // than the cold model, and must run through the same loop shape.
    val warm = new FactorizationMachinesSGD()
      .setDimFactorization(k).setMaxIter(5).setStepSize(0.1)
      .setRegParam(1e-6).setInitialSd(0.01).setSeed(123L)
      .setInitialModel(model)
    val model2 = warm.fit(df)
    val scored2 = model2.transform(df)
      .select(col("label"), col("prediction")).collect()
    val mse2 = scored2.map { r =>
      val dd = r.getDouble(0) - r.getDouble(1); dd * dd
    }.sum / scored2.length
    mse2 should be < baseline * 0.5
  }

  /** Opt-in intercept training (r6): on labels with a large constant
    * offset — the case the reference's fixed w0 = 0.0 silently mishandles
    * (SURVEY M2) — fitIntercept must learn a bias near the offset and
    * beat the interceptless model, while the default stays reference-
    * parity (w0 exactly 0.0, untouched by the loop). */
  test("fitIntercept learns a constant label offset") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val dim = 12
    val offset = 5.0
    val trueW = Array.fill(dim)(rng.nextGaussian() * 0.2)
    val data = (0 until 300).map { _ =>
      val active = rng.shuffle((0 until dim).toList).take(3)
      val xs = active.map(_ -> (rng.nextInt(3) + 1.0)).sortBy(_._1)
      val y = offset + xs.map { case (i, x) => trueW(i) * x }.sum
      (y, Vectors.sparse(dim, xs))
    }
    val df = data.toDF("label", "features")

    // Strong L1: the soft-threshold keeps the feature weights from
    // absorbing the constant offset (w0 is never regularized), so the
    // ONLY way to fit these labels is a trained bias — isolating
    // exactly what fitIntercept adds.
    def fitMse(intercept: Boolean): (Double, Double) = {
      val est = new FactorizationMachinesSGD()
        .setDimFactorization(2).setMaxIter(8).setMiniBatchFraction(0.125)
        .setStepSize(0.5).setRegParam(0.3).setInitialSd(0.01).setSeed(11L)
        .setFitIntercept(intercept)
      val model = est.fit(df)
      val scored = model.transform(df)
        .select(col("label"), col("prediction")).collect()
      val mse = scored.map { r =>
        val d = r.getDouble(0) - r.getDouble(1); d * d
      }.sum / scored.length
      (model.globalBias, mse)
    }
    val (w0Off, mseOff) = fitMse(intercept = false)
    val (w0On, mseOn) = fitMse(intercept = true)

    w0Off shouldBe 0.0 // reference parity: the loop never touches w0
    // the bias must travel decisively toward the planted offset (the
    // 1/sqrt(iter) decay and the first iterations' weight overshoot —
    // the weights chase the offset too until L1 reins them in — cap the
    // travel at ~2.3 of 5.0 in 8 iterations)…
    w0On should be > 2.0
    // …and the intercept model must fit the offset data far better
    mseOn should be < mseOff * 0.5
  }
}
