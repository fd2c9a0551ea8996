package graft.fm

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.functions.col

class PersistenceAndPipelineSuite extends SparkSessionSuite {

  test("model save/load roundtrip preserves predictions (SURVEY S5 gap)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fm-model").toString
    val model = FmQueries.goldenModel(s).setMinLabel(0.0).setMaxLabel(10.0)
    model.write.overwrite().save(dir)
    val loaded = FactorizationMachinesModel.load(dir)

    loaded.dimFactorization shouldBe 3
    loaded.globalBias shouldBe 5.0
    loaded.getMinLabel shouldBe 0.0
    loaded.getMaxLabel shouldBe 10.0

    val input = Seq(
      (100, org.apache.spark.ml.linalg.Vectors.dense(1.0, 2.0, 1.5, -1.0)),
      (103, org.apache.spark.ml.linalg.Vectors.sparse(4, Seq()))
    ).toDF("rowId", "features")
    val a = model.transform(input).select("rowId", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val b = loaded.transform(input).select("rowId", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    a.keySet.foreach(k => b(k) shouldBe a(k) +- 1e-12)
  }

  test("infinite default bounds survive the roundtrip") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("fm-model-inf").toString
    FmQueries.goldenModel(s).write.overwrite().save(dir)
    val loaded = FactorizationMachinesModel.load(dir)
    loaded.getMinLabel.isNegInfinity shouldBe true
    loaded.getMaxLabel.isPosInfinity shouldBe true
  }

  test("sample feature encoding matches Sample:76-95 semantics") {
    val s = spark
    import s.implicits._
    // user 1 rated movies 2 (3.0) and 5 (1.0); user 2 rated only movie 2.
    val ratings = Seq((1, 2, 3.0), (1, 5, 1.0), (2, 2, 4.0))
      .toDF("userId", "movieId", "rating")
    val maxU = 10; val maxM = 6
    val rows = SamplePipeline.buildFeatures(ratings, maxU, maxM)
      .collect()
      .map(r => (r.getDouble(0),
        r.getAs[org.apache.spark.ml.linalg.Vector](1)))
      .sortBy(_._1)

    rows.length shouldBe 3
    // user 2 / movie 2 / rating 4.0: single rating -> no "other" features.
    val (l3, v3) = rows.last
    l3 shouldBe 4.0
    v3.size shouldBe maxU + 2 * maxM
    v3(2) shouldBe 1.0 // user one-hot
    v3(maxU + 2) shouldBe 1.0 // movie one-hot
    v3.toArray.sum shouldBe 2.0 // nothing else set
    // user 1 / movie 2 / rating 3.0: other movie 5 at weight 1/(2-1)=1.
    val (l1, v1) = rows.find(_._1 == 3.0).get
    l1 shouldBe 3.0
    v1(1) shouldBe 1.0
    v1(maxU + 2) shouldBe 1.0
    v1(maxU + maxM + 5) shouldBe 1.0
  }

  test("CrossValidator over regParam grid (M6, Sample:50-61)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val events = (0 until 300).map { i =>
      (i.toLong, rng.nextInt(40).toLong)
    }.toDF("event_id", "user_id")
    val ratings = SamplePipeline.ratingsFromEvents(events)
    // Strict headroom: ids reach 100/50, so the max pools must exceed them
    // (the reference's own encoding overflows at movieId == MaxMovieId).
    val df = SamplePipeline.buildFeatures(ratings, 101, 51)

    val fm = new FactorizationMachinesSGD()
      .setDimFactorization(2)
      .setMaxIter(2)
      .setMiniBatchFraction(0.5)
      .setMinLabel(0.5)
      .setMaxLabel(4.5)
      .setInitialSd(0.01)
      .setStepSize(0.5)
      .setSeed(11L)
    val grid = new ParamGridBuilder()
      .addGrid(fm.regParam, Array(1.0e-6, 0.0))
      .build()
    val evaluator = new RegressionEvaluator().setMetricName("mae")
    val cv = new CrossValidator()
      .setEstimator(fm).setEstimatorParamMaps(grid)
      .setEvaluator(evaluator).setNumFolds(2).setSeed(3L)

    val cvModel = cv.fit(df)
    cvModel.avgMetrics.length shouldBe 2
    all(cvModel.avgMetrics) should be >= 0.0
    all(cvModel.avgMetrics) should be < 5.0 // labels span 0.5..4.5

    val scored = cvModel.transform(df)
    val mae = evaluator.evaluate(scored)
    mae should be < 5.0
    // Clip bounds respected on the way out.
    val preds = scored.select(col("prediction")).collect().map(_.getDouble(0))
    all(preds) should (be >= 0.5 and be <= 4.5)
  }
}
