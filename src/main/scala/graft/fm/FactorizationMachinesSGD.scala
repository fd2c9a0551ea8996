package graft.fm

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Mini-batch SGD trainer for distributed Factorization Machines —
  * the reference's FactorizationMachinesSGD.scala re-designed Spark-first
  * (SURVEY §3.1, §7.4). Semantics preserved:
  *
  *   - model parameters stay distributed end-to-end; the driver never
  *     holds a weight (README.md:7-8);
  *   - `randomSplit(Array.fill(maxIter)(miniBatchFraction), seed)` with its
  *     weight-normalization quirk (SGD:111-112, SURVEY D3): batches are
  *     disjoint and each is ~1/maxIter of the data;
  *   - per-iteration learning rate `stepSize / sqrt(iter)` (SGD:121) and
  *     L1 soft-thresholding with `shrinkage = lr * regParam` (SGD:122,
  *     177-181) applied to every feature every iteration;
  *   - gradient-descent update `θ ← θ − lr · Σ_batch grad / n` via a
  *     per-feature reduction joined full-outer back onto the parameter
  *     table with zero defaults (SGD:148-176);
  *   - the global bias w0 defaults to 0.0 and untrained (SGD:246,
  *     SURVEY M2 — reference parity); `setFitIntercept(true)` (r6)
  *     opts into training it by the batch-mean residual gradient
  *     `w0 ← w0 − lr·Σ_batch residual / n` each iteration (no L1 on
  *     the intercept — shrinking the bias toward 0 is never wanted).
  *     The residual sum rides the per-sample stage the gradient pass
  *     already computes; per-sample residuals are exact dyadic
  *     rationals under the oracle fixtures, so Σ is order-independent
  *     and the update stays hash-checkable.
  *
  * Deliberate divergences (each flagged in SURVEY §7):
  *   - the reference's gradient `deltaWi·pred − label` (SGD:145) is an
  *     operator-precedence bug; we compute the correct FM gradient
  *     `deltaWi · (pred − label)`;
  *   - random init is a *deterministic* hash-gaussian of
  *     (featureId, seed) instead of unseeded `Random.nextGaussian`
  *     (SGD:235-240, Model:144-146, 170): recomputation of any lineage
  *     re-derives identical weights, making training reproducible;
  *   - per-sample sums use k scalar window sums over codegen'd
  *     `element_at` projections instead of a UDAF-over-window (FM:45-81,
  *     Model:191) — one shuffle per iteration for the sample-side pass;
  *   - the new parameter table is eagerly materialized (and
  *     local-checkpointed every `checkpointEvery` iterations) before the
  *     old one is unpersisted, so lineage cannot grow across iterations
  *     (the reference unpersisted lazily and recomputed chains,
  *     SURVEY §3.1 step 5).
  *
  * Scale notes (100 TB): per iteration the exploded batch shuffles once
  * by sampleId (window pass) and once by featureId (gradient reduction +
  * parameter join). Parameter tables shuffle on featureId — co-partitioned
  * with the gradient reduction by construction. Popular-feature skew in
  * the featureId shuffle is handled by AQE skew splitting; the sample-side
  * window partitions are bounded by the number of active features per
  * sample.
  */
class FactorizationMachinesSGD(override val uid: String)
  extends Estimator[FactorizationMachinesModel]
  with FactorizationMachinesParams {

  def this() = this(Identifiable.randomUID("fmSGD"))

  def setDimFactorization(value: Int): this.type = set(dimFactorization, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setMaxIter(value: Int): this.type = set(maxIter, value)
  def setMiniBatchFraction(value: Double): this.type = set(miniBatchFraction, value)
  def setRegParam(value: Double): this.type = set(regParam, value)
  def setStepSize(value: Double): this.type = set(stepSize, value)
  def setMinLabel(value: Double): this.type = set(minLabel, value)
  def setMaxLabel(value: Double): this.type = set(maxLabel, value)
  def setInitialSd(value: Double): this.type = set(initialSd, value)
  def setSeed(value: Long): this.type = set(seed, value)
  def setFitIntercept(value: Boolean): this.type = set(fitIntercept, value)

  /** Per-iteration training losses of the last `fit` (Σ_batch (ŷ−y)²,
    * reference SGD:134-139), for diagnostics and tests. */
  @volatile var lastLossHistory: Seq[Double] = Seq.empty

  /** Warm-start source: when set, `fit` resumes from this model's
    * parameter tables instead of the hash-gaussian init (features absent
    * from the warm model still lazy-init deterministically inside the
    * loop). A capability the reference lacks — its fit always re-inits
    * (SGD:80). */
  @volatile private var initialModel: Option[FactorizationMachinesModel] = None
  def setInitialModel(model: FactorizationMachinesModel): this.type = {
    initialModel = Some(model); this
  }

  // NOTE on lineage: `params` is referenced TWICE per iteration (the
  // exploded left-outer join and the full-outer merge), so the logical
  // plan would double in size every iteration — persist() bounds
  // recomputation but NOT plan size, and by ~8 accumulated iterations the
  // plan string alone OOMs the driver. Every iteration therefore ends in
  // an eager localCheckpoint, which truncates the plan to a leaf.

  override def copy(extra: ParamMap): Estimator[FactorizationMachinesModel] =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema, fitting = true)

  // ---------------------------------------------------------------- fit --

  override def fit(dataset: Dataset[_]): FactorizationMachinesModel = {
    transformSchema(dataset.schema)
    val k = $(dimFactorization)
    val spark = dataset.sparkSession
    import spark.implicits._

    // Column-pruned input: only (label, features) survive to the loop.
    val data = dataset
      .select(col($(labelCol)).as("label"), col($(featuresCol)).as("features"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var params = initialModel
      .map { m =>
        m.dimensionStrength.toDF()
          .join(m.factorizedInteraction.toDF(), Seq("id"))
          .select(col("id"), col("strength"),
            org.apache.spark.ml.functions.vector_to_array(col("vec")).as("vecArr"))
      }
      .getOrElse(initialParams(data))
      .persist(StorageLevel.MEMORY_AND_DISK)
    params.count() // materialize the (deterministic) init

    val batches =
      data.randomSplit(Array.fill($(maxIter))($(miniBatchFraction)), $(seed))

    // Warm starts resume the bias too; cold starts at the reference's 0.0.
    var w0 = initialModel.map(_.globalBias).getOrElse(0.0)
    val losses = ArrayBuffer.empty[Double]
    batches.zipWithIndex.foreach { case (batch, idx) =>
      val iter = idx + 1
      stepW0(params, batch, iter, w0) match {
        case Some((newParams, loss, newW0)) =>
          params.unpersist() // newParams is already materialized by step()
          params = newParams
          w0 = newW0
          losses += loss
          logInfo(s"FM SGD iteration $iter/${$(maxIter)}: loss=$loss")
        case None =>
          logWarning(s"FM SGD iteration $iter/${$(maxIter)}: empty mini-batch")
      }
    }
    lastLossHistory = losses.toSeq
    data.unpersist()

    val strengths = params.select(col("id"), col("strength")).as[Strength]
    val factors = params
      .select(col("id"), array_to_vector(col("vecArr")).as("vec"))
      .as[FactorizedInteraction]
    val model = new FactorizationMachinesModel(uid, k, w0, strengths, factors)
      .setMinLabel($(minLabel)).setMaxLabel($(maxLabel))
      .setFeaturesCol($(featuresCol)).setPredictionCol($(predictionCol))
      .setSampleIdCol($(sampleIdCol))
    copyValues(model.setParent(this))
    model
  }

  // ------------------------------------------------------------ internals --

  /** Deterministic standard gaussian from hashes of (tag, id, f, seed) via
    * Box–Muller — replaces the reference's unseeded Random draws. Pure
    * Catalyst expressions: identical on every recomputation and executor. */
  private[fm] def hashGaussian(id: Column, f: Column, seedVal: Long): Column = {
    def uniform(tag: String): Column =
      (pmod(xxhash64(lit(tag), id, f, lit(seedVal)), lit(1000000L))
        .cast("double") + lit(0.5)) / lit(1000000.0)
    sqrt(lit(-2.0) * org.apache.spark.sql.functions.log(uniform("bm-u1"))) *
      cos(lit(2.0 * math.Pi) * uniform("bm-u2"))
  }

  /** Initial combined parameter table (id, strength, vecArr) over the
    * distinct feature universe of the input — reference SGD:218-252 with
    * seeded init. */
  private[fm] def initialParams(data: DataFrame): DataFrame = {
    val k = $(dimFactorization)
    val sd = $(initialSd)
    val s = $(seed)
    data
      .select(inline(FactorizationMachinesModel.activeEntries(col("features"))))
      .select(col("featureId").as("id"))
      .distinct()
      .select(
        col("id"),
        (hashGaussian(col("id"), lit(-1), s) * sd).as("strength"),
        transform(sequence(lit(0), lit(k - 1)),
          f => hashGaussian(col("id"), f, s) * sd).as("vecArr"))
  }

  /** One SGD iteration at the reference's fixed w0 = 0.0 — the shape
    * every oracle query pins. See [[stepW0]]. */
  private[fm] def step(
      params: DataFrame, batch: DataFrame, iter: Int): Option[(DataFrame, Double)] =
    stepW0(params, batch, iter, 0.0).map { case (p, l, _) => (p, l) }

  /** One SGD iteration: returns the updated combined parameter table —
    * already eagerly local-checkpointed (materialized + plan truncated;
    * see the lineage note above) so the caller can immediately drop the
    * previous table — the batch loss, and the (possibly updated) global
    * bias. w0 enters the training prediction; it is only UPDATED when
    * `fitIntercept` is set (by the batch-mean residual gradient, no L1).
    * None for an empty batch (SGD:126-128). */
  private[fm] def stepW0(
      params: DataFrame, batch: DataFrame, iter: Int,
      w0: Double): Option[(DataFrame, Double, Double)] = {
    val k = $(dimFactorization)
    val sd = $(initialSd)
    val sdv = $(seed)
    val lr = $(stepSize) / math.sqrt(iter)
    val shrinkage = lr * $(regParam)

    val n = batch.count()
    if (n == 0) return None

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("sampleId"))

    // explode + left-outer param join; unseen features get deterministic
    // gaussian init (Model:155-171 with the determinism fix).
    val exploded = batch
      .withColumn("sampleId", monotonically_increasing_id())
      .select(col("label"), col("sampleId"),
        inline(FactorizationMachinesModel.activeEntries(col("features"))))
      .join(params, col("featureId") === params("id"), "left_outer")
      .select(col("label"), col("sampleId"), col("featureId"),
        col("featureValue").as("x"),
        coalesce(col("strength"),
          hashGaussian(col("featureId"), lit(-1), sdv) * sd).as("strength"),
        coalesce(col("vecArr"),
          transform(sequence(lit(0), lit(k - 1)),
            f => hashGaussian(col("featureId"), f, sdv) * sd)).as("vecArr"))

    // Per-row FM terms (Model:173-181). The array math runs as the
    // codegen'd native expressions (graft.functions.FmArrayOps) when the
    // session has GraftExtensions — the HOF forms are CodegenFallback,
    // interpreted per element on every (sample, feature) row of every
    // epoch (r17, brief rule 4). Same FP order, bit-identical values
    // (oracle- and golden-gated); the HOF twin serves plain sessions.
    val terms = exploded.select(
      col("label"), col("sampleId"), col("featureId"), col("x"),
      col("vecArr"),
      (col("strength") * col("x")).as("wixi"),
      FmNative.arrScale(col("vecArr"), col("x")).as("vfxi"),
      (FmNative.sqSum(col("vecArr")) * col("x") * col("x")).as("vi2xi2"))

    // Per-sample sums broadcast back onto every feature row. Two
    // value-identical shapes (both accumulate doubles in arbitrary
    // within-sample order; the SGD oracles and golden gradient tests
    // gate bit-equality):
    //  - WINDOW (default): k+3 scalar window sums — ONE shuffle of the
    //    exploded rows on sampleId plus an in-partition sort.
    //  - GROUPBY+JOIN (env GRAFT_FM_GROUPBY_SUMS=true): partial-
    //    aggregated groupBy (small shuffle) + an equi-join back onto
    //    the exploded rows (second full shuffle, no sort).
    // Measured at sf0.1 (COVERAGE.md r5): the window form wins —
    // the join-back's second full shuffle costs more than the window
    // sort saves. Kept switchable for re-measurement on other shapes.
    val withSums = if (sys.env.get("GRAFT_FM_GROUPBY_SUMS").contains("true")) {
      val aggs = Seq(
        sum(col("wixi")).as("wixiSum"),
        sum(col("vi2xi2")).as("vi2xi2Sum"),
        count(lit(1)).as("cnt")) ++
        (0 until k).map(f => sum(element_at(col("vfxi"), f + 1)).as(s"_vfs$f"))
      val persample = terms.groupBy(col("sampleId"))
        .agg(aggs.head, aggs.tail: _*)
      terms.select(col("label"), col("sampleId"), col("featureId"),
          col("x"), col("vecArr"))
        .join(persample, Seq("sampleId"))
    } else {
      val vfCols = (0 until k).map(f =>
        sum(element_at(col("vfxi"), f + 1)).over(w).as(s"_vfs$f"))
      terms.select(
        (Seq(col("label"), col("sampleId"), col("featureId"), col("x"),
          col("vecArr"),
          sum(col("wixi")).over(w).as("wixiSum"),
          sum(col("vi2xi2")).over(w).as("vi2xi2Sum"),
          count(lit(1)).over(w).as("cnt")) ++ vfCols): _*)
    }

    val normSq = (0 until k).map(f => col(s"_vfs$f") * col(s"_vfs$f")).reduce(_ + _)
    // Training prediction is UNCLIPPED (Model:221 — calcLossGrad has no
    // clip). w0 is added only when nonzero so the default path's doubles
    // stay bit-identical to r1–r5 (0.0 + x flips a −0.0 x).
    val basePred = col("wixiSum") + lit(0.5) * (normSq - col("vi2xi2Sum"))
    val pred = if (w0 == 0.0) basePred else lit(w0) + basePred
    val fitW0 = $(fitIntercept)
    // CORRECT gradient: deltaWi·(pred − label); the reference's SGD:145
    // computes deltaWi·pred − label (precedence bug, documented).
    // sampleId rides along only when the intercept pass needs the
    // per-sample residual below.
    val interceptCols =
      if (fitW0) Seq(col("sampleId"), col("residual").as("r")) else Seq.empty
    val gradRows = withSums
      .withColumn("residual", pred - col("label"))
      .select(
        (Seq(
          col("featureId"),
          (col("x") * col("residual")).as("gw"),
          FmNative.gradV(col("vecArr"),
            array((0 until k).map(i => col(s"_vfs$i")): _*),
            col("x"), col("residual")).as("gv"),
          (col("residual") * col("residual") / col("cnt")).as("lossShare"))
          ++ interceptCols): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Batch loss Σ_samples (ŷ−y)² — computed as Σ_rows residual²/cnt in a
    // single SQL job (replaces the reference's groupBy(first)+RDD reduce,
    // SGD:134-138 / SURVEY A4+A6).
    val loss = gradRows.agg(sum(col("lossShare"))).head.getDouble(0)

    // Intercept update (opt-in): w0 ← w0 − Σ_samples residual · (lr/n).
    // The per-sample residual is replicated across a sample's exploded
    // rows bit-identically (window values), so distinct() recovers ONE
    // exact row per sample and the sum is order-independent under the
    // dyadic fixtures — same association order as the SQL twin
    // (`sum · (lr/n)`). No shrinkage: L1 never applies to the bias.
    val newW0 =
      if (!fitW0) w0
      else w0 - gradRows.select(col("sampleId"), col("r")).distinct()
        .agg(sum(col("r"))).head.getDouble(0) * (lr / n)

    // Per-feature gradient reduction (A3) then full-outer merge back onto
    // the parameter table with zero defaults + L1 soft-threshold
    // (SGD:148-181). Both sides shuffle on the feature id.
    val scale = lr / n
    val gvAgg = (0 until k).map(f =>
      (sum(element_at(col("gv"), f + 1)) * scale).as(s"_gv$f"))
    val grads = gradRows
      .groupBy(col("featureId"))
      .agg((sum(col("gw")) * scale).as("dW"), gvAgg: _*)
      .select(col("featureId"), col("dW"),
        array((0 until k).map(f => col(s"_gv$f")): _*).as("dV"))

    def soft(c: Column): Column =
      signum(c) * greatest(lit(0.0), abs(c) - lit(shrinkage))

    val zeroArr = array_repeat(lit(0.0), k)
    // Features with a gradient but no parameter row (first touch) must be
    // updated FROM the same deterministic lazy-init the forward pass used
    // — not from zero. (The reference is inconsistent here: Model:170
    // inits the forward pass randomly but SGD:171 merges against 0.0;
    // divergence documented.)
    val mergedKey = coalesce(col("id"), col("featureId"))
    val newParams = params
      .join(grads, col("id") === col("featureId"), "full_outer")
      .select(
        mergedKey.as("id"),
        soft(coalesce(col("strength"), hashGaussian(mergedKey, lit(-1), sdv) * sd)
          - coalesce(col("dW"), lit(0.0))).as("strength"),
        FmNative.softUpdate(
          coalesce(col("vecArr"),
            org.apache.spark.sql.functions.transform(
              sequence(lit(0), lit(k - 1)),
              f => hashGaussian(mergedKey, f, sdv) * sd)),
          coalesce(col("dV"), zeroArr),
          shrinkage).as("vecArr"))

    // Eager: materializes before the caller drops the old table AND cuts
    // the (otherwise exponentially duplicated) logical plan to a leaf.
    val materialized = newParams.localCheckpoint(true)
    gradRows.unpersist()
    Some((materialized, loss, newW0))
  }
}
