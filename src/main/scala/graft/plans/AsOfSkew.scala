package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SKEW-HARDENED as-of join — the hot-key answer for [[AsOfJoinExec]].
  *
  * The shuffle form of the native as-of join clusters both sides on the
  * raw key (`AsOfJoinExec.requiredChildDistribution`). That is the
  * minimum-movement plan for a well-distributed key, but a power-law
  * key (one user holding a double-digit share of a 100 TB event
  * corpus) serializes into ONE partition — and because the node is
  * custom, AQE's `OptimizeSkewedJoin` cannot see it, so the usual
  * runtime rescue never happens. Every other join in the engine either
  * broadcasts or inherits AQE skew handling; this wrapper closes the
  * gap for the as-of family.
  *
  * The split is TIME-SLICED, exploiting the operator's own invariant
  * (the best match for a left row at time t is the single greatest
  * right time <= t):
  *
  *   1. DETECT heavy keys from a seeded key-column sample (the
  *      [[graft.relational.AdvancedQueries.skewDiagnose]] decision, run
  *      inline): keys whose sampled share exceeds `hotKeyShare`, capped
  *      at `maxHotKeys`. Detection is an optimization, never a
  *      correctness input — splitting a cold key (false positive) or
  *      missing a warm one (false negative) changes the plan, not the
  *      answer.
  *   2. SLICE each hot key's time axis at its left-time quantiles
  *      (`percentile_approx`, so slices carry ~equal LEFT row counts —
  *      the side that dominates a skewed as-of). Slice id of a row =
  *      number of boundaries <= its time: monotone in time, so a right
  *      row in a LATER slice than a left row always has a strictly
  *      greater time and is never a candidate for it.
  *   3. CARRY-IN: a left row in slice s can still match a right row
  *      from an earlier slice — but only the single greatest-time one,
  *      by the operator's invariant. So for each (hot key, target
  *      slice) replicate exactly ONE right row: the max-time right row
  *      over all earlier slices. O(maxHotKeys × slices) extra rows
  *      total — independent of data size.
  *   4. JOIN on (key, slice) through the unchanged [[AsOfJoinExec]]:
  *      the hot key now hash-distributes over up to `slices` partitions
  *      and its merge work parallelizes, at the cost of two tiny extra
  *      jobs (sample + quantiles) and the carry-in rows.
  *
  * Tie caveat (same contract as the base operator): among duplicate
  * right (key, time) rows the winner is arbitrary; equal times always
  * land in the same slice, so splitting never changes WHICH time value
  * wins — keep right times unique per key for fully deterministic rows.
  *
  * Time columns must be `LongType` epoch-nanos (engine convention,
  * `graft.Tables.normalizeEventTime`): slice arithmetic compares raw
  * longs, and the raw-Long tolerance guard in [[AsOf.join]] applies
  * unchanged.
  */
object AsOfSkew {

  /** Tuning for hot-key detection and splitting. Defaults are sized for
    * a power-law corpus: a key only earns splitting at >= 2% of sampled
    * rows (below that, one partition holds < 2% of the data — not a
    * straggler), and 8 slices turn a 50%-share key into ~6% partitions. */
  final case class Config(
      slices: Int = 8,
      hotKeyShare: Double = 0.02,
      sampleFraction: Double = 0.05,
      maxHotKeys: Int = 64,
      seed: Long = 42L) {
    require(slices >= 2, "need at least 2 slices to split a hot key")
    require(hotKeyShare >= 0.0 && hotKeyShare <= 1.0, "hotKeyShare in [0,1]")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      "sampleFraction in (0,1]")
    require(maxHotKeys >= 1, "maxHotKeys >= 1")
  }

  private val LeftSlice = "__asof_skew_ls"
  private val RightSlice = "__asof_skew_rs"

  /** Backward as-of join ([[AsOf.join]] semantics and output, column
    * for column) with hot-key time-slice splitting. Falls back to the
    * plain plan when detection finds no hot key. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
           leftTime: String, rightTime: String,
           tolerance: Option[Long] = None,
           broadcastRight: Option[Boolean] = None,
           config: Config = Config()): DataFrame = {
    Seq(left.schema(leftTime), right.schema(rightTime)).foreach(f =>
      require(f.dataType == LongType,
        s"skew-hardened as-of requires LongType epoch-nanos time columns; " +
        s"${f.name} is ${f.dataType.simpleString} — normalize at the scan " +
        "first (graft.Tables.normalizeEventTime)"))
    val lKeys = keys.map(_._1)
    val rKeys = keys.map(_._2)

    val hot = detectHotKeys(left, lKeys, config)
    // boundaries can come back empty for a key whose left times are all
    // equal (quantiles collapse) — nothing to split there
    val bounds =
      if (hot.isEmpty) Map.empty[Seq[Any], Seq[Long]]
      else sliceBoundaries(left, lKeys, leftTime, hot, config)
        .filter(_._2.nonEmpty)
    if (bounds.isEmpty)
      return AsOf.join(left, right, keys, leftTime, rightTime, tolerance,
        broadcastRight)

    val leftSliced = left.withColumn(LeftSlice,
      sliceExpr(bounds, lKeys, col(leftTime)))
    val rightSliced = right.withColumn(RightSlice,
      sliceExpr(bounds, rKeys, col(rightTime)))

    // carry-ins: per (hot key, own slice) keep the max-time right row,
    // replicate it to every LATER slice, and per target slice keep the
    // max-time candidate — exactly the greatest right row from all
    // earlier slices, the one row a later slice's merge can still need
    val rCols = right.columns.toSeq
    val maxSlice = bounds.valuesIterator.map(_.length).max // slices range 0..maxSlice
    val hotRightPred = bounds.keysIterator
      .map(kv => keyEq(rKeys, kv)).reduce(_ || _)
    val perSlice = rightSliced
      .filter(hotRightPred && col(rightTime).isNotNull &&
        col(RightSlice) < maxSlice)
      .groupBy((rKeys.map(col) :+ col(RightSlice)): _*)
      .agg(max_by(struct(rCols.map(col): _*), col(rightTime)).as("__r"))
    val carries = perSlice
      .withColumn("__tgt",
        explode(sequence(col(RightSlice) + 1, lit(maxSlice))))
      .groupBy((rKeys.map(col) :+ col("__tgt")): _*)
      .agg(max_by(col("__r"), col("__r").getField(rightTime)).as("__r"))
      .select((rCols.map(c => col("__r").getField(c).as(c)) :+
        col("__tgt").as(RightSlice)): _*)
    val rightWithCarries = rightSliced.unionByName(carries)

    AsOf.join(leftSliced, rightWithCarries,
        keys :+ (LeftSlice -> RightSlice), leftTime, rightTime, tolerance,
        broadcastRight)
      .drop(LeftSlice, RightSlice)
  }

  /** Forward as-of with hot-key splitting — backward on negated time,
    * the [[AsOf.joinForward]] composition over the skew-safe form. */
  def joinForward(left: DataFrame, right: DataFrame,
                  keys: Seq[(String, String)],
                  leftTime: String, rightTime: String,
                  tolerance: Option[Long] = None,
                  broadcastRight: Option[Boolean] = None,
                  config: Config = Config()): DataFrame = {
    Seq(left.schema(leftTime), right.schema(rightTime)).foreach(f =>
      require(f.dataType == LongType,
        s"forward as-of requires LongType epoch-nanos time columns; " +
        s"${f.name} is ${f.dataType.simpleString}"))
    val ln = "__asof_skew_fwd_lt"
    val rn = "__asof_skew_fwd_rt"
    join(left.withColumn(ln, -col(leftTime)),
        right.withColumn(rn, -col(rightTime)),
        keys, ln, rn, tolerance, broadcastRight, config)
      .drop(ln, rn)
  }

  /** Key tuples whose sampled share of the left side exceeds the
    * threshold, heaviest first, capped. One narrow job over a seeded
    * Bernoulli sample of the key columns (column-pruned at the scan). */
  private[plans] def detectHotKeys(
      left: DataFrame, keyNames: Seq[String],
      config: Config): Seq[Seq[Any]] = {
    val keyCols = keyNames.map(col)
    val counts = left.select(keyCols: _*)
      .sample(withReplacement = false, config.sampleFraction, config.seed)
      .na.drop() // null keys never match — never worth splitting
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .persist()
    try {
      val total = Option(counts.agg(sum(col("__cnt"))).first().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      if (total == 0L) Seq.empty
      else {
        // a key below 2 sampled rows is sampling noise, never a straggler
        val threshold = math.max(2L, (total * config.hotKeyShare).toLong)
        counts.filter(col("__cnt") >= threshold)
          .orderBy((col("__cnt").desc +: keyCols): _*)
          .limit(config.maxHotKeys)
          .collect()
          .map(r => keyNames.indices.map(r.get).toSeq)
          .toSeq
      }
    } finally counts.unpersist()
  }

  /** Per hot key: its interior left-time quantiles, deduplicated and
    * sorted — the slice boundaries. One filtered aggregate job whose
    * output is O(maxHotKeys) rows. */
  private[plans] def sliceBoundaries(
      left: DataFrame, keyNames: Seq[String], timeName: String,
      hotKeys: Seq[Seq[Any]], config: Config): Map[Seq[Any], Seq[Long]] = {
    val hotPred = hotKeys.map(kv => keyEq(keyNames, kv)).reduce(_ || _)
    val qs = (1 until config.slices).map(_.toDouble / config.slices).toArray
    left.filter(hotPred && col(timeName).isNotNull)
      .groupBy(keyNames.map(col): _*)
      .agg(percentile_approx(col(timeName), lit(qs), lit(10000)).as("__bs"))
      .collect()
      .map { r =>
        val kv = keyNames.indices.map(r.get).toSeq
        val bs = r.getSeq[Long](keyNames.length).distinct.sorted
        kv -> bs
      }.toMap
  }

  private def keyEq(names: Seq[String], values: Seq[Any]): Column =
    names.zip(values).map { case (n, v) => col(n) === lit(v) }.reduce(_ && _)

  /** Slice id of a row: the number of its key's boundaries <= its time
    * (0 for non-hot keys and null times). Monotone in time per key, so
    * slice(rt) > slice(lt) implies rt > lt — later-slice right rows are
    * never candidates for an earlier-slice left row. Pure nested
    * when/sum over literals: codegen-friendly, no UDF. */
  private[plans] def sliceExpr(
      bounds: Map[Seq[Any], Seq[Long]], keyNames: Seq[String],
      time: Column): Column =
    bounds.foldLeft(when(lit(false), lit(0))) { case (acc, (kv, bs)) =>
      val slice = bs.foldLeft(lit(0)) { (sAcc, b) =>
        sAcc + when(time >= lit(b), 1).otherwise(0)
      }
      acc.when(keyEq(keyNames, kv), slice)
    }.otherwise(lit(0))
}
