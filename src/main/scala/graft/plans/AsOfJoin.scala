package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.DataFrame

/** AS-OF JOIN as a first-class operator — the (c)-level extension point:
  * a custom `LogicalPlan` planned by [[AsOfStrategy]] into
  * [[AsOfJoinExec]], registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * `graft.functions.GraftExtensions`).
  *
  * Semantics (backward as-of, left outer — the semantics of DuckDB's
  * `ASOF LEFT JOIN l.t >= r.t` and pandas `merge_asof`): for every left
  * row, attach the right row with the same key and the greatest
  * `rightTime <= leftTime`; null-extend when no such row exists. A null
  * in any key or time column never matches (SQL predicate semantics).
  *
  * The reference has no as-of operator at all (nearest-event lookups
  * would require a blow-up join; cf. the join inventory in SURVEY §2.3,
  * ref `FactorizationMachinesModel.scala:79-86`); Spark itself only
  * offers the union+window emulation (our `adv_asof_join`). This node
  * gives the semantics a dedicated physical shape: co-partition both
  * sides on the key, sort each partition once on (key, time), and merge
  * in a single streaming pass holding ONE buffered row — no window
  * state, no per-key materialization, no row duplication. At 100 TB
  * that is two shuffles (one per side, the minimum possible) and O(1)
  * memory per partition beyond the sort.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    broadcastRight: Option[Boolean] = None) extends BinaryNode {

  require(leftKeys.length == rightKeys.length,
    "as-of join needs the same number of keys on both sides")

  // right side is null-extended (left outer semantics)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[BroadcastAsOfJoinExec]] when the right
  * side fits the session's broadcast threshold (same stats test as
  * Spark's own JoinSelection) or the caller forced it, else the
  * shuffle-sort-merge [[AsOfJoinExec]]. `broadcastRight = Some(false)`
  * pins the shuffle form regardless of stats. Injected via
  * `injectPlannerStrategy`. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, bcast) =>
      val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val broadcast = bcast.getOrElse(thr > 0 && r.stats.sizeInBytes <= thr)
      if (broadcast)
        BroadcastAsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor for the as-of join. */
object AsOf {
  /** `left` as-of joins `right` on equal `keys` with the most recent
    * `rightTime <= leftTime`; with `tolerance = Some(t)` the match must
    * additionally satisfy `leftTime - rightTime <= t` (in the time
    * column's native unit — pandas `merge_asof(tolerance=...)`
    * semantics). Column names must be disjoint between the two sides
    * (rename before joining, as with any Spark self-join).
    *
    * The right plan's attributes are re-aliased with fresh expression
    * ids so self-joins (both sides reading the same table) bind
    * correctly.
    */
  /** `broadcastRight`: None (default) lets the planner choose by the
    * right side's size statistics vs `autoBroadcastJoinThreshold`;
    * Some(true)/Some(false) force the broadcast / shuffle form. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
           leftTime: String, rightTime: String,
           tolerance: Option[Long] = None,
           broadcastRight: Option[Boolean] = None): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"as-of join requires disjoint column names; " +
      s"shared: ${dup.mkString(", ")}")
    val lPlan = left.queryExecution.analyzed
    // fresh expr-ids on the right so self-joins do not alias each other
    val rAliases = right.queryExecution.analyzed.output
      .map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    val rOut = rAliases.map(_.toAttribute)
    def res(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${out.map(_.name).mkString(", ")}"))
    val node = AsOfJoin(
      lPlan, rPlan,
      keys.map { case (l, _) => res(lPlan.output, l) },
      keys.map { case (_, r) => res(rOut, r) },
      res(lPlan.output, leftTime), res(rOut, rightTime), tolerance,
      broadcastRight)
    org.apache.spark.sql.graftshim.Shim.ofRows(left.sparkSession, node)
  }
}
