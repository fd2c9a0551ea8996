package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * All queries in this engine take `(SparkSession, sfDir)` and load inputs
  * through here, so the scan layer stays in one place (schema pruning and
  * filter pushdown are left to Catalyst — see `.explain` checks in tests).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** Session-level execution knobs shared across modules. */
object Knobs {
  /** Runs `body` with `spark.sql.shuffle.partitions` capped at `cap`,
    * restoring the session setting afterwards. For stages whose data is
    * orders of magnitude smaller than the session default assumes
    * (streaming state stores, tiny-label iteration): per-partition fixed
    * overhead dominates there, so fewer partitions are faster. A
    * throughput knob only — semantics never depend on it. NOTE: the
    * setting is session-global while `body` runs; materialize any
    * full-parallelism upstream (localCheckpoint) BEFORE entering. */
  def withShufflePartitions[T](spark: SparkSession, cap: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, math.min(cap, prev.toInt).toString)
      body
    } finally spark.conf.set(key, prev)
  }
}

/** One verifiable query: a Spark dataflow plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet.
  *
  * Conventions that make the DuckDB hash-compare deterministic:
  *   - every computed column is aliased identically on both sides;
  *   - every query ends in an ORDER BY that is unique per row (or covers
  *     all output columns, so equal-key rows are identical rows);
  *   - floating-point aggregates are rounded on both sides, or built from
  *     values that are exact in binary FP (counts, integer-valued doubles);
  *   - no partition-dependent values (monotonically_increasing_id etc.)
  *     ever reach the output.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    prepare: Option[(SparkSession, String) => Unit] = None)

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Like [[sql]], plus an untimed setup step (fixture staging etc.):
    * Bench runs `prepare` OUTSIDE the timed region so one-time input
    * staging doesn't pollute query timings; `fn` must still stand alone
    * (stage-if-missing) because the driver may invoke it directly. */
  def sqlPrepared(name: String, oracle: String)(
      prepare: (SparkSession, String) => Unit)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), Some(prepare))

  /** Not expressible in ANSI SQL — driver records a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
