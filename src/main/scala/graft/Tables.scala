package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * All queries in this engine take `(SparkSession, sfDir)` and load inputs
  * through here, so the scan layer stays in one place (schema pruning and
  * filter pushdown are left to Catalyst — see `.explain` checks in tests).
  *
  * This is also where PHYSICAL-TYPE NORMALIZATION lives: parquet
  * producers disagree on timestamp physical types (TIMESTAMP(NANOS)
  * surfaces as a nanos long under `spark.sql.legacy.parquet.nanosAsLong`;
  * `timestamp[us]` surfaces as TIMESTAMP/TIMESTAMP_NTZ), and every
  * event-time operator downstream assumes ONE shape. Normalizing at the
  * scan means a producer-side type change is absorbed in one place
  * instead of failing in every consumer.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Engine-wide convention: event time is a `LongType` of epoch-NANOS.
    * Accepts any of the physical shapes a parquet producer may emit for
    * an instant column and rewrites to that convention:
    *   - `LongType`      — already epoch-nanos (TIMESTAMP(NANOS) via the
    *                       `nanosAsLong` legacy flag, or a raw long);
    *   - `TimestampType` / `TimestampNTZType` — micros in the long slot;
    *                       ×1000 to nanos. Sessions are pinned UTC
    *                       (Bench/Verify/tests), so the NTZ→instant cast
    *                       is the identity on the stored value — the
    *                       same value DuckDB's `epoch_ns(ts)` oracle
    *                       sees.
    * Anything else fails with ONE clear diagnostic here rather than N
    * scattered runtime errors downstream. */
  def normalizeEventTime(df: DataFrame, column: String, table: String): DataFrame =
    df.schema(column).dataType match {
      case LongType => df
      case TimestampType =>
        // instant type: unix_micros reads the stored micros directly,
        // timezone-independent
        df.withColumn(column, unix_micros(col(column)) * 1000L)
      case TimestampNTZType =>
        // the NTZ→instant cast interprets the wall-clock value in the
        // session timezone — only the identity under UTC. A consumer
        // session that forgot the UTC pin would get silently
        // timezone-shifted epoch-nanos (r9 advice: the same
        // silent-corruption class as the physical-type drift this
        // layer exists to stop), so fail loudly instead.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"$table.$column is TIMESTAMP_NTZ and the session timezone is " +
          s"'$tz': the NTZ→instant conversion is only value-preserving " +
          "under UTC. Set spark.sql.session.timeZone=UTC (the engine " +
          "convention — Bench/Verify/tests all pin it).")
        df.withColumn(column,
          unix_micros(col(column).cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"fixture schema drift: $table.$column has unsupported type " +
        s"${other.simpleString}; expected one of bigint (epoch-nanos), " +
        "timestamp, timestamp_ntz. Regenerated fixtures with a new " +
        "physical type need a normalization rule here (Tables.scala).")
    }

  /** Expected logical layout of each fixture table (TESTDATA.md), as
    * `column -> acceptable Spark types` (`DataType.simpleString`).
    * Instant columns accept every physical shape the normalization
    * layer handles — parquet producers legitimately vary there (round 8:
    * a driver-side regeneration moved `events.ts` from TIMESTAMP(NANOS)
    * to `timestamp[us]`); everything else is pinned exactly. */
  val fixtureContract: Map[String, Seq[(String, Set[String])]] = {
    val instant = Set("bigint", "timestamp", "timestamp_ntz")
    Map(
      "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
      "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
        "n_regionkey" -> Set("int")),
      "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
        "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set("string")),
      "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
        "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
      "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
        "p_brand" -> Set("string"), "p_type" -> Set("string"),
        "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
      "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
        "o_orderdate" -> instant, "o_orderpriority" -> Set("string")),
      "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
        "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> instant),
      "events" -> Seq("event_id" -> Set("bigint"), "ts" -> instant,
        "user_id" -> Set("bigint"), "event_type" -> Set("string"),
        "value" -> Set("double"), "props" -> Set("string")),
      "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"),
        "n_chars" -> Set("bigint")),
      "embeddings" -> Seq("vec_id" -> Set("bigint"),
        "embedding" -> Set("array<float>"), "label" -> Set("int")))
  }

  /** Checks every fixture table under `dir` against [[fixtureContract]]
    * and returns ONE human-readable issue per divergence (empty = all
    * good). Run by the fixture-guard suite so a driver-side fixture
    * regeneration that shifts a physical type fails as a single clear
    * diagnostic instead of N scattered per-query runtime errors (how
    * round 8's `events.ts` change first surfaced). */
  def fixtureSchemaIssues(spark: SparkSession, dir: String): Seq[String] =
    names.flatMap { t =>
      try {
        val fields = apply(spark, dir, t).schema.fields
        val expected = fixtureContract(t)
        if (fields.map(_.name).toSeq != expected.map(_._1))
          Seq(s"$t: columns [${fields.map(_.name).mkString(", ")}] != " +
            s"expected [${expected.map(_._1).mkString(", ")}]")
        else expected.zip(fields).collect {
          case ((n, ok), f) if !ok.contains(f.dataType.simpleString) =>
            s"$t.$n: type ${f.dataType.simpleString} not in " +
              s"{${ok.mkString(", ")}}"
        }
      } catch {
        case e: Throwable => Seq(s"$t: unreadable (${e.getMessage})")
      }
    }

  /** The reverse-drift twin of [[normalizeEventTime]]: instant columns
    * the queries consume AS TIMESTAMPS (`o_orderdate`, `l_shipdate` —
    * compared against timestamp literals, bucketed in micros) are
    * normalized to `TIMESTAMP_NTZ`, the shape the current
    * `timestamp[us]` fixtures surface. If a regeneration flipped them
    * to TIMESTAMP(NANOS), the `nanosAsLong` session flag would surface
    * a raw long and every date comparison would break the way the
    * event-time surface broke in round 8 — this absorbs that at the
    * scan (nanos long → micros timestamp, exact for the fixtures'
    * whole-second values; sessions pinned UTC make the tz-family casts
    * identity on the stored value). */
  def normalizeInstantColumn(df: DataFrame, column: String, table: String): DataFrame =
    df.schema(column).dataType match {
      case TimestampNTZType => df
      case TimestampType =>
        df.withColumn(column, col(column).cast(TimestampNTZType))
      case LongType => // epoch-nanos long (TIMESTAMP(NANOS) via nanosAsLong)
        df.withColumn(column,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"`$column` DIV 1000"))
            .cast(TimestampNTZType))
      case other => throw new IllegalStateException(
        s"fixture schema drift: $table.$column has unsupported type " +
        s"${other.simpleString}; expected timestamp, timestamp_ntz, or " +
        "bigint (epoch-nanos). Regenerated fixtures with a new physical " +
        "type need a normalization rule here (Tables.scala).")
    }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeInstantColumn(apply(s, d, "orders"), "o_orderdate", "orders")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeInstantColumn(apply(s, d, "lineitem"), "l_shipdate", "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTime(apply(s, d, "events"), "ts", "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Fingerprint of `$d/$table.parquet` (names, sizes, mtimes of its
    * data files) — THE fixture-freshness convention: every
    * stage-if-missing reuse (bucketed as-of tables, streaming staging
    * markers) validates a stored copy of this against the live
    * fixture, so a regenerated fixture restages instead of silently
    * serving the prior generation (the round-8 staleness class). One
    * definition; consumers delegate (r11 review — two private copies
    * had already appeared). */
  private[graft] def fixtureFingerprint(s: SparkSession, d: String,
      table: String): String =
    pathFingerprint(s, new org.apache.hadoop.fs.Path(s"$d/$table.parquet"))

  /** The same freshness fingerprint for an ARBITRARY file or directory
    * root (r13 verdict #4: the collapse pre-pass memo keys on the files
    * its plan scans, which are not always fixture tables). */
  private[graft] def pathFingerprint(s: SparkSession,
      p: org.apache.hadoop.fs.Path): String = {
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // RECURSIVE listing (r11 advice): a top-level-only list rendered a
    // nested/partitioned layout as `name:0:mtime` directory entries, so
    // a regeneration that only rewrote files INSIDE subdirectories
    // could false-match and silently serve the prior generation — the
    // exact staleness class this helper exists to close. listFiles
    // returns only leaf FILES with their full path, so every nested
    // data file participates (keyed by path relative to the table root
    // — stable across table relocation, unique within it).
    val root = p.toUri.getPath
    // hidden-entry rule on EVERY path segment of the table-relative
    // path, not just the leaf name (r12 advice): a recursive listing
    // sees files INSIDE hidden directories (e.g. a _temporary/ tree a
    // crashed writer left behind), and a leaf-only filter would let
    // that residue perturb the staleness checksum. Matches Spark's own
    // listing convention (`_` and `.` prefixes are invisible).
    def hidden(rel: String): Boolean = rel.split('/')
      .exists(seg => seg.startsWith("_") || seg.startsWith("."))
    val stats =
      if (fs.getFileStatus(p).isDirectory) {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.LocatedFileStatus]
        while (it.hasNext) buf += it.next()
        buf.toSeq
      } else Seq(fs.getFileStatus(p))
    stats
      .map(st => (st.getPath.toUri.getPath.stripPrefix(root), st))
      .filterNot { case (rel, _) => hidden(rel.stripPrefix("/")) }
      .sortBy(_._1)
      .map { case (rel, st) =>
        s"$rel:${st.getLen}:${st.getModificationTime}" }
      .mkString(";")
  }
}

/** Session-level execution knobs shared across modules. */
object Knobs {
  /** Run independent Spark actions concurrently and wait for all
    * (guide §2.6 — lifecycle verbs and foreachBatch bodies issue
    * several mutually independent writes whose cost is commit-protocol
    * latency, not compute; overlapping them back-fills idle cores). A
    * FRESH pool per call: worker threads are created from the calling
    * thread during submit, so Spark's inheritable thread-locals (job
    * group / description — what the bench's cpu attribution keys on)
    * propagate correctly, which a shared lazy pool would get wrong
    * after its first use. The first failure propagates after all
    * actions settle. */
  private[graft] def concurrently(actions: (() => Unit)*): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      actions.length,
      (r: Runnable) => {
        val t = new Thread(r, "graft-verb-write")
        t.setDaemon(true)
        t
      })
    try {
      val futs = actions.map(a =>
        java.util.concurrent.CompletableFuture.runAsync(() => a(), pool))
      try java.util.concurrent.CompletableFuture
        .allOf(futs: _*).join()
      catch {
        case e: java.util.concurrent.CompletionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    } finally pool.shutdown()
  }

  /** Runs `body` against a SCOPED child session whose single divergence
    * from `spark` is `spark.sql.shuffle.partitions` capped at `cap`.
    * For stages whose data is orders of magnitude smaller than the
    * session default assumes (streaming state stores, tiny-label
    * iteration): per-partition fixed overhead dominates there, so fewer
    * partitions are faster. A throughput knob only — semantics never
    * depend on it.
    *
    * ISOLATION (r9 advice): the parent session's conf is NEVER touched
    * — the cap lives in a `newSession()` sharing the SparkContext (and
    * cache manager), so an unrelated query running CONCURRENTLY on the
    * parent keeps the session default (the old around-body mutation
    * silently capped it; suite-pinned by a two-thread test). The body
    * receives the scoped session; rebind input frames into it with
    * [[rebind]] (inputs should be `localCheckpoint`ed first so their
    * full-parallelism upstream is already materialized), and rebind
    * lazy results back to the parent so downstream planning sees the
    * parent's conf. */
  def withShufflePartitions[T](spark: SparkSession, cap: Int)(
      body: SparkSession => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val scoped = spark.newSession()
    // newSession() starts from the context defaults, not the parent's
    // runtime-set values: carry those over so the ONLY divergence is
    // the cap (static/non-modifiable entries are skipped)
    spark.conf.getAll.foreach { case (k, v) =>
      copyConfEntry(scoped.conf.set(_: String, _: String), k, v)
    }
    scoped.conf.set(key,
      math.min(cap, spark.conf.get(key).toInt).toString)
    body(scoped)
  }

  /** One conf entry of the [[withShufflePartitions]] carry-over. ONLY
    * the rejections `RuntimeConfig.set` actually raises for entries a
    * child session may not take are swallowed — `AnalysisException`
    * ("Cannot modify the value of a static/Spark config") and
    * `IllegalArgumentException` (an entry invalid for this session).
    * Everything else — interrupts, OOM, any genuine fault mid-copy —
    * propagates (r10 verdict #5: the old `case _: Throwable` hid
    * those too). */
  private[graft] def copyConfEntry(
      set: (String, String) => Unit, k: String, v: String): Unit =
    try set(k, v)
    catch {
      case _: org.apache.spark.sql.AnalysisException => ()
      case _: IllegalArgumentException => ()
    }

  /** Transplants `df`'s logical plan into session `to` (same logical
    * result; planning/execution under `to`'s conf). Works for batch and
    * streaming frames; a `localCheckpoint`ed input rebinds as its
    * materialized RDD. */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    org.apache.spark.sql.graftshim.Shim.ofRows(to, df.queryExecution.logical)
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
