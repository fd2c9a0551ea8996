package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table — a capability entirely
  * absent from the reference (SURVEY §2.13) and added as a first-class
  * extension: watermarked tumbling/sliding window aggregations and
  * stateful sessionization via `flatMapGroupsWithState`.
  *
  * The fixture's `ts` is parquet TIMESTAMP(NANOS); sessions read it as
  * long nanos (`nanosAsLong`) and convert with integer division (`DIV`,
  * never FP division — 1.7e18 ns exceeds double's 53-bit mantissa).
  * Query outputs use epoch seconds (BIGINT) instead of timestamps so the
  * DuckDB comparison never trips on µs-vs-ns parquet schema mismatches.
  *
  * The windowed queries run REAL streaming plans (file source →
  * watermark → window agg → memory sink, AvailableNow trigger) inside
  * the driver contract, and their results hash-match batch SQL oracles.
  * Sessionization ships twice: the streaming `flatMapGroupsWithState`
  * version (tested with MemoryStream + watermark-driven timeouts, since
  * open sessions only flush on event-time timeout) and a batch
  * gaps-and-islands twin whose results ARE oracle-checkable.
  *
  * Scale notes: windowed aggs shuffle once on (window, event_type) with
  * partial aggregation upstream; sessionization shuffles once on user_id
  * and keeps one small state row per open session; watermarks bound state
  * size on unbounded streams.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** nanos-long → TimestampType (µs), via integer division. */
  def tsCol: org.apache.spark.sql.Column = timestamp_micros(expr("ts DIV 1000"))

  /** Watermarked tumbling-window aggregation (streaming or batch df). */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events.withColumn("ts2", tsCol)
      .withWatermark("ts2", "1 hour")
      .groupBy(window(col("ts2"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Watermarked sliding-window aggregation. */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events.withColumn("ts2", tsCol)
      .withWatermark("ts2", "1 hour")
      .groupBy(window(col("ts2"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  case class SessionEvent(user_id: Long, epoch: Long, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** Stateful sessionization: 30-minute inactivity gap, event-time
    * timeout. Sessions emit when the watermark passes end + gap. */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long = 1800)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_seconds(col("epoch")))
      .withWatermark("ets", "30 minutes")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.end, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_._2)
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, t, v, _) =>
              cur match {
                case Some(s) if t - s.end <= gapSeconds =>
                  // min() so a late event (within the watermark) that
                  // precedes the current session start extends it
                  // backwards, matching the batch twin. (An event older
                  // than start − gap would ideally open a separate
                  // earlier session; that reordering is bounded by the
                  // 30-min watermark and documented as approximate.)
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1, s.total + v))
                case Some(s) =>
                  out ::= SessionOut(user, s.start, s.end, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end * 1000 + gapSeconds * 1000)
            }
            out.reverseIterator
          }
      }
  }

  /** Batch sessionization twin — gaps-and-islands with window functions,
    * identical session semantics, fully oracle-checkable. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), unix_timestamp(tsCol).as("t"), col("value"))
      .withColumn("prev", lag(col("t"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev").isNull || col("t") - col("prev") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_start")).over(running))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("session_start"), max(col("t")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /** Runs a streaming aggregation to completion on the bounded fixture
    * via memory sink + AvailableNow, returning the final table. */
  private def runToMemory(agg: DataFrame, name: String): DataFrame = {
    val spark = agg.sparkSession
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** The fixture is a single parquet FILE; the streaming file source
    * needs a directory, so stage it via a Spark write (works on any
    * Hadoop FS, no driver-side file IO). Always overwrites: a skip-if-
    * exists check would serve stale or partial data when the fixture is
    * regenerated or a prior run died mid-write. */
  private def streamingEvents(s: SparkSession, d: String): DataFrame = {
    val staged = s"${System.getProperty("java.io.tmpdir")}/graft-events-staged-" +
      math.abs(d.hashCode)
    Tables.events(s, d).write.mode("overwrite").parquet(staged)
    s.readStream.schema(eventSchema).parquet(staged)
  }

  /** Hourly tumbling counts through a REAL streaming plan, checked
    * against the batch SQL oracle. */
  val tumblingHourly: QueryDef = QueryDef.sql(
    "st_tumbling_hourly",
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_epoch,
      |  event_type, count(*) AS n, round(sum(value), 4) AS total
      |FROM events
      |GROUP BY bucket_epoch, event_type
      |ORDER BY bucket_epoch, event_type""".stripMargin) { (s, d) =>
    val agg = tumblingCounts(streamingEvents(s, d), "1 hour")
    runToMemory(agg, "st_tumbling_hourly_sink")
      .select(unix_timestamp(col("window.start")).as("bucket_epoch"),
        col("event_type"), col("n"), round(col("total"), 4).as("total"))
      .orderBy(col("bucket_epoch"), col("event_type"))
  }

  /** 1-hour windows sliding every 30 minutes through a streaming plan;
    * the oracle unions the two contributing buckets per event. */
  val slidingHalfHour: QueryDef = QueryDef.sql(
    "st_sliding_halfhour",
    """WITH b AS (
      |  SELECT CAST(floor(epoch(time_bucket(INTERVAL '30 minutes', ts))) AS BIGINT)
      |           AS s1, event_type, value
      |  FROM events),
      |contrib AS (
      |  SELECT s1 AS bucket_epoch, event_type, value FROM b
      |  UNION ALL
      |  SELECT s1 - 1800 AS bucket_epoch, event_type, value FROM b)
      |SELECT bucket_epoch, event_type, count(*) AS n,
      |  round(sum(value), 4) AS total
      |FROM contrib
      |GROUP BY bucket_epoch, event_type
      |ORDER BY bucket_epoch, event_type""".stripMargin) { (s, d) =>
    val agg = slidingCounts(streamingEvents(s, d), "1 hour", "30 minutes")
    runToMemory(agg, "st_sliding_halfhour_sink")
      .select(unix_timestamp(col("window.start")).as("bucket_epoch"),
        col("event_type"), col("n"), round(col("total"), 4).as("total"))
      .orderBy(col("bucket_epoch"), col("event_type"))
  }

  /** Batch sessionization (30-min gap), oracle-checked gaps-and-islands. */
  val sessionsBatch: QueryDef = QueryDef.sql(
    "st_sessions_batch",
    """WITH e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
      |  FROM events),
      |marked AS (
      |  SELECT user_id, t, value,
      |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |           OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM e),
      |sess AS (
      |  SELECT user_id, t, value,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY t
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid,
      |  min(t) AS session_start, max(t) AS session_end,
      |  count(*) AS n_events, round(sum(value), 4) AS total_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, sid""".stripMargin) { (s, d) =>
    sessionizeBatch(Tables.events(s, d))
      .select(col("user_id"), col("sid").cast("long").as("sid"),
        col("session_start"), col("session_end"), col("n_events"),
        col("total_value"))
      .orderBy(col("user_id"), col("sid"))
  }

  val all: Seq[QueryDef] = Seq(tumblingHourly, slidingHalfHour, sessionsBatch)
}
