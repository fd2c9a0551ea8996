package graft.streaming

import graft.fm.SparkSessionSuite
import graft.streaming.EventStreams.{SessionEvent, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSuite extends SparkSessionSuite {

  test("streaming sessionization: gap split + event-time timeout flush") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[SessionEvent]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_test").start()

    // user 1: two events 100s apart (one session); user 2: one event.
    input.addData(SessionEvent(1, 1000, 1.0), SessionEvent(1, 1100, 2.0),
      SessionEvent(2, 1000, 5.0))
    q.processAllAvailable()
    // Advance the watermark far past end+gap so timeouts fire (watermark
    // updates at batch end; timeouts process in the following batch).
    input.addData(SessionEvent(3, 100000, 1.0))
    q.processAllAvailable()
    input.addData(SessionEvent(3, 200000, 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_test").as[SessionOut].collect()
      .map(o => o.user_id -> o).toMap
    out(1L) shouldBe SessionOut(1, 1000, 1100, 2, 3.0)
    out(2L) shouldBe SessionOut(2, 1000, 1000, 1, 5.0)
    // user 3's two events are > gap apart: first session flushed too.
    out(3L) shouldBe SessionOut(3, 100000, 100000, 1, 1.0)
  }

  test("streaming dedup drops within-watermark duplicates, keeps firsts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Long, String)] // (event_id, epoch, tag)
    val deduped = input.toDS()
      .toDF("event_id", "epoch", "tag")
      .withColumn("ets", timestamp_seconds(col("epoch")))
      .withWatermark("ets", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_test").start()

    // id 1 arrives three times (same batch + next batch, all well within
    // the watermark), id 2 once; only the first occurrence of each
    // survives.
    input.addData((1L, 1000L, "first"), (1L, 1000L, "dup-same-batch"),
      (2L, 1010L, "first"))
    q.processAllAvailable()
    input.addData((1L, 1400L, "dup-next-batch"), (3L, 1500L, "first"))
    q.processAllAvailable()
    q.stop()

    val out = s.table("dedup_test").select("event_id", "tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "first", 2L -> "first", 3L -> "first")
  }

  test("streaming tumbling agg equals batch computation on bounded input") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    // synthetic events with nano-long ts spanning 3 hours
    val base = 1700000000L * 1000000000L
    val events = (0 until 300).map { i =>
      (i.toLong, base + i * 40L * 1000000000L, (i % 7).toLong,
        Seq("a", "b", "c")(i % 3), i * 0.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(dir)

    val streamed = EventStreams.tumblingCounts(
      s.readStream.schema(EventStreams.eventSchema).parquet(dir), "1 hour")
    val q = streamed.writeStream.outputMode("complete").format("memory")
      .queryName("tumb_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = s.table("tumb_test")
      .select(unix_timestamp(col("window.start")).as("b"), col("event_type"),
        col("n"), round(col("total"), 6).as("total"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    val expected = EventStreams.tumblingCounts(s.read.parquet(dir), "1 hour")
      .select(unix_timestamp(col("window.start")).as("b"), col("event_type"),
        col("n"), round(col("total"), 6).as("total"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    got shouldBe expected
    got.size should be > 3
  }
}
