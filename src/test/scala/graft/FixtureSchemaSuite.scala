package graft

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions.{col, lit}

/** Fixture-schema drift guard (round-8 post-mortem): the driver
  * regenerated `/root/testdata` and `events.ts` silently moved from
  * parquet TIMESTAMP(NANOS) to `timestamp[us]`, which surfaced as 11
  * scattered runtime errors plus 2 silent ×1000 unit bugs. This suite
  * makes the next regeneration fail as ONE diagnostic:
  *   - every fixture table at every SF matches [[Tables.fixtureContract]]
  *     (instant columns may be any shape the normalization layer handles);
  *   - [[Tables.normalizeEventTime]] maps every accepted shape to the
  *     same LongType epoch-nanos values;
  *   - an unsupported physical type fails AT THE SCAN with a single
  *     clear message, not downstream.
  */
class FixtureSchemaSuite extends SparkSessionSuite {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("fixture schemas match the contract at every SF") {
    for (dir <- sfDirs if new java.io.File(dir).isDirectory) {
      val issues = Tables.fixtureSchemaIssues(spark, dir)
      withClue(s"$dir:\n${issues.mkString("\n")}\n") { issues shouldBe empty }
    }
  }

  test("events.ts is normalized to LongType epoch-nanos at the scan") {
    val ev = Tables.events(spark, sfDirs.head)
    ev.schema("ts").dataType shouldBe org.apache.spark.sql.types.LongType
    // sanity: values are epoch-nanos magnitude (year 2000..2100), so a
    // micros-left-as-micros mistake (×1000 too small) cannot pass
    val Array(lo, hi) = ev
      .agg(org.apache.spark.sql.functions.min(col("ts")),
        org.apache.spark.sql.functions.max(col("ts")))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    lo should be > 946684800L * 1000000000L  // 2000-01-01 in nanos
    hi should be < 4102444800L * 1000000000L // 2100-01-01 in nanos
  }

  test("normalization maps micros-timestamp and long-nanos shapes to equal values") {
    val s = spark
    import s.implicits._
    // one instant, three physical shapes
    val nanos = 1700000000123456000L // 2023-11-14T22:13:20.123456Z
    val asLong = Seq(nanos).toDF("ts")
    val asTs = Seq(nanos / 1000).toDF("us")
      .select(org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"))
    val asNtz = asTs.select(col("ts").cast("timestamp_ntz").as("ts"))
    for (df <- Seq(asLong, asTs, asNtz)) {
      val out = Tables.normalizeEventTime(df, "ts", "t")
      out.schema("ts").dataType shouldBe org.apache.spark.sql.types.LongType
      out.head.getLong(0) shouldBe nanos
    }
  }

  test("date queries are invariant to a nanos-long l_shipdate fixture shape") {
    val s = spark
    // simulate the reverse drift: a regeneration that ships
    // TIMESTAMP(NANOS) surfaces (under nanosAsLong) as a raw long —
    // rebuild the sf0.001 lineitem in that shape and q1 must not care
    val dir = java.nio.file.Files.createTempDirectory("nanoslineitem").toString
    Tables.lineitem(s, sfDirs.head)
      .withColumn("l_shipdate",
        org.apache.spark.sql.functions.unix_micros(
          col("l_shipdate").cast("timestamp")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val orig = graft.SparkEntry.queries("q1_pricing_summary")(s, sfDirs.head)
      .collect().map(_.toSeq.toIndexedSeq).toIndexedSeq
    val drifted = graft.SparkEntry.queries("q1_pricing_summary")(s, dir)
      .collect().map(_.toSeq.toIndexedSeq).toIndexedSeq
    orig.length should be > 0
    drifted shouldBe orig
  }

  test("NTZ event time in a non-UTC session fails loudly instead of " +
      "silently timezone-shifting (r9 advice)") {
    val s = spark
    import s.implicits._
    val tzKey = "spark.sql.session.timeZone"
    val ntz = Seq((1L, 1000000L, 2L)).toDF("event_id", "us", "user_id")
      .select(col("event_id"),
        org.apache.spark.sql.functions.timestamp_micros(col("us"))
          .cast("timestamp_ntz").as("ts"),
        col("user_id"))
    // UTC (the engine convention): converts, value-preserving
    Tables.normalizeEventTime(ntz, "ts", "events")
      .select("ts").head().getLong(0) shouldBe 1000000000L
    // any other session timezone: one clear diagnostic, no silent shift
    val prev = s.conf.get(tzKey)
    try {
      s.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        Tables.normalizeEventTime(ntz, "ts", "events")
      }
      e.getMessage should include("UTC")
      e.getMessage should include("events.ts")
    } finally s.conf.set(tzKey, prev)
  }

  test("an unsupported ts type fails at the scan with one clear diagnostic") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("badevents").toString
    Seq((1L, "not-a-time", 2L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    e.getMessage should include("fixture schema drift")
    e.getMessage should include("events.ts")
    // and the contract check reports the same drift as an issue list
    Tables.fixtureSchemaIssues(spark, dir)
      .exists(_.startsWith("events.ts")) shouldBe true
  }
}
