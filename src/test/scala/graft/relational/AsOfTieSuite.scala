package graft.relational

import java.nio.file.Files

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the r10 deterministic TIE RULES of the as-of compositions and
  * the streaming enrichment (r9 advice): among clicks tied on
  * (user_id, t), backward directions pick the MAX event_id, forward
  * directions the MIN — on a corpus with real timestamp ties, which
  * the driver fixtures never contain (their uniqueness is why the old
  * arbitrary picks happened to hash-match). */
class AsOfTieSuite extends SparkSessionSuite {

  private val sec = 1000000000L

  /** events.parquet with two clicks tied at t=100s for user 1. */
  private lazy val tieDir: String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("asof-ties").toString
    Seq(
      (10L, 100L * sec, 1L, "click", 1.0, "p"),
      (11L, 100L * sec, 1L, "click", 1.0, "p"), // tied with 10
      (12L, 300L * sec, 1L, "click", 1.0, "p"),
      (20L, 200L * sec, 1L, "error", 1.0, "p"),
      (21L, 50L * sec, 1L, "error", 1.0, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def picks(name: String): Map[Long, Any] =
    graft.SparkEntry.queries(name)(spark, tieDir)
      .select("error_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap

  test("backward composition resolves a click tie to the max event_id") {
    picks("adv_asof_join") shouldBe Map(
      20L -> 11L, // ties {10, 11} at t=100: max wins
      21L -> null) // nothing at or before t=50
  }

  test("forward composition resolves a click tie to the min event_id") {
    picks("adv_asof_forward") shouldBe Map(
      20L -> 12L, // smallest t >= 200 is the untied click at 300
      21L -> 10L) // ties {10, 11} at t=100: min wins
  }

  test("nearest composition: backward tie rule on equal gaps") {
    picks("adv_asof_nearest") shouldBe Map(
      20L -> 11L, // b gap 100 == f gap 100: backward wins, max-id click
      21L -> 10L) // backward empty: forward min-id click
  }

  test("native-operator family applies the same tie rules (r10)") {
    // the operator's own tie contract is "keep right times unique per
    // key", so these queries pre-dedup tied clicks — backward forms
    // (native, skew, tolerance) to the max id, forward to the min
    for (q <- Seq("adv_asof_native", "adv_asof_skew", "adv_asof_tolerance"))
      withClue(s"$q: ") {
        picks(q) shouldBe Map(20L -> 11L, 21L -> null)
      }
    picks("adv_asof_fwd_native") shouldBe Map(20L -> 12L, 21L -> 10L)
  }

  test("streaming as-of enrichment applies the same backward tie rule") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val ev = Seq(
      (10L, 100L * sec, 1L, "click"),
      (11L, 100L * sec, 1L, "click"),
      (20L, 200L * sec, 1L, "error")).toDS()
    val out = graft.streaming.EventStreams.asofEnrich(ev)
      .collect().map(o => o.error_id -> o.click_id).toMap
    out shouldBe Map(20L -> Some(11L))
  }
}
