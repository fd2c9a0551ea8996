package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Proves [[EventStreams.upsertMerge]] is INCREMENTAL, not a full-state
  * rewrite: state is hash-bucketed on user_id, and a batch touching a
  * subset of buckets must leave every other bucket's files
  * byte-identical (same paths, same SHA-256) while still producing the
  * correct latest-event-per-user state. This is the property that makes
  * per-batch cost O(batch), not O(|state|), under continuous refresh.
  */
class UpsertIncrementalSuite extends SparkSessionSuite {

  private def mkState(): String =
    Files.createTempDirectory("graft-upsert-suite").toString + "/state"

  /** (relative path → sha256) for every data file under the state dir. */
  private def fileDigests(state: String): Map[String, String] = {
    val root = Paths.get(state)
    val md = MessageDigest.getInstance("SHA-256")
    var out = Map.empty[String, String]
    Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (Files.isRegularFile(p) && !rel.endsWith(".crc") && rel.nonEmpty) {
        md.reset()
        out += rel -> md.digest(Files.readAllBytes(p))
          .map("%02x".format(_)).mkString
      }
    }
    out
  }

  private def batchDf(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts", "event_id", "event_type")
  }

  private def bucketOf(userId: Long): Int = {
    val s = spark
    import s.implicits._
    Seq(userId).toDF("user_id")
      .select(pmod(hash(col("user_id")), lit(EventStreams.UpsertBuckets)))
      .head().getInt(0)
  }

  test("second batch rewrites only touched buckets; others byte-identical") {
    val state = mkState()
    // Batch 1: 200 users spread across all buckets.
    val b1 = (0L until 200L).map(u => (u, 1000L + u, u, "seed"))
    EventStreams.upsertMerge(spark, state, batchDf(b1))

    val before = fileDigests(state)
    val buckets = (0L until 200L).map(bucketOf).toSet
    assert(buckets.size == EventStreams.UpsertBuckets,
      "fixture must populate every bucket")

    // Batch 2: updates for exactly two users → at most two buckets touched.
    val u1 = 7L; val u2 = 123L
    val touched = Set(bucketOf(u1), bucketOf(u2))
    EventStreams.upsertMerge(spark, state,
      batchDf(Seq((u1, 5000L, 900L, "update"), (u2, 6000L, 901L, "update"))))

    val after = fileDigests(state)
    val untouched = (p: String) =>
      !touched.exists(b => p.startsWith(s"bucket=$b/") || p.contains(s"/bucket=$b/"))
    val beforeUntouched = before.filter { case (p, _) => untouched(p) }
    val afterUntouched = after.filter { case (p, _) => untouched(p) }
    assert(beforeUntouched.nonEmpty, "need untouched buckets to compare")
    assert(afterUntouched == beforeUntouched,
      "untouched buckets' files must be byte-identical across a batch")
    // Touched buckets really were rewritten (new file names or content).
    assert(before.filter { case (p, _) => !untouched(p) } !=
           after.filter { case (p, _) => !untouched(p) })

    // And the merged state is correct: latest event per user.
    val got = spark.read.parquet(state)
      .filter(col("user_id").isin(u1, u2, 50L))
      .select("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (u1, 5000L, 900L, "update"), (50L, 1050L, 50L, "seed"),
      (u2, 6000L, 901L, "update")).sortBy(_._1))
    assert(spark.read.parquet(state).count() == 200)
  }

  test("merge keeps max-(ts, event_id) row per user within one batch") {
    val state = mkState()
    EventStreams.upsertMerge(spark, state, batchDf(Seq(
      (1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 99L, 3L, "c"),
      (2L, 50L, 4L, "d"))))
    val got = spark.read.parquet(state)
      .select("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 100L, 2L, "b"), (2L, 50L, 4L, "d")))
  }
}
