package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** The shared collapse pre-pass (r13 verdict #4 / advice): hashed
  * distinct must route exactly like the full-content distinct, and the
  * session memo must HIT on a repeated plan but INVALIDATE when the
  * scanned files mutate (the fixture-fingerprint key) — the property
  * that makes memoization safe across the lifecycle queries' staged
  * index mutations. Memo-hit assertions are FAMILY-scoped (r14 advice):
  * a concurrent suite bumping the global counter must not flake a
  * delta assertion here, so each test uses its own family string and
  * reads that family's counter only. */
class ContentCollapseSuite extends SparkSessionSuite {

  private def computes(family: String): Long =
    ContentCollapse.computesOf(family)

  test("dup-free vs duplicated vs null contents route as before the " +
      "hash (n==u iff duplicate-free and null-free)") {
    import spark.implicits._
    val dupFree = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val dup = Seq((1L, "a"), (2L, "a"), (3L, "c")).toDF("id", "t")
    val withNull = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"))
      .toDF("id", "t")
    // in-memory plans carry their data in the semantic hash — safe to
    // memoize, but each distinct dataset is a distinct key
    val (n1, u1) = ContentCollapse.dupStats(dupFree, col("t"), "test")
    n1 shouldBe 3L; u1 shouldBe 3L
    val (n2, u2) = ContentCollapse.dupStats(dup, col("t"), "test")
    n2 shouldBe 3L; (n2 == u2) shouldBe false
    // a null content row must force the collapse route (never counted)
    val (n3, u3) = ContentCollapse.dupStats(withNull, col("t"), "test")
    n3 shouldBe 3L; u3 shouldBe 2L
  }

  test("memo hits on a repeated file-backed plan and invalidates when " +
      "the scanned files mutate") {
    val dir = java.nio.file.Files.createTempDirectory("collapse_memo").toString
    import spark.implicits._
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "t")
        .repartition(1).write.mode("overwrite").parquet(dir)
      def stats() = ContentCollapse.dupStats(
        spark.read.parquet(dir), col("t"), "test_memo")
      val c0 = computes("test_memo")
      stats() shouldBe ((3L, 2L))
      computes("test_memo") shouldBe c0 + 1
      // identical plan + unchanged files -> memo hit, no new action
      stats() shouldBe ((3L, 2L))
      computes("test_memo") shouldBe c0 + 1
      // mutate the scanned files in place (same path, same plan hash):
      // the fingerprint must change the key and force a recompute that
      // sees the NEW data
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "t")
        .repartition(1).write.mode("overwrite").parquet(dir)
      stats() shouldBe ((4L, 4L))
      computes("test_memo") shouldBe c0 + 2
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("localCheckpoint-backed plans are computed fresh (uncacheable " +
      "leaf), never served a stale entry") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a")).toDF("id", "t").localCheckpoint(true)
    val c0 = computes("test_ckpt")
    ContentCollapse.dupStats(df, col("t"), "test_ckpt") shouldBe ((2L, 1L))
    ContentCollapse.dupStats(df, col("t"), "test_ckpt") shouldBe ((2L, 1L))
    computes("test_ckpt") shouldBe c0 + 2
  }

  test("memo eviction is LRU by ACCESS order, not wholesale (r14 " +
      "verdict #6)") {
    import spark.implicits._
    // three distinct in-memory plans = three distinct memo keys
    val a = Seq((1L, "a"), (2L, "a")).toDF("id", "t")
    val b = Seq((1L, "b"), (2L, "b")).toDF("id", "t")
    val c = Seq((1L, "c"), (2L, "c")).toDF("id", "t")
    def stats(df: org.apache.spark.sql.DataFrame) =
      ContentCollapse.dupStats(df, col("t"), "test_lru")
    val capBefore = ContentCollapse.statsCacheCap
    try {
      ContentCollapse.statsCacheCap = 2
      ContentCollapse.clearStatsCache() // leftover entries would absorb
                                        // the evictions pinned below
      val c0 = computes("test_lru")
      stats(a); stats(b)               // cache = {a, b}
      computes("test_lru") shouldBe c0 + 2
      stats(a)                         // ACCESS refreshes a — b is eldest
      computes("test_lru") shouldBe c0 + 2
      stats(c)                         // evicts b (LRU), NOT a
      computes("test_lru") shouldBe c0 + 3
      stats(a)                         // still cached — wholesale clear
      computes("test_lru") shouldBe c0 + 3 // would have recomputed here
      stats(b)                         // evicted -> recompute
      computes("test_lru") shouldBe c0 + 4
    } finally {
      ContentCollapse.statsCacheCap = capBefore
    }
  }
}
