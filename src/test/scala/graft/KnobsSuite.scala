package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the r10 isolation contract of [[Knobs.withShufflePartitions]]:
  * the cap lives in a scoped child session, so a CONCURRENT unrelated
  * query on the parent session keeps the session default — the old
  * around-body conf mutation silently capped it (r9 advice). */
class KnobsSuite extends SparkSessionSuite {

  private val confKey = "spark.sql.shuffle.partitions"

  test("a concurrent query on the parent session keeps the default " +
      "while a capped body runs on another thread") {
    val s = spark
    val default = s.conf.get(confKey).toInt
    default should be > 2

    // AQE coalescing would legally shrink observed partition counts;
    // disable it so getNumPartitions reads the planned shuffle width
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = s.conf.get(aqeKey)
    s.conf.set(aqeKey, "false")
    try {
      val insideBody = new java.util.concurrent.CountDownLatch(1)
      val parentDone = new java.util.concurrent.CountDownLatch(1)

      val body = Future {
        Knobs.withShufflePartitions(s, 2) { scoped =>
          // the scoped session diverges in exactly the cap...
          scoped.conf.get(confKey).toInt shouldBe 2
          val capped = scoped.range(100).groupBy(col("id") % 7).count()
          capped.rdd.getNumPartitions shouldBe 2
          insideBody.countDown()
          // ...and stays capped while the parent query runs
          parentDone.await(30, java.util.concurrent.TimeUnit.SECONDS)
          scoped.range(100).groupBy(col("id") % 5).count()
            .rdd.getNumPartitions shouldBe 2
          scoped.conf.get(confKey).toInt
        }
      }

      // the "unrelated concurrent query": planned on the PARENT session
      // while the body is verifiably in flight on the other thread
      insideBody.await(30, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      s.conf.get(confKey).toInt shouldBe default
      val unrelated = s.range(100).groupBy(col("id") % 3).count()
      unrelated.rdd.getNumPartitions shouldBe default
      parentDone.countDown()

      Await.result(body, 60.seconds) shouldBe 2
      // and nothing to restore: the parent conf was never touched
      s.conf.get(confKey).toInt shouldBe default
    } finally s.conf.set(aqeKey, prevAqe)
  }

  test("rebind transplants a frame between sessions with identical rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint()
    Knobs.withShufflePartitions(s, 2) { scoped =>
      val moved = Knobs.rebind(df, scoped)
      moved.sparkSession should not be theSameInstanceAs(s)
      moved.collect().map(_.toSeq).toSet shouldBe
        df.collect().map(_.toSeq).toSet
      // round-trip back to the parent
      val back = Knobs.rebind(moved, s)
      back.sparkSession shouldBe theSameInstanceAs(s)
      back.collect().map(_.toSeq).toSet shouldBe
        df.collect().map(_.toSeq).toSet
    }
  }

  test("conf carry-over swallows only the expected static-conf " +
      "rejections; genuine faults propagate (r10 verdict #5)") {
    // the rejections RuntimeConfig.set actually raises are absorbed —
    // use a REAL static-conf rejection so the test tracks whatever
    // exception type Spark actually throws
    val staticRejection =
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.conf.set("spark.sql.warehouse.dir", "/tmp/never-applied")
      }
    Knobs.copyConfEntry((_, _) => throw staticRejection, "k", "v")
    Knobs.copyConfEntry(
      (_, _) => throw new IllegalArgumentException("bad entry"), "k", "v")
    // ...but an interrupt mid-copy is a real fault and must escape
    // (the old `case _: Throwable` hid it)
    intercept[InterruptedException] {
      Knobs.copyConfEntry(
        (_, _) => throw new InterruptedException("stop"), "k", "v")
    }
    intercept[OutOfMemoryError] {
      Knobs.copyConfEntry(
        (_, _) => throw new OutOfMemoryError("boom"), "k", "v")
    }
    // and the real carry-over still works end-to-end: a static conf in
    // the parent map is skipped, the runtime cap lands
    val s = spark
    Knobs.withShufflePartitions(s, 2) { scoped =>
      scoped.conf.get("spark.sql.shuffle.partitions").toInt shouldBe 2
    }
  }
}
