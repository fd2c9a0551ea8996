package graft.plans

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
import org.apache.spark.sql.functions._

/** The custom operator must not be an optimization barrier: left-side
  * filters commute below it and child columns prune to the used slice
  * (both all the way into the parquet scan). */
class AsOfJoinOptimizationSuite extends SparkSessionSuite {

  private lazy val dir = {
    val base = java.nio.file.Files.createTempDirectory("asof-opt").toString
    val s = spark
    import s.implicits._
    Seq((1, 10L, "a", "wideL"), (2, 20L, "b", "wideL"))
      .toDF("k", "t", "lv", "l_unused").write.parquet(s"$base/left")
    Seq((1, 5L, "x", "wideR"), (2, 15L, "y", "wideR"))
      .toDF("rk", "rt", "rv", "r_unused").write.parquet(s"$base/right")
    base
  }

  private def joined = AsOf.join(
    spark.read.parquet(s"$dir/left"), spark.read.parquet(s"$dir/right"),
    Seq("k" -> "rk"), "t", "rt")

  test("left-side filters push below the join into the scan") {
    val df = joined.filter(col("k") === 1 && col("rv").isNotNull)
    val opt = df.queryExecution.optimizedPlan
    // the right-side conjunct must stay above the join...
    val topFilter = opt.collectFirst {
      case f @ Filter(_, _: AsOfJoin) => f
      case f @ Filter(_, Project(_, _: AsOfJoin)) => f
    }
    assert(topFilter.isDefined, s"right-side filter not above join:\n$opt")
    assert(topFilter.get.condition.references.map(_.name).toSet == Set("rv"))
    // ...while the left-side one reaches the parquet scan as a pushed
    // predicate
    val physical = df.queryExecution.executedPlan.toString
    withClue(physical) {
      assert(physical.contains("PushedFilters: [IsNotNull(k), EqualTo(k,1)]"))
    }
  }

  test("unused columns prune out of both scans") {
    val df = joined.select("k", "t", "rv")
    val physical = df.queryExecution.executedPlan.toString
    withClue(physical) {
      assert(!physical.contains("l_unused"))
      assert(!physical.contains("r_unused"))
      assert(!physical.contains("lv"))
    }
    // values unaffected by pruning
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      .toSet shouldBe Set((1, 10L, "x"), (2, 20L, "y"))
  }
}
