package graft.relational

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join strategy for repeated big-big joins at
  * 100 TB: both tables pre-shuffled into the same bucket layout on the
  * join key, so the sort-merge join runs with NO shuffle exchange at
  * query time. Asserted on the physical plan.
  */
class BucketingSuite extends SparkSessionSuite {

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    import s.implicits._
    val wh = System.getProperty("spark.sql.warehouse.dir", "spark-warehouse")

    val li = (0L until 2000L).map(i => (i % 500, i, (i % 50).toDouble))
      .toDF("l_orderkey", "l_id", "l_quantity")
    val ord = (0L until 500L).map(i => (i, s"status${i % 3}"))
      .toDF("o_orderkey", "o_status")

    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // Force SMJ (no broadcast) so the shuffle question is real.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_status"))
        .agg(sum(col("l_quantity")).as("q"))

      val plan = joined.queryExecution.executedPlan.toString
      // The join itself must not re-shuffle its inputs: no Exchange
      // between the bucketed scans and the SortMergeJoin — only the
      // final groupBy may shuffle (1), never 2+.
      plan should include("SortMergeJoin")
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      exchanges should be <= 1

      joined.collect().map(_.getAs[Double]("q")).sum shouldBe
        (0L until 2000L).map(i => (i % 50).toDouble).sum
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
