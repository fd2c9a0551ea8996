package graft.relational

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** A partition-column filter must prune directories at planning time:
  * the scan's partition count drops to the matching partitions only and
  * the filter never reaches row-level evaluation. */
class PartitionPruningSuite extends SparkSessionSuite {

  test("partition-column filter prunes at the scan") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    (0 until 3000).map(i => (i.toLong, Seq("A", "B", "C")(i % 3), i * 1.5))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(dir)

    val q = s.read.parquet(dir).filter(col("part") === "B")
    // collect() executes q's own plan, so its scan metrics populate
    // (count() would build and execute a separate plan instance).
    q.collect().length shouldBe 1000

    // The executed scan must have read ONLY the part=B files: compare its
    // numFiles metric against the per-partition file counts on disk.
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    scan.toString should include("PartitionFilters")
    def filesIn(sub: String): Int =
      new java.io.File(s"$dir/$sub").listFiles()
        .count(_.getName.endsWith(".parquet"))
    val total = filesIn("part=A") + filesIn("part=B") + filesIn("part=C")
    val read = scan.metrics("numFiles").value
    read shouldBe filesIn("part=B").toLong
    read should be < total.toLong
  }
}
