package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

class PipelineSuite extends SparkSessionSuite {

  test("corpus-clean pipeline reports gate selectivity via observe()") {
    val dir = "/root/testdata/sf0.001"
    val df = Pipeline.corpusClean.fn(spark, dir)
    // collect() executes df's own QueryExecution — count() would build a
    // derived plan and leave df's observed metrics empty.
    val nOut = df.collect().length.toLong

    val metrics = df.queryExecution.observedMetrics
    val nIn = metrics("pipe_in").getAs[Long]("n_in")
    val nKept = metrics("pipe_kept").getAs[Long]("n_kept")

    // corpus = documents ∪ every-10th duplicated
    val docs = graft.Tables.documents(spark, dir)
    val expectedIn =
      docs.count() + docs.filter(col("doc_id") % 10 === 0).count()
    nIn shouldBe expectedIn
    nKept should be < nIn
    // dedup can only shrink the gated set
    nOut should be <= nKept
    nOut should be > 0L
  }

  test("compaction bounds file count and preserves content") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    (1 to 1000).map(i => (i.toLong, s"p$i", i % 7))
      .toDF("id", "payload", "bucket")
      .repartition(50).write.parquet(s"$base/frag")
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    parquetFiles(s"$base/frag") should be >= 40

    Pipeline.compactDir(spark, s"$base/frag", s"$base/packed",
      Seq("bucket", "id"), targetFiles = 4)
    parquetFiles(s"$base/packed") should be <= 4
    val ids = spark.read.parquet(s"$base/packed")
      .select("id").collect().map(_.getLong(0)).sorted
    ids shouldBe (1L to 1000L).toArray
  }
}
