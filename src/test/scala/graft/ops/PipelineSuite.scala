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

  test("bloom decontamination ≡ exact path, and the bloom actually prunes") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq
    // the oracle pins bloom-vs-DuckDB; this pins bloom-vs-exact inside
    // the engine (same corpus, same plan inputs)
    canon(Pipeline.decontaminateBloom.fn(s, dir)) shouldBe
      canon(Pipeline.decontaminate.fn(s, dir))
    // the probe must PRUNE — an always-true might_contain would pass
    // both oracles. Survivor shingle instances ≤ true-contaminated
    // instances + 5 % of the corpus side (generous vs the 1 % design
    // FPP), and strictly fewer than the unfiltered corpus side.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.Shim
    val sh = graft.Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        // scalatest's inherited `size` shadows functions.size here
        explode(expr("transform(sequence(1, size(toks) - 3), " +
          "i -> array_join(slice(toks, i, 4), ' '))")).as("g"))
    val bench = sh.filter(col("doc_id") % 100 === 0).select(col("g")).distinct()
    val bf = bench.select(Shim.column(
      new BloomFilterAggregate(Shim.expression(xxhash64(col("g"))), 100000L)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpusSide = sh.filter(col("doc_id") % 100 =!= 0)
    val total = corpusSide.count()
    val survivors = corpusSide.filter(Shim.column(new BloomFilterMightContain(
      Shim.expression(lit(bf)), Shim.expression(xxhash64(col("g")))))).count()
    val trueHits = corpusSide.join(broadcast(bench), Seq("g")).count()
    survivors should be >= trueHits
    survivors should be <= (trueHits + (total * 5) / 100)
    survivors should be < total
  }
}
