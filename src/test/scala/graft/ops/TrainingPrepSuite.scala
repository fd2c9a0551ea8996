package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Invariant pins for the round-7 training-prep operators (each also has
  * a DuckDB oracle — these tests assert the SEMANTIC properties the
  * hash-compare alone doesn't explain).
  */
class TrainingPrepSuite extends SparkSessionSuite {

  private val dir = "/root/testdata/sf0.001"

  test("line dedup drops every planted header and nothing leaks through") {
    val out = Dedup.lineDedup.fn(spark, dir).collect()
    out.length shouldBe 500

    // every doc planted with a boilerplate header lost at least one line
    val planted = out.filter(r => r.getLong(0) % 5 == 0 || r.getLong(0) % 7 == 0)
    planted should not be empty
    all(planted.map(_.getLong(2))) should be >= 1L

    // no surviving text contains either planted header
    val cleaned = out.map(_.getString(3))
    cleaned.count(_.contains("all rights reserved copyright")) shouldBe 0
    cleaned.count(_.contains("subscribe to our newsletter")) shouldBe 0

    // reassembly preserves order: a doc with zero drops round-trips its text
    val untouched = out.filter(_.getLong(2) == 0L)
    untouched should not be empty
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    untouched.foreach { r =>
      // only unplanted docs keep their raw text verbatim
      val id = r.getLong(0)
      if (id % 5 != 0 && id % 7 != 0) r.getString(3) shouldBe texts(id)
    }
  }

  test("bigram LM score: probabilities are log-probs and min bounds mean") {
    val out = TextAnalysis.lmScore.fn(spark, dir).collect()
    out.length shouldBe 500
    out.foreach { r =>
      val meanLp = r.getDouble(2)
      val minLp = r.getDouble(3)
      meanLp should be <= 0.0 // every bigram prob <= 1
      minLp should be <= meanLp // the worst transition bounds the mean
    }
  }

  test("weighted sample biases membership toward heavy rows") {
    val out = relationalWeighted().collect()
    out.length shouldBe 100
    val sampleMean = out.map(_.getDouble(1)).sum / out.length
    val corpusMean = graft.Tables.orders(spark, dir)
      .agg(avg(col("o_totalprice"))).head().getDouble(0)
    // A-ES with w = totalprice must overselect heavy orders
    sampleMean should be > corpusMean * 1.2
  }

  private def relationalWeighted() =
    graft.relational.AdvancedQueries.weightedSample.fn(spark, dir)

  test("training shuffle: shards partition the corpus with contiguous positions") {
    val out = Pipeline.shuffleShard.fn(spark, dir).collect()
    out.length shouldBe 500
    out.map(_.getLong(0)).distinct.length shouldBe 500 // a permutation

    val byShard = out.groupBy(_.getLong(1))
    byShard.keySet.size shouldBe 8
    byShard.foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(2)).sorted
      pos shouldBe (1L to rows.length.toLong).toArray // contiguous 1..n
    }

    // determinism: a second run reproduces the exact order
    val again = Pipeline.shuffleShard.fn(spark, dir).collect()
    again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }
}
