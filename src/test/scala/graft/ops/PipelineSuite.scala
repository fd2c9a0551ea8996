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

  test("leakage-safe split keeps every near-dup cluster in one split") {
    val rows = Pipeline.leakageSplit.fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    // split is a function of the cluster key — no cluster is ever torn
    rows.groupBy(_._2).values.foreach { members =>
      members.map(_._4).distinct.length shouldBe 1
    }
    val clusters = rows.groupBy(_._2).values.filter(_.length > 1).toSeq
    clusters.length should be > 0 // the chain corpus plants real clusters
    // and the fix matters: the NAIVE per-doc hash split would have torn
    // at least one of those clusters across the train/val/test boundary
    def naiveSplit(docId: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
      val bucket = Integer.parseInt(
        md.take(2).map("%02x".format(_)).mkString, 16) % 100
      if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
    }
    clusters.count(_.map(m => naiveSplit(m._1)).distinct.length > 1) should
      be > 0
  }

  test("sequence packing matches a sequential driver reference") {
    val dir = "/root/testdata/sf0.001"
    val B = Pipeline.PackBudget
    // the trivially-correct single-threaded packing: walk docs in
    // doc_id order, keep a running token offset, clip spans to windows
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        // scalatest's inherited `size` shadows functions.size here
        (expr("size(split(text, ' '))") + 1).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    var off = 0L
    for ((id, nt) <- docs) {
      val st = off; val en = off + nt; off = en
      val isSplit = if ((en - 1) / B > st / B) 1L else 0L
      var sq = st / B
      while (sq <= (en - 1) / B) {
        val begin = math.max(st, sq * B)
        val stop = math.min(en, (sq + 1) * B)
        expected += ((sq, id, begin - sq * B, stop - begin, nt, isSplit))
        sq += 1
      }
    }
    val got = Pipeline.packSequences.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe expected.toSeq
  }

  /** r12 (r11 verdict #4): the bucket widths are plumbing, never
    * semantics — the hierarchical offsets are identical at any
    * positive widths, including degenerate ones that force MANY
    * buckets and MANY super-buckets (the high-bucket-count path the
    * old forced `broadcast(boff)` design could not survive at 10^10
    * docs). Checked against the one-window global prefix sum. */
  test("packing offsets are bucket-width invariant (hierarchical path)") {
    val s = spark
    import s.implicits._
    val q0 = (0L until 500L).map(i => (i, i % 37 + 1))
      .toDF("doc_id", "n_tokens")
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val reference = q0.withColumn("en", sum(col("n_tokens")).over(wAll))
      .select(col("doc_id"), (col("en") - col("n_tokens")).as("st"), col("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for ((bucket, superF) <- Seq((64L, 4096L), (3L, 2L), (1L, 1L), (500L, 7L))) {
      val q = q0.withColumn("bkt",
        expr(s"CAST(doc_id DIV $bucket AS BIGINT)"))
      val got = Pipeline.hierarchicalOffsets(q, superF)
        .select(col("doc_id"), col("st"), col("en"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      withClue(s"bucket=$bucket superFactor=$superF: ") {
        got shouldBe reference
      }
    }
  }

  test("packing index reconstructs the exact original token stream") {
    // The loader contract: materializing every sequence from the
    // (seq, doc, seq_off, span_len) index — slicing each doc's
    // EOD-terminated token array by its spans, in (seq_id, seq_off)
    // order — must reproduce the concatenated corpus token stream
    // LOSSLESSLY. This pins that spans tile each doc without gap or
    // overlap AND that cross-window splits resume at the right token.
    val dir = "/root/testdata/sf0.001"
    val docToks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> (r.getString(1).split(" ") :+ "<EOD>"))
      .toMap
    val rows = Pipeline.packSequences.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)) // (seq_id, seq_off)
    // per-doc running cursor: a doc's spans must consume its tokens
    // in order across windows
    val cursor = scala.collection.mutable.Map.empty[Long, Int]
    val reconstructed = rows.flatMap { case (_, doc, _, len) =>
      val from = cursor.getOrElse(doc, 0)
      cursor(doc) = from + len.toInt
      docToks(doc).slice(from, from + len.toInt)
    }
    val original = docToks.toSeq.sortBy(_._1).flatMap(_._2)
    reconstructed.toSeq shouldBe original
    // every doc fully consumed
    cursor.foreach { case (doc, n) => n shouldBe docToks(doc).length }
  }

  /** r16 (r15 verdict #1): the DSIR quartile boundary must stay exact
    * with BOUNDED windows under an adversarial weight distribution —
    * one extreme outlier stretches the quantization range so every
    * other weight collapses into bucket 0, and the r15 one-shot scheme
    * then ran its per-weight refinement window over the whole corpus
    * again. [[Pipeline.weightThreshold]] iterates the quantization
    * until the boundary bucket's distinct-weight count fits the
    * refinement cap; each case pins selection ≡ brute-force top-k by
    * (w desc, doc_id asc), and the level count proves the recursion
    * actually engaged. */
  test("dsir weightThreshold: outlier-collapsed weights recurse to a " +
      "bounded refinement and stay exact top-k") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def check(docw: org.apache.spark.sql.DataFrame, k: Long,
        nB: Int, mR: Long): Int = {
      val expect = docw.orderBy(col("w").desc, col("doc_id"))
        .limit(k.toInt)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val (thrW, tieQ, levels) = Pipeline.weightThreshold(docw, k, nB, mR)
      val got = docw.withColumn("rn", row_number().over(
          Window.partitionBy(col("w")).orderBy(col("doc_id"))))
        .filter(col("w") > thrW || (col("w") === thrW && col("rn") <= tieQ))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      got shouldBe expect
      got.size shouldBe k
      levels
    }
    // production shape: a 1e12 outlier + 100k distinct 6-decimal grid
    // weights — level 0 puts all 100k (> the 65536 refinement cap) in
    // bucket 0, so the iteration MUST descend, and the selection is
    // still the exact top quartile
    val adv = (1L to 100000L).map(i => (i, i * 1e-6)) :+ ((100001L, 1e12))
    check(adv.toDF("doc_id", "w"), 25000L, 65536, 65536L) should be > 1
    // deep recursion at toy widths: 4-bucket quantization, refinement
    // capped at 8 distinct weights, 1000-weight grid + outlier
    val toy = (1L to 1000L).map(i => (i, i * 1e-6)) :+ ((1001L, 1e9))
    check(toy.toDF("doc_id", "w"), 250L, 4, 8L) should be > 2
    // ties at the threshold weight: the quota rule picks lowest doc_ids
    val ties = (1L to 200L).map(i => (i, (i % 10).toDouble))
    check(ties.toDF("doc_id", "w"), 50L, 65536, 65536L) should be >= 1
    // all-equal weights: zero-width interval exits level 1
    val flat = (1L to 40L).map(i => (i, 0.5))
    check(flat.toDF("doc_id", "w"), 10L, 65536, 65536L) shouldBe 1
    // mixed-sign weights (DSIR weights are log-ratios — negative is
    // the COMMON case) with a negative outlier stretching the range
    // downward: the k-boundary sits in the top bucket's narrow slice
    val mixed = (1L to 2000L).map(i => (i, (i - 1000L) * 1e-6)) :+
      ((2001L, -1e9))
    check(mixed.toDF("doc_id", "w"), 500L, 16, 64L) should be > 1
    // every doc at the SAME extreme outlier value except a grid tail:
    // the boundary bucket is a pure tie block, quota rule exact
    val tiedOut = (1L to 100L).map(i => (i, 1e12)) ++
      (101L to 300L).map(i => (i, i * 1e-6))
    check(tiedOut.toDF("doc_id", "w"), 150L, 65536, 65536L) should be >= 1
  }

  test("sequence packing fills every window except the last exactly") {
    val rows = Pipeline.packSequences.fn(spark, "/root/testdata/sf0.001")
      .groupBy(col("seq_id")).agg(sum(col("span_len")).as("fill"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val lastSeq = rows.map(_._1).max
    // seq ids are dense 0..last: no window is skipped
    rows.map(_._1) shouldBe (0L to lastSeq).toArray
    rows.filter(_._1 != lastSeq).foreach { case (_, fill) =>
      fill shouldBe Pipeline.PackBudget
    }
    rows.last._2 should be <= Pipeline.PackBudget
  }
}
