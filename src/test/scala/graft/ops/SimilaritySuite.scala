package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

class SimilaritySuite extends SparkSessionSuite {

  /** Structured corpus (3 tight clusters) where a working IVF must
    * achieve high recall: a query's true neighbors share its cluster, so
    * probing the nearest cells finds them. */
  test("IVF top-k recovers within-cluster neighbors on clustered data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(3)
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian() * 5.0))
    val emb = (0L until 120L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")

    val prep = Similarity.prepared(emb).persist()
    val queries = prep.filter(col("vec_id") < 6)
    val got = Similarity.ivfTopK(prep, queries, k = 5, nlist = 6, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))

    got.length shouldBe 30 // 6 queries x 5 neighbors
    // every returned neighbor must be from the query's own cluster
    // (cosine between distinct far-apart clusters is far below
    // within-cluster cosine ~ 1)
    got.foreach { case (q, n) => (n % 3) shouldBe (q % 3) }
  }

  /** Recall floors of the two approximate driver queries against the
    * brute-force exact query, on the real (unstructured) fixture corpus:
    * deterministic-centroid IVF (nprobe=6) >= 0.8 and OR-amplified
    * 4-table multi-probe LSH >= 0.8 — the history is r1 0.6/0.26,
    * r2-r4 0.70/0.56, r5 0.84/0.88 measured. */
  test("deterministic IVF and multi-probe LSH hit their recall floors") {
    val dir = "/root/testdata/sf0.01"
    def pairs(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("sim_topk_brute")
    val ivf = pairs("sim_topk_ivf")
    val lsh = pairs("sim_topk_lsh")
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    withClue(s"ivf recall $ivfRecall: ") { ivfRecall should be >= 0.8 }
    withClue(s"lsh recall $lshRecall: ") { lshRecall should be >= 0.8 }
  }

  /** The bucketed range search must recover a solid fraction of the
    * exact kernel's threshold pairs. 4 planes + Hamming-1 probing give
    * P[bucket distance <= 1] ≈ p⁴ + 4p³(1−p) with p the per-plane
    * collision probability (1 − θ/π) — ~0.5 for borderline cos 0.35
    * pairs, higher for closer ones. */
  test("LSH range search recalls enough exact threshold pairs") {
    val dir = "/root/testdata/sf0.01"
    def pairSet(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select(col("v1"), col("v2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet("sim_range_search")
    val approx = pairSet("sim_range_search_lsh")
    approx.subsetOf(exact) shouldBe true // pruning only, never invention
    val recall = (exact & approx).size.toDouble / exact.size
    withClue(s"range-lsh recall $recall: ") { recall should be >= 0.4 }
  }

  test("brute-force and IVF agree on clustered data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(9)
    val centers = Seq.fill(4)(Array.fill(16)(rng.nextGaussian() * 5.0))
    val emb = (0L until 160L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val prep = Similarity.prepared(emb).persist()
    val queries = prep.filter(col("vec_id") < 4)

    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val brute = pairs(Similarity.cosineTopK(queries, prep, 3))
    val ivf = pairs(Similarity.ivfTopK(prep, queries, 3, nlist = 8, nprobe = 2))

    // recall@3 must be perfect here: true neighbors share the query cell
    brute.keySet.count(k => ivf.get(k).contains(brute(k))) should be >= 10
  }

  /** The r5 scale-killer: centroids grew as n/64, so the broadcast
    * centroid table and the assignment crossJoin were O(n²/64). The
    * fixed-budget rule must yield ~IvfNlist centroids at EVERY corpus
    * size — asserted here on two corpora 4× apart. */
  test("IVF centroid budget is independent of corpus size") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val prep = Similarity.prepared(graft.Tables.embeddings(spark, dir))
      val n = prep.count()
      val stride = Similarity.ivfStride(n)
      val cents = prep.filter(col("vec_id") % stride === 0).count()
      withClue(s"$dir n=$n stride=$stride: ") {
        cents shouldBe Similarity.IvfNlist.toLong
      }
    }
  }

  test("persisted IVF index answers identically to the transient form") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("ivf-index").toString
    val prep = Similarity.prepared(graft.Tables.embeddings(s, dir)).persist()
    val queries = prep.filter(col("vec_id") % 50 === 0)

    Similarity.saveIvfIndex(prep, base, nlist = 8)
    val fromIndex = Similarity.topKFromIvfIndex(s, base, queries, k = 5,
        nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val transient = Similarity.ivfTopKDet(prep, queries, 5,
        nlist = 8, nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)

    fromIndex should not be empty
    fromIndex shouldBe transient
    // the index layout is one directory per cell (partition pruning unit)
    val cells = new java.io.File(s"$base/corpus").listFiles()
      .count(_.getName.startsWith("cell="))
    cells should be > 1
  }

  test("hard negatives exclude the planted near-dup twin for every anchor") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.SparkEntry.queries("sim_hard_negatives")(
      s, "/root/testdata/sf0.001").collect()
    out.length should be > 0
    out.foreach { r =>
      val (anchor, neighbor, cos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      withClue(s"anchor $anchor: ") {
        // the scaled twin (anchor + 10000) must never rank as a negative
        neighbor should not be (anchor + 10000L)
        // and nothing at near-dup similarity survives the cut
        cos should be < 0.99
      }
    }
    // every anchor still gets its full quota of 3 negatives
    out.groupBy(_.getLong(0)).values.foreach(_.length shouldBe 3)
  }

  test("IVF hard negatives hit a recall floor vs the exact twin") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val prep = Dedup.corpusScaledEmb(
      graft.Tables.embeddings(s, "/root/testdata/sf0.001")).persist()
    val anchors = prep.filter(col("vec_id") % 25 === 0 && col("vec_id") < 10000)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.hardNegatives(anchors, prep, 3, 0.99))
    val ivf = pairs(Similarity.hardNegativesIvf(anchors, prep, 3, 0.99))
    // the approximate channel never surfaces a near-dup either
    Similarity.hardNegativesIvf(anchors, prep, 3, 0.99)
      .agg(max(col("cos"))).head.getDouble(0) should be < 0.99
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.6 // sim_topk_ivf regime (0.84 recall@5) applies
    prep.unpersist()
  }

  /** r7: SQ8's 8-bit-per-dim quantization error is tiny relative to
    * inter-vector L2 distances, so its asymmetric top-5 must recover
    * nearly all exact-L2 top-5 neighbors — far above the coarser
    * IVF/LSH floors. Exact sets computed driver-side on the fixture. */
  test("SQ8 top-k hits a high recall floor vs exact L2") {
    val s = spark
    val outRows = Similarity.sq8TopK.fn(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    graft.InternalCaches.releaseAll()
    val vecs = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val exact = vecs.keys.filter(_ % 50 == 0).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          val d = v.zip(vecs(q)).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, id)
        }
        .sortBy(identity).take(5).map { case (_, id) => (q, id) }
    }.toSet
    val recall = outRows.intersect(exact).size.toDouble / exact.size
    withClue(s"sq8 recall $recall: ") { recall should be >= 0.9 }
  }

  test("k-means-refined IVF dispatches from conf alone ≡ explicit path") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val prep = Similarity.prepared(graft.Tables.embeddings(s, dir)).persist()
    val queries = prep.filter(col("vec_id") % Similarity.QueryStride === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toIndexedSeq).sortBy(_.toString)
    val flat = canon(Similarity.ivfTopKDet(prep, queries, 5, nprobe = Similarity.IvfNprobe))
    val explicitKm = canon(Similarity.ivfTopKDetKm(prep, queries, 5))
    try {
      s.conf.set("spark.graft.ivf.kmeansIters", Similarity.KmIters.toString)
      canon(Similarity.ivfTopKDet(prep, queries, 5, nprobe = Similarity.IvfNprobe)) shouldBe explicitKm
    } finally s.conf.unset("spark.graft.ivf.kmeansIters")
    // off-switch restored: back to the stride quantizer
    canon(Similarity.ivfTopKDet(prep, queries, 5, nprobe = Similarity.IvfNprobe)) shouldBe flat
    prep.unpersist()
  }

  test("k-means-refined IVF keeps within-cluster recall on clustered data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(3)
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian() * 5.0))
    val emb = (0L until 120L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val prep = Similarity.prepared(emb).persist()
    val queries = prep.filter(col("vec_id") < 6)
    val got = Similarity
      .ivfTopKDetKm(prep, queries, k = 5, nlist = 6, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    got.length shouldBe 30
    got.foreach { case (q, n) => (n % 3) shouldBe (q % 3) }
    prep.unpersist()
  }

  test("k-means refinement is partition-layout independent") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    def run(parts: Int): IndexedSeq[(Long, Long, Long, Long)] =
      Similarity
        .kmeansAssign(
          Similarity.prepared(
            graft.Tables.embeddings(s, dir).repartition(parts)),
          8, Similarity.KmIters)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toIndexedSeq
    // exact integer picounit sums make the refined centroids — and so
    // the whole assignment, distances included — bit-identical under
    // any partitioning (the property plain-double k-means lacks)
    run(3) shouldBe run(11)
  }

  test("k-means Lloyd iterations do not worsen stride-init inertia") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val prep = Similarity.prepared(graft.Tables.embeddings(s, dir))
    def inertia(iters: Int): (Long, Long, Long) = {
      val rows = Similarity.kmeansAssign(prep, 8, iters).collect()
      (rows.map(_.getLong(2)).sum, rows.length.toLong,
        rows.map(_.getLong(1)).distinct.length.toLong)
    }
    val (i0, n0, _) = inertia(0) // assignment against the raw stride picks
    val (i2, n2, k2) = inertia(Similarity.KmIters)
    n0 shouldBe graft.Tables.embeddings(s, dir).count()
    n2 shouldBe n0 // every vector keeps exactly one cluster
    k2 should be <= 8L
    withClue(s"inertia $i0 -> $i2: ") { i2 should be <= i0 }
    // csize is consistent: per-cid row counts match the reported size
    val byCid = Similarity.kmeansAssign(prep, 8, Similarity.KmIters)
      .collect().groupBy(_.getLong(1))
    byCid.foreach { case (_, rows) =>
      rows.map(_.getLong(3)).distinct.toSeq shouldBe Seq(rows.length.toLong)
    }
  }
}
