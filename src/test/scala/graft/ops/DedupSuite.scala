package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

class DedupSuite extends SparkSessionSuite {

  test("connectedComponents merges chains transitively") {
    val s = spark
    import s.implicits._
    // A 5-node path (min label must travel 4 hops), a 2-node pair, and a
    // triangle — no (1,5) or (20,22) edge exists, so only transitive
    // closure can produce the expected labels.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc1", "doc2")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  /** r13: incremental label maintenance ≡ full rebuild, including the
    * hard cases — a late edge BRIDGING two existing components, a new
    * node attaching to an old component, a brand-new component, and an
    * untouched component whose labels must carry over verbatim. */
  test("incrementalCC equals full rebuild on bridge/attach/new/untouched") {
    val s = spark
    import s.implicits._
    val oldE = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // path component min 1
      (10L, 11L),                             // pair component min 10
      (20L, 21L), (21L, 22L),                 // triangle-ish min 20
      (40L, 41L)).toDF("doc1", "doc2")        // untouched by any new edge
    val newE = Seq(
      (5L, 10L),    // BRIDGES components 1 and 10 → one component, min 1
      (30L, 22L),   // new node into component 20
      (100L, 101L)) // brand-new component
      .toDF("doc1", "doc2")
    val oldLabels = Dedup.connectedComponents(oldE)
    val got = Dedup.incrementalCC(oldLabels, newE)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(oldE.unionAll(newE))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe full
    got(10L) shouldBe 1L   // the bridge really merged
    got(30L) shouldBe 20L  // the attach really labeled
    got(40L) shouldBe 40L; got(41L) shouldBe 40L // carried verbatim
  }

  /** Property: for random graphs under ANY edge split, incremental
    * merge of the held-back edges equals the full one-shot solve. Also
    * pins the degenerate splits (all edges old / all edges new). */
  test("incrementalCC matches full rebuild on random splits") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(1913)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 15
      val edges = Seq.fill(n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val full = Dedup.connectedComponents(edges.toDF("doc1", "doc2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (keepEvery <- Seq(1, 3)) { // 1 = all edges arrive late
        val (late, early) = edges.zipWithIndex
          .partition { case (_, i) => i % keepEvery == 0 }
        val oldLabels =
          Dedup.connectedComponents(early.map(_._1).toDF("doc1", "doc2"))
        val got = Dedup.incrementalCC(
            oldLabels, late.map(_._1).toDF("doc1", "doc2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        withClue(s"trial $trial keepEvery $keepEvery: ") { got shouldBe full }
      }
      // empty late batch: labels carry through unchanged
      val all = Dedup.connectedComponents(edges.toDF("doc1", "doc2"))
      val idle = Dedup.incrementalCC(all,
          Seq.empty[(Long, Long)].toDF("doc1", "doc2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"trial $trial empty batch: ") { idle shouldBe full }
    }
  }

  /** Property: on random graphs, the distributed label propagation must
    * agree exactly with a driver-side union-find. */
  test("connectedComponents matches union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical expected label: min member id per component
      val byRoot = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .groupBy(find).flatMap { case (_, ms) => ms.map(_ -> ms.min) }
      val got = Dedup.connectedComponents(edges.toDF("doc1", "doc2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"trial $trial (n=$n, ${edges.size} edges): ") {
        got shouldBe byRoot
      }
    }
  }

  /** r13 (verdict #7): the SIGNATURE COLLAPSE makes a duplicate FLOOD
    * (1000 byte-identical docs — the input dedup exists for) yield its
    * FULL pair set with no capped drop: the flood is ONE distinct
    * signature, so the bucket never goes hot, and the C(1000,2) intra
    * pairs are output-bound expansion. Under the r12 per-doc count this
    * exact corpus tripped the cap and silently dropped all 499,500
    * pairs. The cap still fires on genuine signature DIVERSITY. */
  test("MinHash flood yields full pairs; diversity over the cap drops and logs") {
    val s = spark
    import s.implicits._
    val flood = (0L until 1000L).map((_, "alpha beta gamma delta epsilon"))
    val pairDocs = Seq(
      (2000L, "zeta eta theta iota kappa"),
      (2001L, "zeta eta theta iota kappa"))
    val corpus = (flood ++ pairDocs).toDF("doc_id", "text")
    val sh = Dedup.shingles(Dedup.encodedToks(corpus))
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true))
    val nPairs =
      try Dedup.lshCandidatePairs(sh).count()
      finally System.setErr(oldErr)
    // the FULL pair relation: C(1000,2) flood pairs + the planted pair;
    // no hot bucket (1 distinct signature each), no logged drop
    nPairs shouldBe (1000L * 999 / 2 + 1)
    errBuf.toString should not include "band bucket"

    // genuine diversity: distinct-signature near-dups sharing a band.
    // cap = 0 makes every bucket hot — banded (inter-group) candidates
    // all drop with a log, while identical-signature pairs (intra) are
    // exempt from the fanout guard by contract.
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val near = docs.unionAll(Dedup.incomingLshBatch(docs))
    val shNear = Dedup.shingles(Dedup.encodedToks(near))
    val uncapped = Dedup.lshCandidatePairs(shNear)
    uncapped.filter(col("n_match") < 16).count() should be > 0L
    val errBuf2 = new java.io.ByteArrayOutputStream()
    System.setErr(new java.io.PrintStream(errBuf2, true))
    val capped =
      try Dedup.lshCandidatePairs(shNear, bucketCap = 0)
        .localCheckpoint(true)
      finally System.setErr(oldErr)
    capped.filter(col("n_match") < 16).count() shouldBe 0L
    errBuf2.toString should include("band bucket")
    // intra pairs (n_match = 16 by construction) survive any cap
    capped.count() shouldBe uncapped.filter(col("n_match") === 16).count()
  }

  /** A 100-node path is the propagation worst case (min label needs 99
    * rounds — past the 50-round budget): the public API must auto-switch
    * to the star algorithm and still produce exact labels, and the star
    * form alone must converge in O(log n) rounds (12 ≫ log₂ 100 ≈ 7,
    * but ≪ the 99 propagation needs). */
  test("ngram-Jaccard flood: distinct-content DfCap keeps every near-dup " +
      "pair a 25-copy flood would have cap-dropped; collapsed ≡ " +
      "member-level reference") {
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val docs = (0 until 25)
      .map(k => base.select((col("doc_id") + k * 100000L).as("doc_id"),
        col("text")))
      .reduce(_ unionAll _).persist()
    try {
      // member-level reference with the DISTINCT-CONTENT df semantics
      val gids = docs.withColumn("gid",
          min(col("doc_id")).over(Window.partitionBy(col("text"))))
        .select(col("doc_id"), col("gid"))
      val shAll = Dedup.shingles(Dedup.encodedToks(docs)).persist()
      val rare = shAll.join(gids, Seq("doc_id"))
        .groupBy(col("x")).agg(count_distinct(col("gid")).as("df"))
        .filter(col("df") <= 20).select(col("x"))
      val sh = shAll.join(rare, Seq("x")).persist()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh.as("a").join(sh.as("b"), col("a.x") === col("b.x") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .agg(count(lit(1)).as("inter"))
      val reference = inter
        .join(sizes.as("s1"), col("s1.doc_id") === col("doc1"))
        .join(sizes.as("s2"), col("s2.doc_id") === col("doc2"))
        .select(col("doc1"), col("doc2"), col("inter"),
          col("s1.sz").as("sz1"), col("s2.sz").as("sz2"),
          round(col("inter").cast("double") /
            (col("s1.sz") + col("s2.sz") - col("inter")), 6).as("jaccard"))
        .filter(col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")) >= 0.5)
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
        .sortBy(t => (t._1, t._2)).toSeq
      val got = canon(Dedup.ngramJaccardPlan(docs))
      got shouldBe canon(reference)
      // recall under flood: every twin pair is present at jaccard 1.0 —
      // the r12-class defect (per-row df >= 25 > DfCap would have
      // dropped every shingle of every flooded doc, emptying the result)
      val intra = got.filter(t => t._2 - t._1 >= 100000L && t._6 == 1.0)
      intra.size should be >= 100 * 300 / 2 // docs with >=3 tokens, C(25,2) each
      got.map(t => (t._1, t._2)) should contain((0L, 100000L))
      shAll.unpersist(); sh.unpersist()
    } finally { docs.unpersist(); graft.InternalCaches.releaseAll() }
  }

  test("high-diameter path falls back to large-star/small-star") {
    val s = spark
    import s.implicits._
    val path = (0L until 99L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val expected = (0L until 100L).map(_ -> 0L).toMap
    val viaStar = Dedup.connectedComponentsStar(path, maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaStar shouldBe expected
    val viaApi = Dedup.connectedComponents(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaApi shouldBe expected
  }

  /** The two CC forms must be interchangeable: bit-identical label maps
    * on graphs where both converge. */
  test("star labels are identical to propagation labels") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("doc1", "doc2")
      val prop = Dedup.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"trial $trial (n=$n): ") { star shouldBe prop }
    }
  }

  /** r13 (verdict #3): graph consumers take the star-edge contract —
    * (gid → member) + one edge per group pair — which must yield
    * bit-identical CC labels to the all-pairs relation at a fraction
    * of the edge volume on a flooded corpus. */
  test("star-edge contract: CC labels identical to the pair-fed run") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // chain corpus (multi-member clusters) + a 40-copy flood (one
    // fat duplicate group)
    val flood = (1L to 40L).map(i =>
      (800000L + i, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Dedup.corpusChain(docs).unionAll(flood)
    val sh = Dedup.shingles(Dedup.encodedToks(corpus))
    val pairs = Dedup.lshCandidatePairs(sh)
      .filter(col("n_match") >= 8).select(col("doc1"), col("doc2"))
      .localCheckpoint(true)
    val edges = Dedup.lshCandidateEdges(sh)
      .filter(col("n_match") >= 8).select(col("doc1"), col("doc2"))
      .localCheckpoint(true)
    // the flood alone is C(40,2) = 780 pairs but only 39 star edges
    (pairs.count() - edges.count()) should be >= (780L - 39L)
    def labelsOf(e: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(e).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    labelsOf(edges) shouldBe labelsOf(pairs)
  }

  test("cc_clusters puts every planted near-dup triple in one cluster") {
    val df = Dedup.ccClusters.fn(spark, "/root/testdata/sf0.001")
    val labels = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every planted chain {d, d+10000, d+20000} that was detected at all
    // must be fully consolidated: all present members share one label.
    val planted = labels.keySet.filter(_ < 10000).filter(_ % 20 == 0)
    planted should not be empty
    planted.foreach { d =>
      val members = Seq(d, d + 10000, d + 20000).filter(labels.contains)
      withClue(s"chain of $d: ") {
        members.map(labels).distinct.size shouldBe 1
      }
    }
    // At least one full triple exists (cluster_size >= 3 via 3 members).
    assert(planted.exists(d =>
      labels.contains(d + 10000) && labels.contains(d + 20000)))
  }

  /** banded ≡ exact must hold beyond the driver fixture (r5, advice: a
    * single-table band made the equality a single-fixture property).
    * Independent seeded corpus: 300 random vectors + 30 planted
    * near-dups (scaled + jittered copies, cos ≈ 0.9999). The two-table
    * Hamming-1 band must recover EVERY cos ≥ 0.99 pair the exact
    * all-pairs kernel finds — deterministic under the fixed seed. */
  test("banded embedding near-dup equals the exact kernel on a perturbed corpus") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    val base = (0L until 300L).map(i =>
      (i, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val planted = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 1000L, v.map(x => x * 1.02f + (rng.nextGaussian() * 0.01).toFloat))
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val prep = Similarity.prepared(emb).persist()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.filter(col("rawcos") >= 0.99).select("v1", "v2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.pairCosineKernel(prep, 0.99))
    val banded = pairs(Similarity.bandedPairCosine(prep))
    exact.size should be >= 25 // the planted near-dups really qualify
    banded shouldBe exact
    prep.unpersist()
  }

  test("semantic dedup: survivors pairwise below threshold per cell; " +
      "co-clustered planted copies dropped") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val prep = Dedup.corpusScaledEmb(
      graft.Tables.embeddings(s, "/root/testdata/sf0.001")).persist()
    val assign = Dedup.semanticAssign(prep).persist()
    val survivors = Dedup.semanticDedup(prep, 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // planted ids (+10000) that landed in their source's cell MUST be
    // dropped (source id is lower, cosine ~ 1), and some must exist for
    // the test to mean anything
    val cells = assign.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coClustered = cells.keys.filter(id =>
      id >= 10000L && cells.get(id - 10000L) == cells.get(id)).toSet
    coClustered.size should be >= 5
    coClustered.intersect(survivors) shouldBe empty

    // the keep rule's invariant: no two SURVIVORS in one cell at >= 0.99
    val sv = assign.filter(col("vec_id").isin(survivors.toSeq: _*))
    val p1 = sv.select(col("cell"), col("vec_id").as("v1"),
      col("v").as("lv"), col("nrm").as("n1"))
    val p2 = sv.select(col("cell"), col("vec_id").as("v2"),
      col("v").as("rv"), col("nrm").as("n2"))
    val maxCos = p1.join(p2, Seq("cell")).filter(col("v1") < col("v2"))
      .select(max(Similarity.dot(col("lv"), col("rv")) /
        (col("n1") * col("n2"))).as("m"))
      .head().getDouble(0)
    maxCos should be < 0.99
    assign.unpersist(); prep.unpersist()
  }

  test("per-row map-side signatures equal the batch signature chain") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    // corpus incl. the planted batch (covers the short synthetic docs)
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionAll(Dedup.incomingLshBatch(docs)).persist()
    val h = Dedup.SignatureHashes
    val batchSig = Dedup.corpusSignatures(corpus)
    val rowSig = Dedup.withRowSignature(corpus, "text")
    val sigCols = (0 until h).map(j => s"mh$j") ++
      (0 until Dedup.SignatureBands).map(b => s"band$b")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select((col("doc_id") +: sigCols.map(col)): _*)
        .orderBy(col("doc_id")).collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val batchRows = canon(Dedup.corpusBandRows(batchSig)
      .groupBy(col("doc_id")).pivot("bi").agg(first(col("bv")))
      .withColumnsRenamed(Map("0" -> "band0", "1" -> "band1"))
      .join(batchSig, Seq("doc_id")))
    val rowRows = canon(rowSig.filter(col("band0").isNotNull))
    batchRows.length should be > 500 // every doc with >= 3 tokens signs
    rowRows shouldBe batchRows
    // docs too short to shingle get null signatures — exactly the docs
    // absent from the batch signature table
    val nullRows = rowSig.filter(col("band0").isNull).count()
    nullRows shouldBe (corpus.count() - batchRows.length)
    corpus.unpersist()
  }

  test("persisted band index: probe evidence equals inline; buckets prune") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("bandidx").toString
    Dedup.saveBandIndex(docs, dir)
    val batch = Dedup.incomingLshBatch(docs)

    // evidence from the persisted probe == evidence computed inline
    // (the st_lsh_dedup flow) on the same batch
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("incoming_id", "existing_id", "bi").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val persisted = canon(Dedup.probeBandIndex(s, dir, batch))
    val h = Dedup.SignatureHashes
    val sig = Dedup.corpusSignatures(docs)
    val idx = Dedup.corpusBandRows(sig).withColumnRenamed("doc_id", "existing_id")
    val ssig = (0 until h).foldLeft(
      sig.withColumnRenamed("doc_id", "existing_id"))((acc, j) =>
      acc.withColumnRenamed(s"mh$j", s"smh$j"))
    val signed = Dedup.withRowSignature(batch, "text")
      .withColumnRenamed("doc_id", "incoming_id")
    val probe = signed.select(
      (col("incoming_id") +: (0 until h).map(j => col(s"mh$j"))) :+
        explode(array((0 until Dedup.SignatureBands).map(b =>
          struct(lit(b).as("bi"), col(s"band$b").as("bv"))): _*)).as("band"): _*)
      .select((col("incoming_id") +: (0 until h).map(j => col(s"mh$j"))) :+
        col("band.bi").as("bi") :+ col("band.bv").as("bv"): _*)
    val nMatch = (0 until h)
      .map(j => when(col(s"mh$j") === col(s"smh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val inline = canon(probe.join(idx, Seq("bi", "bv")).join(ssig, Seq("existing_id"))
      .withColumn("n_match", nMatch).filter(col("n_match") >= 8)
      .select(col("incoming_id"), col("existing_id"), col("bi"), col("n_match")))
    inline.length should be > 10
    persisted shouldBe inline

    // a small probe touches few buckets -> the index scan prunes.
    // The planted 1-token doc has no shingles (null bands) — it must
    // neither crash the touched-bucket collection nor emit evidence.
    import s.implicits._
    val small = batch.orderBy("doc_id").limit(2)
      .unionAll(Seq((99999L, "short")).toDF("doc_id", "text"))
    val q = Dedup.probeBandIndex(s, dir, small)
    q.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan)
      .find(_.toString.contains("bands")).get
    val totalBuckets = new java.io.File(s"$dir/bands").listFiles()
      .count(_.getName.startsWith("bucket="))
    val readParts = scan.metrics("numPartitions").value
    readParts should be <= 4L // 2 docs x 2 bands
    readParts should be < totalBuckets.toLong
  }

  test("incremental LSH: synthetic new docs admitted, near-dup variants rejected") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.SparkEntry.queries("dedup_incremental_lsh")(
      s, "/root/testdata/sf0.001")
    val survivors = out.collect().map(_.getLong(0)).toSet
    val synthetic = survivors.filter(_ >= 60000L)
    val nearDupSurvivors = survivors.filter(id => id >= 50000L && id < 60000L)
    // every genuinely-new synthetic doc is admitted (no shingle overlap
    // with the corpus, so it can never band-collide into a rejection)
    synthetic.size shouldBe 25
    // near-dup variants are rejected at the banding's expected recall:
    // a drop-1-token variant at Jaccard ~0.9+ escapes BOTH 8-row bands
    // only with small probability, so at most a few of the 25 survive
    nearDupSurvivors.size should be <= 3
  }

  /** r7 (verdict #5): a degenerate clustering that lands the whole
    * corpus in ONE cell must not go silently quadratic — over-cap
    * cells are excluded from the pair stage (members all kept, with a
    * logged drop), while the same clustering under a generous cap
    * still dedups normally. nlist = 1 forces the one-cell case. */
  test("semanticDedup: over-cap cells skip the pair stage, members kept") {
    val s = spark
    val prep = Dedup.corpusScaledEmb(
      graft.Tables.embeddings(s, "/root/testdata/sf0.001")).localCheckpoint()
    val n = prep.count() // 500 base + 20 planted scaled copies
    val capped = Dedup.semanticDedup(prep, 0.99, nlist = 1, cellCap = 50)
    capped.count() shouldBe n // hot cell flagged, nothing dropped
    val uncapped = Dedup.semanticDedup(prep, 0.99, nlist = 1, cellCap = 100000)
    // with the pair stage active the 20 planted copies drop (sources
    // are lower-id, cos ~ 1); max natural pair cosine is 0.51
    uncapped.count() shouldBe (n - 20)
  }

  /** r7: exact-substring span dedup keeps a shared span only in its
    * canonical (min doc_id) document, cuts it from every copy, and
    * leaves unique text untouched — including unique prefix/suffix text
    * in documents that carry a duplicated span. */
  test("substringSpanDedup: canonical keeps span, copies are cut") {
    val s = spark
    import s.implicits._
    val span = (1 to 9).map(i => s"shared$i").mkString(" ") // 9 toks > SubLen=8
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),          // canonical holder
      (2L, s"epsilon zeta $span eta theta"),          // copy: span cut
      (3L, "iota kappa lambda mu nu xi omicron pi rho sigma")) // unique
      .toDF("doc_id", "text")
    val out = Dedup.substringSpanDedup(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    graft.InternalCaches.releaseAll()

    // doc 1: 13 tokens, span covered (9 toks dup) but ALL kept (canonical)
    out(1L).getLong(1) shouldBe 13L
    out(1L).getLong(3) shouldBe 9L  // n_dup_tokens
    out(1L).getLong(4) shouldBe 13L // n_kept_tokens: canonical keeps span
    // doc 2: 13 tokens, 9 dup tokens cut -> 4 kept (its unique corners)
    out(2L).getLong(3) shouldBe 9L
    out(2L).getLong(4) shouldBe 4L
    // doc 3: untouched
    out(3L).getLong(2) shouldBe 0L  // n_dup_windows
    out(3L).getLong(4) shouldBe 10L
    // doc 2's reconstruction = its four unique tokens, md5-pinned
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("epsilon zeta eta theta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    out(2L).getString(6) shouldBe md5
  }
}
