package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY dev drive (r12, judge item 6): 100× correctness probe for
  * the banded Hamming families. The DuckDB oracles cannot run at this
  * scale (the all-pairs twin is ~1.3e11 pair evaluations) and the full
  * outputs are quadratic by fixture construction (~7e8 rows), so the
  * check is ROUTE INVARIANCE BY CHECKSUM: brute, banded, and auto must
  * agree on (row count, Σ hash(id1,id2,hamming)) — any tie-rule, cap,
  * or expansion defect that survives 10× and bites at 100× splits the
  * checksums. Deleted after the probe (verify-skill convention). */
object Scale100Drive {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale100")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("id1"), col("id2"), col("hamming"))), lit(0L)).as("h"),
        coalesce(sum(col("hamming")), lit(0L)).as("s")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[100x] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // family probes: run each route by session conf (the queries are
    // un-pinned by design; oracle is route-invariant)
    def routed(q: String, route: String): (Long, Long, Long) = {
      val conf = spark.conf
      route match {
        case "banded" =>
          conf.set("spark.graft.hamming.auto.minBrute", "0")
          conf.set("spark.graft.hamming.auto.sharePct", "100000")
        case "brute" =>
          conf.set("spark.graft.hamming.auto.minBrute", Long.MaxValue.toString)
        case _ =>
      }
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val renamed = q match {
          case "dedup_simhash_auto" =>
            df.select(col("doc1").as("id1"), col("doc2").as("id2"), col("hamming"))
          case _ =>
            df.select(col("ida").as("id1"), col("idb").as("id2"), col("hamming"))
        }
        timed(s"$q/$route")(checksum(renamed))
      } finally {
        conf.unset("spark.graft.hamming.auto.minBrute")
        conf.unset("spark.graft.hamming.auto.sharePct")
        graft.InternalCaches.releaseAll()
        spark.catalog.clearCache()
      }
    }

    var failed = false
    for (q <- Seq("dedup_simhash_auto", "mm_phash_dedup", "mm_fuzzy_dedup")) {
      val byRoute = Seq("auto", "banded", "brute").map(r => r -> routed(q, r))
      val distinct = byRoute.map(_._2).distinct
      if (distinct.size == 1)
        println(s"[100x] $q ROUTE-INVARIANT ${byRoute.head._2}")
      else {
        println(s"[100x] $q MISMATCH: $byRoute")
        failed = true
      }
    }

    // ingest-grow: lifecycle survives 100x; report admission counts
    val grow = timed("dedup_ingest_grow") {
      graft.SparkEntry.queries("dedup_ingest_grow")(spark, dir)
        .groupBy(col("batch_no")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println(s"[100x] dedup_ingest_grow admissions: $grow")

    // cosine dispatch decision at 200k vectors (decision only — the
    // pair output is quadratic by construction at this fixture)
    val prep = graft.ops.Similarity.prepared(
      graft.Tables.embeddings(spark, dir)).persist()
    val d = timed("rangeDispatchDecision") {
      graft.ops.Similarity.rangeDispatchDecision(prep)
    }
    println(s"[100x] range dispatch: n=${d.n} lsh=${d.lshPairs} " +
      s"brute=${d.brutePairs} useBrute=${d.useBrute} (${d.reason})")

    println(if (failed) "[100x] FAIL" else "[100x] OK")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
