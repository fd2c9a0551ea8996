package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY 100× probe for the r13 vector collapse (deleted after the
  * record, per the r12 Scale100BandDrive convention).
  *
  * The 100× fixture (synth_scale copies=100 over sf0.1) gives every
  * vector 99 byte-identical twins. No external oracle fits that scale,
  * but the collapse makes one DERIVABLE: the 100× output of an exact
  * pair query is precisely the member expansion of its 1× unique-pair
  * output —
  *   rows(K) = pairs_1x · K² + uQual · K(K−1)/2
  *   Σ round(cos·1e6)(K) = K² · Σ_1x + C(K,2) · Σ_selfQual
  * where uQual / Σ_selfQual count the unique vectors whose self-cosine
  * clears the threshold. Both identities are asserted EXACTLY (integer
  * units), making the 1× DuckDB-checked output the oracle for the 100×
  * run.
  */
object Scale100CosDrive {
  def main(args: Array[String]): Unit = {
    val Array(dir1x, dir100x) = args
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val K = 100L

    def run(name: String)(body: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (rows, ck) = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name: rows=$rows ck=$ck in $dt%.1f s")
      graft.InternalCaches.releaseAll()
      spark.catalog.clearCache()
    }

    // --- 1x ground truth (the DuckDB-checked query shape) ---
    val prep1 = graft.ops.Similarity.prepared(graft.Tables.embeddings(spark, dir1x))
    val pairs1 = graft.ops.Similarity.rangeSearchPairs(prep1, 0.35)
      .select(col("v1"), col("v2"),
        (floor(col("rawcos") * 1e6 + 0.5)).cast("long").as("c6"))
      .agg(count(lit(1)).as("n"), sum(col("c6")).as("ck")).head()
    val (p1, ck1) = (pairs1.getLong(0), pairs1.getLong(1))
    // dot_product_q is registered by GraftExtensions — the same kernel
    // Similarity.dot resolves to in this session
    val self1 = prep1
      .select((call_function("dot_product_q", col("v"), col("v"))
        / (col("nrm") * col("nrm"))).as("sc"))
      .filter(col("sc") >= 0.35)
      .select(floor(col("sc") * 1e6 + 0.5).cast("long").as("c6"))
      .agg(count(lit(1)).as("u"), sum(col("c6")).as("ck")).head()
    val (uQual, ckSelf) = (self1.getLong(0), self1.getLong(1))
    println(s"[probe] 1x: pairs=$p1 ck=$ck1 uQual=$uQual ckSelf=$ckSelf")
    val expRows = p1 * K * K + uQual * K * (K - 1) / 2
    val expCk = ck1 * K * K + ckSelf * K * (K - 1) / 2
    graft.InternalCaches.releaseAll(); spark.catalog.clearCache()

    // --- 100x: the dispatched flagship, asserted against the closed form
    val prep100 = graft.InternalCaches.register(
      graft.ops.Similarity.prepared(
        graft.Tables.embeddings(spark, dir100x)).persist())
    run("sim_range_search_auto@100x") {
      val r = graft.ops.Similarity.rangeSearchPairs(prep100, 0.35)
        .select((floor(col("rawcos") * 1e6 + 0.5)).cast("long").as("c6"))
        .agg(count(lit(1)).as("n"), sum(col("c6")).as("ck")).head()
      val (rows, ck) = (r.getLong(0), r.getLong(1))
      assert(rows == expRows, s"rows $rows != expected $expRows")
      assert(ck == expCk, s"checksum $ck != expected $expCk")
      (rows, ck)
    }

    // --- 100x top-k: every query's top-5 must be its 5 smallest twin
    // ids (self-cosine ~1 dominates the <=0.51 background), a pure id
    // computation from group membership — a second derived oracle.
    run("sim_topk_brute@100x") {
      val queries = prep100.filter(col("vec_id") % 50 === 0)
      val got = graft.ops.Similarity.cosineTopK(queries, prep100, 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
      val members = prep100.select(col("vec_id"), col("v"))
        .withColumn("gid", min(col("vec_id"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("v"))))
        .select(col("gid"), col("vec_id"))
      val qm = members.join(queries.select(col("vec_id")), Seq("vec_id"))
        .select(col("vec_id").as("query_id"), col("gid"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cand"))
      val expected = qm.join(members.withColumnRenamed("vec_id", "cand"),
          Seq("gid"))
        .filter(col("cand") =!= col("query_id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("cand").as("neighbor_id"))
      val diff = got.exceptAll(expected).count() +
        expected.exceptAll(got).count()
      assert(diff == 0, s"top-k mismatch: $diff rows differ")
      (got.count(), 0L)
    }

    println("[probe] 100x cosine probes PASS")
    spark.stop()
  }
}
