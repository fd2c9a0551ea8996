package graft.relational

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the z-order layout's two claims: (1) the arithmetic locality
  * guarantee — fixing the z-value's bits above 2k fixes both dims'
  * bits above k, so every z-bucket spans < 2^k on BOTH keys; (2) the
  * layout payoff — after writing files z-range-partitioned, a small
  * rectangle query's (min,max) stats intersect only a few files, i.e.
  * column stats prune on BOTH dimensions, which a single-column sort
  * only gives its leading column. */
class ZOrderLayoutSuite extends SparkSessionSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every z-bucket spans fewer than 128 values on both dims") {
    val s = spark
    val out = graft.SparkEntry.queries("adv_zorder_layout")(s, dir).collect()
    out.length should be >= 2 // sf0.001's key range fills few buckets
    out.foreach { r =>
      val (minP, maxP) = (r.getLong(2), r.getLong(3))
      val (minS, maxS) = (r.getLong(4), r.getLong(5))
      withClue(s"bucket ${r.getLong(0)}: ") {
        (maxP - minP) should be < 128L
        (maxS - minS) should be < 128L
      }
    }
  }

  test("z-value interleave is a bijection on 31-bit pairs") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    // mix of small (fixture-sized) and large (SF100-key-sized) values —
    // 16-bit interleave would alias the latter (x vs x + 65536)
    val pairs = Seq.fill(250)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong)) ++
      Seq.fill(250)((rng.nextInt(Int.MaxValue).toLong, rng.nextInt(Int.MaxValue).toLong))
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), AdvancedQueries.zCol(col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // de-interleave: even bits back to a, odd bits back to b
      val a2 = (0 until 31).map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
      val b2 = (0 until 31).map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
      (a2, b2) shouldBe ((a, b))
    }
    // distinct inputs => distinct z-values (injective on the sample)
    out.map(_.getLong(2)).distinct.length shouldBe pairs.distinct.length
  }

  test("z-range-partitioned files stats-prune a two-dim rectangle query") {
    val s = spark
    val li = graft.Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zval", AdvancedQueries.zCol(col("l_partkey"), col("l_suppkey")))
    val outDir = java.nio.file.Files.createTempDirectory("zorder").toString
    li.repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(outDir)

    // per-file (min,max) rectangles — what parquet footer stats expose
    val rects = s.read.parquet(outDir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
        min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
      .collect()
    val nFiles = rects.length
    nFiles should be >= 8
    // a 64x64 rectangle query in the middle of both key ranges; a file
    // must be READ iff its [min,max] box INTERSECTS the rectangle on
    // both dims (containment would undercount and pass vacuously)
    val (pLo, pHi, sLo, sHi) = (512L, 575L, 32L, 95L)
    val intersecting = rects.count { r =>
      r.getLong(2) >= pLo && r.getLong(1) <= pHi &&
        r.getLong(4) >= sLo && r.getLong(3) <= sHi
    }
    // z-layout: only the files whose z-range covers the rectangle's
    // interleaved prefix can intersect — a strict minority. A
    // suppkey-only filter would hit every file under a partkey-sorted
    // layout; here both dims prune.
    intersecting should be < (nFiles / 2)
  }
}
