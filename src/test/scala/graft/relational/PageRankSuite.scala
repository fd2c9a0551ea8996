package graft.relational

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

/** Pins the [[AdvancedQueries.pageRank]] lifecycle claims (r7, verdict):
  * (1) a long run (50 rounds) neither blows up plan depth — each round
  * ends in an eager localCheckpoint, so the final frame's lineage is
  * shallow no matter the round count — nor drifts off the fixpoint;
  * (2) the convergence stop is exact: it fires only at a rounded
  * fixpoint, so a tol=0 run and a forced full-length run return
  * identical values; (3) general out-degrees divide correctly (the
  * query graph is 3-regular, which would mask a wrong denominator). */
class PageRankSuite extends SparkSessionSuite {

  private val dir = "/root/testdata/sf0.001"

  private def fixtureGraph(s: org.apache.spark.sql.SparkSession) = {
    val nodes = graft.Tables.documents(s, dir)
      .select(col("doc_id").as("v"))
    val n = nodes.count()
    val edges = Seq((7L, 1L), (13L, 3L), (29L, 11L)).map { case (m, c) =>
      nodes.select(col("v").as("src"), ((col("v") * m + c) % n).as("dst"))
    }.reduce(_ unionAll _)
    (nodes, edges)
  }

  test("50 rounds on the fixture graph: shallow plan, fixpoint unchanged") {
    val s = spark
    val (nodes, edges) = fixtureGraph(s)
    // tol = -1 forces ALL 50 rounds (delta can never be <= -1), so this
    // exercises the long-run path the convergence stop would normally
    // cut short.
    val long = AdvancedQueries.pageRank(nodes, edges, maxIters = 50,
      tol = -1.0)
    // per-round localCheckpoint => the returned frame's plan hangs off
    // one materialized RDD scan, not 50 nested join/agg layers
    val planNodes = long.queryExecution.optimizedPlan.collect { case p => p }.size
    planNodes should be < 10
    val five = AdvancedQueries.pageRank(nodes, edges, maxIters = 5,
      tol = -1.0)
    // the fixture graph is 3-in/3-out regular: uniform rank is the exact
    // fixpoint, so 50 rounds == 5 rounds bit-for-bit
    long.select(col("v"), col("r")).exceptAll(five).count() shouldBe 0L
    five.exceptAll(long.select(col("v"), col("r"))).count() shouldBe 0L
  }

  test("convergence stop returns the same values as a forced full run") {
    val s = spark
    val (nodes, edges) = fixtureGraph(s)
    val stopped = AdvancedQueries.pageRank(nodes, edges, maxIters = 50)
    val forced = AdvancedQueries.pageRank(nodes, edges, maxIters = 50,
      tol = -1.0)
    stopped.exceptAll(forced).count() shouldBe 0L
    forced.exceptAll(stopped).count() shouldBe 0L
  }

  test("non-regular out-degrees divide by the node's own degree") {
    val s = spark
    import s.implicits._
    // star + chain: 0 -> {1,2,3}, 1 -> 2. Node 0 has outdeg 3, node 1
    // outdeg 1; a denominator bug (fixed 3) would show on node 2's rank.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("v")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val r1 = AdvancedQueries.pageRank(nodes, edges, maxIters = 1, tol = -1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = 0.15 / 4
    r1(0L) shouldBe (base +- 1e-9) // no in-edges
    r1(1L) shouldBe (base + 0.85 * 0.25 / 3 +- 1e-9)
    r1(2L) shouldBe (base + 0.85 * (0.25 / 3 + 0.25 / 1) +- 1e-9)
    r1(3L) shouldBe (base + 0.85 * 0.25 / 3 +- 1e-9)
  }

  /** r16 (r15 verdict #4): triangles orient wedges by (degree, id) —
    * the per-node counts must be identical to a brute-force reference
    * over the same derived edge set (the count is orientation-
    * invariant; a wrong orientation double-counts or drops triangles
    * at rank ties, which the query graph's many degree-equal nodes
    * exercise heavily). */
  test("degree-ordered triangles match a brute-force per-node count") {
    val s = spark
    val rows = AdvancedQueries.triangles.fn(s, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force reference, driver-side: same edge derivation
    val nodes = graft.Tables.documents(s, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val n = nodes.length.toLong
    val und = nodes.flatMap { v =>
      val ds = Seq((v + 1) % n, (v + 2) % n, v - v % 100) ++
        (if (v % 7 == 0) Seq(0L) else Nil)
      ds.filter(_ != v).map(d => (math.min(v, d), math.max(v, d)))
    }.toSet
    val adj = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      .withDefaultValue(Set.empty[Long])
    val cnt = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- und; c <- adj(b) if und.contains((a, c))) {
      cnt(a) += 1; cnt(b) += 1; cnt(c) += 1
    }
    rows.size shouldBe n
    nodes.foreach { v =>
      withClue(s"node $v: ") { rows(v) shouldBe cnt(v) }
    }
    rows.values.sum should be > 0L // fixture actually has triangles
  }
}
