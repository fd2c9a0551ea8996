package graft.functions

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._

class GramRunStatsSuite extends SparkSessionSuite {

  /** Brute-force reference: space-joined n-grams counted in plain
    * Scala — the semantics both previous ta_repetition plans (the
    * (doc, gram) hash aggregation and the sorted-array fold) computed,
    * and the DuckDB oracle still computes. */
  private def ref(toks: Seq[String], n: Int): (Long, Long, Long) = {
    val total = math.max(toks.length - n + 1, 0)
    val counts = toks.sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq.groupBy(identity).map(_._2.size.toLong)
    val best = if (counts.isEmpty) 0L else counts.max
    val dup = counts.filter(_ > 1L).sum
    (best, dup, total.toLong)
  }

  test("gram_run_stats equals brute-force gram counting") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    // edge shapes: empty, shorter than n, exactly n, all-identical
    // tokens (max run), high-duplication, and random mixes
    val docs: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("a"), Seq("a", "b"), Seq("a", "a", "a"),
        Seq("x", "y", "x", "y", "x", "y")) ++
      Seq.fill(300) {
        val n = rng.nextInt(40)
        val vocab = 1 + rng.nextInt(6) // small vocab => many repeated grams
        (0 until n).map(_ => s"t${rng.nextInt(vocab)}")
      } ++
      // long docs stress the packed-key open-addressing fast path
      // (probe chains, id interning at scale); tiny vocab forces heavy
      // gram multiplicity
      Seq.fill(4) {
        val vocab = 2 + rng.nextInt(60)
        (0 until 3000 + rng.nextInt(3000)).map(_ => s"w${rng.nextInt(vocab)}")
      }
    // n = 2, 3 run the packed fast path; n = 4 runs the string path
    // (the guard route), pinning both to the same reference
    for (n <- Seq(2, 3, 4)) {
      val got = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("id", "toks")
        .select(col("id"), expr(s"gram_run_stats(toks, $n)").as("r"))
        .select(col("id"), col("r.best"), col("r.dup"), col("r.total"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      docs.zipWithIndex.foreach { case (d, i) =>
        withClue(s"n=$n doc=$i toks=${d.take(12).mkString(",")}") {
          got(i.toLong) shouldBe ref(d, n)
        }
      }
    }
  }

  test("gram_run_stats guard inputs: null / empty / separator tokens") {
    val s = spark
    import s.implicits._
    // Joined-string reference with concat_ws null-skip semantics — the
    // intended semantics for ALL inputs (r17 advice: the fast path must
    // route rows where token-tuple identity and joined-string identity
    // diverge to the string path, not silently count them differently).
    def refG(toks: Seq[Option[String]], n: Int): (Long, Long, Long) = {
      val total = math.max(toks.length - n + 1, 0)
      val counts = toks.sliding(n).filter(_.length == n)
        .map(_.flatten.mkString(" ")).toSeq
        .groupBy(identity).map(_._2.size.toLong)
      val best = if (counts.isEmpty) 0L else counts.max
      val dup = counts.filter(_ > 1L).sum
      (best, dup, total.toLong)
    }
    val docs: Seq[Seq[Option[String]]] = Seq(
      // separator-bearing tokens: ["a b","c"] and ["a","b c"] join to
      // the SAME gram "a b c" — tuple identity would split them
      Seq(Some("a b"), Some("c"), Some("a"), Some("b c"), Some("a b")),
      // null elements (concat_ws skips them in the join)
      Seq(Some("a"), None, Some("a"), Some("a"), None, Some("a")),
      // empty-string tokens (kept by concat_ws, unlike nulls)
      Seq(Some(""), Some("a"), Some(""), Some("a"), Some("")),
      // mixes of all three guard classes
      Seq(Some("x y"), None, Some(""), Some("x"), Some("y"), Some("x y"),
        Some("x"), Some("y")),
      Seq(Some(" "), Some(" "), Some(" "), Some("q")))
    for (n <- Seq(1, 2, 3, 4)) {
      val got = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("id", "toks")
        .select(col("id"), expr(s"gram_run_stats(toks, $n)").as("r"))
        .select(col("id"), col("r.best"), col("r.dup"), col("r.total"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      docs.zipWithIndex.foreach { case (d, i) =>
        withClue(s"n=$n doc=$i toks=${d.take(12).mkString(",")}") {
          got(i.toLong) shouldBe refG(d, n)
        }
      }
    }
  }

  test("gram_run_stats rejects n < 1") {
    val s = spark
    import s.implicits._
    for (bad <- Seq(0, -1)) {
      val e = intercept[Exception] {
        Seq((1L, Seq("a", "b", "c"))).toDF("id", "toks")
          .select(expr(s"gram_run_stats(toks, $bad)")).collect()
      }
      e.getMessage should include("n must be >= 1")
    }
  }

  test("gram_run_stats null array yields null") {
    val s = spark
    import s.implicits._
    val got = Seq((1L, Some(Seq("a", "b"))), (2L, None))
      .toDF("id", "toks")
      .select(col("id"), expr("gram_run_stats(toks, 2)").as("r"))
      .orderBy(col("id")).collect()
    got(0).isNullAt(1) shouldBe false
    got(1).isNullAt(1) shouldBe true
  }
}
