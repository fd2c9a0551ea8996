package graft.plans

import graft.fm.SparkSessionSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: on randomized inputs (duplicate keys, duplicate
  * times, nulls, empty sides, keys present on only one side), the
  * custom sort-merge operator must agree row-for-row with an
  * independent in-memory reference implementation of backward-as-of
  * semantics. Random layouts also exercise the merge across many
  * partition/ordering shapes. */
class AsOfJoinPropertySuite extends SparkSessionSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1234L + i)))

  // small domains force key/time collisions
  private val keyGen = Gen.option(Gen.choose(0, 5))
  private val timeGen = Gen.option(Gen.choose(0L, 40L))

  private def sideGen(maxRows: Int): Gen[List[(Option[Int], Option[Long], Int)]] =
    for {
      n <- Gen.choose(0, maxRows)
      rows <- Gen.listOfN(n, for {
        k <- keyGen
        t <- timeGen
      } yield (k, t))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i) }

  /** Reference: for each left row, the ACCEPTABLE matches are exactly
    * the right rows with the maximum time <= t under the same
    * (non-null) key (empty set = must null-extend). With duplicate
    * (key, time) rows the sort order among ties is layout-dependent, so
    * any max-time row is a correct buffer — the fixture queries keep
    * right times unique per key for full determinism. */
  private def reference(
      left: Seq[(Option[Int], Option[Long], Int)],
      right: Seq[(Option[Int], Option[Long], Int)],
      tol: Option[Long]): Map[Int, Set[Int]] =
    left.map { case (lk, lt, lid) =>
      lid -> ((lk, lt) match {
        case (Some(k), Some(t)) =>
          val cands = right.filter { case (rk, rt, _) =>
            rk.contains(k) && rt.exists(rv =>
              rv <= t && tol.forall(x => t - rv <= x))
          }
          cands.map(_._2.get).maxOption match {
            case Some(best) =>
              cands.filter(_._2.contains(best)).map(_._3).toSet
            case None => Set.empty[Int]
          }
        case _ => Set.empty[Int]
      })
    }.toMap

  /** Forward mirror of [[reference]]: acceptable matches are the right
    * rows at the MINIMUM time >= t under the same key, with tolerance
    * bounding `rt - t`. */
  private def referenceForward(
      left: Seq[(Option[Int], Option[Long], Int)],
      right: Seq[(Option[Int], Option[Long], Int)],
      tol: Option[Long]): Map[Int, Set[Int]] =
    left.map { case (lk, lt, lid) =>
      lid -> ((lk, lt) match {
        case (Some(k), Some(t)) =>
          val cands = right.filter { case (rk, rt, _) =>
            rk.contains(k) && rt.exists(rv =>
              rv >= t && tol.forall(x => rv - t <= x))
          }
          cands.map(_._2.get).minOption match {
            case Some(best) =>
              cands.filter(_._2.contains(best)).map(_._3).toSet
            case None => Set.empty[Int]
          }
        case _ => Set.empty[Int]
      })
    }.toMap

  test("random fuzz: forward direction vs reference semantics") {
    val s = spark
    import s.implicits._
    val cases = samples(
      for {
        l <- sideGen(25)
        r <- sideGen(25)
        tol <- Gen.option(Gen.choose(0L, 15L))
      } yield (l, r, tol), 40)
    cases should not be empty
    cases.zipWithIndex.foreach { case ((l, r, tol), i) =>
      val left = l.toDF("k", "t", "lid")
      val right = r.toDF("rk", "rt", "rid")
      val forms: Seq[Boolean] =
        if (i < 6) Seq(false, true) else Seq(i % 2 == 1)
      val expect = referenceForward(l, r, tol)
      forms.foreach { bcast =>
        val got = AsOf.joinForward(left, right, Seq("k" -> "rk"), "t", "rt",
            tol, broadcastRight = Some(bcast))
          .select("lid", "rid").collect()
          .map(row => row.getInt(0) ->
            (if (row.isNullAt(1)) None else Some(row.getInt(1))))
          .toMap
        withClue(s"case $i (broadcast=$bcast): left=$l right=$r tol=$tol\n") {
          got.keySet shouldBe expect.keySet
          got.foreach { case (lid, rid) =>
            withClue(s"lid=$lid got=$rid acceptable=${expect(lid)}: ") {
              rid match {
                case Some(r0) => assert(expect(lid).contains(r0))
                case None => assert(expect(lid).isEmpty)
              }
            }
          }
        }
      }
    }
  }

  test("random fuzz vs reference semantics, with and without tolerance") {
    val s = spark
    import s.implicits._
    val cases = samples(
      for {
        l <- sideGen(25)
        r <- sideGen(25)
        tol <- Gen.option(Gen.choose(0L, 15L))
      } yield (l, r, tol), 60)
    cases should not be empty

    cases.zipWithIndex.foreach { case ((l, r, tol), i) =>
      val left = l.toDF("k", "t", "lid")
      val right = r.map { case (k, t, id) => (k, t, id) }
        .toDF("rk", "rt", "rid")
      // Both physical forms (alternating per case to bound runtime,
      // both pinned on the first cases) must satisfy the same
      // reference semantics.
      val forms: Seq[Boolean] =
        if (i < 10) Seq(false, true) else Seq(i % 2 == 1)
      val expect = reference(l, r, tol)
      forms.foreach { bcast =>
        val got = AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt", tol,
            broadcastRight = Some(bcast))
          .select("lid", "rid").collect()
          .map(row => row.getInt(0) ->
            (if (row.isNullAt(1)) None else Some(row.getInt(1))))
          .toMap
        withClue(s"case $i (broadcast=$bcast): left=$l right=$r tol=$tol\n") {
          got.keySet shouldBe expect.keySet // exactly one row per left row
          got.foreach { case (lid, rid) =>
            withClue(s"lid=$lid got=$rid acceptable=${expect(lid)}: ") {
              rid match {
                case Some(r0) => assert(expect(lid).contains(r0))
                case None => assert(expect(lid).isEmpty)
              }
            }
          }
        }
      }
    }
  }
}
