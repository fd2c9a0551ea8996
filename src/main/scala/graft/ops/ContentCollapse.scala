package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, OneRowRelation, Range}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** THE shared (row count, distinct content) pre-pass behind every
  * content-collapse entry point ([[HammingBands.pairs]],
  * [[Similarity.collapsedCosinePairs]], [[Similarity.collapsedTopK]],
  * `Dedup.ngramJaccardPlan`): one single-row action that decides
  * dup-free skip vs collapse. Two r13 cost fixes live here, shared by
  * all four engines instead of four private copies:
  *
  *  1. '''Hashed distinct''' (r13 advice): `count_distinct` runs over a
  *     64-bit `xxhash64` of the content, not the content itself — a
  *     full-array/full-text grouping shuffled the entire corpus content
  *     per call just to pick a route. A hash COLLISION can only
  *     undercount distincts, i.e. only falsely trigger the collapse
  *     path — which groups by FULL content and stays exact — so the
  *     dup-free skip (`n == u` forces `u_true == n`) is collision-safe.
  *     Null contents keep the standing convention: never counted, so
  *     they force the collapse path (whose builders drop or isolate
  *     them).
  *  2. '''Session-scoped memo''' (r13 verdict #4): the battery charged
  *     this action ~15×/run at 1× (+0.2–0.5 s/query). Keyed by
  *     (session token, analyzed-plan semantic hash, content expression,
  *     input-file fingerprint) — the `AsOfSkew.detectMemo` pattern. The
  *     fingerprint (names/sizes/mtimes of every file the plan scans,
  *     via [[graft.Tables.pathFingerprint]]) makes mid-session input
  *     mutation safe: a lifecycle query that rewrites its staged dir
  *     re-fingerprints on the next call and recomputes. Plans with a
  *     leaf the fingerprint cannot see through (localCheckpoint RDDs,
  *     v2 sources, streaming) are computed fresh every call — never
  *     cached wrong, just not cached. Unlike the as-of detect memo the
  *     stakes of a stale entry would only be plan choice anyway (both
  *     routes are exact — the collapse-invariance contract), but the
  *     fingerprint holds the stronger freshness property regardless.
  *     Opt out per session with `spark.graft.collapse.statsCache=false`.
  */
private[graft] object ContentCollapse {

  /** (session token, plan semanticHash, content expr, input fingerprint)
    * -> (n, u). Entries are two longs; the map clears past 512 keys. */
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, String, String), (Long, Long)]()

  /** Pre-pass actions actually computed (cache misses + uncacheable) —
    * the suite's observable for memo-hit/invalidation pinning. */
  private[graft] val prePassComputes = new java.util.concurrent.atomic.AtomicLong

  /** Stable per-session token: the `AsOfSkew.sessionToken` convention
    * (WeakHashMap + UUID — a dead session's token can never be minted
    * again, so its entries are inert until the size-bound clear). */
  private val sessionTokens = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sessionToken(s: SparkSession): String =
    sessionTokens.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** Fingerprint of every file-source root `df` scans, or None when the
    * plan has a leaf whose backing data the fingerprint cannot see
    * (then the caller must not memoize). LocalRelation/OneRowRelation/
    * Range carry their data in the plan itself — the semantic hash
    * already covers them. */
  private def inputFingerprint(df: DataFrame): Option[String] = {
    val s = df.sparkSession
    val perLeaf = df.queryExecution.analyzed.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => Some(h.location.rootPaths.map(p =>
          try graft.Tables.pathFingerprint(s, p)
          catch { case scala.util.control.NonFatal(_) => return None })
          .mkString("|"))
        case _ => None
      }
      case _: LocalRelation | _: OneRowRelation | _: Range => Some("")
      case _ => None
    }
    if (perLeaf.exists(_.isEmpty)) None
    else Some(perLeaf.flatten.mkString("||"))
  }

  /** One row: (total rows, distinct non-null `content` values — hashed,
    * see object doc). Memoized per (session, plan, content, inputs). */
  def dupStats(df: DataFrame, content: Column, family: String): (Long, Long) = {
    val s = df.sparkSession
    def compute(): (Long, Long) = {
      prePassComputes.incrementAndGet()
      val r = df.agg(count(lit(1)).as("n"),
        count_distinct(when(content.isNotNull, xxhash64(content))).as("u"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val cacheOn = graft.DispatchConf(s, "spark.graft.collapse.")
      .bool("statsCache", dflt = true)
    if (!cacheOn) return compute()
    inputFingerprint(df) match {
      case None => compute()
      case Some(fp) =>
        val key = (sessionToken(s),
          df.queryExecution.analyzed.semanticHash(), content.toString, fp)
        val hit = statsCache.get(key)
        if (hit != null) hit
        else {
          val v = compute()
          if (statsCache.size() >= 512) statsCache.clear()
          statsCache.put(key, v)
          v
        }
    }
  }
}
