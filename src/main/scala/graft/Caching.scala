package graft

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted INSIDE library operators (the IVF
  * ranked-cell table, the MinHash signature table): an operator cannot
  * know when its lazy result materializes, so it registers the cached
  * handle here and the CALLER releases after materializing — the
  * paired-release story for library composition (r5, verdict #8: these
  * persists previously relied solely on session-level cache clearing).
  *
  * Verify/Bench drain the registry after every query (alongside
  * `spark.catalog.clearCache()`); a library consumer composing
  * operators in one session calls [[releaseAll]] at its own batch
  * boundaries. Releasing only drops cache blocks — every registered
  * frame keeps full lineage, so a late re-materialization recomputes
  * instead of failing (never register localCheckpoint'd frames here).
  */
object InternalCaches {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted frame for later release; returns it. */
  private[graft] def register(df: DataFrame): DataFrame = {
    registered.add(df)
    df
  }

  /** Unpersist every registered frame (idempotent, safe while lazy
    * results are still unmaterialized — they recompute). Best-effort by
    * design: a frame registered under a SparkContext that has since
    * stopped is skipped — its cache blocks died with the context, and
    * unpersisting through the dead context throws (caught in the full
    * suite run, where a later suite's releaseAll drained frames
    * registered by earlier suites' stopped sessions). */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = registered.poll()
    while (df != null) {
      try {
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking)
      } catch {
        case scala.util.control.NonFatal(_) => // cache is gone either way
      }
      df = registered.poll()
    }
  }
}
