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
    * results are still unmaterialized — they recompute). */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = registered.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = registered.poll()
    }
  }
}
