package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** WRITE-AHEAD INTENT MARKER for persisted-index lifecycle verbs — the
  * crash-consistency mechanism of the band/line/IVF index directories.
  *
  * A lifecycle verb (append, delete, compact, rebuild) is several FS
  * mutations — row appends, a dynamic partition overwrite of derived
  * counts, a hot-list overwrite, a snapshot commit — with no cross-file
  * atomicity on a plain filesystem. Before round 10 the manifest write
  * was the commit point *by documentation only*: a crash after the live
  * counts/hot mutated but before the snapshot committed left
  * as-of(latest) silently diverging from the live probe, and nothing
  * detected the torn state.
  *
  * The marker closes that window the standard log-structured way:
  *
  *   - [[begin]] writes `dir/_INTENT` (naming the verb) BEFORE the
  *     verb's first mutation, after first asserting no marker is
  *     already present;
  *   - [[end]] removes it AFTER the verb's last write (its commit
  *     point) — so the marker exists exactly while the directory may
  *     be torn;
  *   - every probe and every new verb calls [[assertClean]] on entry: a
  *     surviving marker means the previous verb died mid-flight, and
  *     the caller gets ONE actionable diagnostic (which verb, and that
  *     the recovery path is the index's compaction/rebuild) instead of
  *     silently reading suspect state;
  *   - the RECOVERY verbs (compaction, full rebuild) enter through
  *     [[beginRepair]], which tolerates — and on success clears — an
  *     existing marker, because they restore every invariant from the
  *     raw per-row facts rather than trusting the derived state.
  *
  * The underscore prefix keeps the marker invisible to Spark's parquet
  * listings (the `_SUCCESS` convention). Single-writer discipline is
  * ENFORCED, not assumed (r11): [[begin]]'s marker write is
  * create-exclusive, so of two concurrent verbs on one directory the
  * loser fails fast with a diagnostic instead of the two interleaving
  * mutations silently. */
private[graft] object IndexIntent {

  private def marker(dir: String) = new Path(s"$dir/_INTENT")

  private def fs(s: SparkSession, dir: String) =
    marker(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The incomplete verb named by a surviving marker, if any. A marker
    * that vanishes between the existence check and the read means the
    * writer's [[end]] just committed — that is CLEAN, not an error
    * (snapshot readers legitimately poll a directory a live writer is
    * appending to; see `CrashConsistencySuite`'s reader/writer race). */
  def pending(s: SparkSession, dir: String): Option[String] = {
    val f = fs(s, dir)
    val p = marker(dir)
    if (!f.exists(p)) None
    else {
      try {
        val in = f.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    }
  }

  /** Refuses to touch a directory whose previous lifecycle verb never
    * completed. `recovery` names the verb that repairs this index kind
    * from raw facts (compaction for band/IVF, rebuild for line). */
  def assertClean(s: SparkSession, dir: String, recovery: String): Unit =
    pending(s, dir).foreach { verb =>
      throw new IllegalStateException(
        s"index at $dir is suspect: a previous '$verb' did not complete " +
        s"(crash left $dir/_INTENT behind), so live counts/hot and the " +
        s"snapshot log may disagree. Run $recovery to restore every " +
        "invariant from the raw index rows, then retry.")
    }

  /** Marks verb start. Fails if the directory is already suspect, and
    * fails FAST if another writer races this one: the marker write is
    * CREATE-EXCLUSIVE (`FileSystem.create(path, overwrite = false)`),
    * so two concurrent verbs that both pass [[assertClean]] cannot both
    * win — the loser throws with one actionable diagnostic instead of
    * the two verbs silently interleaving marker writes and FS
    * mutations (r10 verdict #2: the old check-then-overwrite begin
    * made the single-writer discipline an unenforced assumption). A
    * writer that DIED holding the marker is the [[assertClean]] case,
    * and its recovery story is unchanged: the recovery verb enters via
    * [[beginRepair]], which replaces the marker and clears it at its
    * own commit point. */
  def begin(s: SparkSession, dir: String, verb: String,
      recovery: String): Unit = {
    assertClean(s, dir, recovery)
    val f = fs(s, dir)
    val p = marker(dir)
    def lost(cause: Throwable): Nothing =
      throw new IllegalStateException(
        s"concurrent lifecycle verb on index at $dir: another writer " +
        s"created $p between this verb's clean-check and its marker " +
        "write (begin is create-exclusive). The index lifecycle is " +
        "single-writer per directory — serialize the verbs; if the " +
        s"other writer is dead, run $recovery (enters via " +
        "beginRepair) to clear its marker.", cause)
    val out: java.io.OutputStream = f match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        // Hadoop's LOCAL create(overwrite=false) is exists()-then-open
        // — check-then-act, not atomic, so two racers could both win.
        // java.io.File.createNewFile is O_CREAT|O_EXCL: true exclusive
        // creation at the syscall level.
        val jf = new java.io.File(p.toUri.getPath)
        Option(jf.getParentFile).foreach(_.mkdirs())
        if (!jf.createNewFile()) lost(null)
        new java.io.FileOutputStream(jf)
      case _ =>
        // HDFS and precondition-capable object stores make
        // create(overwrite=false) atomic at the metadata layer
        try f.create(p, false)
        catch { case e: java.io.IOException => lost(e) }
    }
    try out.write((verb + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Marks the start of a RECOVERY verb: an existing marker is
    * tolerated (recovering a torn directory is the point) and replaced
    * so a crash inside the recovery itself is detected the same way. */
  def beginRepair(s: SparkSession, dir: String, verb: String): Unit =
    write(s, dir, verb)

  /** The verb completed: the directory is consistent again. */
  def end(s: SparkSession, dir: String): Unit =
    fs(s, dir).delete(marker(dir), false)

  private def write(s: SparkSession, dir: String, verb: String): Unit = {
    val f = fs(s, dir)
    val out = f.create(marker(dir), true)
    try out.write((verb + "\n").getBytes("UTF-8"))
    finally out.close()
  }
}
