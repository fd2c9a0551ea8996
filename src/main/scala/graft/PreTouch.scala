package graft

/** Page-cache pre-toucher for Bench's UNTIMED regions (r13 verdict #1).
  *
  * The r13 driver record was a 2.9× phantom: a ballooned box evicted
  * the page cache, and because the untimed `prepare` hook staged inputs
  * WITHOUT reading them, the first (and only) timed pass was charged
  * all the input+state IO — 10–45× per-query inflation on 21 queries,
  * indistinguishable from a code regression until a quiet-box
  * re-measure. Raw-reading every input file outside the timed region
  * pins the bytes into the page cache, so the timed pass measures
  * compute + shuffle, not the weather.
  *
  * Files already touched under the same (size, mtime) are skipped, so
  * the per-query re-touch after `prepare` is a stat-only walk — only
  * files a prepare just (re)wrote are re-read. Hidden entries are NOT
  * skipped: commit markers and parquet footers get scanned by Spark
  * too, and a spurious touch is free.
  */
object PreTouch {
  private val seen = scala.collection.mutable.HashMap.empty[String, (Long, Long)]

  /** Total bytes actually read since JVM start — the observable for
    * the suite and for Bench's one-line audit log. */
  @volatile private[graft] var bytesRead = 0L

  /** Raw-read every regular file under `roots` not already touched at
    * its current (size, mtime). Best-effort by design: a file deleted
    * or truncated mid-walk is skipped, never fatal — the cost would be
    * one cold read inside the timed region, the status quo ante. */
  def touch(roots: Seq[java.io.File]): Unit = synchronized {
    val buf = new Array[Byte](4 << 20)
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
      else if (f.isFile) {
        val sig = (f.length, f.lastModified)
        if (!seen.get(f.getPath).contains(sig)) {
          try {
            val in = new java.io.FileInputStream(f)
            try {
              var r = in.read(buf)
              while (r >= 0) { bytesRead += r; r = in.read(buf) }
            } finally in.close()
            seen(f.getPath) = sig
          } catch { case _: java.io.IOException => () }
        }
      }
    roots.filter(_.exists).foreach(walk)
  }

  /** Everything a battery query can scan: the fixture dir, every graft
    * staging root under java.io.tmpdir (persisted band/line/IVF
    * indexes, staged source fixtures, stream outputs/checkpoints — all
    * staging uses the `graft-*` prefix by convention), and the
    * warehouse (bucketed as-of tables). */
  def benchRoots(sfDir: String, warehouseDir: String): Seq[java.io.File] = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val staged = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft-")).toSeq
    val wh = new java.io.File(
      warehouseDir.stripPrefix("file://").stripPrefix("file:"))
    new java.io.File(sfDir) +: wh +: staged
  }
}
