package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY 100×-scale probe for the streaming ingest loops (r15
  * verdict #5) — the `Scale100Drive` convention: run once, quote the
  * output in COVERAGE.md, then delete the file. Probes sustained
  * micro-batch ingest at the 100× fixture (500 k docs / 10 M events):
  *
  *  - `clean`: [[graft.streaming.EventStreams.cleanDocsStream]] over
  *    20 micro-batches of 25 k docs — per-batch wall must stay flat
  *    (cost tracks the batch), and the final persisted LINE INDEX must
  *    be checksum-identical to a one-shot batch build over the same
  *    corpus (count merging is additive and order-invariant).
  *  - `upsert`: the registered `st_upsert` query at 100× — per-batch
  *    wall rows, final materialized state checksum-identical to the
  *    batch QUALIFY twin over the raw events.
  *  - `lsh`: the registered `st_lsh_dedup` query at 100× — streamed
  *    evidence checksum-identical to the same probe run as ONE batch
  *    read (static index both sides).
  */
object StreamScale100Drive {
  private def session(): SparkSession = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors)
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** (row count, Σ xxhash64 over all columns as decimal) — the 100×
    * probe checksum convention (decimal sum: ANSI long-sum of
    * full-range hashes overflows). */
  private def checksum(df: DataFrame): (Long, java.math.BigDecimal) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val r = df.agg(count(lit(1)),
      sum(xxhash64(cols: _*).cast("decimal(38,0)"))).head()
    (r.getLong(0),
      if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
  }

  private class ProgressTap
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.numInputRows > 0)
        rows += ((p.batchId, p.numInputRows, p.batchDuration / 1000.0))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  private def withTap(s: SparkSession)(body: => Unit): Seq[(Long, Long, Double)] = {
    val tap = new ProgressTap
    s.streams.addListener(tap)
    try body finally s.streams.removeListener(tap)
    tap.rows.toSeq
  }

  private def printBatches(tag: String, rows: Seq[(Long, Long, Double)]): Unit = {
    rows.foreach { case (b, n, sec) =>
      println(f"[$tag] batch $b%3d  rows $n%8d  wall $sec%7.2f s")
    }
  }

  private def dirBytes(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  private def cleanProbe(s: SparkSession, src: String): Unit = {
    val root = "/tmp/graft-stream100-clean"
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(rp, true)
    val corpus = graft.Tables.documents(s, src)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val maxId = corpus.agg(max(col("doc_id"))).head().getLong(0)
    val nFiles = 20
    val step = maxId / nFiles + 1
    for (i <- 0 until nFiles) {
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_stage$i")
      corpus.filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .filter(_.getName.startsWith("part-")).head
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/src", f"b$i%03d.parquet"))
      fs.delete(tmp, true)
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$root/src", f"b$i%03d.parquet"),
        1000L * (i + 1), -1)
    }
    val t0 = System.nanoTime()
    val rows = withTap(s) {
      graft.streaming.EventStreams.cleanDocsStream(s, s"$root/index",
        s"$root/src", s"$root/ckpt", s"$root/out")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    printBatches("clean", rows)
    println(f"[clean] total wall $wall%.1f s over ${rows.length} batches; " +
      f"index ${dirBytes(s, s"$root/index") / 1e6}%.1f MB")
    // batch twin: one-shot line index over the same corpus
    graft.ops.Dedup.saveLineIndex(corpus, s"$root/index_twin")
    val a = checksum(s.read.parquet(s"$root/index/counts")
      .select(col("lh"), col("df")))
    val b = checksum(s.read.parquet(s"$root/index_twin/counts")
      .select(col("lh"), col("df")))
    println(s"[clean] streamed index counts $a vs batch twin $b  " +
      s"MATCH=${a == b}")
    val out = checksum(s.read.parquet(s"$root/out").drop("epoch"))
    println(s"[clean] cleaned output rows=${out._1}")
    fs.delete(rp, true)
  }

  private def upsertProbe(s: SparkSession, src: String): Unit = {
    var out: DataFrame = null
    val rows = withTap(s) {
      out = graft.streaming.EventStreams.upsertState.fn(s, src)
    }
    printBatches("upsert", rows)
    val a = checksum(out)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc, col("event_type").desc)
    val twin = graft.Tables.events(s, src)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), expr("ts DIV 1000000000").as("last_sec"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_type"))
    val b = checksum(twin)
    println(s"[upsert] streamed state $a vs batch QUALIFY twin $b  " +
      s"MATCH=${a == b}")
  }

  private def lshProbe(s: SparkSession, src: String): Unit = {
    var out: DataFrame = null
    val t0 = System.nanoTime()
    val rows = withTap(s) {
      out = graft.streaming.EventStreams.lshDedup.fn(s, src)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    printBatches("lsh", rows)
    println(f"[lsh] total wall $wall%.1f s")
    val a = checksum(out)
    // batch twin: identical probe construction, one batch read of the
    // same staged incoming dir (path formula mirrors lshStagedDir)
    val staged = s"${System.getProperty("java.io.tmpdir")}/graft-lshbatch-staged-" +
      math.abs(src.hashCode)
    val h = graft.ops.Dedup.SignatureHashes
    val docs = graft.Tables.documents(s, src)
    val sig = graft.ops.Dedup.corpusSignatures(docs)
    val bandRows = graft.ops.Dedup.corpusBandRows(sig)
    val hot = graft.ops.Dedup.corpusBandRows(
        sig.dropDuplicates((0 until h).map(j => s"mh$j")))
      .groupBy(col("bi"), col("bv"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > graft.ops.Dedup.BandBucketCap)
      .select(col("bi"), col("bv"))
    val idx = bandRows.join(broadcast(hot), Seq("bi", "bv"), "left_anti")
      .withColumnRenamed("doc_id", "existing_id").localCheckpoint(true)
    val ssig = (0 until h).foldLeft(
      sig.withColumnRenamed("doc_id", "existing_id"))((acc, j) =>
      acc.withColumnRenamed(s"mh$j", s"smh$j")).localCheckpoint(true)
    val signed = graft.ops.Dedup.withRowSignature(
        s.read.parquet(staged), "text")
      .withColumnRenamed("doc_id", "incoming_id")
    val probe = signed.select(
      (col("incoming_id") +: (0 until h).map(j => col(s"mh$j"))) :+
        explode(array((0 until graft.ops.Dedup.SignatureBands).map(b =>
          struct(lit(b).as("bi"), col(s"band$b").as("bv"))): _*)).as("band"): _*)
      .select((col("incoming_id") +: (0 until h).map(j => col(s"mh$j"))) :+
        col("band.bi").as("bi") :+ col("band.bv").as("bv"): _*)
    val nMatch = (0 until h)
      .map(j => when(col(s"mh$j") === col(s"smh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val twin = probe
      .join(broadcast(idx), Seq("bi", "bv"))
      .join(broadcast(ssig), Seq("existing_id"))
      .withColumn("n_match", nMatch)
      .filter(col("n_match") >= 8)
      .select(col("incoming_id"), col("existing_id"), col("bi"),
        col("n_match"))
    val b = checksum(twin)
    println(s"[lsh] streamed evidence $a vs one-batch twin $b  " +
      s"MATCH=${a == b}")
  }

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("all")
    val src = if (args.length > 1) args(1) else "/tmp/sfx100"
    val s = session()
    if (what == "all" || what == "clean") cleanProbe(s, src)
    if (what == "all" || what == "upsert") upsertProbe(s, src)
    if (what == "all" || what == "lsh") lshProbe(s, src)
    s.stop()
  }
}
