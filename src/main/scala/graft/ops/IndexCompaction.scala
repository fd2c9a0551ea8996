package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for the persisted index directories
  * ([[Dedup.saveBandIndex]], [[Dedup.saveLineIndex]],
  * [[Similarity.saveIvfIndex]]) — the third verb of the index
  * lifecycle, after build and append. The append paths are
  * deliberately append-only (every pre-existing data file stays
  * byte-identical, which is what makes probe-after-append provably
  * equivalent to a rebuild), so a long ingestion run fragments each
  * bucket/cell into one small file per batch; at corpus scale the
  * probe's partition-pruned read then pays per-file open cost that
  * dwarfs the bytes. Compaction rewrites a dataset directory into one
  * file per partition (or a fixed file count for unpartitioned data)
  * WITHOUT changing a single row — probe-before ≡ probe-after is
  * suite-pinned for all three indexes.
  *
  * Shape: write the compacted copy to a sibling tmp dir, then swap by
  * rename — never an in-place overwrite of files being read, and never
  * an O(corpus) block-manager materialization (the localCheckpoint
  * "materialize before overwrite" pattern is right for the small
  * per-batch count merges, wrong for a whole-corpus rewrite). Renames
  * make this a stop-the-world maintenance op: run it between ingestion
  * rounds, not concurrently with probes — the standard table-compactor
  * contract.
  */
private[graft] object IndexCompaction {

  /** Rewrite the parquet dataset at `dir` into `nFiles` files per
    * partition directory (partitioned case: one shuffle task per
    * partition value, so each partition lands in exactly one file) or
    * `nFiles` total (unpartitioned case), then swap it in. No-op if
    * `dir` does not exist. `transform` lets the caller drop rows during
    * the rewrite (the tombstone PURGE of the delete lifecycle verb —
    * logical deletes accumulate O(batch) in a side log and are applied
    * physically here, where the files are being rewritten anyway);
    * default is the row-identical rewrite. */
  def rewrite(s: SparkSession, dir: String, partitionCol: Option[String],
      nFiles: Int = 1,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame
        = identity): Unit = {
    val src = new Path(dir)
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(src)) return
    val tmp = new Path(dir + ".compact-tmp")
    fs.delete(tmp, true)
    val df = transform(s.read.parquet(dir))
    partitionCol match {
      case Some(c) =>
        df.repartition(col(c))
          .write.mode("overwrite").partitionBy(c).parquet(tmp.toString)
      case None =>
        df.repartition(nFiles)
          .write.mode("overwrite").parquet(tmp.toString)
    }
    val old = new Path(dir + ".compact-old")
    fs.delete(old, true)
    if (!fs.rename(src, old))
      throw new java.io.IOException(s"compaction swap failed: $dir")
    if (!fs.rename(tmp, src)) {
      fs.rename(old, src) // roll back; leave the tmp copy for inspection
      throw new java.io.IOException(s"compaction swap failed: $dir")
    }
    fs.delete(old, true)
  }
}
