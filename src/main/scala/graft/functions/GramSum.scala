package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass Gram / scatter-matrix accumulator: given integer-quantized
  * (micro-unit) vectors `v`, sums the outer product `v·vᵀ` into a flat
  * `dim²` long buffer — the single-scan covariance primitive behind
  * [[graft.ops.Similarity.pcaPower]].
  *
  * Why longs: micro-unit products are exact integers, so partial sums
  * are associative and order-free — the merge order across partitions
  * (nondeterministic in Spark) can never change the result, which is
  * what lets a DuckDB oracle reproduce the matrix bit-for-bit. Range:
  * |x| ≤ ~0.53 ⇒ |c| ≤ ~5.3e5 micro, product ≤ 2.8e11, so ~3e7 rows fit
  * before a cell nears 2^63 — far beyond any single-partition partial;
  * the merged total stays exact for the fixture SFs and the documented
  * 1e-12 rescale happens only after aggregation.
  *
  * Scale shape (100 TB): classic map-side combine — every partition
  * folds its rows into one dim² buffer (32 KiB at dim 64), the shuffle
  * carries one buffer per partition, and the driver never sees row
  * data. This is the treeAggregate covariance pattern from MLlib's PCA
  * (RowMatrix.computeGramianMatrix) expressed as a typed Aggregator so
  * it composes with DataFrame pipelines.
  */
class GramSum(val dim: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]]
    with Serializable {

  override def zero: Array[Long] = new Array[Long](dim * dim)

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] = {
    if (v != null) {
      var i = 0
      while (i < dim) {
        val vi = v(i)
        if (vi != 0L) {
          val base = i * dim
          var j = 0
          while (j < dim) { buf(base + j) += vi * v(j); j += 1 }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** Column form: `new GramSum(64)(col("c"))`. */
  def apply(c: Column): Column =
    udaf(this, ExpressionEncoder[Array[Long]]()).apply(c)
}
