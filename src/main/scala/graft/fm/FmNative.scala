package graft.fm

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column builders for the FM hot-path array math: the codegen'd native
  * expressions ([[graft.functions.FmArrayOps]]) when the active session
  * has GraftExtensions registered (Verify/Bench/tests do), else the
  * original higher-order-function constructions — the
  * [[graft.ops.Similarity.dot]] dispatch pattern. Both forms are
  * value-identical bit for bit (same FP operation order; pinned by the
  * SGD/score SQL oracles, the golden suites, and FmArrayOpsSuite's
  * native-vs-HOF property test); the native forms exist because HOFs
  * are CodegenFallback — interpreted per array element on every
  * exploded (sample, feature) row of every epoch and scoring pass. */
private[fm] object FmNative {

  private def has(name: String): Boolean =
    SparkSession.active.catalog.functionExists(name)

  /** `[v * x for v in arr]` — `transform(arr, _ * x)`. */
  def arrScale(arr: Column, x: Column): Column =
    if (has("fm_arr_scale")) call_function("fm_arr_scale", arr, x)
    else transform(arr, v => v * x)

  /** `Σ v²` as the left fold `aggregate(arr, 0.0, (a, v) => a + v*v)`. */
  def sqSum(arr: Column): Column =
    if (has("fm_sq_sum")) call_function("fm_sq_sum", arr)
    else aggregate(arr, lit(0.0), (a, v) => a + v * v)

  /** Per-factor gradient `(x·vfs_f − vecArr_f·x·x) · residual`. */
  def gradV(vecArr: Column, vfs: Column, x: Column, residual: Column): Column =
    if (has("fm_grad_v")) call_function("fm_grad_v", vecArr, vfs, x, residual)
    else transform(sequence(lit(0), size(vecArr) - 1),
      f => (x * element_at(vfs, f + 1)
        - element_at(vecArr, f + 1) * x * x) * residual)

  /** L1 soft-threshold update `soft(v − g)` per factor. */
  def softUpdate(vecArr: Column, dV: Column, shrinkage: Double): Column = {
    def soft(c: Column): Column =
      signum(c) * greatest(lit(0.0), abs(c) - lit(shrinkage))
    if (has("fm_soft_update"))
      call_function("fm_soft_update", vecArr, dV, lit(shrinkage))
    else zip_with(vecArr, dV, (v, g) => soft(v - g))
  }
}
