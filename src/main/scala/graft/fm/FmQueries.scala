package graft.fm

import graft.{QueryDef, Tables}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FM queries exposed through the driver contract (SparkEntry). */
object FmQueries {

  /** The golden scoring model of the reference suite
    * (FactorizationMachinesSuite.scala:41-53): k=3, w0=5.0, 4 features. */
  private[graft] def goldenModel(s: SparkSession): FactorizationMachinesModel = {
    import s.implicits._
    val strengths = Seq(
      Strength(0, 0.1), Strength(1, 0.2), Strength(2, 0.3), Strength(3, 0.4)
    ).toDS()
    val factors = Seq(
      FactorizedInteraction(0, Vectors.dense(1.0, 2.0, 3.0).toDense),
      FactorizedInteraction(1, Vectors.dense(3.0, 2.0, 1.0).toDense),
      FactorizedInteraction(2, Vectors.dense(-0.1, -0.1, -0.2).toDense),
      FactorizedInteraction(3, Vectors.dense(-0.5, 0.3, 0.0).toDense)
    ).toDS()
    new FactorizationMachinesModel("golden", 3, 5.0, strengths, factors)
  }

  /** Scores deterministic 4-dim feature vectors derived from lineitem with
    * the golden model — drives the full scoring dataflow (explode → param
    * join → per-sample agg → FM formula → join-back/bias-fallback) from
    * the driver surface.
    *
    * ORACLE (r10 — this was the battery's last rows-only check): the
    * VectorUDT input itself is not SQL-expressible, but the golden
    * model is a fixed 4-feature k=3 table, so its scoring IS — inlined
    * as literal arithmetic (the [[FmRelationalQueries]] pattern). The
    * SQL mirrors the engine's evaluation order term for term: each
    * per-sample reduction is a LEFT-ASSOCIATIVE sum in feature-index
    * order (explode emits a dense vector's entries in index order,
    * adjacent in one partition, so the partial aggregation accumulates
    * them in exactly that order), `Σ_f v²` folds 0.0 + v0² + v1² + v2²
    * before scaling by x·x, and the final form is
    * (bias + wxSum) + 0.5·(normSq − v2x2Sum). Inputs are cross-engine
    * exact: quantities are integer-valued doubles (their sum is exact),
    * discount/tax sums land within ulps of a 0.01-grid point so
    * round(·,4) is unambiguous, and both engines then run the identical
    * scalar ops. round(·,6) on both sides absorbs nothing but keeps the
    * contract visible. */
  val fmScoreGolden: QueryDef = QueryDef.sql(
    "fm_score_golden",
    """WITH agg AS (
      |  SELECT l_orderkey, sum(l_quantity) AS q,
      |    round(sum(l_discount), 4) AS disc,
      |    round(sum(l_tax), 4) AS tax,
      |    max(l_linenumber) AS ln
      |  FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey),
      |x AS (
      |  SELECT l_orderkey, q/10.0 AS x0, disc*10.0 AS x1, tax*10.0 AS x2,
      |    CAST(ln % 3 AS DOUBLE) AS x3
      |  FROM agg),
      |vf AS (
      |  SELECT l_orderkey, x0, x1, x2, x3,
      |    (1.0)*x0 + (3.0)*x1 + (-0.1)*x2 + (-0.5)*x3 AS vf0,
      |    (2.0)*x0 + (2.0)*x1 + (-0.1)*x2 + (0.3)*x3 AS vf1,
      |    (3.0)*x0 + (1.0)*x1 + (-0.2)*x2 + (0.0)*x3 AS vf2
      |  FROM x),
      |scored AS (
      |  SELECT l_orderkey,
      |    5.0 + ((0.1)*x0 + (0.2)*x1 + (0.3)*x2 + (0.4)*x3)
      |      + 0.5*((vf0*vf0 + vf1*vf1 + vf2*vf2)
      |             - (((1.0)*(1.0) + (2.0)*(2.0) + (3.0)*(3.0))*x0*x0
      |                + ((3.0)*(3.0) + (2.0)*(2.0) + (1.0)*(1.0))*x1*x1
      |                + ((-0.1)*(-0.1) + (-0.1)*(-0.1) + (-0.2)*(-0.2))*x2*x2
      |                + ((-0.5)*(-0.5) + (0.3)*(0.3) + (0.0)*(0.0))*x3*x3)) AS p
      |  FROM vf)
      |SELECT l_orderkey, round(p, 6) AS prediction
      |FROM scored
      |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    val toVec = udf { (q: Double, disc: Double, tax: Double, ln: Int) =>
      Vectors.dense(q / 10.0, disc * 10.0, tax * 10.0, (ln % 3).toDouble)
    }
    val input = Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_quantity")).as("q"),
        round(sum(col("l_discount")), 4).as("disc"),
        round(sum(col("l_tax")), 4).as("tax"),
        max(col("l_linenumber")).as("ln"))
      .select(col("l_orderkey"),
        toVec(col("q"), col("disc"), col("tax"), col("ln")).as("features"))
    goldenModel(s).setCarryThroughScoring(true).transform(input)
      .select(col("l_orderkey"), round(col("prediction"), 6).as("prediction"))
      .orderBy(col("l_orderkey"))
  }

  // NOTE: fm_train_quick moved to FmRelationalQueries (round 5) — the
  // fit() loop now runs under the SQL oracle (warm-started from the
  // deterministic parameter table, one full-batch iteration). The
  // mini-batch randomSplit training path (env-dependent weights by
  // design, SURVEY D3) remains pinned by the training suites.

  val all: Seq[QueryDef] = Seq(fmScoreGolden)
}
