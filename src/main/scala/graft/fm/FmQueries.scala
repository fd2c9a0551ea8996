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
    * the driver surface. Rows-only check: VectorUDT inputs are not
    * ANSI-SQL-expressible; the SQL-oracle FM queries live in
    * [[FmRelationalQueries]]. */
  val fmScoreGolden: QueryDef = QueryDef.rowsOnly("fm_score_golden") { (s, d) =>
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
