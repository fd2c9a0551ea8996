package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** End-to-end corpus-cleaning pipeline — the composition a training-data
  * run actually executes, as ONE dataflow: per-doc statistics → quality
  * gate → exact dedup of the survivors. Demonstrates that the individual
  * operators (TextAnalysis stats, Dedup exact) compose into a single
  * Catalyst plan: the stats are map-side, the gate is a pushed filter,
  * and the only shuffles are the final content-hash group and the sort.
  *
  * Cross-engine determinism: the quality GATE uses exact integer
  * arithmetic only (token counts, cross-multiplied ratio thresholds) —
  * a raw FP threshold on the logistic score could flip rows whose score
  * sits one ulp from the cut (the r1 hash-failure class). The logistic
  * score itself ships as an informational column, rounded to 6 decimals
  * (the same contract ta_quality already proved hash-stable).
  */
object Pipeline {

  /** Gate: 30 ≤ n_tokens ≤ 1000 and stopword density ≥ 10 % (exact:
    * stop_cnt·10 ≥ n_tokens). Corpus: documents ∪ exact copies of every
    * 10th doc — the dedup stage must collapse them after the gate. */
  val corpusClean: QueryDef = QueryDef.sql(
    "pipe_corpus_clean",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, text FROM documents
      |  WHERE doc_id % 10 = 0),
      |stats AS (
      |  SELECT doc_id, text,
      |    len(toks) AS n_tokens,
      |    len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS stop_cnt,
      |    list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS char_sum
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
      |        FROM corpus) t),
      |gated AS (
      |  SELECT * FROM stats
      |  WHERE n_tokens BETWEEN 30 AND 1000 AND stop_cnt * 10 >= n_tokens),
      |deduped AS (
      |  SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
      |    count(*) AS n_copies, min(n_tokens) AS n_tokens,
      |    min(stop_cnt) AS stop_cnt, min(char_sum) AS char_sum
      |  FROM gated GROUP BY md5(text))
      |SELECT doc_id, n_copies, n_tokens,
      |  round(stop_cnt * 1.0 / n_tokens, 6) AS stop_ratio,
      |  round(1.0/(1.0 + exp(-(0.3*(char_sum * 1.0 / n_tokens)
      |        + 2.0*(stop_cnt * 1.0 / n_tokens) - 0.002*n_tokens))), 6)
      |    AS quality
      |FROM deduped
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val stopWords = Seq("the", "a", "of", "and")
    val docs = Tables.documents(s, d)
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val toks = split(col("text"), " ")
    val stats = corpus.select(col("doc_id"), col("text"),
      size(toks).as("n_tokens"),
      size(filter(toks, t => stopWords.map(t === _).reduce(_ || _)))
        .as("stop_cnt"),
      aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
        .as("char_sum"))
    // Pipeline observability via Dataset.observe: per-run input/kept
    // counts ride along as CollectMetrics nodes (read from
    // queryExecution.observedMetrics after any action; asserted in the
    // suite) — the production way to monitor gate selectivity without a
    // second pass over the corpus. Output rows are unaffected.
    val gated = stats
      .observe("pipe_in", count(lit(1)).as("n_in"))
      .filter(
        col("n_tokens").between(30, 1000) &&
          col("stop_cnt") * 10 >= col("n_tokens"))
      .observe("pipe_kept", count(lit(1)).as("n_kept"))
    val deduped = gated
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"),
        min(col("n_tokens")).as("n_tokens"), min(col("stop_cnt")).as("stop_cnt"),
        min(col("char_sum")).as("char_sum"))
    deduped.select(col("doc_id"), col("n_copies"), col("n_tokens"),
        round(col("stop_cnt").cast("double") / col("n_tokens"), 6)
          .as("stop_ratio"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(0.3) * (col("char_sum").cast("double") / col("n_tokens"))
            + lit(2.0) * (col("stop_cnt").cast("double") / col("n_tokens"))
            - lit(0.002) * col("n_tokens")))), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(corpusClean)
}
