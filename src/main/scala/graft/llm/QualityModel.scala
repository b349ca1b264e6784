package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring for pre-training corpora.
  *
  * The standard CCNet/RedPajama quality signal is a language-model
  * score: perplexity of each document under a small LM trained on a
  * clean reference corpus (reference: hudi has no analog; the shape
  * follows Wenzek et al. 2019 "CCNet", §4.3). The container has no LM,
  * so the model here is the strongest one derivable in-engine: a
  * unigram LM fit on the corpus itself. Per-doc cross-entropy under it
  * separates boilerplate (common tokens everywhere, LOW xent) from
  * noise (rare tokens, HIGH xent); the useful middle band survives a
  * bucket filter exactly as in CCNet's head/middle/tail split.
  *
  * Scale shape (100 TB): one token-count aggregate whose OUTPUT is
  * vocabulary-sized (a few million rows — broadcastable), then one
  * per-doc aggregate. The corpus text is scanned twice but never
  * shuffled whole: only (doc_id, token) pairs move, and the frequency
  * table rides a broadcast join.
  */
object QualityModel {

  /** Per-document unigram cross-entropy: mean over the doc's tokens of
    * -ln(corpusCount(token) / corpusTokens). Emits (doc_id, n_tokens,
    * xent). Every token is in-vocabulary by construction (the model is
    * the corpus), so no smoothing term is needed.
    *
    * DuckDB mirror: `sum(-ln(CAST(cnt AS DOUBLE) / total)) / count(*)`
    * over the same token/frequency join — the division and ln round
    * identically (IEEE doubles), summation-order drift is far inside
    * the oracle's 1e-12 tolerance.
    */
  def unigramXent(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.wsTokens(col(textCol))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // corpus size rides the plan as a broadcast 1-row aggregate (the
    // oracle's `tot` CTE shape): fully lazy — no driver job at
    // construction time, and cnt/total always evaluate against the SAME
    // corpus state (an eagerly collected total could go stale between
    // plan construction and execution). The long sum casts exactly to
    // double in both engines.
    val tot = freq.agg(sum(col("cnt")).cast("double").as("_g_total"))
    toks.join(broadcast(freq), "tok")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(-log(col("cnt").cast("double") / col("_g_total")))
          .as("_g_nll"))
      .withColumn("xent", col("_g_nll") / col("n_tokens"))
      .drop("_g_nll")
  }

  /** CCNet-style band labels over the xent distribution: `head` (most
    * model-like; boilerplate risk), `middle` (keep), `tail` (noise).
    * Boundaries are explicit xent values so the label is a pure per-row
    * expression (no global quantile pass at filter time — compute the
    * boundaries once on a sample, then pass them in). */
  def xentBand(xent: Column, headBelow: Double, tailAbove: Double): Column =
    when(xent < headBelow, lit("head"))
      .when(xent > tailAbove, lit("tail"))
      .otherwise(lit("middle"))
}
