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

  /** Per-document interpolated BIGRAM cross-entropy (Jelinek–Mercer
    * smoothing — the CCNet lm-score shape one order up from
    * [[unigramXent]]): for each adjacent pair (w1, w2),
    * `p = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/total` and
    * `xent = mean −ln p` over the doc's bigram positions. Both model
    * tables are corpus-fit, so every pair is in-vocabulary and the
    * interpolation smooths the conditional toward the unigram rate
    * (c(w1) approximates the bigram-start count, the standard JM
    * simplification). Docs with < 2 tokens emit no row.
    *
    * Prefer λ with an exactly-representable complement (default 0.75 →
    * 0.25) so oracle literals match bit-for-bit.
    *
    * Scale: two hash aggregates (unigram + bigram vocab) and broadcast
    * joins back — the corpus scans twice, nothing quadratic; at a
    * trillion-token corpus swap the broadcast joins for hash joins on
    * the pair key and the shape still holds. */
  def bigramXent(
      df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    val toks = TextFunctions.wsTokens(col(textCol))
    val words = df.select(col(idCol).as("doc_id"), explode(toks).as("tok"))
    val uni = words.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("c"))
    val tot = uni.agg(sum(col("c")).as("_g_total"))
    val pairs = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(toks, 2)).as("pair"))
      .withColumn("w1", element_at(split(col("pair"), " "), 1))
      .withColumn("w2", element_at(split(col("pair"), " "), 2))
    val bi = pairs.groupBy(col("pair")).agg(count(lit(1)).cast("double").as("cb"))
    pairs
      .join(broadcast(bi), "pair")
      .join(broadcast(uni.select(col("tok").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("tok").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("_g_p",
        lit(lambda) * (col("cb") / col("c1")) +
          lit(1.0 - lambda) * (col("c2") / col("_g_total")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(-log(col("_g_p"))).as("_g_nll"))
      .withColumn("xent", col("_g_nll") / col("n_pairs"))
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
