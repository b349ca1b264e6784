package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling: the per-group summary statistics a training-data
  * card reports — document counts, token totals, and exact interpolated
  * token-count percentiles (Spark's `percentile`, the (n−1)·q linear
  * interpolation also used by numpy). One hash aggregation per group;
  * the percentile aggregate's state is a value→count map, so groups
  * with many DISTINCT token counts (not many documents) bound the
  * state — at 100 TB group cardinality is languages/sources, and token
  * counts are small integers, so state stays tiny while the scan does
  * all the work.
  *
  * No reference counterpart (the reference is a table format); the
  * semantics follow the standard dataset-card profiling pass.
  */
object Profiling {

  /** One row per group: `n_docs`, `total_tokens`, `mean_tokens`, and a
    * `p<q>` column per requested quantile (e.g. p25, p50, p90).
    * Null-text docs are filtered explicitly, same stance as
    * [[Chunking.chunkTokens]]. */
  def corpusProfile(
      df: DataFrame, groupCol: String, textCol: Column,
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.9)): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0, 1]: $quantiles")
    val qCols = quantiles.zipWithIndex.map { case (q, i) =>
      element_at(col("_qs"), i + 1)
        .as("p" + math.round(q * 100).toString)
    }
    df.filter(textCol.isNotNull)
      .select(col(groupCol),
        size(TextFunctions.wsTokens(textCol)).cast("long").as("_n"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_n")).as("total_tokens"),
        percentile(col("_n"), typedlit(quantiles)).as("_qs"))
      .withColumn("mean_tokens",
        col("total_tokens").cast("double") / col("n_docs"))
      .select(Seq(col(groupCol), col("n_docs"), col("total_tokens"),
        col("mean_tokens")) ++ qCols: _*)
  }

  /** Distribution-shift audit for mixing QA: per-slice KL divergence
    * KL(P_slice ‖ P_corpus) between each `groupCol` slice's token
    * distribution and the whole corpus', over the corpus' top-`vocabK`
    * tokens with add-one smoothing (so a token absent from a slice
    * contributes finitely). The standard "did this source drift from
    * the mix?" score — a slice of boilerplate or another language
    * jumps out as a large KL.
    *
    * Distributions are restricted to the top-V vocabulary on BOTH
    * sides: p_t = (c_gt+1)/(n_g+V), q_t = (c_t+1)/(N+V), KL = Σ_V
    * p·ln(p/q), summed in vocabulary-rank order via a strict fold —
    * bit-stable, engine-replayable.
    *
    * Scale shape: ONE token-census pass (explode → hash-agg keyed by
    * (group, token)); the global distribution derives from re-summing
    * that census, never a second corpus scan. Vocab (V rows) and the
    * group×V grid are codebook-sized and broadcast; the final fold
    * runs over V scalars per group. Output: (groupCol, n_tokens, kl)
    * with n_tokens = the slice's vocab-restricted token count. */
  def tokenKlShift(
      df: DataFrame, groupCol: String, textCol: Column,
      vocabK: Int): DataFrame = {
    require(vocabK >= 1, s"vocabK must be >= 1: $vocabK")
    val gt = df.filter(textCol.isNotNull)
      .select(col(groupCol).as("_g"),
        explode(TextFunctions.wsTokens(textCol)).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("_g"), col("token"))
      .agg(count(lit(1)).as("_c"))
    // corpus distribution by re-aggregating the census (no second scan);
    // top-V via TakeOrdered, then the V-row rank window
    val global = gt.groupBy(col("token")).agg(sum(col("_c")).as("_gc"))
      .orderBy(col("_gc").desc, col("token").asc)
      .limit(vocabK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_gc").desc, col("token").asc)
    val vocab = global.withColumn("_rnk", row_number().over(w))
    val totals = vocab.agg(sum(col("_gc")).as("_n_all"),
      count(lit(1)).as("_v"))
    // group × vocab grid so absent tokens smooth to c=0 (both sides
    // broadcast-small: #groups and V are codebook-sized)
    val grid = gt.select(col("_g")).distinct()
      .crossJoin(broadcast(vocab))
      .join(gt, Seq("_g", "token"), "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val withTotals = grid
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("_n_g"),
        collect_list(struct(col("_rnk"), col("_c"), col("_gc"))).as("_terms"))
      .crossJoin(broadcast(totals))
    val kl = aggregate(
      array_sort(col("_terms")), lit(0.0), (acc, e) => {
        val p = (e("_c").cast("double") + 1.0) /
          (col("_n_g").cast("double") + col("_v"))
        val q = (e("_gc").cast("double") + 1.0) /
          (col("_n_all").cast("double") + col("_v"))
        acc + p * log(p / q)
      })
    withTotals.select(col("_g").as(groupCol),
      col("_n_g").cast("long").as("n_tokens"), kl.as("kl"))
  }

  /** The dataset card's vocabulary table: the corpus' top-`k` tokens
    * with occurrence and document counts, Zipf-ranked (count DESC,
    * token ASC — deterministic). The census is one explode + hash
    * aggregation (map-side combined, index-sized output); top-k goes
    * through `orderBy(...).limit(k)`, which Spark plans as TakeOrdered
    * (per-partition top-k + driver merge — never a global sort), and
    * only then does the k-row rank window run, over k rows total.
    * Output: (rnk, token, n_occ, n_docs). */
  def tokenProfile(
      df: DataFrame, idCol: String, textCol: Column, k: Int): DataFrame = {
    val toks = df.filter(textCol.isNotNull)
      .select(col(idCol).as("_id"),
        explode(TextFunctions.wsTokens(textCol)).as("token"))
      .filter(col("token") =!= "")
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("token").asc)
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("token"), col("n_occ"), col("n_docs"))
  }
}
