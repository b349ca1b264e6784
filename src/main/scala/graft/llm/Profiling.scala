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
}
