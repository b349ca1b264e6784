package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Train/eval contamination detection for training-data pipelines.
  *
  * The standard decontamination pass (GPT-3 appendix C style): a corpus
  * document is contaminated by an eval/benchmark document when a large
  * fraction of the eval document's word n-grams appear verbatim in the
  * corpus document. The reference engine (hudi-0.10.0) has no analog —
  * this belongs to the training-data operator family layered on top
  * (same tier as [[Dedup]] / [[Similarity]]).
  *
  * Scale posture: the n-gram match is an inverted-index equi-join on
  * the shingle string (shingle → doc postings on both sides), identical
  * in shape to [[Dedup.jaccardPairs]] — shuffle volume is
  * O(docs × shingles), never O(corpus × eval). Hot shingles (boilerplate
  * shared by thousands of docs) can be dropped with `maxShingleDocFreq`
  * before the join, the same quadratic-fan-out guard the dedup family
  * uses. Eval sets are small in practice, so Spark's AQE broadcasts the
  * eval posting list and the corpus side never shuffles at all.
  */
object Contamination {

  /** All (corpus doc, eval doc) pairs sharing at least one distinct
    * word n-gram, with the shared-shingle count and the fraction of the
    * EVAL doc's distinct n-grams covered by the corpus doc. Pairs below
    * `minFrac` are dropped.
    *
    * Returns (doc_id, eval_id, common, eval_ngrams, overlap_frac).
    */
  def ngramOverlap(
      corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      minFrac: Double = 0.0,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val corpusSh = Dedup.shingleIndex(corpus, idCol, textCol, n, maxShingleDocFreq)
    val evalSh = Dedup.shingleIndex(eval, idCol, textCol, n)
      .withColumnRenamed("doc_id", "eval_id")
    val evalSizes = evalSh.groupBy("eval_id").agg(count(lit(1)).as("eval_ngrams"))
    corpusSh.join(evalSh, "s")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("common"))
      .join(evalSizes, "eval_id")
      .withColumn("overlap_frac",
        col("common").cast("double") / col("eval_ngrams"))
      .filter(col("overlap_frac") >= minFrac)
      .select(col("doc_id"), col("eval_id"), col("common"),
        col("eval_ngrams"), col("overlap_frac"))
  }

  /** Per-corpus-doc contamination verdict: the worst (max-fraction)
    * overlapping eval doc, ties broken toward the smaller eval id.
    * Returns (doc_id, worst_eval_id, overlap_frac) for docs whose worst
    * overlap reaches `threshold` — the drop list of the pipeline. */
  def contaminatedDocs(
      corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      threshold: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val overlaps = ngramOverlap(corpus, eval, idCol, textCol, n,
      minFrac = 0.0, maxShingleDocFreq = maxShingleDocFreq)
    // worst-overlap pick via window: id-type-agnostic (string/UUID doc
    // ids tie-break fine; an arithmetic-negation trick would not), and
    // the shuffle is the same (doc_id, ·) exchange the groupBy needs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("overlap_frac").desc, col("eval_id").asc)
    overlaps
      .withColumn("_g_rk", row_number().over(w))
      .filter(col("_g_rk") === 1)
      .select(col("doc_id"), col("eval_id").as("worst_eval_id"),
        col("overlap_frac"))
      .filter(col("overlap_frac") >= threshold)
  }
}
