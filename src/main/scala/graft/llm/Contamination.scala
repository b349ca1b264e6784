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

  /** LSH-bucketed decontamination — the 100 TB path of
    * [[contaminatedDocs]]: instead of joining the full shingle inverted
    * index, corpus and benchmark docs get MinHash signatures
    * ([[Dedup.minhashSignatures]], one-pass codegen kernel, no shuffle)
    * and only banded bucket collisions become candidates, probed
    * new-vs-all style with the BENCHMARK as the probe side — candidate
    * volume tracks the (small) benchmark, never corpus². Candidates
    * are scored by the unbiased minhash Jaccard estimate and kept at
    * `minEst`; run the exact [[ngramOverlap]] on the survivors when the
    * verdict must be exact.
    *
    * Benchmark ids are mapped into the negative key space internally
    * (corpus ids must be >= 0), so the two tables never collide inside
    * the shared signature frame. The id contract is enforced row-level
    * ON THE SIGNATURE FRAME: a doc too short to shingle never enters
    * the shared frame at all, so it can neither collide nor alias — its
    * id is never read and never validated (checking it would cost a
    * second full corpus scan for a row that cannot affect the result).
    * Output: one row per flagged corpus doc —
    * (doc_id, worst_bench_id, n_match, est_jaccard) with the
    * highest-estimate benchmark doc, ties to the smaller bench id. */
  def lshContaminatedDocs(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4,
      minEst: Double = 0.5): DataFrame = {
    // contract: ids on BOTH sides are non-negative, enforced row-level —
    // a negative corpus id silently dropped from the signature store
    // would let a contaminated doc through unflagged, and a negative
    // bench id would alias into the corpus key space after the flip
    def nonNeg(side: String) = when(col("doc_id") >= 0, col("doc_id"))
      .otherwise(raise_error(concat(
        lit(s"lshContaminatedDocs: $side ids must be >= 0, got "),
        col("doc_id").cast("string"))))
    val cSig = Dedup.minhashSignatures(corpus, idCol, textCol, n, k)
      .select(nonNeg("corpus").as("doc_id"), col("sig"))
    val bSig = Dedup.minhashSignatures(bench, idCol, textCol, n, k)
      .select((-nonNeg("benchmark") - 1).as("doc_id"), col("sig"))
    val pairs = Dedup.minhashLshFromSigs(
      cSig.unionByName(bSig).cache(), k, bands, minEst,
      probeIds = Some(bSig.select(col("doc_id"))))
    // bench side always sorts below corpus side (negative ids), so a
    // cross pair is exactly (doc_a < 0 <= doc_b); bench-bench pairs
    // (both negative) are probe artifacts and drop here
    val cross = pairs.filter(col("doc_a") < 0 && col("doc_b") >= 0)
      .select(col("doc_b").as("doc_id"),
        (-col("doc_a") - 1).as("bench_id"),
        col("n_match"), col("est_jaccard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("est_jaccard").desc, col("bench_id").asc)
    cross.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("doc_id"), col("bench_id").as("worst_bench_id"),
        col("n_match"), col("est_jaccard"))
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
