package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over a text corpus: BM25 ranked search on an
  * inverted index — the term-match complement of the embedding-side
  * [[Similarity]] family (RAG keyword recall, decontamination probes,
  * boilerplate hunting).
  *
  * Scoring follows the Lucene/Okapi formula:
  * `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`,
  * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`.
  *
  * Determinism: every count is exact integer math in doubles; the only
  * float SUM (per-(query,doc) term contributions) folds in sorted term
  * order, so scores are bit-reproducible across engines and retries —
  * the DuckDB oracle replays the identical arithmetic.
  *
  * Scale posture: one explode + hash aggregation builds tf (map-side
  * combined); df is a second aggregation of tf; the query term set is
  * broadcast, so search cost is one pass over the postings of the
  * queried terms — never a corpus × queries join. For a standing search
  * service, persist `tf` as a graft table and incremental-maintain it.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** Term frequencies per (doc, term) with doc length attached — the
    * inverted index. One explode + one hash aggregation. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.wsTokens(col(textCol)).as("_tk"))
      .select(col("doc_id"), size(col("_tk")).cast("double").as("dl"),
        explode(col("_tk")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** BM25 top-k docs per query. `queries` carries `(q_id, terms)` with
    * `terms: array<string>`; it is broadcast (query sets are small).
    * Output: `(q_id, rnk, doc_id, score)`, ties broken by doc id. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = K1, b: Double = B): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    // N and avgdl: integer-valued sums — exact in double at any
    // aggregation order, so collecting them to the driver is safe
    val lens = docs
      .select(size(TextFunctions.wsTokens(col(textCol))).cast("long").as("n"))
      .agg(count(lit(1)).as("docs"), sum(col("n")).as("toks")).head()
    // empty index: an empty (correctly-typed) result, not a 0/0 NaN
    // score or a null unboxing on the sum
    if (lens.getLong(0) == 0L || lens.isNullAt(1))
      return tf.select(col("doc_id")).limit(0)
        .crossJoin(queries.select(col("q_id")).limit(0))
        .select(col("q_id"), lit(0L).as("rnk"), col("doc_id"),
          lit(0.0).as("score"))
    val nDocs = lens.getLong(0).toDouble
    val avgdl = lens.getLong(1).toDouble / nDocs
    val qt = queries
      .select(col("q_id"), explode(col("terms")).as("term")).distinct()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val contrib = tf
      .join(broadcast(qt), "term")
      .join(dfreq, "term")
      .withColumn("idf",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .select(col("q_id"), col("doc_id"), col("term"), col("c"))
    // fold contributions in sorted term order: a groupBy float sum would
    // be partition-order dependent, this is bit-stable
    val scored = contrib
      .groupBy(col("q_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (acc, x) => acc + x("c")).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score"))
  }

  /** Tf-idf keyword extraction: the top-`k` most characteristic terms
    * per document (corpus-profiling, topic tagging, near-dup triage).
    * `tfidf(t,d) = tf · ln((N+1)/(df+1))` — the +1s keep corpus-wide
    * terms at idf ≈ 0 instead of −∞/0 edge cases.
    *
    * Scale posture: tf is the same explode + hash aggregation as BM25
    * (map-side combined); df aggregates tf (term-keyed, index-sized)
    * and joins back BY TERM — never a corpus-sized broadcast; the
    * per-doc top-k window partitions by doc, whose fan-out is the
    * doc's distinct term count, not the corpus. Single multiplication
    * per row — bit-stable without a fold.
    *
    * Output: (doc_id, rnk, term, tf, tfidf), ties broken by term. */
  def tfidfKeywords(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val nDocs = docs.filter(col(textCol).isNotNull).count().toDouble
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(dfreq, "term")
      .withColumn("tfidf",
        col("tf") * log((lit(nDocs) + 1.0) / (col("df") + 1.0)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
        col("term"), col("tf").cast("long").as("tf"), col("tfidf"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of two or
    * more ranked lists — the standard hybrid-retrieval combiner for
    * keyword ([[bm25TopK]]) + dense ([[Similarity.bruteForceTopK]] /
    * the ANN family) search: `score(q,d) = Σ_lists 1/(k0 + rnk)`,
    * rank-only, so BM25 scores and cosines never need calibrating
    * against each other. Every input carries (q_id, rnk, doc_id); a doc
    * missing from a list simply contributes nothing for it.
    *
    * Determinism: the per-(q,d) float sum folds in list order (each
    * contribution is tagged with its list index and sorted before the
    * fold), so fused scores are bit-stable across partitionings and
    * engines. Scale shape: inputs are already top-k-sized (queries × k
    * rows, never corpus-sized); one union + one hash aggregation + a
    * per-query rank window. Output: (q_id, rnk, doc_id, rrf). */
  def rrfFuse(
      lists: Seq[DataFrame], k: Int, k0: Double = 60.0): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("q_id"), col("doc_id"), lit(i).as("_li"),
        (lit(1.0) / (lit(k0) + col("rnk").cast("double"))).as("_c"))
    }.reduce(_.unionByName(_))
    val scored = tagged
      .groupBy(col("q_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("_li"), col("_c")))),
        lit(0.0), (acc, x) => acc + x("_c")).as("rrf"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("rrf"))
  }
}
