package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{TextFunctions => TF}

/** BPE tokenizer TRAINING (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the LEARN
  * side of the tokenizer pair; [[TextFunctions.bpeApply]] is the APPLY
  * side (reference corpus-tooling analog: the pair-census + merge loop
  * the q100/q144 gates approximate one step of).
  *
  * Classic BPE counts symbol pairs WITHIN words only (the `</w>` end
  * mark keeps word-final subwords distinct), so the corpus collapses to
  * a word-TYPE histogram first: ONE corpus scan builds `(word, cnt)`,
  * and the entire merge loop then runs on the vocab-sized types table —
  * at 100 TB the corpus is scanned once and each of the K iterations
  * touches only distinct words (millions of rows, not billions). Each
  * iteration is one distributed pair-count + argmax (a 1-row collect)
  * plus one kernel-projection merge application; generations are
  * cached and lineage is truncated with `localCheckpoint` every 8
  * rounds (same idiom as [[Dedup.nearDupClusters]]).
  */
object Tokenizer {

  /** End-of-word mark appended as a terminal symbol to every word.
    * Because nothing ever FOLLOWS it inside a word, no learned merge
    * can start with a symbol ending in the mark — which is what makes
    * applying the merge table to a flattened whole-document symbol
    * stream equivalent to per-word application (see TokenizerSpec). */
  val EndMark = "</w>"

  /** A word's initial symbol sequence: its characters plus [[EndMark]].
    * `(?s).` (dot-all single char) is codepoint-wise in BOTH Java regex
    * and RE2 — including line terminators — so the DuckDB oracle's
    * `regexp_extract_all(w, '(?s).')` splits identically. */
  def charSymbols(word: Column): Column =
    concat(regexp_extract_all(word, lit("(?s)."), lit(0)), array(lit(EndMark)))

  /** One learned merge: rank (1-based), the pair, its corpus frequency
    * at selection time, and the weighted corpus symbol count AFTER
    * applying it — the last gates every intermediate state of the
    * loop, not just the chosen pairs. */
  case class BpeMerge(
      rnk: Long, a: String, b: String, cnt: Long, corpusSymbolsAfter: Long)

  /** Learn `numMerges` BPE merges from `textCol` (single-space
    * tokenized, like [[TextFunctions.wsTokens]]). Ties on pair
    * frequency break to the lexicographically smallest pair — fully
    * deterministic. Stops early only when no adjacent pair is left
    * (every word fully merged) or the best pair's frequency falls
    * below `minCount` (default 1 = never). */
  def bpeTrain(
      df: DataFrame,
      textCol: Column,
      numMerges: Int,
      minCount: Long = 1L): Seq[BpeMerge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    // ONE corpus scan: word-type histogram, then expand types to their
    // char symbols. Empty tokens (from runs of separators) carry no
    // pairs and are dropped up front.
    var types: DataFrame = df
      .filter(textCol.isNotNull)
      .select(explode(TF.wsTokens(textCol)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), charSymbols(col("w")).as("sym"))
      .persist()
    val merges = ArrayBuffer.empty[BpeMerge]
    var step = 0
    var done = false
    try {
      while (step < numMerges && !done) {
        val best = types
          .select(col("cnt"), explode(TF.shingles(col("sym"), 2)).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("p").asc)
          .limit(1)
          .collect()
        if (best.isEmpty || best(0).getLong(1) < minCount) {
          done = true
        } else {
          // symbols never contain ' ' (words are space-split), so the
          // shingle join/split round-trips the pair exactly
          val Array(a, b) = best(0).getString(0).split(" ", 2)
          val next0 = types.withColumn("sym", TF.bpeApply(col("sym"), Seq((a, b))))
          val next =
            if ((step + 1) % 8 == 0) next0.localCheckpoint(true)
            else next0.persist()
          val symsAfter = next
            .agg(sum(col("cnt") * size(col("sym"))).cast("long"))
            .collect()(0).getLong(0)
          types.unpersist()
          types = next
          merges += BpeMerge(step + 1L, a, b, best(0).getLong(1), symsAfter)
          step += 1
        }
      }
    } finally types.unpersist()
    merges.toSeq
  }

  /** [[bpeTrain]] as a (tiny, driver-local) DataFrame for gating:
    * columns (rnk, a, b, cnt, corpus_symbols_after). */
  def bpeTrainDF(
      spark: SparkSession,
      df: DataFrame,
      textCol: Column,
      numMerges: Int): DataFrame = {
    val rows = bpeTrain(df, textCol, numMerges).map(m =>
      Row(m.rnk, m.a, m.b, m.cnt, m.corpusSymbolsAfter))
    val schema = StructType(Seq(
      StructField("rnk", LongType, nullable = false),
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("corpus_symbols_after", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Tokenize documents with a learned merge table: each word expands
    * to char symbols + [[EndMark]], the flattened per-document stream
    * goes through the [[TextFunctions.bpeApply]] kernel once (per-row
    * math, shuffle-free at any corpus size — see [[EndMark]] for why
    * flattened == per-word). */
  def bpeEncode(textCol: Column, merges: Seq[(String, String)]): Column =
    TF.bpeApply(
      flatten(transform(TF.wsTokens(textCol), w => charSymbols(w))),
      merges)
}
