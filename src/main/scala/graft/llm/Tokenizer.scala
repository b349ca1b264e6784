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
    // ONE corpus scan: the shared word-type histogram ([[wordTypes]] —
    // empty tokens from separator runs carry no pairs and are dropped
    // there), then expand types to their char symbols.
    var types: DataFrame = wordTypes(df, textCol)
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

  // ==========================================================================
  // Unigram-LM tokenizer (Kudo 2018, "Subword Regularization" — the
  // SentencePiece unigram model), Viterbi-EM variant: the OTHER real-world
  // tokenizer algorithm next to BPE. Same scale posture as bpeTrain: the
  // corpus collapses to a word-TYPE histogram in one scan; every EM round
  // is one job over the types table with the (small) vocab riding the plan
  // as a single map literal; Viterbi itself is pure per-row array math.
  // ==========================================================================

  /** Log-prob assigned to an out-of-vocabulary single character — keeps
    * every position reachable (any text encodes) while making an OOV
    * char strictly worse than any real piece. Deterministic and
    * engine-replayable (the oracle inlines the same constant). */
  val UnkLogProb: Double = -100.0

  /** Viterbi-best segmentation of a single non-empty word under a
    * unigram piece model: dp(i) = max over j in [i−L, i) of
    * dp(j) + logprob(w[j+1..i]); ties on score break to the LARGER j
    * (shorter final piece) via the struct-max. Unknown single chars
    * fall back to [[UnkLogProb]] — every position stays reachable, any
    * text encodes; unknown multi-char substrings are simply not
    * candidates (null score, filtered). Pure Catalyst fold (aggregate
    * over positions carrying (score, pieces) cells) — no UDF, no
    * shuffle, O(len · maxPieceLen) per word. Pass `vocab` as a
    * `typedlit(Map[String, Double])` so the plan carries ONE literal. */
  def unigramViterbi(word: Column, vocab: Column, maxPieceLen: Int): Column = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val init = array(struct(
      lit(0.0).as("score"),
      array().cast("array<string>").as("pieces")))
    // empty words must short-circuit: sequence(1, 0) is the DESCENDING
    // array [1, 0], which would drive the fold to element_at(dp, 0)
    val fold = aggregate(
      sequence(lit(1), length(word)),
      init,
      (dp, i) => {
        val best = array_max(filter(
          transform(
            sequence(greatest(i - maxPieceLen, lit(0)), i - 1),
            j => {
              val piece = word.substr(j + 1, i - j)
              val lp = when(i - j === 1,
                  coalesce(element_at(vocab, piece), lit(UnkLogProb)))
                .otherwise(element_at(vocab, piece))
              struct((element_at(dp, j + 1)("score") + lp).as("score"),
                j.as("j"))
            }),
          c => c("score").isNotNull))
        val bestJ = best("j")
        concat(dp, array(struct(
          best("score").as("score"),
          concat(element_at(dp, bestJ + 1)("pieces"),
            array(word.substr(bestJ + 1, i - bestJ))).as("pieces"))))
      },
      dp => element_at(dp, -1)("pieces"))
    when(length(word) > 0, fold)
      .otherwise(array().cast("array<string>"))
  }

  /** Tokenize documents with a trained unigram vocab: per word Viterbi,
    * flattened per document (unigram segmentation never crosses a word
    * boundary, so flattening is exact). Empty tokens from separator
    * runs carry nothing and are dropped. */
  def unigramEncode(textCol: Column, vocab: Column, maxPieceLen: Int): Column =
    flatten(transform(
      filter(TF.wsTokens(textCol), w => w =!= ""),
      w => unigramViterbi(w, vocab, maxPieceLen)))

  /** Substring seed census: every substring (≤ `maxPieceLen` chars) of
    * every word TYPE, weighted by the type's corpus count — the
    * candidate pool unigram training selects its seed vocabulary from.
    * One corpus scan for the histogram; the explode fans out
    * O(len · maxPieceLen) per TYPE, never per corpus row.
    * Output: (piece, cnt). */
  def unigramSeedCounts(
      df: DataFrame, textCol: Column, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val types = wordTypes(df, textCol)
    val subs = flatten(transform(
      sequence(lit(1), length(col("w"))),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
        l => col("w").substr(i, l))))
    types.select(explode(subs).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
  }

  /** One corpus scan: the word-TYPE histogram every trainer runs on. */
  private def wordTypes(df: DataFrame, textCol: Column): DataFrame = df
    .filter(textCol.isNotNull)
    .select(explode(TF.wsTokens(textCol)).as("w"))
    .filter(col("w") =!= "")
    .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** A trained unigram piece: corpus count under the final Viterbi pass
    * and its log-probability ln(cnt / total) over that pass. */
  case class UnigramPiece(piece: String, cnt: Long, logprob: Double)

  /** Train a unigram-LM tokenizer vocabulary, Viterbi-EM variant:
    *
    *  1. SEED: top `seedSize` substrings by (count desc, piece asc)
    *     from [[unigramSeedCounts]], plus ALL single characters
    *     (coverage — training never needs the UNK fallback);
    *     initial logprob = ln(cnt / total over the selected seed).
    *  2. EM × `emRounds`: segment every word type with
    *     [[unigramViterbi]] under the current model (one distributed
    *     job, vocab-sized result to the driver), recount pieces
    *     weighted by type counts, re-normalize ln(cnt / total). Pieces
    *     no Viterbi path uses drop out (count 0) — the pruning force.
    *  3. FINAL: keep every surviving single-char piece, plus the top
    *     multi-char pieces by (cnt desc, piece asc) up to `vocabSize`
    *     total.
    *
    * Fully deterministic (no sampling, defined tie-breaks) and
    * engine-replayable — the q178/q179 oracles unroll the same census,
    * DP and renormalization term-for-term. Log-probs are doubles, so
    * the gates lean on ln() producing identical bits across JVM libm
    * and DuckDB (the same reliance every xent/LM gate in this repo
    * already makes — q97/q99/q137); all DISCRETE decisions (seed
    * selection, pruning, tie-breaks) use exact longs and codepoint
    * string order, never floats. */
  def unigramTrain(
      df: DataFrame, textCol: Column, vocabSize: Int,
      maxPieceLen: Int = 4, seedSize: Int = 1000,
      emRounds: Int = 1): Seq[UnigramPiece] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be >= 1: $seedSize")
    require(emRounds >= 1, s"emRounds must be >= 1: $emRounds")
    // driver-side tie-breaks must match Spark/DuckDB string order
    // (codepoint == UTF-8 byte order); Ordering.String is UTF-16
    // code-unit order, which disagrees beyond the BMP
    val byCntThenPiece = Ordering.Tuple2(Ordering.Long, CodepointOrder)
    val types = wordTypes(df, textCol).persist()
    val census = unigramSeedCounts(df, textCol, maxPieceLen).persist()
    try {
      val top = census
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(seedSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val chars = census.filter(length(col("piece")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val seed = (top ++ chars).toMap.toSeq.sortBy(_._1)(CodepointOrder)
      var counts: Seq[(String, Long)] = seed
      var round = 0
      while (round < emRounds) {
        val total = counts.map(_._2).sum.toDouble
        val lp = counts.map { case (p, c) => p -> math.log(c / total) }.toMap
        counts = types
          .select(explode(
            unigramViterbi(col("w"), typedlit(lp), maxPieceLen)).as("piece"),
            col("cnt"))
          .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
          .sortBy(_._1)(CodepointOrder)
        round += 1
      }
      val total = counts.map(_._2).sum.toDouble
      // single-CODEPOINT pieces (not single UTF-16 units: a non-BMP char
      // is one piece and must keep its coverage exemption)
      val (chars1, multi) = counts.partition(p =>
        p._1.codePointCount(0, p._1.length) == 1)
      val kept = chars1 ++ multi
        .sortBy { case (p, c) => (-c, p) }(byCntThenPiece)
        .take(math.max(0, vocabSize - chars1.size))
      kept.sortBy { case (p, c) => (-c, p) }(byCntThenPiece)
        .map { case (p, c) => UnigramPiece(p, c, math.log(c / total)) }
    } finally {
      census.unpersist()
      types.unpersist()
    }
  }

  // ==========================================================================
  // WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
  // completes the real-world trio next to BPE and unigram-LM. Training is
  // the BPE loop with a LIKELIHOOD selection rule: the merged pair is the
  // one maximizing count(ab) / (count(a) · count(b)) over the current
  // symbol state (the mutual-information greedy step), with continuation
  // symbols carrying the `##` mark. Encoding is greedy longest-match-first
  // per word with an [UNK] fallback — NOT the merge replay BPE uses. Same
  // scale posture as bpeTrain: one corpus scan to the word-TYPE histogram,
  // every training step one distributed pair+unigram census with a 1-row
  // argmax collect, encode pure per-row array math (no UDF, no shuffle).
  // ==========================================================================

  /** The unknown-word token greedy encoding falls back to when no vocab
    * piece matches at some position (BERT's convention). */
  val UnkToken = "[UNK]"

  /** WordPiece continuation mark (BERT's convention): every non-initial
    * symbol of a word carries it; merging strips it from the right-hand
    * side so merged pieces stay marked iff word-internal. */
  val WpMark = "##"

  /** A word's initial WordPiece symbols: first character plain, every
    * following character `##`-marked. Codepoint-wise split, like
    * [[charSymbols]] (the oracle replays it with the same regex). */
  def wpSymbols(word: Column): Column = {
    val chars = regexp_extract_all(word, lit("(?s)."), lit(0))
    transform(sequence(lit(1), size(chars)), i =>
      when(i === 1, element_at(chars, i))
        .otherwise(concat(lit(WpMark), element_at(chars, i))))
  }

  /** One learned WordPiece merge: rank, the (marked) pair, its pair
    * count, its likelihood score count(ab)/(count(a)·count(b)) at
    * selection time, the merged token, and the weighted corpus symbol
    * count after applying it (gating every intermediate state). The
    * score is a ratio of exact longs cast to double — IEEE division is
    * correctly rounded, so Spark and DuckDB produce identical bits. */
  case class WpMerge(rnk: Long, a: String, b: String, cnt: Long,
      score: Double, merged: String, corpusSymbolsAfter: Long)

  /** Learn `numMerges` WordPiece merges from `textCol`. Ties on score
    * break to the lexicographically smallest pair — fully deterministic.
    * Stops early when no adjacent pair remains or the best pair's count
    * falls below `minCount`. */
  def wpTrain(
      df: DataFrame,
      textCol: Column,
      numMerges: Int,
      minCount: Long = 1L): Seq[WpMerge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var types: DataFrame = wordTypes(df, textCol)
      .select(col("w"), col("cnt"), wpSymbols(col("w")).as("sym"))
      .persist()
    val merges = ArrayBuffer.empty[WpMerge]
    var step = 0
    var done = false
    try {
      while (step < numMerges && !done) {
        // pair census + unigram census over the SAME symbol state, then
        // the likelihood argmax — one distributed job, a 1-row collect
        val pairs = types
          .select(col("cnt"), explode(TF.shingles(col("sym"), 2)).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("cp"))
        val unis = types
          .select(col("cnt"), explode(col("sym")).as("s"))
          .groupBy(col("s")).agg(sum(col("cnt")).as("cs"))
        val best = pairs
          .withColumn("a", split(col("p"), " ", 2)(0))
          .withColumn("b", split(col("p"), " ", 2)(1))
          .join(unis.select(col("s").as("a"), col("cs").as("ca")), "a")
          .join(unis.select(col("s").as("b"), col("cs").as("cb")), "b")
          .withColumn("score",
            col("cp").cast("double") /
              (col("ca").cast("double") * col("cb").cast("double")))
          .orderBy(col("score").desc, col("p").asc)
          .limit(1)
          .select("a", "b", "cp", "score")
          .collect()
        if (best.isEmpty || best(0).getLong(2) < minCount) {
          done = true
        } else {
          val (a, b) = (best(0).getString(0), best(0).getString(1))
          val merged = a + b.stripPrefix(WpMark)
          val next0 = types.withColumn("sym", TF.wpApply(col("sym"), Seq((a, b))))
          val next =
            if ((step + 1) % 8 == 0) next0.localCheckpoint(true)
            else next0.persist()
          val symsAfter = next
            .agg(sum(col("cnt") * size(col("sym"))).cast("long"))
            .collect()(0).getLong(0)
          types.unpersist()
          types = next
          merges += WpMerge(step + 1L, a, b, best(0).getLong(2),
            best(0).getDouble(3), merged, symsAfter)
          step += 1
        }
      }
    } finally types.unpersist()
    merges.toSeq
  }

  /** [[wpTrain]] as a (tiny, driver-local) DataFrame for gating:
    * columns (rnk, a, b, cnt, score, merged, corpus_symbols_after). */
  def wpTrainDF(
      spark: SparkSession,
      df: DataFrame,
      textCol: Column,
      numMerges: Int): DataFrame = {
    val rows = wpTrain(df, textCol, numMerges).map(m =>
      Row(m.rnk, m.a, m.b, m.cnt, m.score, m.merged, m.corpusSymbolsAfter))
    val schema = StructType(Seq(
      StructField("rnk", LongType, nullable = false),
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("corpus_symbols_after", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The encode-side vocabulary a training run induces: the corpus's
    * initial symbol alphabet (all single chars, plain and `##`-marked)
    * plus every merge product. One distributed census over word TYPES. */
  def wpVocab(df: DataFrame, textCol: Column,
      merges: Seq[WpMerge]): Seq[String] = {
    val alphabet = wordTypes(df, textCol)
      .select(explode(wpSymbols(col("w"))).as("s"))
      .distinct()
      .collect().map(_.getString(0)).toSeq
    (alphabet ++ merges.map(_.merged)).distinct.sorted(CodepointOrder)
  }

  /** Greedy longest-match-first WordPiece encoding of one word: at each
    * position take the LONGEST vocab piece matching (word-initial pieces
    * plain, continuations `##`-marked); if none matches, the whole word
    * becomes [[UnkToken]] (BERT's behavior). Pure Catalyst fold — state
    * (pos, pieces, failed) advanced at most len(word) times, each step
    * O(maxPieceLen) map probes; no UDF, no shuffle. Pass `vocab` as a
    * `typedlit(Map[String, Int])` so the plan carries ONE literal. */
  def wpEncodeWord(word: Column, vocab: Column, maxPieceLen: Int): Column = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val init = struct(
      lit(0).as("pos"),
      array().cast("array<string>").as("pieces"),
      lit(false).as("failed"))
    val fold = aggregate(
      sequence(lit(1), length(word)),
      init,
      (st, _) => {
        val stall = st("failed") || st("pos") >= length(word)
        val maxL = least(lit(maxPieceLen), length(word) - st("pos"))
        val cand = array_max(filter(
          transform(sequence(lit(1), maxL), l => {
            val raw = word.substr(st("pos") + 1, l)
            val piece = when(st("pos") === 0, raw)
              .otherwise(concat(lit(WpMark), raw))
            when(element_at(vocab, piece).isNotNull,
              struct(l.as("l"), piece.as("piece")))
          }),
          c => c.isNotNull))
        when(stall, st).otherwise(
          when(cand.isNull,
            struct(st("pos").as("pos"), st("pieces").as("pieces"),
              lit(true).as("failed")))
          .otherwise(struct(
            (st("pos") + cand("l")).as("pos"),
            concat(st("pieces"), array(cand("piece"))).as("pieces"),
            lit(false).as("failed"))))
      },
      st => when(st("failed"), array(lit(UnkToken))).otherwise(st("pieces")))
    when(length(word) > 0, fold)
      .otherwise(array().cast("array<string>"))
  }

  /** Tokenize documents with a trained WordPiece vocab: per word greedy
    * longest-match, flattened per document (WordPiece never crosses a
    * word boundary). Empty tokens from separator runs are dropped. */
  def wpEncode(textCol: Column, vocab: Column, maxPieceLen: Int): Column =
    flatten(transform(
      filter(TF.wsTokens(textCol), w => w =!= ""),
      w => wpEncodeWord(w, vocab, maxPieceLen)))

  /** Codepoint-lexicographic string order — identical to Spark's
    * UTF8String ordering and DuckDB's binary collation. */
  private object CodepointOrder extends Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** [[unigramTrain]] as a (tiny, driver-local) DataFrame for gating:
    * columns (piece, cnt, logprob), ordered (cnt desc, piece asc). */
  def unigramTrainDF(
      spark: SparkSession, df: DataFrame, textCol: Column, vocabSize: Int,
      maxPieceLen: Int = 4, seedSize: Int = 1000,
      emRounds: Int = 1): DataFrame = {
    val rows = unigramTrain(df, textCol, vocabSize, maxPieceLen, seedSize,
      emRounds).map(p => Row(p.piece, p.cnt, p.logprob))
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("logprob", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
