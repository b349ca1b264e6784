package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, quality scoring, language ID, fingerprinting).
  *
  * Everything here is built from codegen'd Spark SQL functions — no UDFs —
  * so whole-stage codegen spans the full pipeline and the same arithmetic
  * is reproducible in any ANSI engine (the DuckDB oracles mirror these
  * formulas exactly).
  *
  * Cross-engine determinism rules used throughout:
  *  - hashes are md5-derived (md5 is bit-identical everywhere), folded to
  *    a positive long from a hex prefix — never engine-native hash()
  *  - float math happens in IEEE double with a fixed left-to-right fold
  *    order, so results are bit-identical across engines
  */
object TextFunctions {

  /** Deterministic 60-bit positive hash of a string column: first 15 hex
    * chars of md5 as a long. DuckDB mirror:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 48-bit variant (for SimHash, where bits are enumerated). */
  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Whitespace tokens. The synthetic corpus is single-space separated;
    * for arbitrary text swap in split(trim(c), "\\s+"). */
  def wsTokens(c: Column): Column = split(c, " ")

  /** Word n-gram shingles from a token array (the dedup unit). Empty for
    * docs shorter than n tokens. */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array())

  /** A GPT-style pre-tokenizer: letter runs | digit runs | single
    * non-alphanumeric glyphs. Counts approximate BPE token counts well
    * enough for length filtering. */
  val BpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(BpePattern), lit(0))

  /** Stopword-profile language ID: score each language by how many tokens
    * hit its function-word profile, predict the argmax (ties broken by
    * profile order, "und" = undetermined when all scores are zero).
    * A word-level n-gram heuristic — cheap, shuffle-free, codegen'd. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  def langScores(tokens: Column): Seq[(String, Column)] =
    LangProfiles.map { case (lang, words) =>
      lang -> size(filter(tokens, t => t.isin(words.map(lit(_)): _*)))
    }

  def langId(tokens: Column): Column = {
    val scores = langScores(tokens)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Character-trigram language ID — the "real" heuristic for natural
    * text, spec-tested on genuine multilingual sentences. Scores = count
    * of profile trigrams present; argmax wins. Not oracle-mirrored (the
    * synthetic corpus has no cross-language signal); lives here as the
    * production path with [[langId]] as the word-level fallback. */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", "ing", " of", "of ", "ion"),
    "de" -> Seq("der", " der", "ich", "sch", "ein", "die", "und", " un", "en ", "cht"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", "ión", " es", "es ", "ent", "ado"),
    "fr" -> Seq(" le", "le ", " de", "es ", "ent", " et", "et ", "ais", "our", "que"))

  def langIdTrigram(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val grams = transform(sequence(lit(1), greatest(length(padded) - 2, lit(0))),
      i => padded.substr(i, lit(3)))
    val scores = TrigramProfiles.map { case (lang, profile) =>
      lang -> size(filter(grams, g => g.isin(profile.map(lit(_)): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Rolling-hash document fingerprint: the min/max of k-gram shingle
    * hashes (= a 1-function MinHash; collision-resistant doc identity
    * that survives reordering-free edits). */
  def fingerprintMin(tokens: Column, k: Int): Column =
    array_min(transform(shingles(tokens, k), s => hash60(s)))

  def fingerprintMax(tokens: Column, k: Int): Column =
    array_max(transform(shingles(tokens, k), s => hash60(s)))
}
