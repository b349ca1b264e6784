package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** md5 hashes of the non-overlapping `width`-token spans of a token
    * array (the exact-substring dedup unit — see
    * [[Dedup.spanStats]]); empty for docs shorter than one span. */
  def spanHashes(tokens: Column, width: Int): Column = {
    val nSpans = floor(size(tokens) / width).cast("int")
    when(nSpans > 0,
      transform(sequence(lit(0), nSpans - 1),
        i => md5(concat_ws(" ", slice(tokens, i * width + 1, lit(width))))))
      .otherwise(array().cast("array<string>"))
  }

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

  // ---- repetition / quality-filter rules ----------------------------------
  // The Gopher/MassiveText-style repetition signals (Rae et al. 2021,
  // §A1.1 "repetition" filters): fraction of duplicated tokens and of
  // duplicated n-grams, and the mass of the single most frequent token.
  // All are pure per-row array expressions — shuffle-free, so a quality
  // pass over 100 TB is embarrassingly parallel.

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 - distinct/total. 0.0 for empty docs. */
  def dupTokenFrac(tokens: Column): Column =
    when(size(tokens) > 0,
      lit(1.0) - size(array_distinct(tokens)).cast("double") / size(tokens))
      .otherwise(lit(0.0))

  /** Fraction of word n-grams that are repeats (the "duplicate n-gram
    * fraction" rule; high values = boilerplate / looped generations). */
  def dupNgramFrac(tokens: Column, n: Int): Column = {
    val grams = shingles(tokens, n)
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
      .otherwise(lit(0.0))
  }

  /** Occurrence count of the single most frequent token: sort the
    * tokens, then one fold tracking the longest equal-run — O(n log n)
    * per row instead of the O(n·distinct) count-per-distinct shape. */
  def topTokenCount(tokens: Column): Column =
    aggregate(
      array_sort(tokens),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** The standard keep/drop decision from the repetition rules (the
    * thresholds are the caller's; the defaults mirror the published
    * filter: drop token-repeat-heavy docs, duplicate-2-gram-dominated
    * docs, and docs dominated by one token). */
  def repetitionKeep(
      tokens: Column,
      maxDupTokenFrac: Double = 0.85,
      maxDup2gramFrac: Double = 0.65,
      maxTopTokenFrac: Double = 0.30): Column =
    (dupTokenFrac(tokens) <= maxDupTokenFrac) &&
      (dupNgramFrac(tokens, 2) <= maxDup2gramFrac) &&
      (size(tokens) === 0 ||
        topTokenCount(tokens).cast("double") / size(tokens) <= maxTopTokenFrac)

  // ---- full Gopher rule chain ---------------------------------------------

  /** The complete MassiveText quality-filter chain (Rae et al. 2021
    * §A1.1 — the rule set beyond the repetition filters above):
    * document word-count bounds, mean-word-length band, minimum
    * fraction of words containing an alphabetic character, minimum
    * distinct stopwords, then the repetition rules. Returns the FIRST
    * failing rule's name ('word_count' | 'mean_word_len' | 'alpha_frac'
    * | 'stopwords' | 'repetition') or 'keep'. Pure per-row array math —
    * a quality pass stays shuffle-free at any scale. */
  // canonical Gopher thresholds — the ONLY place they are written down;
  // the SQL `gopher_verdict` registration and the overload defaults
  // below both read these
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMinAlphaFrac = 0.8
  val GopherMinDistinctStops = 2

  def gopherVerdict(tokens: Column, stopwords: Seq[String],
      minWords: Int = GopherMinWords, maxWords: Int = GopherMaxWords,
      minMeanLen: Double = GopherMinMeanLen,
      maxMeanLen: Double = GopherMaxMeanLen,
      minAlphaFrac: Double = GopherMinAlphaFrac,
      minDistinctStops: Int = GopherMinDistinctStops): Column =
    gopherVerdict(tokens, array(stopwords.map(lit(_)): _*), minWords,
      maxWords, minMeanLen, maxMeanLen, minAlphaFrac, minDistinctStops)

  /** Core form with the stopword set as an array column (the SQL
    * function surface binds here). */
  def gopherVerdict(tokens: Column, stopwords: Column, minWords: Int,
      maxWords: Int, minMeanLen: Double, maxMeanLen: Double,
      minAlphaFrac: Double, minDistinctStops: Int): Column = {
    val n = size(tokens)
    // integer length sum then one division: bit-identical to the
    // oracle's list_sum/len arithmetic
    val meanLen = when(n > 0,
      aggregate(tokens, lit(0L), (acc, w) => acc + length(w))
        .cast("double") / n).otherwise(lit(0.0))
    val alphaFrac = when(n > 0,
      size(filter(tokens, w => w.rlike("[a-zA-Z]"))).cast("double") / n)
      .otherwise(lit(0.0))
    val stops = size(array_intersect(array_distinct(tokens), stopwords))
    when(n < minWords || n > maxWords, lit("word_count"))
      .when(meanLen < minMeanLen || meanLen > maxMeanLen, lit("mean_word_len"))
      .when(alphaFrac < minAlphaFrac, lit("alpha_frac"))
      .when(stops < minDistinctStops, lit("stopwords"))
      .when(!repetitionKeep(tokens), lit("repetition"))
      .otherwise(lit("keep"))
  }

  // ---- C4-style line-level cleaning ---------------------------------------
  // The other canonical web-corpus filter chain (Raffel et al. 2020,
  // "Colossal Clean Crawled Corpus", §2.2) — line-level rules first,
  // then page-level verdicts over the CLEANED page. All pure per-row
  // array/string math: shuffle-free at any scale.

  /** C4 line rule: keep a line iff (trimmed) it ends in terminal
    * punctuation, has at least `minLineWords` words, and does not
    * mention "javascript". */
  def c4LineKeep(line: Column, minLineWords: Int = 3): Column = {
    val t = trim(line)
    t.rlike("[.!?\"']$") &&
      // runs of spaces must not mint empty "words" toward the minimum
      size(filter(split(t, " "), w => w =!= "")) >= minLineWords &&
      !lower(t).contains("javascript")
  }

  /** Apply the line rules: the page with offending lines removed
    * (line separator preserved as `\n`). */
  def c4Clean(text: Column, minLineWords: Int = 3): Column =
    array_join(filter(split(text, "\n"), l => c4LineKeep(l, minLineWords)), "\n")

  /** Sentence count of a cleaned page = terminal-punctuation marks. */
  def c4SentenceCount(cleaned: Column): Column =
    size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0))).cast("long")

  /** Page-level verdict over the CLEANED text, first failing rule wins
    * (same ordered-verdict shape as [[gopherVerdict]]): 'brace' (source
    * code markers), 'lorem_ipsum' (placeholder text), 'blocklist'
    * (caller-supplied bad words, matched case-insensitively as
    * substrings), 'too_few_sentences' (< `minSentences` after line
    * cleaning), else 'keep'. */
  def c4Verdict(cleaned: Column, blocklist: Seq[String] = Nil,
      minSentences: Int = 5): Column = {
    val lc = lower(cleaned)
    val blocked = blocklist.foldLeft(lit(false))((acc, w) =>
      acc || lc.contains(w.toLowerCase))
    when(cleaned.contains("{"), lit("brace"))
      .when(lc.contains("lorem ipsum"), lit("lorem_ipsum"))
      .when(blocked, lit("blocklist"))
      .when(c4SentenceCount(cleaned) < minSentences, lit("too_few_sentences"))
      .otherwise(lit("keep"))
  }

  // ---- PII scrubbing -------------------------------------------------------
  // Pattern-based redaction for the classic training-data scrub pass
  // (emails, IPv4s, US-style phone numbers). Patterns stick to syntax
  // valid in both Java regex and RE2 so oracles can mirror the counts.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long"))

  /** Replace each PII match with a typed placeholder token. Order
    * matters: emails first (an email's domain must not be half-eaten by
    * another rule), then IPs, then phones. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "[EMAIL]")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "[IP]")
    regexp_replace(noIp, PhonePattern, "[PHONE]")
  }

  /** Payment-card candidates: 13–19 digits, single space/dash separators
    * allowed between digits (the forms cards are actually typed in).
    * Syntax valid in Java regex AND RE2 (no backreferences). */
  val CardCandidatePattern = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Luhn checksum (ISO/IEC 7812 mod-10) over a candidate that may still
    * carry separators — the validator that separates real card numbers
    * from arbitrary digit runs (order IDs, timestamps), the same
    * candidate→checksum split every PII scrubber (e.g. presidio's credit
    * card recognizer) uses. Pure Catalyst fold: strip separators,
    * reverse, double every second digit from the right (−9 overflow
    * fold), sum % 10 == 0. Codegen'd per row — no UDF, no shuffle. */
  def luhnValid(candidate: Column): Column = {
    val ds = regexp_replace(candidate, "[ -]", "")
    val digs = transform(split(reverse(ds), ""), (c, i) => {
      val d = c.cast("int")
      when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(digs, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** (candidate count, Luhn-valid count) per document. */
  def cardCounts(text: Column): (Column, Column) = {
    val cands = regexp_extract_all(text, lit(CardCandidatePattern), lit(0))
    (size(cands).cast("long"),
      size(filter(cands, luhnValid(_))).cast("long"))
  }

  /** Redact ALL card-shaped digit runs, Luhn-valid or not — redaction is
    * deliberately more conservative than detection (a mistyped card
    * number is still PII; an order ID eaten by the scrub costs nothing).
    * The Luhn counts above are the metric; this is the scrub. */
  def redactCards(text: Column): Column =
    regexp_replace(text, CardCandidatePattern, "[CARD]")

  // ---- HTML stripping ------------------------------------------------------
  // Crawl-derived corpora arrive as markup; the standard extraction pass
  // drops script/style payloads and comments wholesale, turns remaining
  // tags into whitespace, decodes the common entities, and collapses
  // runs of whitespace. All patterns are valid in both Java regex and
  // RE2 (inline (?is) flags, lazy quantifiers, no backreferences) so
  // DuckDB oracles can replay the chain verbatim.

  private val ScriptBlock = "(?is)<script\\b[^>]*>.*?</script>"
  private val StyleBlock = "(?is)<style\\b[^>]*>.*?</style>"
  private val CommentBlock = "(?s)<!--.*?-->"
  private val AnyTag = "<[^>]*>"

  /** (entity, replacement) in DECODE ORDER: `&amp;` must come last so
    * double-escaped text like `&amp;lt;` decodes exactly once (to
    * `&lt;`), never twice (to `<`). */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Markup → plain text: drop script/style/comment payloads, replace
    * tags with spaces, decode common entities, collapse whitespace.
    * Pure per-row regex chain — codegen'd, shuffle-free at any scale. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, ScriptBlock, " "), StyleBlock, " "),
      CommentBlock, " ")
    val noTags = regexp_replace(noBlocks, AnyTag, " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    // explicit class, NOT \s: Java's \s includes \x0B, RE2's does not —
    // spelling it out keeps both engines byte-identical
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r\\x0B]+", " "))
  }

  // ---- URL extraction / host filtering -------------------------------------
  // Domain-level curation (blocklists, per-host mixing weights, spam-host
  // pruning) needs URLs pulled out of text and reduced to hosts. Both
  // patterns are RE2-safe for oracle parity.

  // case-insensitive scheme (crawl data carries HTTP://); terminator is
  // any whitespace, spelled as an explicit class for RE2 parity. The
  // LAST character must additionally not be sentence punctuation, so
  // "(https://ads.example)" yields the bare URL — a punctuation-suffixed
  // host would evade blocklist equality checks downstream
  val UrlPattern =
    "(?i)https?://[^ \\t\\n\\f\\r\\x0B]*[^ \\t\\n\\f\\r\\x0B.,;:!?)\\]'\"]"
  private val HostPattern = "(?i)^https?://([^/:?#]+)"

  /** Every http(s) URL in the text, in order of appearance. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** Lowercased hostname of a URL ('' when the scheme is missing);
    * ports, paths, queries and fragments are cut. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  // tracking params stripped by canonicalUrl; a char-class-only RE2/Java
  // common-subset pattern (no \w, no lookaround)
  private val TrackParam = "(utm_[a-z0-9_]*|fbclid|gclid)"

  /** Canonical form of a URL for URL-level dedup (the C4/Gopher first
    * pass — the same page re-crawled via different link decorations must
    * collapse): drops the #fragment, strips tracking query params
    * (utm_*, fbclid, gclid) wherever they sit in the query string,
    * lowercases scheme + host (never the path — paths are case-
    * sensitive), removes a leading `www.`, drops the scheme-default
    * port (:80 http / :443 https), and trims trailing `/` and `?`.
    *
    * Pure per-row regex math over patterns in the Java/RE2 common
    * subset, so the DuckDB oracle replays every step; shuffle-free at
    * any corpus size. A scheme-less input passes through (the prefix
    * rules simply don't match). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // non-leading trackers drop with their '&'; a leading tracker
    // followed by more params donates its '?' to the successor; a
    // leading lone tracker drops with the '?'
    val a = regexp_replace(noFrag, "(?i)&" + TrackParam + "=[^&]*", "")
    val b = regexp_replace(a, "(?i)\\?" + TrackParam + "=[^&]*&", "?")
    val c = regexp_replace(b, "(?i)\\?" + TrackParam + "=[^&]*$", "")
    val prefixPat = "(?i)^https?://[^/?#]*"
    val pfx = lower(regexp_extract(c, prefixPat, 0))
    val pfxNoPort = regexp_replace(
      regexp_replace(pfx, "^(http://[^/:?#]+):80$", "$1"),
      "^(https://[^/:?#]+):443$", "$1")
    val pfxNoWww = regexp_replace(pfxNoPort, "^(https?)://www\\.", "$1://")
    val rest = regexp_replace(c, prefixPat, "")
    regexp_replace(concat(pfxNoWww, rest), "[/?]+$", "")
  }

  // ---- line-level dedup ----------------------------------------------------

  /** Remove repeated lines within a document, keeping the FIRST
    * occurrence of each (boilerplate like nav text and newsletter
    * banners repeats verbatim; C4/RefinedWeb drop the repeats, not the
    * first sighting). `array_distinct` preserves first-occurrence
    * order, so the document's reading order survives. Per-row only. */
  def dedupLines(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  // ---- unicode normalization -----------------------------------------------

  /** NFC/NFD/NFKC/NFKD normalization via the codegen'd
    * [[graft.functions.NormalizeText]] expression (see its scaladoc for
    * why dedup pipelines need this before hashing). */
  def normalize(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.functions.NormalizeText(
        org.apache.spark.sql.graft.ColumnBridge.toCatalyst(text), form))

  // ---- BPE tokenizer apply -------------------------------------------------

  /** Greedy ranked-merge application over a token array (the tokenizer
    * APPLY side; codegen'd [[graft.functions.BpeApply]] kernel): per
    * merge (a, b), one left-to-right pass replaces non-overlapping
    * adjacent (a, b) pairs with their concatenation. Per-row math —
    * shuffle-free at any corpus size once the (tiny) merge table is in
    * hand. */
  def bpeApply(tokens: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.functions.BpeApply(
        org.apache.spark.sql.graft.ColumnBridge.toCatalyst(tokens), merges))

  /** [[bpeApply]]'s WordPiece variant: pair matching on the
    * `##`-marked symbols, merged token = `a + b` with b's continuation
    * mark stripped (so `("ab", "##cd")` merges to `"abcd"`, still
    * continuation-marked iff `a` was). Same codegen'd kernel. */
  def wpApply(tokens: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      graft.functions.BpeApply(
        org.apache.spark.sql.graft.ColumnBridge.toCatalyst(tokens), merges,
        merges.map { case (a, b) => a + b.stripPrefix("##") }))

  /** Per-document vocabulary coverage against the corpus's top-`k`
    * tokens (count DESC, token ASC — deterministic): token instances
    * outside the vocab are OOV — the tokenizer-fit / domain-shift
    * diagnostic. Two text scans total: one token-level aggregation
    * builds the vocab (collected to the driver, codebook-sized like
    * [[topPairs]]), then scoring is pure per-row membership math —
    * no explode+join and no shuffle on the scoring pass. Null-text
    * docs are filtered explicitly. Output: (idCol, n_tokens, n_oov,
    * oov_rate). */
  def oovRates(
      df: DataFrame, idCol: String, textCol: Column, k: Int): DataFrame = {
    val clean = df.filter(textCol.isNotNull)
    val vocab: Seq[String] = clean
      .select(explode(wsTokens(textCol)).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_t").asc).limit(k)
      .collect().map(_.getString(0)).toSeq
    val toks = wsTokens(textCol)
    val vocabLit = typedlit(vocab)
    clean.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => !array_contains(vocabLit, t)))
          .cast("long").as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }

  /** The top-`k` adjacent token pairs by corpus frequency (count DESC,
    * pair ASC — fully deterministic), as a ranked merge table for
    * [[bpeApply]]. One hash aggregation + a driver collect of k rows
    * (codebook-sized, like a quantizer). */
  def topPairs(df: DataFrame, textCol: Column, k: Int): Seq[(String, String)] =
    df.select(explode(shingles(wsTokens(textCol), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
      .collect().map { r =>
        val Array(a, b) = r.getString(0).split(" ", 2)
        (a, b)
      }.toSeq
}
