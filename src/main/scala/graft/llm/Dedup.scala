package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Corpus deduplication operators for training-data pipelines.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - NOTHING here cross-joins the corpus. Exact dedup is one
  *    hash-groupBy; fuzzy dedup goes through inverted-index joins
  *    (shingle → doc) or LSH bucket joins whose fan-out is bounded by
  *    bucket size, so the shuffle volume is O(docs × signature), not
  *    O(docs²).
  *  - `maxShingleDocFreq` drops stop-shingles before the pair join —
  *    the standard skew guard: a shingle shared by k docs produces k²
  *    candidate pairs, so frequency capping bounds worst-case skew.
  *  - All hashes are md5-derived (see [[TextFunctions.hash60]]) so every
  *    stage is reproducible across engines and across Spark retries.
  */
object Dedup {

  /** Exact dedup: group identical normalized text, keep the smallest id
    * as canonical (reference-style hash-groupBy; one shuffle). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Distinct (doc, shingle) inverted index, optionally dropping
    * shingles that occur in more than `maxDocFreq` docs (skew guard —
    * hot shingles explode the candidate join quadratically). */
  def shingleIndex(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc_id"),
        explode(shingles(wsTokens(col(textCol)), n)).as("s"))
      .distinct()
    maxDocFreq.fold(sh)(capIndex(sh, _))
  }

  /** The one copy of the doc-freq skew-cap rule: count docs per shingle
    * (windowless), keep the cold ones. Shared by [[shingleIndex]] and
    * the pair generators (which need the raw index too, for sizing). */
  private def capIndex(sh: DataFrame, cap: Int): DataFrame = {
    val freq = sh.groupBy("s").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= cap)
    sh.join(freq.select("s"), "s")
  }

  /** N-gram Jaccard near-dup pairs: inverted-index self-join on shingles
    * → common counts → |A∩B| / |A∪B| ≥ threshold. Exact (not
    * probabilistic); preferred when the corpus-per-shingle fan-out is
    * tame, else use [[minhashLsh]].
    *
    * `maxDocFreq` caps how many docs may share a shingle before it is
    * dropped from the PAIR-GENERATING index (default 1000): one
    * stop-shingle shared by k docs contributes k² candidate pairs, so an
    * uncapped index turns a single boilerplate phrase in a 1M-doc corpus
    * into 10¹² pairs. Doc sizes |A| and |B| always come from the
    * UNCAPPED shingle sets, so capping can only shrink |A∩B| — the
    * computed Jaccard of a pair touched by the cap only ever DROOPS
    * below the exact value, never inflates above it (sizing from the
    * capped index would raise J for asymmetric pairs: one boilerplate-
    * heavy doc would lose |A| mass but keep its intersection). The
    * standard recall-for-boundedness trade every corpus-scale dedup
    * makes. Pass `maxDocFreq = None` for exact uncapped semantics on
    * corpora known to be tame. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      maxDocFreq: Option[Int] = Some(1000)): DataFrame = {
    val raw = shingleIndex(df, idCol, textCol, n, None)
    val sh = maxDocFreq.fold(raw)(capIndex(raw, _))
    val sizes = raw.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
  }

  /** Directed shingle-containment pairs (Broder 1997's asymmetric
    * resemblance twin): containment(a in b) = |A∩B| / |A|. Catches what
    * symmetric Jaccard structurally misses — a short quote/excerpt page
    * fully contained in a long original scores containment 1.0 while
    * its Jaccard is |A|/|B| ≈ 0 — the aggregator/mirror-fragment case
    * in crawl dedup.
    *
    * Same inverted-index shape and the same `maxDocFreq` skew cap as
    * [[jaccardPairs]], and the same inflate-guard: |A| always comes
    * from the UNCAPPED shingle set, so the cap can only shrink the
    * intersection — a capped score droops below exact, never above.
    * Output: (doc_a, doc_b, common, containment) where containment is
    * the fraction of doc_a's shingles inside doc_b; BOTH orientations
    * of a pair are scored and filtered independently. */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      maxDocFreq: Option[Int] = Some(1000)): DataFrame = {
    val raw = shingleIndex(df, idCol, textCol, n, None)
    val sh = maxDocFreq.fold(raw)(capIndex(raw, _))
    val sizes = raw.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("_ida"), col("b.doc_id").as("_idb"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("_ida"), col("n_sh").as("_na")), "_ida")
      .join(sizes.select(col("doc_id").as("_idb"), col("n_sh").as("_nb")), "_idb")
    val ab = common.select(col("_ida").as("doc_a"), col("_idb").as("doc_b"),
      col("common"),
      (col("common").cast("double") / col("_na")).as("containment"))
    val ba = common.select(col("_idb").as("doc_a"), col("_ida").as("doc_b"),
      col("common"),
      (col("common").cast("double") / col("_nb")).as("containment"))
    ab.unionByName(ba).filter(col("containment") >= threshold)
  }

  /** Winnowing fingerprint index (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): hash every token k-gram, slide a window of `w`
    * consecutive gram hashes across the document, and keep each window's
    * MINIMUM hash. The guarantee the whole-document
    * [[TextFunctions.fingerprintMin]] cannot give: any shared passage of
    * at least w+k-1 tokens selects at least one common fingerprint in
    * both documents, while only ~2/(w+1) of the grams are stored —
    * position-robust partial-overlap detection at a fraction of the
    * inverted-index size.
    *
    * Scale shape: fingerprint selection is pure per-row array math (one
    * transform over the gram hashes, O(len·w) with w a small constant —
    * no UDF, no shuffle); the output is the distinct (doc_id, s) posting
    * list, id + 60-bit hash only. Documents shorter than `k` tokens have
    * no grams and emit no row; documents shorter than w+k-1 tokens form
    * a single window (their global min — fingerprintMin semantics). */
  def winnowIndex(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"k-gram size must be >= 1: $k")
    require(w >= 1, s"window size must be >= 1: $w")
    val base = df
      .select(col(idCol).as("doc_id"),
        transform(shingles(wsTokens(col(textCol)), k), g => hash60(g)).as("_hs"))
      .filter(size(col("_hs")) > 0)
    val nWin = greatest(size(col("_hs")) - (w - 1), lit(1))
    val fps = array_distinct(transform(
      sequence(lit(1), nWin), i => array_min(slice(col("_hs"), i, lit(w)))))
    // cross-ROW distinct too (same as shingleIndex): a doc_id split
    // across input rows must not double its postings — overlap scores
    // of > 1.0 would otherwise be possible
    base.select(col("doc_id"), explode(fps).as("s")).distinct()
  }

  /** Document pairs sharing at least `minShared` winnowing fingerprints
    * ([[winnowIndex]]), with `overlap` = shared / min(|A|, |B|) — the
    * MOSS-style partial-plagiarism / shared-passage report. Same
    * inverted-index join shape and the same `maxDocFreq` hot-key cap as
    * [[jaccardPairs]] (sizes always from the UNCAPPED fingerprint sets,
    * so a capped score droops, never inflates).
    * Output: (doc_a, doc_b, common, overlap). */
  def winnowOverlap(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long = 2L,
      maxDocFreq: Option[Int] = Some(1000)): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val raw = winnowIndex(df, idCol, textCol, k, w)
    val idx = maxDocFreq.fold(raw)(capIndex(raw, _))
    val sizes = raw.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val common = idx.as("a").join(idx.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minShared)
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("common"),
        (col("common").cast("double") / least(col("na"), col("nb")))
          .as("overlap"))
  }

  /** Edit-distance verification of CANDIDATE near-dup pairs — the
    * precision stage after a recall-oriented generator
    * ([[minhashLsh]]/[[simhashPairsBanded]]/[[jaccardPairs]]): join the
    * two texts back onto each (doc_a, doc_b) pair and keep pairs whose
    * Levenshtein distance is at most `maxRatio` of the longer text.
    * Token-set scores are blind to ORDER (a shuffled bag of the same
    * shingles can pass Jaccard); edit distance is not — this is the
    * verifier that kills those false accepts.
    *
    * Cost model: Levenshtein is O(|a|·|b|) PER PAIR, so this runs on
    * candidate-sized input (never the corpus) and both sides are capped
    * at `maxChars` characters (prefix comparison — the standard trade;
    * identical prefixes of two long near-dups still verify, and the cap
    * bounds the worst pair at maxChars²). The two text joins shuffle
    * pair ids + one capped text each; output is id-pair-sized.
    * Output: (doc_a, doc_b, dist, edit_ratio), edit_ratio in [0,1]
    * (two empty texts are identical: ratio 0). */
  def editVerify(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      maxRatio: Double, maxChars: Int = 1000): DataFrame = {
    require(maxRatio >= 0.0 && maxRatio <= 1.0, s"maxRatio in [0,1]: $maxRatio")
    require(maxChars >= 1, s"maxChars must be >= 1: $maxChars")
    val capped = docs.select(col(idCol),
      substring(col(textCol), 1, maxChars).as("_t"))
    // a candidate pair whose doc is missing from `docs` or has NULL
    // text must fail loudly — a silent drop here would mark a genuine
    // near-duplicate as verified-not-duplicate (same loud-input
    // convention as lshContaminatedDocs' id contract)
    def checked(side: String) = when(col(s"_t$side").isNotNull, col(s"_t$side"))
      .otherwise(raise_error(concat(
        lit(s"editVerify: doc_$side "), col(s"doc_$side").cast("string"),
        lit(" is missing from docs or has null text"))))
    val joined = pairs
      .join(capped.select(col(idCol).as("doc_a"), col("_t").as("_ta")),
        Seq("doc_a"), "left")
      .join(capped.select(col(idCol).as("doc_b"), col("_t").as("_tb")),
        Seq("doc_b"), "left")
      .withColumn("_ta", checked("a"))
      .withColumn("_tb", checked("b"))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb")).cast("long"))
      .withColumn("edit_ratio",
        when(greatest(length(col("_ta")), length(col("_tb"))) === 0, lit(0.0))
          .otherwise(col("dist").cast("double") /
            greatest(length(col("_ta")), length(col("_tb")))))
    joined.filter(col("edit_ratio") <= maxRatio)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("edit_ratio"))
  }

  /** Modulus for the derived MinHash family: largest prime < 2^30, so
    * `a * h0 + b` stays well inside a 64-bit long. */
  val MinhashPrime: Long = 1073741789L

  /** Per-document n-gram novelty against everything EARLIER in id
    * order (crawl/ingest order): the fraction of a doc's distinct
    * shingles first seen in a lower-id document — the boilerplate /
    * stale-content signal used to down-weight re-crawls without full
    * pair enumeration.
    *
    * Scale shape: one inverted-index hash aggregation (min doc per
    * shingle) plus a join whose output is EXACTLY the index size (each
    * (doc, shingle) row matches one first-doc row) — linear in the
    * corpus, never k² in hot-shingle doc frequency, so no frequency cap
    * is needed. Docs shorter than `n` tokens have no shingles and emit
    * no row. Output: (doc_id, n_shingles, n_seen, novelty). */
  def noveltyScores(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = shingleIndex(df, idCol, textCol, n, None)
    val firsts = sh.groupBy(col("s")).agg(min(col("doc_id")).as("_first"))
    sh.join(firsts, "s")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("_first") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
      .withColumn("novelty",
        lit(1.0) - col("n_seen").cast("double") / col("n_shingles"))
  }

  /** Deterministic md5-derived affine constants (a_i, b_i) for the
    * MinHash family — reproducible in any engine, so the DuckDB oracle
    * inlines the same numbers. */
  def minhashParam(i: Int): (Long, Long) = {
    def c(tag: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % MinhashPrime
    }
    (math.max(1L, c("mh-a")), c("mh-b"))
  }

  /** MinHash signatures via a derived affine family: ONE md5 per
    * shingle (h0 = hash60(s) mod p), then h_i = (a_i·h0 + b_i) mod p —
    * k universal hashes for the price of one digest (the reference
    * computes k independent hashes per shingle; the affine family is
    * the standard MinHash trick with the same estimator guarantees).
    * Returns (doc_id, sig array[k] ordered by i).
    *
    * Shape note: the k hashes are k agg COLUMNS over one shingle scan,
    * not a k-way row explosion — the shuffle moves #shingles rows, not
    * #shingles × k, and the k mins ride one hash aggregate. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    // one-pass codegen'd kernel: the signature folds document-locally
    // (graft.functions.MinHashSig), so there is NO shuffle here at all —
    // the former explode→distinct→groupBy moved #docs × #shingles rows
    // through two exchanges for the same minima (min over instances ==
    // min over distinct shingles)
    val (as, bs) = (0 until k).map(minhashParam).unzip
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    df.select(col(idCol).as("doc_id"),
        bridge.toColumn(graft.functions.MinHashSig(
          bridge.toExpr(wsTokens(col(textCol))), n, as, bs, MinhashPrime)).as("sig"))
      .filter(col("sig").isNotNull) // docs too short to shingle drop out, as before
  }

  /** DuckDB fragment computing the same signatures: the affine-family
    * parameter table as a VALUES list, inlined into oracle SQL so both
    * engines hash identically. */
  def minhashParamsSql(k: Int): String =
    (0 until k).map { i =>
      val (a, b) = minhashParam(i)
      s"($i, $a, $b)"
    }.mkString(", ")

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * k/bands rows; docs sharing any full band land in the same bucket
    * and become candidates; candidates are scored by fraction of
    * matching minhashes (an unbiased Jaccard estimate) and kept at
    * `minEst`. The bucket join replaces the all-pairs comparison — the
    * 100 TB path. */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4,
      minEst: Double = 0.5): DataFrame =
    minhashLshFromSigs(
      minhashSignatures(df, idCol, textCol, n, k).cache(), k, bands, minEst)

  /** [[minhashLsh]] over PRECOMPUTED signatures `(doc_id, sig)` — the
    * operating mode where signatures persist in a graft table and each
    * crawl batch upserts its own, so dedup cost tracks the BATCH, not
    * the corpus.
    *
    * `probeIds` = incremental mode: only candidate pairs with at least
    * one side in `probeIds` (a `doc_id` frame) are considered — new-vs-
    * all plus new-vs-new, never old-vs-old (those were reported when
    * the old docs were themselves new). The banded-collision criterion
    * is symmetric, so incremental rounds compose exactly: the union of
    * per-batch probe results over a growing store equals the one-shot
    * full recompute (q94 gates that equality against DuckDB). */
  def minhashLshFromSigs(
      sigs: DataFrame, k: Int, bands: Int, minEst: Double,
      probeIds: Option[DataFrame] = None): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rows = k / bands
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"))
      .withColumn("bucket",
        concat_ws(",", (0 until rows).map(r =>
          element_at(col("sig"), col("b") * rows + lit(r + 1)).cast("string")): _*))
      .select(col("doc_id"), col("b"), col("bucket"))
    val cand = probeIds match {
      case None =>
        banded.as("x").join(banded.as("y"),
            col("x.b") === col("y.b") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
      case Some(probe) =>
        // probe side is the (small) new batch: bucket join against the
        // full store, pair oriented a<b afterwards so new-new pairs
        // arriving from both directions collapse in the distinct
        banded.join(probe.select(col("doc_id")), Seq("doc_id")).as("x")
          .join(banded.as("y"),
            col("x.b") === col("y.b") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") =!= col("y.doc_id"))
          .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
          .distinct()
    }
    val matches = (1 to k).map(i =>
      when(element_at(col("sa"), i) === element_at(col("sb"), i), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
      .withColumn("n_match", matches.cast("long"))
      .withColumn("est_jaccard", col("n_match") / lit(k.toDouble))
      .filter(col("est_jaccard") >= minEst)
      .select(col("doc_a"), col("doc_b"), col("n_match"), col("est_jaccard"))
  }

  /** Connected components over near-dup pairs (`doc_a`, `doc_b`):
    * transitive closure turns pairwise matches into dedup GROUPS (a~b,
    * b~c ⇒ {a,b,c} dedup together; pairwise-only dedup would keep a and
    * c). Iterative min-label propagation — each round every node takes
    * the min component id among itself and its neighbors; converges in
    * O(log diameter) rounds, all shuffle-side, no driver graph state.
    * Returns (node, component = min doc id of its cluster). */
  def nearDupClusters(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().cache()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node")).cache()
    labels.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val neighborMin = sym
        .join(labels.select(col("node").as("dst"), col("component").as("nc")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("nc")).as("nmin"))
      val step = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
      // caching bounds recompute but each generation's PLAN still nests
      // the last: analysis time grows with rounds. Every 5 rounds a
      // localCheckpoint truncates lineage to the materialized blocks, so
      // long propagation chains (graph diameter ≫ 5) stay O(1) per round
      val next =
        if ((iter + 1) % 5 == 0) step.localCheckpoint(true) else step.cache()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "node")
        .filter(col("component") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** SimHash (48-bit): per distinct token, a 48-bit hash weighted by the
    * token's count; each bit position sums ±weight; the sign vector is
    * the fingerprint. Near-dups = small Hamming distance.
    *
    * Shape note: 48 bit-sums as 48 agg columns over one token scan (no
    * 48-way row explosion); the fingerprint is then a single 48-term
    * projection. One shuffle of #distinct-token rows total. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one-pass codegen'd kernel (graft.functions.SimHash48): the 48 bit
    // sums fold document-locally, replacing TWO shuffles (token counts,
    // then bit sums) with a plain projection — Σ_distinct count·(±1) is
    // Σ_instances (±1), so the fingerprints are value-identical
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    df.select(col(idCol).as("doc_id"),
        bridge.toColumn(graft.functions.SimHash48(
          bridge.toExpr(wsTokens(col(textCol))))).as("simhash"))
      .filter(col("simhash").isNotNull) // null text never fingerprinted, as before
  }

  /** SimHash near-dup pairs at Hamming distance ≤ maxHamming.
    *
    * The pair join here is all-pairs over *fingerprints* (8 bytes/doc —
    * tiny relative to the corpus); at larger corpus sizes, band the 48
    * bits into (maxHamming+1) segments and bucket-join on segment
    * equality (pigeonhole: any pair within distance d shares at least
    * one of d+1 segments) — same trick as [[minhashLsh]]. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        call_function("bit_count",
          col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash pairs with the pigeonhole bucket join (the scale path):
    * split 48 bits into `segments` equal segments; any pair with
    * Hamming ≤ segments-1 must agree on ≥1 whole segment, so the
    * bucket join finds all of them without an all-pairs comparison. */
  def simhashPairsBanded(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val segments = maxHamming + 1
    val segBits = 48 / segments
    val sh = simhash(df, idCol, textCol).cache()
    val seg = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(segments - 1))).as("g"))
      .withColumn("piece",
        call_function("shiftright", col("simhash"), col("g") * segBits)
          .bitwiseAND(lit((1L << segBits) - 1)))
    seg.as("a").join(seg.as("b"),
        col("a.g") === col("b.g") && col("a.piece") === col("b.piece") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        call_function("bit_count",
          col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- exact substring (token-span) dedup ---------------------------------

  /** Per-document duplicated-span statistics: split each doc into
    * non-overlapping `width`-token spans (the line-dedup unit of
    * CCNet/RefinedWeb — this corpus has no newlines, so the unit is a
    * fixed token window), hash each span, and count how many of a doc's
    * spans occur at least `minCount` times corpus-wide (same-doc repeats
    * included). Emits (doc_id, n_spans, n_dup_spans, dup_frac) for every
    * doc with ≥1 full span; a high dup_frac marks boilerplate to drop or
    * trim. Scale shape: explode → per-hash count as a WINDOW over the
    * span stream → per-doc aggregate; span hashes are 32-char md5
    * strings, so the exchanges carry id-sized rows and never the raw
    * text. The window form (count over partition-by-hash) replaces the
    * former aggregate-then-join-back: identical per-row counts, but ONE
    * scan+explode of the corpus and ONE full exchange of the span
    * stream instead of two of each (guide §2.4 — the join's shuffle
    * already sorted by hash, so the window adds no new work). */
  def spanStats(df: DataFrame, idCol: String, textCol: String,
      width: Int, minCount: Int = 2): DataFrame = {
    require(width > 0, "span width must be positive")
    val exploded = df.select(col(idCol).as("doc_id"),
      explode(spanHashes(wsTokens(col(textCol)), width)).as("h"))
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    exploded.withColumn("c", count(lit(1)).over(byHash))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("c") >= minCount, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_spans"))
  }

  /** Remove corpus-duplicated token spans from each document, keeping
    * the document (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — the substring-level complement of
    * [[spanStats]], which only flags). Text is cut into non-overlapping
    * `width`-token spans; a span whose hash occurs `minCount`+ times
    * corpus-wide is dropped from EVERY document carrying it, and the
    * trailing `< width` tokens are always kept. A null text yields
    * null `n_spans` and empty `clean_text` (matching the SQL-side
    * semantics the oracle replays). Returns
    * `(doc_id, n_spans, n_dropped, clean_text)`.
    *
    * Scale shape: span hashing and counting exchange only
    * (id, span-index, hash) scalars; the single corpus-sized move is
    * the final id-join that rebuilds text — unavoidable for a rewrite
    * (the output IS the corpus), and the drop-set side of that join is
    * duplicated-spans-only, which Spark broadcasts when small. */
  def dropDupSpans(df: DataFrame, idCol: String, textCol: String,
      width: Int, minCount: Int = 2): DataFrame = {
    require(width > 0, "span width must be positive")
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("_text"))
    val exploded = base.select(col("doc_id"),
      posexplode(spanHashes(wsTokens(col("_text")), width)).as(Seq("i", "h")))
    val hot = exploded.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("h"))
    val drops = exploded.join(hot, "h")
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("_dl"), count(lit(1)).as("n_dropped"))
    val tk = wsTokens(col("_text"))
    // null text stays null here (size(null) is -1 under non-ANSI eval —
    // never let it masquerade as a span count)
    val nSpans = when(col("_text").isNotNull,
      floor(size(tk) / width).cast("int"))
    val keptIdx = when(nSpans > 0,
        filter(sequence(lit(0), nSpans - 1), i =>
          coalesce(!array_contains(col("_dl"), i), lit(true))))
      .otherwise(array().cast("array<int>"))
    base.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        nSpans.cast("long").as("n_spans"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(array_join(concat(
            flatten(transform(keptIdx, i => slice(tk, i * width + 1, lit(width)))),
            slice(tk, nSpans * width + 1, lit(width))), " "), lit(""))
          .as("clean_text"))
  }

  // ---- canonical-document selection ---------------------------------------

  /** Canonical-doc selection over near-dup clusters: connected
    * components over `pairs` (via [[nearDupClusters]]), every unpaired
    * doc its own singleton component, then ONE canonical doc kept per
    * component — the highest `pref` (e.g. token count), ties to the
    * smallest id. Returns `docs` plus `component` and `is_canonical`;
    * `filter(col("is_canonical"))` is the dedup'd corpus. The per-
    * component window shuffles by component — clusters are tiny by
    * construction (bounded by the pair graph's fan-out guards), so no
    * skew at scale. */
  def canonicalize(docs: DataFrame, pairs: DataFrame, idCol: String,
      pref: Column): DataFrame = {
    val comps = nearDupClusters(pairs)
      .withColumnRenamed("node", "_g_node")
    val labeled = docs
      .join(comps, docs(idCol) === col("_g_node"), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .drop("_g_node")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(pref.desc, col(idCol).asc)
    labeled.withColumn("is_canonical", row_number().over(w) === 1)
  }

  /** Corpus-level line dedup (the RefinedWeb/CCNet boilerplate pass,
    * complementing the WITHIN-document [[TextFunctions.dedupLines]]):
    * a line whose hash appears in at least `minDocs` DISTINCT documents
    * is boilerplate (nav bars, cookie banners, newsletter prompts) and
    * is removed from EVERY document it appears in. Removing all
    * occurrences (rather than keeping a "first" one) keeps the operator
    * deterministic and order-independent — there is no meaningful first
    * document in a distributed corpus.
    *
    * Scale shape: the explode projects `(id, hash60(line))` BEFORE any
    * exchange, so the whole index/census path moves ids and 60-bit
    * hashes only; the census is one hash-keyed groupBy (index-sized
    * output) and each doc's removal set is an array of longs. The
    * single corpus-sized move is the final id-join that rebuilds text —
    * unavoidable for a rewrite (the output IS the corpus, same posture
    * as [[dropDupSpans]]), and the removal-set side of that join is
    * flagged-docs-only, which Spark broadcasts when small.
    * Reconstruction is per-row array math; nothing is corpus-quadratic.
    *
    * Output: (idCol, n_lines, n_removed, cleaned) per input doc.
    */
  def corpusLineDedup(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      minDocs: Int = 2,
      /** literal unit separator: "\n" = lines (default); "\n\n" =
        * paragraph-level dedup, the coarser RefinedWeb variant */
      sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would remove every line)")
    require(sep.nonEmpty, "sep must be non-empty")
    val lines = split(textCol, java.util.regex.Pattern.quote(sep))
    // (id, line-hash) pairs, distinct per doc — the only exploded pass.
    // Empty units are structure (blank lines / trailing separators),
    // not content: they occur in nearly every real document, so letting
    // them into the census would flag "" as boilerplate and strip every
    // blank line corpus-wide. They are excluded here AND in the removal
    // filter below, so they always survive.
    val index = df
      .filter(textCol.isNotNull)
      .select(col(idCol), explode(array_distinct(lines)).as("_l"))
      .filter(col("_l") =!= "")
      .select(col(idCol), hash60(col("_l")).as("_lh"))
    val flagged = index
      .groupBy(col("_lh"))
      .agg(count(lit(1)).as("_n_docs"))
      .filter(col("_n_docs") >= minDocs)
    val removeSets = index
      .join(flagged, "_lh")
      .groupBy(col(idCol))
      .agg(collect_set(col("_lh")).as("_rm"))
    val rm = coalesce(col("_rm"), array().cast("array<bigint>"))
    val kept = filter(lines, l => l === "" || !array_contains(rm, hash60(l)))
    // null-text rows carry no lines and are dropped (same stated
    // semantics as chunkTokens: size(null) diverges between ANSI modes)
    df.filter(textCol.isNotNull)
      .join(removeSets, Seq(idCol), "left")
      .select(
        col(idCol),
        size(lines).cast("long").as("n_lines"),
        (size(lines) - size(kept)).cast("long").as("n_removed"),
        array_join(kept, sep).as("cleaned"))
  }

  /** URL-level dedup (the very first pass of C4/Gopher-style crawl
    * curation, upstream of any content hashing): canonicalize each
    * doc's URL with [[TextFunctions.canonicalUrl]] — so link
    * decorations (utm params, fragments, www, default ports, trailing
    * slashes, scheme/host case) collapse — then group by the canonical
    * form; the smallest id per group is the canonical fetch.
    *
    * Scale shape: canonicalization is per-row regex math; the census is
    * one hash-groupBy keyed by canonical URL (bounded fan-out: a URL's
    * re-crawl count), and the join back moves (canon_url, id-sized
    * stats) only. Same posture as exact content dedup.
    *
    * Output: (idCol, canon_url, canonical_id, n_dups, is_canonical) per
    * non-null-URL input row. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: Column): DataFrame = {
    val canon = df.filter(urlCol.isNotNull)
      .select(col(idCol), TextFunctions.canonicalUrl(urlCol).as("canon_url"))
    val groups = canon.groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))
    canon.join(groups, "canon_url")
      .select(col(idCol), col("canon_url"), col("canonical_id"), col("n_dups"),
        (col(idCol) === col("canonical_id")).as("is_canonical"))
  }
}
