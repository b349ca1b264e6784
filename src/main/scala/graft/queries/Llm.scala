package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Similarity, TextFunctions => TF}

/** Training-data pipeline query suite over `documents` / `embeddings`
  * (the LLM-pipeline operators: text analysis, dedup family, similarity
  * search, multimodal plumbing).
  *
  * Every oracle mirrors the Spark arithmetic exactly: md5-derived
  * hashes, double math in fixed left-fold order (see
  * [[graft.llm.TextFunctions]]) — results hash-match bit-for-bit.
  */
object Llm {
  import graft.Tables.t

  type QFn = (SparkSession, String) => DataFrame

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-qllm").toFile
    d.deleteOnExit()
    d.toString
  }

  private val Stopwords = Seq("the", "a")

  /** Recursive-CTE replay of [[graft.llm.Tokenizer.unigramViterbi]]
    * (maxPieceLen = 3) over the `types` word histogram, reading the
    * piece→logprob map from `mapFrom`: per position the candidate cells
    * are (score, split j); `list_sort(...)[-1]` reproduces Spark's
    * struct array_max — max score, ties to the LARGER split. Emits
    * `name(w, cnt, pieces)`. */
  private def unigramVitCte(name: String, mapFrom: String,
      maxPieceLen: Int = 3): String = s"""
        $name AS (
          WITH RECURSIVE v(w, cnt, m, i, dp) AS (
            SELECT w, cnt, (SELECT m FROM $mapFrom), 0,
                   [{'score': 0.0::DOUBLE, 'pieces': []::VARCHAR[]}]
            FROM types
            UNION ALL
            SELECT w, cnt, m, i + 1,
              list_append(dp, list_transform(
                [list_sort(list_filter(
                   list_transform(range(greatest(i + 1 - $maxPieceLen, 0), i + 1), j ->
                     {'score': dp[(j + 1)::INT].score +
                        CASE WHEN i + 1 - j = 1
                          THEN coalesce(
                            m[substr(w, (j + 1)::INT, (i + 1 - j)::INT)][1],
                            -100.0::DOUBLE)
                          ELSE m[substr(w, (j + 1)::INT, (i + 1 - j)::INT)][1]
                        END,
                      'j': j}),
                   c -> c.score IS NOT NULL))[-1]],
                b -> {'score': b.score,
                      'pieces': list_append(dp[(b.j + 1)::INT].pieces,
                        substr(w, (b.j + 1)::INT, (i + 1 - b.j)::INT))})[1])
            FROM v WHERE i < len(w))
          SELECT w, cnt, dp[len(w) + 1].pieces AS pieces
          FROM v WHERE i = len(w))"""

  /** Shared CTE chain replaying [[graft.llm.Tokenizer.unigramTrain]] on
    * the en slice, PARAMETERIZED exactly like the trainer: word-type
    * histogram → substring seed census → seed log-probs (map `emm0`) →
    * `emRounds` × (Viterbi `emvit_r` under model `emm_{r-1}` → recount
    * `emcounts_r` → renormalized model `emm_r`) → final counts
    * `fcounts` → pruned vocab `keptf`. The unroll depth equals the
    * trainer's `emRounds` loop (Tokenizer.scala recount loop) —
    * composed by the q178/q179 single-round gates and the q181
    * multi-round pruning-churn gate. */
  private def unigramTrainCtes(emRounds: Int = 1, seedSize: Int = 120,
      vocabSize: Int = 60, maxPieceLen: Int = 3): String = {
    val rounds = (1 to emRounds).map { r =>
      val prev = if (r == 1) "seed" else s"emcounts${r - 1}"
      s"""emm${r - 1} AS (
          SELECT map(list(piece ORDER BY piece),
                     list(ln(cnt / (SELECT sum(cnt)::DOUBLE FROM $prev))
                          ORDER BY piece)) AS m
          FROM $prev),
        ${unigramVitCte(s"emvit$r", s"emm${r - 1}", maxPieceLen)},
        emcounts$r AS (
          SELECT piece, sum(cnt) AS cnt FROM (
            SELECT unnest(pieces) AS piece, cnt FROM emvit$r)
          GROUP BY piece)"""
    }.mkString(",\n        ")
    s"""
        types AS (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w
            FROM documents WHERE text IS NOT NULL AND lang = 'en')
          WHERE w <> '' GROUP BY w),
        census AS (
          SELECT piece, sum(cnt) AS cnt FROM (
            SELECT unnest(flatten(list_transform(range(1, len(w) + 1), i ->
              list_transform(range(1, least($maxPieceLen, len(w) - i + 1) + 1), l ->
                substr(w, i::INT, l::INT))))) AS piece, cnt
            FROM types)
          GROUP BY piece),
        top_seed AS (
          SELECT piece, cnt FROM census
          ORDER BY cnt DESC, piece ASC LIMIT $seedSize),
        seed AS (
          SELECT piece, cnt FROM top_seed
          UNION
          SELECT piece, cnt FROM census WHERE len(piece) = 1),
        $rounds,
        fcounts AS (SELECT piece, cnt FROM emcounts$emRounds),
        charsf AS (SELECT piece, cnt FROM fcounts WHERE len(piece) = 1),
        multif AS (
          SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
            FROM fcounts WHERE len(piece) > 1)
          WHERE rk <= greatest(0, $vocabSize - (SELECT count(*) FROM charsf))),
        keptf AS (SELECT * FROM charsf UNION ALL SELECT * FROM multif)"""
  }

  /** Stacked-CTE DuckDB replay of [[graft.llm.Tokenizer.wpTrain]]'s `k`
    * WordPiece merge steps over the docs selected by `where`: per step a
    * pair census AND a unigram census over the same `##`-marked symbol
    * state, the likelihood argmax count(ab)/(count(a)·count(b)) (score
    * DESC, pair ASC — IEEE double division of exact longs, bit-identical
    * across engines), then the same gaps-and-islands greedy application
    * as BPE with the continuation mark stripped from the merged token. */
  private def wpTrainCtes(k: Int, where: String = ""): String = {
    val steps = (1 to k).map { i =>
      s"""wp$i AS (
        SELECT sym[j] || ' ' || sym[j+1] AS p,
               sym[j] AS a, sym[j+1] AS b, sum(cnt) AS c
        FROM wt${i - 1}, unnest(range(1, len(sym))) AS u(j)
        GROUP BY 1, 2, 3),
      wq$i AS (
        SELECT s, sum(cnt) AS c FROM (
          SELECT sym[j] AS s, cnt
          FROM wt${i - 1}, unnest(range(1, len(sym)+1)) AS u(j))
        GROUP BY s),
      wb$i AS MATERIALIZED (
        SELECT p.a, p.b, p.c,
               CAST(p.c AS DOUBLE) /
                 (CAST(qa.c AS DOUBLE) * CAST(qb.c AS DOUBLE)) AS score,
               p.a || CASE WHEN p.b LIKE '##%' THEN substr(p.b, 3)
                           ELSE p.b END AS mc
        FROM wp$i p
        JOIN wq$i qa ON qa.s = p.a
        JOIN wq$i qb ON qb.s = p.b
        ORDER BY score DESC, p.p ASC LIMIT 1),
      wu$i AS (
        SELECT t.w, t.cnt, u.j, t.sym[u.j] AS s,
               coalesce(t.sym[u.j] = mb.a AND t.sym[u.j+1] = mb.b, FALSE) AS m
        FROM wt${i - 1} t, wb$i mb, unnest(range(1, len(t.sym)+1)) AS u(j)),
      wg$i AS (
        SELECT *, j - row_number() OVER (PARTITION BY w, m ORDER BY j) AS isl
        FROM wu$i),
      wh$i AS (
        SELECT *, m AND (row_number() OVER (PARTITION BY w, m, isl ORDER BY j) % 2 = 1) AS take
        FROM wg$i),
      wr$i AS (
        SELECT *, coalesce(lag(take) OVER (PARTITION BY w ORDER BY j), FALSE) AS consumed,
               lead(s) OVER (PARTITION BY w ORDER BY j) AS nxt
        FROM wh$i),
      wt$i AS MATERIALIZED (
        SELECT w, max(cnt) AS cnt,
               list(CASE WHEN take THEN s ||
                 (CASE WHEN nxt LIKE '##%' THEN substr(nxt, 3) ELSE nxt END)
                 ELSE s END ORDER BY j) AS sym
        FROM wr$i WHERE NOT consumed GROUP BY w),
      ws$i AS (SELECT CAST(sum(cnt * len(sym)) AS BIGINT) AS syms FROM wt$i)"""
    }
    s"""wt0 AS MATERIALIZED (
      SELECT w, cnt,
             list_transform(range(1, len(cs)+1),
               i -> CASE WHEN i = 1 THEN cs[i] ELSE '##' || cs[i] END) AS sym
      FROM (
        SELECT w, CAST(count(*) AS BIGINT) AS cnt,
               regexp_extract_all(w, '(?s).') AS cs
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL $where)
        WHERE w <> ''
        GROUP BY w)),
    ${steps.mkString(",\n")}"""
  }

  private def wpTrainOracle(k: Int): String =
    s"""WITH ${wpTrainCtes(k)},
    ${(1 to k).map { i =>
      s"""wf$i AS (SELECT CAST($i AS BIGINT) AS rnk, a, b, CAST(c AS BIGINT) AS cnt,
             score, mc AS merged,
             (SELECT syms FROM ws$i) AS corpus_symbols_after FROM wb$i)"""
    }.mkString(",\n")}
    SELECT * FROM (
    ${(1 to k).map(i => s"SELECT * FROM wf$i").mkString("\nUNION ALL\n")}
    ) ORDER BY rnk"""

  /** Stacked-CTE DuckDB replay of [[graft.llm.Tokenizer.bpeTrain]]'s
    * `k` merge steps. Per step: pair census + argmax (count DESC, pair
    * ASC), then greedy left-to-right non-overlapping application. The
    * greedy pass is the only sequential part; it SQL-izes exactly via
    * gaps-and-islands: adjacent positions can both match only when
    * a = b (else b = a is forced), so within each maximal run of
    * consecutive matches greedy takes the 1st, 3rd, … (odd offsets),
    * and a position is consumed iff its predecessor merged. Validated
    * against an independent reference on planted a=b runs and ties
    * (TokenizerSpec mirrors those cases in Scala). */
  private def bpeTrainOracle(k: Int): String =
    s"""WITH ${bpeTrainCtes(k)},
    ${(1 to k).map { i =>
      s"""f$i AS (SELECT CAST($i AS BIGINT) AS rnk, a, b, CAST(c AS BIGINT) AS cnt,
             (SELECT syms FROM s$i) AS corpus_symbols_after FROM b$i)"""
    }.mkString(",\n")}
    SELECT * FROM (
    ${(1 to k).map(i => s"SELECT * FROM f$i").mkString("\nUNION ALL\n")}
    ) ORDER BY rnk"""

  /** The shared CTE chain of [[bpeTrainOracle]] (word-type histogram
    * t0, then per step i: pair census p_i, argmax b_i, greedy merge
    * application u/g/h/r/t_i, post-state symbol count s_i) — composed
    * by both the train gate and the train→encode gate. */
  private def bpeTrainCtes(k: Int): String = {
    val steps = (1 to k).map { i =>
      s"""p$i AS (
        SELECT sym[j] || ' ' || sym[j+1] AS p, sum(cnt) AS c
        FROM t${i - 1}, unnest(range(1, len(sym))) AS u(j)
        GROUP BY 1),
      b$i AS MATERIALIZED (
        SELECT string_split(p, ' ')[1] AS a, string_split(p, ' ')[2] AS b, c
        FROM p$i ORDER BY c DESC, p ASC LIMIT 1),
      u$i AS (
        SELECT t.w, t.cnt, u.j, t.sym[u.j] AS s,
               coalesce(t.sym[u.j] = mb.a AND t.sym[u.j+1] = mb.b, FALSE) AS m
        FROM t${i - 1} t, b$i mb, unnest(range(1, len(t.sym)+1)) AS u(j)),
      g$i AS (
        SELECT *, j - row_number() OVER (PARTITION BY w, m ORDER BY j) AS isl
        FROM u$i),
      h$i AS (
        SELECT *, m AND (row_number() OVER (PARTITION BY w, m, isl ORDER BY j) % 2 = 1) AS take
        FROM g$i),
      r$i AS (
        SELECT *, coalesce(lag(take) OVER (PARTITION BY w ORDER BY j), FALSE) AS consumed,
               lead(s) OVER (PARTITION BY w ORDER BY j) AS nxt
        FROM h$i),
      t$i AS MATERIALIZED (
        SELECT w, max(cnt) AS cnt,
               list(CASE WHEN take THEN s || nxt ELSE s END ORDER BY j) AS sym
        FROM r$i WHERE NOT consumed GROUP BY w),
      s$i AS (SELECT CAST(sum(cnt * len(sym)) AS BIGINT) AS syms FROM t$i)"""
    }
    s"""t0 AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt,
             list_append(regexp_extract_all(w, '(?s).'), '</w>') AS sym
      FROM (SELECT unnest(string_split(text, ' ')) AS w
            FROM documents WHERE text IS NOT NULL)
      WHERE w <> ''
      GROUP BY w),
    ${steps.mkString(",\n")}"""
  }

  val all: Map[String, (QFn, Option[String])] = Map(

    // ---- text analysis: token counts + quality scoring
    "q20_text_stats" -> ((
      (s: SparkSession, d: String) => {
        val toks = TF.wsTokens(col("text"))
        t(s, d, "documents").select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_distinct"),
            size(filter(toks, x => x.isin(Stopwords.map(lit(_)): _*)))
              .cast("long").as("n_stop"))
          .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
          .withColumn("quality",
            (col("n_distinct").cast("double") / col("n_tokens")) * (lit(1.0) - col("stop_ratio")))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        SELECT doc_id,
               len(tk) AS n_tokens,
               len(list_distinct(tk)) AS n_distinct,
               len(list_filter(tk, x -> x IN ('the', 'a'))) AS n_stop,
               CAST(len(list_filter(tk, x -> x IN ('the', 'a'))) AS DOUBLE) / len(tk) AS stop_ratio,
               (CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk))
                 * (1.0 - CAST(len(list_filter(tk, x -> x IN ('the', 'a'))) AS DOUBLE) / len(tk)) AS quality
        FROM toks ORDER BY doc_id"""))),

    // ---- language ID (stopword-profile heuristic) vs labeled lang
    "q21_lang_id" -> ((
      (s: SparkSession, d: String) => {
        val toks = TF.wsTokens(col("text"))
        t(s, d, "documents")
          .select(col("lang"), TF.langId(toks).as("predicted"))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some("""
        WITH scored AS (
          SELECT lang,
                 len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','is'))) AS s_en,
                 len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS s_de,
                 len(list_filter(string_split(text,' '), x -> x IN ('el','la','los','y','es'))) AS s_es,
                 len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS s_fr
          FROM documents
        ), pred AS (
          SELECT lang,
                 CASE WHEN greatest(s_en,s_de,s_es,s_fr) = 0 THEN 'und'
                      WHEN s_en = greatest(s_en,s_de,s_es,s_fr) THEN 'en'
                      WHEN s_de = greatest(s_en,s_de,s_es,s_fr) THEN 'de'
                      WHEN s_es = greatest(s_en,s_de,s_es,s_fr) THEN 'es'
                      ELSE 'fr' END AS predicted
          FROM scored)
        SELECT lang, predicted, count(*) AS n FROM pred
        GROUP BY lang, predicted ORDER BY lang, predicted"""))),

    // ---- BPE-ish token counting (regex pre-tokenizer)
    "q22_token_counts" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "documents").select(
            col("doc_id"),
            size(TF.wsTokens(col("text"))).cast("long").as("n_ws"),
            size(TF.bpeTokens(col("text"))).cast("long").as("n_bpe"))
          .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws,
               len(regexp_extract_all(text, '${TF.BpePattern}')) AS n_bpe
        FROM documents ORDER BY doc_id"""))),

    // ---- rolling-hash document fingerprint (1-function MinHash)
    "q23_fingerprint" -> ((
      (s: SparkSession, d: String) => {
        val toks = TF.wsTokens(col("text"))
        t(s, d, "documents").select(
            col("doc_id"),
            size(TF.shingles(toks, 5)).cast("long").as("n_shingles"),
            TF.fingerprintMin(toks, 5).as("fp_min"),
            TF.fingerprintMax(toks, 5).as("fp_max"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT doc_id, list_transform(range(1, len(tk)-3),
                 i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]) AS ss
               FROM toks)
        SELECT doc_id, len(ss) AS n_shingles,
               list_min(list_transform(ss, x -> CAST('0x'||substr(md5(x),1,15) AS BIGINT))) AS fp_min,
               list_max(list_transform(ss, x -> CAST('0x'||substr(md5(x),1,15) AS BIGINT))) AS fp_max
        FROM sh ORDER BY doc_id"""))),

    // ---- Gopher-style repetition quality rules: duplicate-token /
    //      duplicate-2-gram fractions, top-token mass, keep decision
    //      (Rae et al. 2021 §A1.1 repetition filters — the standard
    //      pre-training scrub pass; pure per-row array math, so the
    //      100 TB pass is shuffle-free)
    "q77_quality_rules" -> ((
      (s: SparkSession, d: String) => {
        val toks = TF.wsTokens(col("text"))
        t(s, d, "documents").select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            TF.dupTokenFrac(toks).as("dup_token_frac"),
            TF.dupNgramFrac(toks, 2).as("dup_2gram_frac"),
            TF.topTokenCount(toks).as("top_token_count"),
            TF.repetitionKeep(toks).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        top AS (
          SELECT doc_id, max(c) AS top_cnt FROM (
            SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
          GROUP BY doc_id),
        base AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        grams AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i + 1]) AS g2
          FROM base),
        m AS (
          SELECT b.doc_id,
                 len(tk) AS n_tokens,
                 CASE WHEN len(tk) > 0
                      THEN 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
                      ELSE 0.0 END AS dup_token_frac,
                 CASE WHEN len(g.g2) > 0
                      THEN 1.0 - CAST(len(list_distinct(g.g2)) AS DOUBLE) / len(g.g2)
                      ELSE 0.0 END AS dup_2gram_frac,
                 t.top_cnt AS top_token_count
          FROM base b
          JOIN grams g ON b.doc_id = g.doc_id
          JOIN top t ON b.doc_id = t.doc_id)
        SELECT doc_id, n_tokens, dup_token_frac, dup_2gram_frac,
               top_token_count,
               (dup_token_frac <= 0.85 AND dup_2gram_frac <= 0.65 AND
                (n_tokens = 0 OR
                 CAST(top_token_count AS DOUBLE) / n_tokens <= 0.30)) AS keep
        FROM m ORDER BY doc_id"""))),

    // ---- exact dedup over a simulated re-crawl (each doc appears twice)
    "q24_dedup_exact" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val recrawl = docs.withColumn("doc_id", col("doc_id") + 100000)
        Dedup.exact(docs.unionByName(recrawl), "doc_id", "text")
          .orderBy(col("canonical_id"))
      },
      Some("""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000, text FROM documents)
        SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM corpus GROUP BY md5(text) ORDER BY canonical_id"""))),

    // ---- exact n-gram Jaccard near-dup pairs (inverted-index join)
    "q25_dedup_jaccard" -> ((
      (s: SparkSession, d: String) =>
        Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text", n = 3,
            threshold = 0.7, maxDocFreq = None) // oracle is exact/uncapped
          .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, common,
               CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
        FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.7
        ORDER BY doc_a, doc_b"""))),

    // ---- MinHash + LSH banding (the sub-quadratic scale path)
    "q26_dedup_minhash" -> ((
      (s: SparkSession, d: String) =>
        Dedup.minhashLsh(t(s, d, "documents"), "doc_id", "text",
            n = 3, k = 16, bands = 4, minEst = 0.5)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        mh AS (
          SELECT doc_id, i,
                 min((a * (CAST('0x'||substr(md5(s),1,15) AS BIGINT) % ${Dedup.MinhashPrime})
                      + b) % ${Dedup.MinhashPrime}) AS h
          FROM sh, (VALUES ${Dedup.minhashParamsSql(16)}) params(i, a, b)
          GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, b,
                 CAST(sig[b*4+1] AS VARCHAR)||','||CAST(sig[b*4+2] AS VARCHAR)||','||
                 CAST(sig[b*4+3] AS VARCHAR)||','||CAST(sig[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS n_match,
               len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) / 16.0 AS est_jaccard
        FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
        WHERE len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) >= 8
        ORDER BY doc_a, doc_b"""))),

    // ---- SimHash near-dup pairs (48-bit, Hamming ≤ 2)
    "q27_dedup_simhash" -> ((
      (s: SparkSession, d: String) =>
        Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", maxHamming = 2)
          .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH tw AS (
          SELECT doc_id, w, count(*) AS cnt,
                 CAST('0x'||substr(md5('sh:'||w),1,12) AS BIGINT) AS h
          FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
          GROUP BY doc_id, w),
        bits AS (
          SELECT doc_id, j, sum(cnt * (2 * ((h >> CAST(j AS INTEGER)) & 1) - 1)) AS v
          FROM tw, range(0, 48) r(j) GROUP BY doc_id, j),
        sh AS (
          SELECT doc_id,
                 sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS simhash
          FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        ORDER BY doc_a, doc_b"""))),

    // ---- SimHash pairs via the pigeonhole bucket join — same answer
    //      shape as q27 but NO all-pairs comparison (the 100 TB path:
    //      any pair with Hamming ≤ 2 shares one of 3 16-bit segments)
    "q27b_dedup_simhash_banded" -> ((
      (s: SparkSession, d: String) =>
        Dedup.simhashPairsBanded(t(s, d, "documents"), "doc_id", "text", maxHamming = 2)
          .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH tw AS (
          SELECT doc_id, w, count(*) AS cnt,
                 CAST('0x'||substr(md5('sh:'||w),1,12) AS BIGINT) AS h
          FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
          GROUP BY doc_id, w),
        bits AS (
          SELECT doc_id, j, sum(cnt * (2 * ((h >> CAST(j AS INTEGER)) & 1) - 1)) AS v
          FROM tw, range(0, 48) r(j) GROUP BY doc_id, j),
        sh AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id),
        seg AS (
          SELECT doc_id, simhash,
                 g, (simhash >> CAST(g * 16 AS INTEGER)) & 65535 AS piece
          FROM sh, range(0, 3) r(g)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS ha, b.simhash AS hb
          FROM seg a JOIN seg b
            ON a.g = b.g AND a.piece = b.piece AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 2
        ORDER BY doc_a, doc_b"""))),

    // ---- exact cosine top-k (brute force baseline; queries broadcast)
    "q28_embed_topk" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 5)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 list_sum(list_transform(range(1,65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * c.embedding[i])) / (q.nrm * c.nrm) AS cos
          FROM nrm q JOIN nrm c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
        SELECT q_id, rnk, n_id, cos FROM (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM scored)
        WHERE rnk <= 5 ORDER BY q_id, rnk"""))),

    // ---- embedding near-dup pairs (cosine threshold)
    "q29_embed_neardup" -> ((
      (s: SparkSession, d: String) =>
        Similarity.nearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding", 0.45)
          .orderBy(col("id_a"), col("id_b")),
      Some("""
        WITH nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(range(1,65),
                 i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) AS cos
        FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1,65),
                i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) >= 0.45
        ORDER BY id_a, id_b"""))),

    // ---- embedding near-dup pairs through the LSH bucket join — same
    //      threshold as q29 but the candidate set is bucket-bounded (no
    //      cartesian join anywhere in the plan; the 100 TB variant)
    "q29b_embed_neardup_bucketed" -> ((
      (s: SparkSession, d: String) =>
        Similarity.nearDupPairsBucketed(t(s, d, "embeddings"), "vec_id", "embedding", 0.45)
          .orderBy(col("id_a"), col("id_b")),
      Some("""
        WITH g AS (
          SELECT p, list_transform(range(1, 65),
            i -> CAST(CAST('0x'||substr(md5(CAST(p AS VARCHAR)||':'||CAST(i AS VARCHAR)),1,15) AS BIGINT) % 2001 - 1000 AS DOUBLE)) AS plane
          FROM range(0, 16) r(p)),
        sigbits AS (
          SELECT e.vec_id, g.p,
                 CASE WHEN list_sum(list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) * g.plane[i])) > 0 THEN 1 ELSE 0 END AS bit
          FROM embeddings e, g),
        sig AS (SELECT vec_id, list(bit ORDER BY p) AS bits FROM sigbits GROUP BY vec_id),
        bands AS (
          SELECT vec_id, b,
                 CAST(bits[b*4+1] AS VARCHAR)||CAST(bits[b*4+2] AS VARCHAR)||
                 CAST(bits[b*4+3] AS VARCHAR)||CAST(bits[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings)
        SELECT c.id_a, c.id_b,
               list_sum(list_transform(range(1,65),
                 i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) AS cos
        FROM cand c JOIN nrm a ON a.vec_id = c.id_a JOIN nrm b ON b.vec_id = c.id_b
        WHERE list_sum(list_transform(range(1,65),
                i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) >= 0.45
        ORDER BY id_a, id_b"""))),

    // ---- embedding dedup GROUPS: bucketed near-dup pairs → connected
    //      components (the full scale-path composition: no cartesian
    //      join, no driver graph)
    "q47_embed_dedup_clusters" -> ((
      (s: SparkSession, d: String) => {
        val pairs = Similarity.nearDupPairsBucketed(
            t(s, d, "embeddings"), "vec_id", "embedding", 0.45)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        Dedup.nearDupClusters(pairs)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"), min(col("node")).as("keeper"))
          .orderBy(col("component"))
      },
      Some("""
        WITH g AS (
          SELECT p, list_transform(range(1, 65),
            i -> CAST(CAST('0x'||substr(md5(CAST(p AS VARCHAR)||':'||CAST(i AS VARCHAR)),1,15) AS BIGINT) % 2001 - 1000 AS DOUBLE)) AS plane
          FROM range(0, 16) r(p)),
        sigbits AS (
          SELECT e.vec_id, g.p,
                 CASE WHEN list_sum(list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) * g.plane[i])) > 0 THEN 1 ELSE 0 END AS bit
          FROM embeddings e, g),
        sig AS (SELECT vec_id, list(bit ORDER BY p) AS bits FROM sigbits GROUP BY vec_id),
        bands AS (
          SELECT vec_id, b,
                 CAST(bits[b*4+1] AS VARCHAR)||CAST(bits[b*4+2] AS VARCHAR)||
                 CAST(bits[b*4+3] AS VARCHAR)||CAST(bits[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        edges AS (
          SELECT c.id_a AS doc_a, c.id_b AS doc_b
          FROM cand c JOIN nrm a ON a.vec_id = c.id_a JOIN nrm b ON b.vec_id = c.id_b
          WHERE list_sum(list_transform(range(1,65),
                  i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) >= 0.45),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          WITH RECURSIVE r(node, target) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s.dst FROM r JOIN sym s ON s.src = r.target)
          SELECT node, min(target) AS component FROM r GROUP BY node)
        SELECT component, count(*) AS cluster_size, min(node) AS keeper
        FROM reach GROUP BY component ORDER BY component"""))),

    // ---- LSH-bucketed approximate NN (the 100 TB similarity path)
    "q30_ann_lsh" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.lshAnn(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 3)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH g AS (
          SELECT p, list_transform(range(1, 65),
            i -> CAST(CAST('0x'||substr(md5(CAST(p AS VARCHAR)||':'||CAST(i AS VARCHAR)),1,15) AS BIGINT) % 2001 - 1000 AS DOUBLE)) AS plane
          FROM range(0, 16) r(p)),
        sigbits AS (
          SELECT e.vec_id, g.p,
                 CASE WHEN list_sum(list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) * g.plane[i])) > 0 THEN 1 ELSE 0 END AS bit
          FROM embeddings e, g),
        sig AS (SELECT vec_id, list(bit ORDER BY p) AS bits FROM sigbits GROUP BY vec_id),
        bands AS (
          SELECT vec_id, b,
                 CAST(bits[b*4+1] AS VARCHAR)||CAST(bits[b*4+2] AS VARCHAR)||
                 CAST(bits[b*4+3] AS VARCHAR)||CAST(bits[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT q.vec_id AS q_id, x.vec_id AS n_id
          FROM bands q JOIN bands x
            ON q.b = x.b AND q.bucket = x.bucket AND q.vec_id < 5 AND x.vec_id <> q.vec_id),
        nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        scored AS (
          SELECT c.q_id, c.n_id,
                 list_sum(list_transform(range(1,65),
                   i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) AS cos
          FROM cand c JOIN nrm a ON a.vec_id = c.q_id JOIN nrm b ON b.vec_id = c.n_id)
        SELECT q_id, rnk, n_id, cos FROM (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM scored)
        WHERE rnk <= 3 ORDER BY q_id, rnk"""))),

    // ---- dedup clustering: connected components over near-dup pairs
    //      (transitive closure — a~b, b~c dedup as ONE group)
    "q39_dedup_clusters" -> ((
      (s: SparkSession, d: String) => {
        val pairs = Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
          n = 3, threshold = 0.7, maxDocFreq = None) // oracle is exact/uncapped
        Dedup.nearDupClusters(pairs)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"), min(col("node")).as("keeper"))
          .orderBy(col("component"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        edges AS (
          SELECT doc_a, doc_b FROM pairs
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.7),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          WITH RECURSIVE r(node, target) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s.dst FROM r JOIN sym s ON s.src = r.target)
          SELECT node, min(target) AS component FROM r GROUP BY node)
        SELECT component, count(*) AS cluster_size, min(node) AS keeper
        FROM reach GROUP BY component ORDER BY component"""))),

    // ---- IVF-flat ANN (fixed coarse quantizer; the other scale path
    //      next to LSH: per-query cost = probed-cell occupancy)
    "q38_ann_ivf" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfAnn(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 3, cells = 16, nprobe = 4)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        cent AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm FROM nrm WHERE vec_id < 16),
        corpus_cells AS (
          SELECT vec_id AS n_id, c_id AS n_cell FROM (
            SELECT n.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(range(1,65), i -> CAST(n.embedding[i] AS DOUBLE) * c.c_vec[i])) / (n.nrm * c.c_nrm) DESC, c.c_id) AS rk
            FROM nrm n, cent c)
          WHERE rk = 1),
        query_cells AS (
          SELECT vec_id AS q_id, c_id AS q_cell FROM (
            SELECT n.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(range(1,65), i -> CAST(n.embedding[i] AS DOUBLE) * c.c_vec[i])) / (n.nrm * c.c_nrm) DESC, c.c_id) AS rk
            FROM nrm n, cent c WHERE n.vec_id < 5)
          WHERE rk <= 4),
        cand AS (
          SELECT DISTINCT q.q_id, cc.n_id
          FROM query_cells q JOIN corpus_cells cc
            ON cc.n_cell = q.q_cell AND cc.n_id <> q.q_id),
        scored AS (
          SELECT c.q_id, c.n_id,
                 list_sum(list_transform(range(1,65), i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) AS cos
          FROM cand c JOIN nrm a ON a.vec_id = c.q_id JOIN nrm b ON b.vec_id = c.n_id)
        SELECT q_id, rnk, n_id, cos FROM (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM scored)
        WHERE rnk <= 3 ORDER BY q_id, rnk"""))),

    // ---- end-to-end training-data pipeline: simulated re-crawl →
    //      exact dedup → quality filter → MinHash near-dup removal →
    //      per-language corpus stats. The operators composed are each
    //      individually oracle-checked (q20/q24/q26); this checks the
    //      composition.
    "q36_pipeline_e2e" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
        val corpus = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 100000))
        val canonical = Dedup.exact(corpus, "doc_id", "text")
          .select(col("canonical_id").as("doc_id"))
        val deduped = corpus.join(canonical, "doc_id")
        val toks = TF.wsTokens(col("text"))
        val nTok = size(toks).cast("long")
        val quality =
          (size(array_distinct(toks)).cast("double") / nTok) *
            (lit(1.0) - size(filter(toks, x => x.isin(Stopwords.map(lit(_)): _*)))
              .cast("double") / nTok)
        val kept = deduped
          .withColumn("n_tokens", nTok)
          .filter(col("n_tokens") >= 20 && quality > 0.2)
        val nearDup = Dedup.minhashLsh(kept, "doc_id", "text",
            n = 3, k = 16, bands = 4, minEst = 0.5)
          .select(col("doc_b")).distinct()
        kept.join(nearDup, kept("doc_id") === col("doc_b"), "left_anti")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH corpus AS (
          SELECT doc_id, lang, text FROM documents
          UNION ALL SELECT doc_id + 100000, lang, text FROM documents
        ), deduped AS (
          SELECT min(doc_id) AS doc_id, any_value(lang) AS lang, text
          FROM corpus GROUP BY md5(text), text
        ), quality AS (
          SELECT doc_id, lang, text,
                 len(string_split(text,' ')) AS n_tokens,
                 (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')))
                   * (1.0 - CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) AS DOUBLE) / len(string_split(text,' '))) AS q
          FROM deduped
        ), kept AS (
          SELECT doc_id, lang, text, n_tokens FROM quality WHERE n_tokens >= 20 AND q > 0.2
        ), toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM kept),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        mh AS (
          SELECT doc_id, i,
                 min((a * (CAST('0x'||substr(md5(s),1,15) AS BIGINT) % ${Dedup.MinhashPrime})
                      + b) % ${Dedup.MinhashPrime}) AS h
          FROM sh, (VALUES ${Dedup.minhashParamsSql(16)}) params(i, a, b)
          GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, b,
                 CAST(sig[b*4+1] AS VARCHAR)||','||CAST(sig[b*4+2] AS VARCHAR)||','||
                 CAST(sig[b*4+3] AS VARCHAR)||','||CAST(sig[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0,4) r(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.b=b.b AND a.bucket=b.bucket AND a.doc_id<b.doc_id),
        neardup AS (
          SELECT DISTINCT c.doc_b
          FROM cand c JOIN sig sa ON sa.doc_id=c.doc_a JOIN sig sb ON sb.doc_id=c.doc_b
          WHERE len(list_filter(range(1,17), i -> sa.sig[i]=sb.sig[i])) >= 8),
        final AS (
          SELECT k.* FROM kept k LEFT JOIN neardup n ON k.doc_id = n.doc_b
          WHERE n.doc_b IS NULL)
        SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM final GROUP BY lang ORDER BY lang"""))),

    // ---- multimodal: binary payload pipeline (stub decode; real plumbing)
    "q31_multimodal_features" -> ((
      (s: SparkSession, d: String) =>
        Multimodal.featurePipeline(s, t(s, d, "documents")),
      Some("""
        SELECT CASE CAST(doc_id % 3 AS INTEGER)
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               count(*) AS n_media,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               count(*) * 10 AS total_feature_dims
        FROM documents GROUP BY 1 ORDER BY 1"""))),

    // ---- token-budget sharding: contiguous ~5k-token shards via the
    //      parallel prefix-sum (bucketed cumsum + driver offset fold —
    //      NO global single-partition window); the oracle recomputes the
    //      same assignment with a plain global window, proving the
    //      decomposition exact
    "q87_token_shards" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Sharding
          .tokenShards(t(s, d, "documents"), col("text"), col("doc_id"),
            budget = 5000L, buckets = 8)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tok"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard")),
      Some("""
        WITH t AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                 sum(len(string_split(text, ' ')))
                   OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM documents)
        SELECT CAST(floor((cum - n_tokens) / 5000) AS BIGINT) AS shard,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tok,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM t GROUP BY 1 ORDER BY 1"""))),

    // ---- train/eval contamination: every 10th doc plays the eval set;
    //      a corpus doc is flagged when ≥30% of an eval doc's distinct
    //      trigrams appear verbatim in it (GPT-3-style decontamination,
    //      via the same inverted-index join shape as q25)
    "q88_contamination" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        graft.llm.Contamination.ngramOverlap(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", n = 3, minFrac = 0.3)
          .orderBy(col("doc_id"), col("eval_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 10 = 0),
        ev_sizes AS (SELECT eval_id, count(*) AS eval_ngrams FROM ev GROUP BY eval_id),
        hits AS (
          SELECT c.doc_id, e.eval_id, count(*) AS common
          FROM sh c JOIN ev e ON c.s = e.s
          WHERE c.doc_id % 10 <> 0
          GROUP BY 1, 2)
        SELECT h.doc_id, h.eval_id, h.common, z.eval_ngrams,
               CAST(h.common AS DOUBLE) / z.eval_ngrams AS overlap_frac
        FROM hits h JOIN ev_sizes z ON z.eval_id = h.eval_id
        WHERE CAST(h.common AS DOUBLE) / z.eval_ngrams >= 0.3
        ORDER BY h.doc_id, h.eval_id"""))),

    // ---- deterministic stratified sampling + hash split: per-source
    //      ppm rates over md5 buckets — reproducible across engines,
    //      monotone in the rate, no RNG state anywhere
    "q89_stratified_sample" -> ((
      (s: SparkSession, d: String) => {
        val sampled = graft.llm.Mixing.stratifiedSample(
          t(s, d, "documents"), "source", "doc_id",
          ratesPpm = Map("web" -> 250000L, "books" -> 750000L, "code" -> 500000L),
          defaultPpm = 100000L, salt = "mix")
        graft.llm.Mixing.split(sampled, "doc_id",
            splits = Seq("val" -> 50000L, "test" -> 50000L), rest = "train",
            salt = "split")
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
            sum(col("n_chars")).as("chars"))
          .orderBy(col("source"), col("split"))
      },
      Some("""
        WITH sampled AS (
          SELECT *,
                 CAST('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
                   % 1000000 AS sb
          FROM documents
          WHERE CAST('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
                  % 1000000
                < CASE source WHEN 'web' THEN 250000 WHEN 'books' THEN 750000
                              WHEN 'code' THEN 500000 ELSE 100000 END)
        SELECT source,
               CASE WHEN sb < 50000 THEN 'val'
                    WHEN sb < 100000 THEN 'test' ELSE 'train' END AS split,
               count(*) AS n, min(doc_id) AS first_doc,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM sampled GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // ---- temperature-weighted source mixing (tau=2): rates planned
    //      from per-source counts on the driver (metadata-sized), then
    //      the same integral md5-ppm membership filter; the oracle
    //      re-derives the rates with identical sqrt/floor arithmetic
    "q90_temperature_mix" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Mixing.temperatureMix(
            t(s, d, "documents"), "source", "doc_id",
            tau = 2.0, targetTotal = 2000L, salt = "mix")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
            max(col("rate_ppm")).as("rate_ppm"))
          .orderBy(col("source")),
      Some("""
        WITH counts AS (
          SELECT source, count(*) AS cnt FROM documents GROUP BY source),
        wsum AS (SELECT sum(sqrt(CAST(cnt AS DOUBLE)) ORDER BY source) AS ws
                 FROM counts),
        rates AS (
          SELECT source, cnt,
                 LEAST(1000000, GREATEST(0, CAST(floor(
                   2000.0 * (sqrt(CAST(cnt AS DOUBLE)) / ws.ws) / cnt * 1000000.0
                 ) AS BIGINT))) AS rate_ppm
          FROM counts, wsum ws)
        SELECT d.source, count(*) AS n, min(d.doc_id) AS first_doc,
               max(r.rate_ppm) AS rate_ppm
        FROM documents d JOIN rates r ON r.source = d.source
        WHERE CAST('0x'||substr(md5('mix:'||CAST(d.doc_id AS VARCHAR)),1,15) AS BIGINT)
                % 1000000 < r.rate_ppm
        GROUP BY d.source ORDER BY d.source"""))),

    // ---- the codegen kernels through PURE SQL (injectFunction surface):
    //      pairwise cosine over a thinned id grid — same arithmetic the
    //      DataFrame API gates via q28/q29
    "q91_sql_vector_functions" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "embeddings").createOrReplaceTempView("q91_emb")
        s.sql("""
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 dot_product(a.embedding, b.embedding) /
                   (sqrt(sum_squares(a.embedding)) *
                    sqrt(sum_squares(b.embedding))) AS cos
          FROM q91_emb a JOIN q91_emb b ON a.vec_id < b.vec_id
          WHERE a.vec_id % 40 = 0 AND b.vec_id % 40 = 0
          ORDER BY id_a, id_b""")
      },
      Some("""
        WITH sub AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings WHERE vec_id % 40 = 0)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(range(1, 65),
                 i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
                 / (a.nrm * b.nrm) AS cos
        FROM sub a JOIN sub b ON a.vec_id < b.vec_id
        ORDER BY id_a, id_b"""))),

    // ---- fractional upsampling (training-recipe epochs): books repeat
    //      ~2.5x, web downsamples to 0.3x, the rest passes through once;
    //      the epoch index stays observable so shards can interleave
    "q92_upsample_epochs" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Mixing.upsample(
            t(s, d, "documents"), "source", "doc_id",
            weightsPpm = Map("web" -> 300000L, "books" -> 2500000L),
            defaultPpm = 1000000L, salt = "epoch")
          .groupBy(col("source"), col("epoch"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
            sum(col("n_chars")).as("chars"))
          .orderBy(col("source"), col("epoch")),
      Some("""
        WITH w AS (
          SELECT doc_id, source, n_chars,
                 CASE source WHEN 'web' THEN 300000
                             WHEN 'books' THEN 2500000
                             ELSE 1000000 END AS wppm,
                 CAST('0x'||substr(md5('epoch:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
                   % 1000000 AS b
          FROM documents),
        r AS (
          SELECT doc_id, source, n_chars,
                 (wppm // 1000000) +
                   CASE WHEN b < (wppm % 1000000) THEN 1 ELSE 0 END AS rep
          FROM w),
        x AS (
          SELECT doc_id, source, n_chars, unnest(range(rep)) AS epoch
          FROM r WHERE rep > 0)
        SELECT source, epoch, count(*) AS n, min(doc_id) AS first_doc,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM x GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // ---- the data-loader materialization chain end-to-end: quality
    //      gate → stratified mix → epoch upsampling → token-budget
    //      shards (q36's dedup pipeline covers cleaning; this covers
    //      the serving side). seq_id = doc_id*4 + epoch keeps repeated
    //      copies uniquely ordered for the prefix-sum sharder
    "q93_training_mix_pipeline" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(length(col("text")) >= 50)
        val mixed = graft.llm.Mixing.stratifiedSample(docs, "source", "doc_id",
          ratesPpm = Map("web" -> 500000L, "books" -> 1000000L),
          defaultPpm = 800000L, salt = "mix")
        val epochs = graft.llm.Mixing.upsample(mixed, "source", "doc_id",
          weightsPpm = Map("books" -> 2000000L), defaultPpm = 1000000L,
          salt = "epoch")
          .withColumn("seq_id", col("doc_id") * 4 + col("epoch"))
        graft.llm.Sharding
          .tokenShards(epochs, col("text"), col("seq_id"),
            budget = 20000L, buckets = 8)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok"),
            countDistinct(col("source")).as("n_sources"),
            min(col("seq_id")).as("first_seq"))
          .orderBy(col("shard"))
      },
      Some("""
        WITH sampled AS (
          SELECT doc_id, source, text FROM documents
          WHERE len(text) >= 50
            AND CAST('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
                  % 1000000
                < CASE source WHEN 'web' THEN 500000
                              WHEN 'books' THEN 1000000 ELSE 800000 END),
        w AS (
          SELECT doc_id, source, text,
                 CASE source WHEN 'books' THEN 2000000 ELSE 1000000 END AS wppm,
                 CAST('0x'||substr(md5('epoch:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
                   % 1000000 AS b
          FROM sampled),
        e AS (
          SELECT doc_id, source, text,
                 unnest(range((wppm // 1000000) +
                   CASE WHEN b < (wppm % 1000000) THEN 1 ELSE 0 END)) AS epoch
          FROM w),
        k AS (SELECT doc_id*4 + epoch AS seq_id, source,
                     len(string_split(text, ' ')) AS n_tokens FROM e),
        c AS (SELECT seq_id, source, n_tokens,
                     sum(n_tokens) OVER (ORDER BY seq_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM k)
        SELECT CAST(floor((cum - n_tokens) / 20000) AS BIGINT) AS shard,
               count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tok,
               count(DISTINCT source) AS n_sources, min(seq_id) AS first_seq
        FROM c GROUP BY 1 ORDER BY 1"""))),

    // ---- INCREMENTAL dedup over a persisted signature store (the 100 TB
    //      operating mode: each crawl batch upserts its signatures into a
    //      graft table and LSH-probes only new-vs-all — old-vs-old never
    //      recomputes). Two batches arriving in sequence must produce
    //      EXACTLY the one-shot full-corpus answer (the oracle below =
    //      q26's full recompute, same n/k/bands/threshold)
    "q94_incremental_dedup" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val batch1 = docs.filter(col("doc_id") % 3 =!= 0)
        val batch2 = docs.filter(col("doc_id") % 3 === 0)
        val dir = freshDir()
        val tbl = graft.write.GraftTable.create(s, dir, graft.core.TableConfig(
          name = "sig_store", tableType = graft.core.TableType.COW,
          keyFields = Seq("doc_id"), targetFileRows = 500000))
        // crawl 1: signatures land in the store; its pairs are reported
        tbl.bulkInsert(Dedup.minhashSignatures(batch1, "doc_id", "text", n = 3, k = 16))
        val r = graft.read.GraftReader(tbl)
        val pairs1 = Dedup.minhashLshFromSigs(
          r.dataOnly(r.snapshot()).select(col("doc_id"), col("sig")),
          k = 16, bands = 4, minEst = 0.5)
        // crawl 2: upsert the new batch, probe new-vs-all only
        val sig2 = Dedup.minhashSignatures(batch2, "doc_id", "text", n = 3, k = 16)
        tbl.upsert(sig2)
        val pairs2 = Dedup.minhashLshFromSigs(
          r.dataOnly(r.snapshot()).select(col("doc_id"), col("sig")),
          k = 16, bands = 4, minEst = 0.5,
          probeIds = Some(sig2.select(col("doc_id"))))
        pairs1.unionByName(pairs2).orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        mh AS (
          SELECT doc_id, i,
                 min((a * (CAST('0x'||substr(md5(s),1,15) AS BIGINT) % ${Dedup.MinhashPrime})
                      + b) % ${Dedup.MinhashPrime}) AS h
          FROM sh, (VALUES ${Dedup.minhashParamsSql(16)}) params(i, a, b)
          GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, b,
                 CAST(sig[b*4+1] AS VARCHAR)||','||CAST(sig[b*4+2] AS VARCHAR)||','||
                 CAST(sig[b*4+3] AS VARCHAR)||','||CAST(sig[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS n_match,
               len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) / 16.0 AS est_jaccard
        FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
        WHERE len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) >= 8
        ORDER BY doc_a, doc_b"""))),

    // ---- exact substring (token-span) dedup: the line-dedup analog
    //      (no newlines in this corpus, so the unit is a 10-token
    //      window); flags docs whose spans repeat corpus-wide
    "q95_span_dedup" -> ((
      (s: SparkSession, d: String) =>
        Dedup.spanStats(t(s, d, "documents"), "doc_id", "text", width = 10)
          .filter(col("n_dup_spans") > 0)
          .orderBy(col("doc_id")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sp AS (SELECT doc_id, unnest(list_transform(range(0, len(tk)//10),
                 i -> md5(array_to_string(list_slice(tk, i*10+1, i*10+10), ' ')))) AS h
               FROM toks),
        cnt AS (SELECT h, count(*) AS c FROM sp GROUP BY h),
        agg AS (SELECT doc_id, count(*) AS n_spans,
                       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
                FROM sp JOIN cnt USING (h) GROUP BY doc_id)
        SELECT doc_id, n_spans, n_dup_spans,
               CAST(n_dup_spans AS DOUBLE) / n_spans AS dup_frac
        FROM agg WHERE n_dup_spans > 0 ORDER BY doc_id"""))),

    // ---- canonical-doc selection per near-dup cluster: CC over the
    //      q39 pair graph, keep the longest member (ties: lowest id);
    //      the gate reports every multi-doc cluster's pick and the
    //      token mass the dedup removed
    "q96_canonical_docs" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
          .withColumn("n_tokens", size(TF.wsTokens(col("text"))).cast("long"))
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.7, maxDocFreq = None) // oracle is exact/uncapped
        Dedup.canonicalize(docs, pairs, "doc_id", col("n_tokens"))
          .groupBy(col("component"))
          .agg(count(lit(1)).as("n_members"),
            max(when(col("is_canonical"), col("doc_id"))).as("canonical_doc"),
            sum(when(!col("is_canonical"), col("n_tokens"))
              .otherwise(0L)).as("dropped_tokens"))
          .filter(col("n_members") > 1)
          .orderBy(col("component"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        edges AS (
          SELECT doc_a, doc_b FROM pairs
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.7),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          WITH RECURSIVE r(node, target) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s.dst FROM r JOIN sym s ON s.src = r.target)
          SELECT node, min(target) AS component FROM r GROUP BY node),
        lab AS (
          SELECT t.doc_id, coalesce(rc.component, t.doc_id) AS component,
                 len(tk) AS n_tokens
          FROM toks t LEFT JOIN reach rc ON rc.node = t.doc_id),
        rk AS (SELECT *, row_number() OVER (PARTITION BY component
                 ORDER BY n_tokens DESC, doc_id ASC) AS rk FROM lab)
        SELECT component, count(*) AS n_members,
               max(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc,
               CAST(sum(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END) AS BIGINT)
                 AS dropped_tokens
        FROM rk GROUP BY component HAVING count(*) > 1 ORDER BY component"""))),

    // ---- unigram-LM cross-entropy quality score (CCNet's lm-score
    //      shape with the corpus itself as the model): low = boiler-
    //      plate, high = noise; the oracle replays the identical
    //      frequency join and -ln sum
    "q97_unigram_xent" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.QualityModel
          .unigramXent(t(s, d, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM documents),
        freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq)
        SELECT doc_id, count(*) AS n_tokens,
               sum(-ln(CAST(cnt AS DOUBLE) / total)) / count(*) AS xent
        FROM toks JOIN freq USING (tok), tot
        GROUP BY doc_id ORDER BY doc_id"""))),

    // ---- deterministic reproducible shuffle: md5-keyed permutation
    //      into loader shards; the integer order_check fingerprints the
    //      EXACT within-shard order, so both engines must agree on the
    //      full permutation, not just membership
    "q98_deterministic_shuffle" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Mixing
          .deterministicShuffle(t(s, d, "documents"), "doc_id",
            nShards = 8, salt = "epoch0")
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"),
            max(when(col("pos") === 1, col("doc_id"))).as("first_doc"),
            sum(col("pos") * col("doc_id")).as("order_check"))
          .orderBy(col("shard")),
      Some("""
        WITH k AS (
          SELECT doc_id,
                 CAST('0x'||substr(md5('epoch0:'||CAST(doc_id AS VARCHAR)),1,15)
                   AS BIGINT) AS key
          FROM documents),
        p AS (SELECT doc_id, key % 8 AS shard,
                     row_number() OVER (PARTITION BY key % 8
                       ORDER BY key, doc_id) AS pos
              FROM k)
        SELECT shard, count(*) AS n,
               max(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
               CAST(sum(pos * doc_id) AS BIGINT) AS order_check
        FROM p GROUP BY shard ORDER BY shard"""))),

    // ---- CCNet-style corpus partition: per-source head/middle/tail
    //      split on the unigram xent (fixed band boundaries from the
    //      corpus distribution, inlined in both engines — the label is
    //      a pure per-row expression, no quantile pass at filter time)
    "q99_xent_bands" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        graft.llm.QualityModel.unigramXent(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("band", graft.llm.QualityModel.xentBand(col("xent"),
            headBelow = 3.396, tailAbove = 3.410))
          .groupBy(col("source"), col("band"))
          .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"))
          .orderBy(col("source"), col("band"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM documents),
        freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
        sc AS (SELECT doc_id, count(*) AS n_tokens,
                      sum(-ln(CAST(cnt AS DOUBLE) / total)) / count(*) AS xent
               FROM toks JOIN freq USING (tok), tot GROUP BY doc_id),
        lab AS (SELECT sc.doc_id, d.source, sc.n_tokens,
                       CASE WHEN xent < 3.396 THEN 'head'
                            WHEN xent > 3.410 THEN 'tail'
                            ELSE 'middle' END AS band
                FROM sc JOIN documents d ON d.doc_id = sc.doc_id)
        SELECT source, band, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS tok
        FROM lab GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // ---- vocabulary building: top merge candidates by adjacent-pair
    //      frequency (the first BPE merge step, distributed: one hash
    //      aggregate + TakeOrdered — composition of existing shingles)
    "q100_pair_vocab" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .select(explode(TF.shingles(TF.wsTokens(col("text")), 2)).as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(20),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        p AS (SELECT unnest(list_transform(range(1, len(tk)),
                i -> tk[i]||' '||tk[i+1])) AS pair
              FROM toks)
        SELECT pair, count(*) AS cnt FROM p
        GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20"""))),

    // ---- the complete Gopher/MassiveText filter chain (q77 gates the
    //      repetition subset; this gates the whole ordered verdict):
    //      per-source outcome census with the token mass at stake
    "q101_gopher_census" -> ((
      (s: SparkSession, d: String) => {
        val toks = TF.wsTokens(col("text"))
        t(s, d, "documents").select(
            col("source"), size(toks).cast("long").as("n_tokens"),
            TF.gopherVerdict(toks, Stopwords).as("verdict"))
          .groupBy(col("source"), col("verdict"))
          .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"))
          .orderBy(col("source"), col("verdict"))
      },
      Some("""
        WITH base AS (SELECT doc_id, source, string_split(text,' ') AS tk
                      FROM documents),
        top AS (
          SELECT doc_id, max(c) AS top_cnt FROM (
            SELECT doc_id, w, count(*) AS c FROM (
              SELECT doc_id, unnest(tk) AS w FROM base) GROUP BY doc_id, w)
          GROUP BY doc_id),
        m AS (
          SELECT b.doc_id, b.source, len(tk) AS n_tokens,
                 list_sum(list_transform(tk, w -> len(w))) * 1.0 / len(tk)
                   AS mean_len,
                 len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]')))
                   * 1.0 / len(tk) AS alpha_frac,
                 len(list_intersect(list_distinct(tk), ['the','a'])) AS stops,
                 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
                   AS dup_tok,
                 1.0 - CAST(len(list_distinct(list_transform(
                     generate_series(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE)
                   / (len(tk) - 1) AS dup_2g,
                 t.top_cnt
          FROM base b JOIN top t ON t.doc_id = b.doc_id),
        v AS (
          SELECT source, n_tokens,
                 CASE
                   WHEN n_tokens < 50 OR n_tokens > 100000 THEN 'word_count'
                   WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 'mean_word_len'
                   WHEN alpha_frac < 0.8 THEN 'alpha_frac'
                   WHEN stops < 2 THEN 'stopwords'
                   WHEN NOT (dup_tok <= 0.85 AND dup_2g <= 0.65 AND
                             CAST(top_cnt AS DOUBLE) / n_tokens <= 0.30)
                     THEN 'repetition'
                   ELSE 'keep' END AS verdict
          FROM m)
        SELECT source, verdict, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS tok
        FROM v GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // ---- the round-7 operators composed into the full modern cleaning
    //      recipe (C4/CCNet shape): Gopher gate → span-dup drop →
    //      near-dup canonicalization → LM tail filter → deterministic
    //      shuffle into loader shards. One declarative plan end to end;
    //      the integer order_check pins the exact final permutation
    "q102_clean_pipeline" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        def toks = TF.wsTokens(col("text"))
        val kept = docs.filter(TF.gopherVerdict(toks, Stopwords) === "keep")
        val spanDrop = Dedup.spanStats(kept, "doc_id", "text", width = 10)
          .filter(col("dup_frac") > 0.5).select(col("doc_id"))
        val c1 = kept.join(spanDrop, Seq("doc_id"), "left_anti")
          .withColumn("n_tokens", size(toks).cast("long"))
        val pairs = Dedup.jaccardPairs(c1, "doc_id", "text",
          n = 3, threshold = 0.7, maxDocFreq = None) // oracle is exact/uncapped
        val canon = Dedup.canonicalize(c1, pairs, "doc_id", col("n_tokens"))
          .filter(col("is_canonical"))
        val scored = graft.llm.QualityModel.unigramXent(canon, "doc_id", "text")
        val fin = canon
          .join(scored.select(col("doc_id"), col("xent")), "doc_id")
          .filter(col("xent") <= 3.41)
        graft.llm.Mixing
          .deterministicShuffle(fin, "doc_id", nShards = 4, salt = "ep0")
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"),
            countDistinct(col("source")).as("n_sources"),
            sum(col("pos") * col("doc_id")).as("order_check"))
          .orderBy(col("shard"))
      },
      Some("""
        WITH base AS (SELECT doc_id, source, text, string_split(text,' ') AS tk
                      FROM documents),
        top AS (
          SELECT doc_id, max(c) AS top_cnt FROM (
            SELECT doc_id, w, count(*) AS c FROM (
              SELECT doc_id, unnest(tk) AS w FROM base) GROUP BY doc_id, w)
          GROUP BY doc_id),
        gq AS (
          SELECT b.doc_id, b.source, b.text, b.tk, len(tk) AS n_tokens
          FROM base b JOIN top t USING (doc_id)
          WHERE NOT (len(tk) < 50 OR len(tk) > 100000)
            AND list_sum(list_transform(tk, w -> len(w))) * 1.0 / len(tk)
                  BETWEEN 3.0 AND 10.0
            AND len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]')))
                  * 1.0 / len(tk) >= 0.8
            AND len(list_intersect(list_distinct(tk), ['the','a'])) >= 2
            AND (1.0 - CAST(len(list_distinct(tk)) AS DOUBLE)/len(tk)) <= 0.85
            AND (1.0 - CAST(len(list_distinct(list_transform(
                  generate_series(1,len(tk)-1), i -> tk[i]||' '||tk[i+1])))
                  AS DOUBLE)/(len(tk)-1)) <= 0.65
            AND CAST(t.top_cnt AS DOUBLE)/len(tk) <= 0.30),
        sp AS (SELECT doc_id, unnest(list_transform(range(0, len(tk)//10),
                 i -> md5(array_to_string(list_slice(tk, i*10+1, i*10+10),' ')))) AS h
               FROM gq),
        cnt AS (SELECT h, count(*) AS c FROM sp GROUP BY h),
        sdup AS (SELECT doc_id,
                   sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)*1.0/count(*) AS dup_frac
                 FROM sp JOIN cnt USING (h) GROUP BY doc_id),
        c1 AS (SELECT gq.* FROM gq LEFT JOIN sdup USING (doc_id)
               WHERE coalesce(dup_frac, 0.0) <= 0.5),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM c1)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1,2),
        edges AS (SELECT doc_a, doc_b FROM prs
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.7),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          WITH RECURSIVE r(node, target) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s.dst FROM r JOIN sym s ON s.src = r.target)
          SELECT node, min(target) AS component FROM r GROUP BY node),
        lab AS (SELECT c1.doc_id, c1.source, c1.n_tokens,
                       coalesce(rc.component, c1.doc_id) AS component
                FROM c1 LEFT JOIN reach rc ON rc.node = c1.doc_id),
        rk AS (SELECT *, row_number() OVER (PARTITION BY component
                 ORDER BY n_tokens DESC, doc_id ASC) AS rk FROM lab),
        canon AS (SELECT doc_id, source, n_tokens FROM rk WHERE rk = 1),
        ctoks AS (SELECT c.doc_id, unnest(string_split(b.text,' ')) AS tok
                  FROM canon c JOIN base b USING (doc_id)),
        freq AS (SELECT tok, count(*) AS cnt FROM ctoks GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
        sc AS (SELECT doc_id, sum(-ln(CAST(cnt AS DOUBLE)/total))/count(*) AS xent
               FROM ctoks JOIN freq USING (tok), tot GROUP BY doc_id),
        fin AS (SELECT c.doc_id, c.source, c.n_tokens
                FROM canon c JOIN sc USING (doc_id) WHERE sc.xent <= 3.41),
        k AS (SELECT doc_id, source, n_tokens,
                CAST('0x'||substr(md5('ep0:'||CAST(doc_id AS VARCHAR)),1,15)
                  AS BIGINT) AS key FROM fin),
        p AS (SELECT doc_id, source, n_tokens, key % 4 AS shard,
                row_number() OVER (PARTITION BY key % 4
                  ORDER BY key, doc_id) AS pos FROM k)
        SELECT shard, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS tok,
               count(DISTINCT source) AS n_sources,
               CAST(sum(pos * doc_id) AS BIGINT) AS order_check
        FROM p GROUP BY shard ORDER BY shard"""))),

    // ---- the text-quality/sampling family through PURE SQL (the
    //      injectFunction surface, q91's pattern): hash-sampled quality
    //      census mixing gopher_verdict, span_hashes, repetition_keep,
    //      and ppm_bucket in one statement
    "q103_sql_text_functions" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "documents").createOrReplaceTempView("q103_docs")
        s.sql("""
          SELECT source,
                 gopher_verdict(split(text, ' '), array('the', 'a')) AS verdict,
                 count(*) AS n,
                 sum(size(span_hashes(split(text, ' '), 10))) AS n_spans,
                 sum(CASE WHEN repetition_keep(split(text, ' '))
                     THEN 1 ELSE 0 END) AS n_rep_ok
          FROM q103_docs
          WHERE ppm_bucket(doc_id, 'mix') < 500000
          GROUP BY source, verdict
          ORDER BY source, verdict""")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, source, string_split(text,' ') AS tk FROM documents
          WHERE CAST('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,15)
                  AS BIGINT) % 1000000 < 500000),
        top AS (
          SELECT doc_id, max(c) AS top_cnt FROM (
            SELECT doc_id, w, count(*) AS c FROM (
              SELECT doc_id, unnest(tk) AS w FROM base) GROUP BY doc_id, w)
          GROUP BY doc_id),
        m AS (
          SELECT b.doc_id, b.source, len(tk) AS n_tokens,
                 len(tk) // 10 AS n_spans,
                 list_sum(list_transform(tk, w -> len(w))) * 1.0 / len(tk)
                   AS mean_len,
                 len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]')))
                   * 1.0 / len(tk) AS alpha_frac,
                 len(list_intersect(list_distinct(tk), ['the','a'])) AS stops,
                 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
                   AS dup_tok,
                 1.0 - CAST(len(list_distinct(list_transform(
                     generate_series(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE)
                   / (len(tk) - 1) AS dup_2g,
                 t.top_cnt
          FROM base b JOIN top t ON t.doc_id = b.doc_id),
        v AS (
          SELECT source, n_tokens, n_spans,
                 (dup_tok <= 0.85 AND dup_2g <= 0.65 AND
                  CAST(top_cnt AS DOUBLE) / n_tokens <= 0.30) AS rep_ok,
                 CASE
                   WHEN n_tokens < 50 OR n_tokens > 100000 THEN 'word_count'
                   WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 'mean_word_len'
                   WHEN alpha_frac < 0.8 THEN 'alpha_frac'
                   WHEN stops < 2 THEN 'stopwords'
                   WHEN NOT (dup_tok <= 0.85 AND dup_2g <= 0.65 AND
                             CAST(top_cnt AS DOUBLE) / n_tokens <= 0.30)
                     THEN 'repetition'
                   ELSE 'keep' END AS verdict
          FROM m)
        SELECT source, verdict, count(*) AS n,
               CAST(sum(n_spans) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rep_ok
        FROM v GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // ---- document chunking: fixed token windows with overlap, stable
    //      chunk ids — the standard context-packing / RAG splitter.
    //      Pure per-row explode: shuffle-free at any corpus size
    "q120_chunking" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Chunking.chunkTokens(
            t(s, d, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        ex AS (SELECT doc_id, tk, unnest(range(0, len(tk), 24)) AS start
               FROM toks)
        SELECT doc_id,
               CAST(start // 24 AS BIGINT) AS chunk_idx,
               CAST(doc_id AS VARCHAR) || '#' ||
                 CAST(start // 24 AS VARCHAR) AS chunk_key,
               CAST(least(32, len(tk) - start) AS BIGINT) AS n_tokens,
               array_to_string(tk[start + 1 : start + 32], ' ') AS chunk_text
        FROM ex ORDER BY doc_id, chunk_idx"""))),

    // ---- C4-style line-level cleaning (Raffel et al. 2020 §2.2): the
    //      corpus is single-line prose, so the query first derives a
    //      realistic multi-line "page" per doc with literal replaces
    //      (sentence breaks, code braces, a scripty word, placeholder
    //      text) — identical construction on both engines — then applies
    //      the line rules and the ordered page verdict over the CLEANED
    //      text. Per-row string math only: shuffle-free
    "q121_c4_clean" -> ((
      (s: SparkSession, d: String) => {
        val page = replace(replace(replace(replace(col("text"),
          lit(" line"), lit(".\n")),
          lit(" big"), lit(" {")),
          lit(" vector"), lit(" javascript")),
          lit(" dup"), lit(" lorem ipsum."))
        val cleaned = TF.c4Clean(page)
        t(s, d, "documents").select(col("doc_id"),
            cleaned.as("_c"),
            size(filter(split(page, "\n"), l => TF.c4LineKeep(l)))
              .cast("long").as("kept_lines"))
          .select(col("doc_id"),
            TF.c4Verdict(col("_c"), blocklist = Seq("customer"),
              minSentences = 3).as("verdict"),
            col("kept_lines"),
            TF.c4SentenceCount(col("_c")).as("sentences"),
            length(col("_c")).cast("long").as("cleaned_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH page AS (
          SELECT doc_id,
                 replace(replace(replace(replace(text,
                   ' line', '.' || chr(10)),
                   ' big', ' {'),
                   ' vector', ' javascript'),
                   ' dup', ' lorem ipsum.') AS p
          FROM documents),
        lines AS (
          SELECT doc_id, p, list_filter(string_split(p, chr(10)), l ->
                   regexp_matches(trim(l), '[.!?"'']$')
                   AND len(list_filter(string_split(trim(l), ' '),
                                       w -> w <> '')) >= 3
                   AND NOT contains(lower(trim(l)), 'javascript')) AS kept
          FROM page),
        c AS (SELECT doc_id,
                     -- duckdb's array_to_string of an EMPTY list is NULL,
                     -- spark's array_join is '' — pin the spark semantics
                     coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
                     len(kept) AS kept_lines
              FROM lines)
        SELECT doc_id,
               CASE WHEN contains(cleaned, '{') THEN 'brace'
                    WHEN contains(lower(cleaned), 'lorem ipsum')
                      THEN 'lorem_ipsum'
                    WHEN contains(lower(cleaned), 'customer')
                      THEN 'blocklist'
                    WHEN len(regexp_extract_all(cleaned, '[.!?]')) < 3
                      THEN 'too_few_sentences'
                    ELSE 'keep' END AS verdict,
               CAST(kept_lines AS BIGINT) AS kept_lines,
               CAST(len(regexp_extract_all(cleaned, '[.!?]')) AS BIGINT)
                 AS sentences,
               CAST(len(cleaned) AS BIGINT) AS cleaned_chars
        FROM c ORDER BY doc_id"""))),

    // ---- SQ8 scalar quantization (FAISS QT_8bit analog): per-dim
    //      [lo,hi] trained on the corpus, vectors encoded to 1 byte/dim
    //      (4x smaller at float32 dims — at 100 TB the embedding column
    //      IS the bill), search by asymmetric distance: exact query
    //      vectors against midpoint-decoded codes. The oracle replays
    //      train + encode + decode + top-k arithmetic exactly
    "q123_sq8_ann" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val (lo, hi) = Similarity.sq8Train(emb, "embedding")
        Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 5, lo, hi)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH stats AS (
          SELECT i,
                 min(CAST(embedding[i] AS DOUBLE)) AS lo,
                 max(CAST(embedding[i] AS DOUBLE)) AS hi
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
          GROUP BY i),
        bounds AS (
          SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi
          FROM stats),
        dec AS (
          SELECT vec_id,
                 list_transform(range(1, 65), i ->
                   CASE WHEN b.hi[i] = b.lo[i] THEN b.lo[i]
                        ELSE b.lo[i] + (CAST(least(255, greatest(0,
                               CAST(floor((CAST(embedding[i] AS DOUBLE) - b.lo[i])
                                          * 255.0 / (b.hi[i] - b.lo[i]))
                                    AS INTEGER))) AS DOUBLE) + 0.5)
                             * (b.hi[i] - b.lo[i]) / 256.0 END) AS dvec
          FROM embeddings, bounds b),
        nrm AS (SELECT vec_id, dvec,
                       sqrt(list_sum(list_transform(dvec, x -> x * x))) AS nrm
                FROM dec),
        qn AS (SELECT vec_id, embedding,
                      sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * x))) AS nrm
               FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * c.dvec[i]))
                   / (q.nrm * c.nrm) AS cos
          FROM qn q JOIN nrm c ON c.vec_id <> q.vec_id)
        SELECT q_id, rnk, n_id, cos FROM (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
          FROM scored)
        WHERE rnk <= 5 ORDER BY q_id, rnk"""))),

    // ---- BM25 keyword retrieval (Lucene/Okapi formula) over an
    //      inverted index — the term-match complement of the embedding
    //      ANN family. Scores fold per-(query,doc) contributions in
    //      sorted term order, so the float math is bit-stable and the
    //      oracle replays it exactly
    "q124_bm25" -> ((
      (s: SparkSession, d: String) => {
        import s.implicits._
        val queries = Seq(
          (0L, Seq("spark", "merge")),
          (1L, Seq("window", "filter")),
          (2L, Seq("customer", "vector"))).toDF("q_id", "terms")
        graft.llm.Retrieval.bm25TopK(
            t(s, d, "documents"), "doc_id", "text", queries, k = 10)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        d AS (SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS dl FROM toks),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                         CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
                  FROM toks),
        tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
               FROM (SELECT doc_id, dl, unnest(tk) AS term FROM d)
               GROUP BY 1, 2, 3),
        dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
                  GROUP BY 1),
        q(q_id, term) AS (VALUES
          (0, 'spark'), (0, 'merge'),
          (1, 'window'), (1, 'filter'),
          (2, 'customer'), (2, 'vector')),
        contrib AS (
          SELECT q.q_id, tf.doc_id, tf.term,
                 ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)) AS c
          FROM tf
          JOIN q ON q.term = tf.term
          JOIN dfreq ON dfreq.term = tf.term, stats s),
        scored AS (
          SELECT q_id, doc_id,
                 list_sum(list_transform(
                   list_sort(list(struct_pack(term := term, c := c))),
                   x -> x.c)) AS score
          FROM contrib GROUP BY 1, 2)
        SELECT CAST(q_id AS BIGINT) AS q_id, rnk, doc_id, score FROM (
          SELECT q_id, doc_id, score,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY score DESC, doc_id) AS rnk
          FROM scored)
        WHERE rnk <= 10 ORDER BY q_id, rnk"""))),

    // ---- PII scrubbing: the corpus is PII-free word soup, so the
    //      query first plants emails / IPv4s / phone numbers with
    //      literal replaces (identical construction on both engines),
    //      then counts and redacts with the shared RE2-safe patterns.
    //      Pure per-row regex math: shuffle-free at any corpus size
    "q125_pii_scrub" -> ((
      (s: SparkSession, d: String) => {
        val planted = replace(replace(replace(col("text"),
          lit(" line"), lit(" bob@example.com")),
          lit(" big"), lit(" 10.0.0.1")),
          lit(" dup"), lit(" 555-867-5309"))
        val (em, ip, ph) = TF.piiCounts(planted)
        t(s, d, "documents").select(col("doc_id"),
            em.as("n_email"), ip.as("n_ip"), ph.as("n_phone"),
            TF.redactPii(planted).as("redacted"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
                 replace(replace(replace(text,
                   ' line', ' bob@example.com'),
                   ' big', ' 10.0.0.1'),
                   ' dup', ' 555-867-5309') AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t,
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
               CAST(len(regexp_extract_all(t,
                 '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[EMAIL]', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
                 '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '[PHONE]', 'g')
                 AS redacted
        FROM p ORDER BY doc_id"""))),

    // ---- HTML extraction: build a markup page per doc (script block,
    //      comment, entities — literal replaces, mirrored), then
    //      strip_html it to plain text. Per-row regex chain only
    "q126_html_strip" -> ((
      (s: SparkSession, d: String) => {
        val page = concat(lit("<html><body><p>"),
          replace(replace(replace(replace(col("text"),
            lit(" line"), lit("</p>\n<p>")),
            lit(" big"),
            lit(" <script type=\"text/javascript\">var x = 1 < 2;</script> ")),
            lit(" vector"), lit(" Tom &amp; Jerry &lt;3 ")),
            lit(" dup"), lit(" <!-- hidden tracking note --> ")),
          lit("</p></body></html>"))
        val cleaned = TF.stripHtml(page)
        t(s, d, "documents").select(col("doc_id"),
            cleaned.as("cleaned"),
            size(split(cleaned, " ")).cast("long").as("n_words"),
            length(cleaned).cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH page AS (
          SELECT doc_id,
                 '<html><body><p>' ||
                 replace(replace(replace(replace(text,
                   ' line', '</p>' || chr(10) || '<p>'),
                   ' big',
                   ' <script type="text/javascript">var x = 1 < 2;</script> '),
                   ' vector', ' Tom &amp; Jerry &lt;3 '),
                   ' dup', ' <!-- hidden tracking note --> ') ||
                 '</p></body></html>' AS p
          FROM documents),
        c AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(
                     regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(p,
                         '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                       '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                       '(?s)<!--.*?-->', ' ', 'g'),
                       '<[^>]*>', ' ', 'g'),
                     '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                     '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                   '[ \t\n\f\r\x0B]+', ' ', 'g')) AS cleaned
          FROM page)
        SELECT doc_id, cleaned,
               CAST(len(string_split(cleaned, ' ')) AS BIGINT) AS n_words,
               CAST(len(cleaned) AS BIGINT) AS n_chars
        FROM c ORDER BY doc_id"""))),

    // ---- URL host census with a blocklist: plant URLs, extract them,
    //      reduce to hosts, drop blocklisted hosts, count per host.
    //      One shuffle (the host groupBy); the blocklist is a literal
    //      isin — broadcast-free at any list size that fits a filter
    "q127_url_hosts" -> ((
      (s: SparkSession, d: String) => {
        val planted = replace(replace(replace(replace(col("text"),
          lit(" line"), lit(" http://spark.apache.org/docs/latest ")),
          lit(" slow"), lit(" https://spark.apache.org/examples.html ")),
          lit(" big"), lit(" https://github.com/apache/spark ")),
          lit(" dup"), lit(" http://ads.tracker.example/pixel?id=1 "))
        t(s, d, "documents")
          .select(col("doc_id"), explode(TF.extractUrls(planted)).as("url"))
          .select(col("doc_id"), TF.urlHost(col("url")).as("host"))
          .filter(!col("host").isin("ads.tracker.example"))
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_urls"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("host"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
                 replace(replace(replace(replace(text,
                   ' line', ' http://spark.apache.org/docs/latest '),
                   ' slow', ' https://spark.apache.org/examples.html '),
                   ' big', ' https://github.com/apache/spark '),
                   ' dup', ' http://ads.tracker.example/pixel?id=1 ') AS t
          FROM documents),
        u AS (SELECT doc_id,
                     unnest(regexp_extract_all(t,
                       '(?i)https?://[^ \t\n\f\r\x0B]*[^ \t\n\f\r\x0B.,;:!?)\]''"]')) AS url
              FROM p),
        h AS (SELECT doc_id,
                     lower(regexp_extract(url,
                       '(?i)^https?://([^/:?#]+)', 1)) AS host
              FROM u)
        SELECT host, count(*) AS n_urls,
               count(DISTINCT doc_id) AS n_docs
        FROM h WHERE host <> 'ads.tracker.example'
        GROUP BY 1 ORDER BY 1"""))),

    // ---- within-document line dedup: plant a repeated boilerplate
    //      banner (two trigger words map to the SAME line), split to
    //      lines, keep first occurrences. The oracle checks the
    //      order-independent facets (counts, deduped length, sorted
    //      join); LlmSpec pins first-occurrence ORDER, which DuckDB's
    //      list_distinct can't replay. Per-row array math only
    "q128_line_dedup" -> ((
      (s: SparkSession, d: String) => {
        val page = replace(replace(replace(col("text"),
          lit(" dup"), lit("\nSubscribe to our newsletter\n")),
          lit(" big"), lit("\nSubscribe to our newsletter\n")),
          lit(" line"), lit("\n"))
        val lines = split(page, "\n")
        t(s, d, "documents").select(col("doc_id"),
            size(lines).cast("long").as("n_lines"),
            (size(lines) - size(array_distinct(lines))).cast("long")
              .as("n_dup_lines"),
            length(TF.dedupLines(page)).cast("long").as("n_chars_deduped"),
            array_join(array_sort(array_distinct(lines)), "\n")
              .as("lines_sorted"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
                 replace(replace(replace(text,
                   ' dup', chr(10) || 'Subscribe to our newsletter' || chr(10)),
                   ' big', chr(10) || 'Subscribe to our newsletter' || chr(10)),
                   ' line', chr(10)) AS t
          FROM documents),
        l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM p)
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(ls) - len(list_distinct(ls)) AS BIGINT)
                 AS n_dup_lines,
               CAST(len(array_to_string(list_distinct(ls), chr(10)))
                 AS BIGINT) AS n_chars_deduped,
               array_to_string(list_sort(list_distinct(ls)), chr(10))
                 AS lines_sorted
        FROM l ORDER BY doc_id"""))),

    // ---- unicode NFC normalization (codegen'd NormalizeText
    //      expression): append a decomposed accent (e + U+0301) so the
    //      pass has real work — NFC composes it to one codepoint.
    //      DuckDB's nfc_normalize replays the composition exactly
    "q129_nfc_normalize" -> ((
      (s: SparkSession, d: String) => {
        val decomposed = concat(col("text"), lit(" cafe"), lit("\u0301"))
        val normalized = TF.normalize(decomposed, "NFC")
        t(s, d, "documents").select(col("doc_id"),
            length(decomposed).cast("long").as("n_before"),
            length(normalized).cast("long").as("n_after"),
            normalized.as("normalized"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CAST(length(text || ' cafe' || chr(769)) AS BIGINT)
                 AS n_before,
               CAST(length(nfc_normalize(text || ' cafe' || chr(769)))
                 AS BIGINT) AS n_after,
               nfc_normalize(text || ' cafe' || chr(769)) AS normalized
        FROM documents ORDER BY doc_id"""))),

    // ---- product quantization ANN (FAISS IndexPQ analog): 8 subspaces
    //      x 16 centroids seeded from the first 16 vectors (the
    //      deterministic oracle-replayable init), ADC shortlist of 10,
    //      exact re-rank to top-3. Codes are 8 bytes/vector vs 256 for
    //      the raw floats — the scan-side win PQ exists for. The oracle
    //      replays init + encode + decode + ADC + re-rank arithmetic
    //      exactly (left-to-right double folds, first-min tie-breaks)
    "q130_pq_ann" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val cb = Similarity.pqInitCodebooks(emb, "vec_id", "embedding",
          m = 8, ksub = 16)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 3, cb, rerank = 10)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        cbs AS (
          SELECT s, list(blk ORDER BY j) AS cb
          FROM (
            SELECT s, vec_id AS j,
                   list_transform(range(1, 9), i -> v[s*8 + i]) AS blk
            FROM e, (SELECT unnest(range(0, 8)) AS s) WHERE vec_id < 16)
          GROUP BY s),
        codes AS (
          SELECT vec_id, s,
                 CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS code
          FROM (
            SELECT e.vec_id, c.s,
                   list_transform(range(1, 17), j ->
                     list_sum(list_transform(range(1, 9), i ->
                       (e.v[c.s*8 + i] - c.cb[j][i])
                         * (e.v[c.s*8 + i] - c.cb[j][i])))) AS d
            FROM e, cbs c)),
        dec AS (
          SELECT vec_id, flatten(list(blk ORDER BY s)) AS dvec
          FROM (SELECT cd.vec_id, cd.s, c.cb[cd.code + 1] AS blk
                FROM codes cd JOIN cbs c ON c.s = cd.s)
          GROUP BY vec_id),
        nrm AS (
          SELECT vec_id, dvec,
                 sqrt(list_sum(list_transform(dvec, x -> x * x))) AS dnrm
          FROM dec),
        qn AS (
          SELECT vec_id AS q_id, v AS qv,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS qnrm
          FROM e WHERE vec_id < 5),
        adc AS (
          SELECT q.q_id, c.vec_id AS n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.dvec[i])) / (q.qnrm * c.dnrm) AS cos_adc
          FROM qn q JOIN nrm c ON c.vec_id <> q.q_id),
        short AS (
          SELECT q_id, n_id, cos_adc FROM (
            SELECT q_id, n_id, cos_adc,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_adc DESC, n_id) AS srnk
            FROM adc) WHERE srnk <= 10),
        ex AS (
          SELECT s.q_id, s.n_id, s.cos_adc,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * n.v[i]))
                   / (q.qnrm * sqrt(list_sum(list_transform(n.v,
                       x -> x * x)))) AS cos
          FROM short s
          JOIN qn q ON q.q_id = s.q_id
          JOIN e n ON n.vec_id = s.n_id)
        SELECT q_id, rnk, n_id, cos, cos_adc FROM (
          SELECT q_id, n_id, cos, cos_adc,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rnk
          FROM ex) WHERE rnk <= 3
        ORDER BY q_id, rnk"""))),

    // ---- IVF-PQ ANN (FAISS IndexIVFPQ analog): coarse cells bound the
    //      candidate set, PQ ADC ranks within the probed cells, exact
    //      re-rank restores precision on the shortlist — the standard
    //      billion-vector composition. Same deterministic seeds as
    //      q38/q130, so the oracle replays every stage bit-for-bit
    "q131_ivfpq_ann" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val cb = Similarity.pqInitCodebooks(emb, "vec_id", "embedding",
          m = 8, ksub = 16)
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 3, cb,
            cells = 16, nprobe = 4, rerank = 10)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        en AS (
          SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nr
          FROM e),
        cent AS (
          SELECT vec_id AS c_id, v AS c_v, nr AS c_nr
          FROM en WHERE vec_id < 16),
        corpus_cells AS (
          SELECT vec_id AS n_id, c_id AS n_cell FROM (
            SELECT n.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(range(1, 65),
                       i -> n.v[i] * c.c_v[i])) / (n.nr * c.c_nr) DESC,
                     c.c_id) AS rk
            FROM en n, cent c)
          WHERE rk = 1),
        query_cells AS (
          SELECT vec_id AS q_id, c_id AS q_cell FROM (
            SELECT n.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(range(1, 65),
                       i -> n.v[i] * c.c_v[i])) / (n.nr * c.c_nr) DESC,
                     c.c_id) AS rk
            FROM en n, cent c WHERE n.vec_id < 5)
          WHERE rk <= 4),
        cand AS (
          SELECT q.q_id, cc.n_id
          FROM query_cells q JOIN corpus_cells cc
            ON cc.n_cell = q.q_cell AND cc.n_id <> q.q_id),
        cbs AS (
          SELECT s, list(blk ORDER BY j) AS cb
          FROM (
            SELECT s, vec_id AS j,
                   list_transform(range(1, 9), i -> v[s*8 + i]) AS blk
            FROM e, (SELECT unnest(range(0, 8)) AS s) WHERE vec_id < 16)
          GROUP BY s),
        codes AS (
          SELECT vec_id, s,
                 CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS code
          FROM (
            SELECT e.vec_id, c.s,
                   list_transform(range(1, 17), j ->
                     list_sum(list_transform(range(1, 9), i ->
                       (e.v[c.s*8 + i] - c.cb[j][i])
                         * (e.v[c.s*8 + i] - c.cb[j][i])))) AS d
            FROM e, cbs c)),
        dec AS (
          SELECT vec_id, flatten(list(blk ORDER BY s)) AS dvec
          FROM (SELECT cd.vec_id, cd.s, c.cb[cd.code + 1] AS blk
                FROM codes cd JOIN cbs c ON c.s = cd.s)
          GROUP BY vec_id),
        nrm AS (
          SELECT vec_id, dvec,
                 sqrt(list_sum(list_transform(dvec, x -> x * x))) AS dnrm
          FROM dec),
        qn AS (
          SELECT vec_id AS q_id, v AS qv, nr AS qnrm
          FROM en WHERE vec_id < 5),
        adc AS (
          SELECT ca.q_id, ca.n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.dvec[i])) / (q.qnrm * c.dnrm) AS cos_adc
          FROM cand ca
          JOIN qn q ON q.q_id = ca.q_id
          JOIN nrm c ON c.vec_id = ca.n_id),
        short AS (
          SELECT q_id, n_id, cos_adc FROM (
            SELECT q_id, n_id, cos_adc,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_adc DESC, n_id) AS srnk
            FROM adc) WHERE srnk <= 10),
        ex AS (
          SELECT s.q_id, s.n_id, s.cos_adc,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * n.v[i])) / (q.qnrm * n.nr) AS cos
          FROM short s
          JOIN qn q ON q.q_id = s.q_id
          JOIN en n ON n.vec_id = s.n_id)
        SELECT q_id, rnk, n_id, cos, cos_adc FROM (
          SELECT q_id, n_id, cos, cos_adc,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rnk
          FROM ex) WHERE rnk <= 3
        ORDER BY q_id, rnk"""))),

    // ---- duplicated-span REMOVAL (Lee et al. 2022): q95 flags docs
    //      carrying corpus-repeated 10-token spans; this rewrites them
    //      out while keeping the docs. The oracle rebuilds every
    //      cleaned text from the same span arithmetic
    "q132_span_removal" -> ((
      (s: SparkSession, d: String) =>
        Dedup.dropDupSpans(t(s, d, "documents"), "doc_id", "text", width = 10)
          .orderBy(col("doc_id")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk
                      FROM documents),
        sp AS (SELECT doc_id, unnest(range(0, len(tk)//10)) AS i, tk
               FROM toks),
        sph AS (SELECT doc_id, i,
                       md5(array_to_string(
                         list_slice(tk, i*10+1, i*10+10), ' ')) AS h
                FROM sp),
        hot AS (SELECT h FROM sph GROUP BY h HAVING count(*) >= 2),
        drops AS (SELECT doc_id, list(i) AS dl, count(*) AS n_dropped
                  FROM sph JOIN hot USING (h) GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(t.tk) // 10 AS BIGINT) AS n_spans,
               CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
               coalesce(array_to_string(
                 flatten(list_transform(
                   list_filter(range(0, len(t.tk)//10),
                     i -> d.dl IS NULL OR NOT list_contains(d.dl, i)),
                   i -> list_slice(t.tk, i*10+1, i*10+10)))
                 || list_slice(t.tk, (len(t.tk)//10)*10+1, len(t.tk)),
                 ' '), '') AS clean_text
        FROM toks t LEFT JOIN drops d USING (doc_id)
        ORDER BY t.doc_id"""))),

    // ---- incrementally-maintained PQ index (the q94 signature-store
    //      pattern for ANN): crawl batch 1 trains the codebooks and
    //      bulk-loads its codes into a graft table, batch 2 UPSERTS its
    //      codes, search runs over the STORED codes (m bytes/vector,
    //      raw embeddings touched only for the exact re-rank). The
    //      oracle replays the batch-1-seeded codebooks over the union
    "q136_incremental_ann_index" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val b1 = emb.filter(col("vec_id") % 3 =!= 0)
        val b2 = emb.filter(col("vec_id") % 3 === 0)
        val cb = Similarity.pqInitCodebooks(b1, "vec_id", "embedding",
          m = 8, ksub = 16)
        val dir = freshDir()
        val tbl = graft.write.GraftTable.create(s, dir, graft.core.TableConfig(
          name = "pq_index", tableType = graft.core.TableType.COW,
          keyFields = Seq("vec_id"), targetFileRows = 500000))
        tbl.bulkInsert(b1.select(col("vec_id"),
          Similarity.pqCodes(col("embedding"), cb).as("codes")))
        tbl.upsert(b2.select(col("vec_id"),
          Similarity.pqCodes(col("embedding"), cb).as("codes")))
        val r = graft.read.GraftReader(tbl)
        val stored = r.dataOnly(r.snapshot()).select(col("vec_id"), col("codes"))
        Similarity.pqTopKFromCodes(stored, emb, emb.filter(col("vec_id") < 5),
            "vec_id", "codes", "embedding", k = 3, cb, rerank = 10)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        cbs AS (
          SELECT s, list(blk ORDER BY j) AS cb
          FROM (
            SELECT s, seed.vec_id AS j,
                   list_transform(range(1, 9), i -> seed.v[s*8 + i]) AS blk
            FROM (SELECT vec_id, v FROM e WHERE vec_id % 3 <> 0
                  ORDER BY vec_id LIMIT 16) seed,
                 (SELECT unnest(range(0, 8)) AS s))
          GROUP BY s),
        codes AS (
          SELECT vec_id, s,
                 CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS code
          FROM (
            SELECT e.vec_id, c.s,
                   list_transform(range(1, 17), j ->
                     list_sum(list_transform(range(1, 9), i ->
                       (e.v[c.s*8 + i] - c.cb[j][i])
                         * (e.v[c.s*8 + i] - c.cb[j][i])))) AS d
            FROM e, cbs c)),
        dec AS (
          SELECT vec_id, flatten(list(blk ORDER BY s)) AS dvec
          FROM (SELECT cd.vec_id, cd.s, c.cb[cd.code + 1] AS blk
                FROM codes cd JOIN cbs c ON c.s = cd.s)
          GROUP BY vec_id),
        nrm AS (
          SELECT vec_id, dvec,
                 sqrt(list_sum(list_transform(dvec, x -> x * x))) AS dnrm
          FROM dec),
        qn AS (
          SELECT vec_id AS q_id, v AS qv,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS qnrm
          FROM e WHERE vec_id < 5),
        adc AS (
          SELECT q.q_id, c.vec_id AS n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.dvec[i])) / (q.qnrm * c.dnrm) AS cos_adc
          FROM qn q JOIN nrm c ON c.vec_id <> q.q_id),
        short AS (
          SELECT q_id, n_id, cos_adc FROM (
            SELECT q_id, n_id, cos_adc,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_adc DESC, n_id) AS srnk
            FROM adc) WHERE srnk <= 10),
        ex AS (
          SELECT s.q_id, s.n_id, s.cos_adc,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * n.v[i]))
                   / (q.qnrm * sqrt(list_sum(list_transform(n.v,
                       x -> x * x)))) AS cos
          FROM short s
          JOIN qn q ON q.q_id = s.q_id
          JOIN e n ON n.vec_id = s.n_id)
        SELECT q_id, rnk, n_id, cos, cos_adc FROM (
          SELECT q_id, n_id, cos, cos_adc,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rnk
          FROM ex) WHERE rnk <= 3
        ORDER BY q_id, rnk"""))),

    // ---- interpolated bigram LM scoring (Jelinek-Mercer, the CCNet
    //      lm-score one order above q97's unigram): p = 0.75·p(w2|w1) +
    //      0.25·p_uni(w2), xent = mean -ln p over bigram positions
    "q137_bigram_xent" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.QualityModel.bigramXent(
            t(s, d, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk
                      FROM documents),
        uni AS (SELECT t AS tok, CAST(count(*) AS DOUBLE) AS c
                FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni),
        pp AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(tk)),
                        i -> tk[i])) AS w1,
                      unnest(list_transform(range(1, len(tk)),
                        i -> tk[i+1])) AS w2
               FROM toks),
        bi AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
               FROM pp GROUP BY 1, 2),
        scored AS (
          SELECT pp.doc_id,
                 0.75 * (bi.cb / u1.c) + 0.25 * (u2.c / t.total) AS p
          FROM pp
          JOIN bi ON bi.w1 = pp.w1 AND bi.w2 = pp.w2
          JOIN uni u1 ON u1.tok = pp.w1
          JOIN uni u2 ON u2.tok = pp.w2, tot t)
        SELECT doc_id, count(*) AS n_pairs,
               sum(-ln(p)) / count(*) AS xent
        FROM scored GROUP BY doc_id ORDER BY doc_id"""))),

    // ---- sequence packing: concatenate the corpus in doc_id order and
    //      cut the token stream into fixed 64-token training sequences,
    //      one row per (doc, sequence) overlap segment with the doc
    //      boundary offsets the trainer needs for attention-mask resets.
    //      The global token offsets come from the parallel prefix-sum
    //      (q87's machinery — no single global window); the oracle's
    //      plain cumsum window computes the same offsets exactly
    "q138_seq_packing" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Packing.packSequences(
            t(s, d, "documents"), col("text"), col("doc_id"), seqLen = 64)
          .select(col("doc_id"), col("n_tokens"), col("token_start"),
            col("seq_id"), col("seg_start"), col("tok_from"), col("tok_len"),
            col("seg_text"))
          .orderBy(col("doc_id"), col("seq_id")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        c AS (SELECT doc_id, tk,
                     CAST(len(tk) AS BIGINT) AS n_tokens,
                     CAST(sum(len(tk)) OVER (ORDER BY doc_id) - len(tk)
                          AS BIGINT) AS token_start
              FROM toks),
        seg AS (SELECT doc_id, tk, n_tokens, token_start,
                       unnest(range(token_start // 64,
                                    (token_start + n_tokens - 1) // 64 + 1))
                         AS seq_id
                FROM c),
        off AS (SELECT doc_id, tk, n_tokens, token_start, seq_id,
                       CAST(greatest(seq_id * 64 - token_start, 0)
                            AS BIGINT) AS tok_from,
                       CAST(greatest(token_start - seq_id * 64, 0)
                            AS BIGINT) AS seg_start,
                       CAST(least(token_start + n_tokens, (seq_id + 1) * 64)
                            - greatest(token_start, seq_id * 64)
                            AS BIGINT) AS tok_len
                FROM seg)
        SELECT doc_id, n_tokens, token_start, seq_id, seg_start, tok_from,
               tok_len,
               array_to_string(tk[tok_from + 1 : tok_from + tok_len], ' ')
                 AS seg_text
        FROM off ORDER BY doc_id, seq_id"""))),

    // ---- SemDeDup (Abbas et al. 2023): semantic dedup by clustering —
    //      coarse cells bound the pairwise work (the paper's design),
    //      within-cell cosine >= 0.45 drops everything but the min-id
    //      representative. Same threshold as q29, but duplicates are
    //      only found within a cell — the approximation the paper
    //      trades for the Σ|cell|² bound
    "q139_semdedup" -> ((
      (s: SparkSession, d: String) =>
        Similarity.semDedup(t(s, d, "embeddings"), "vec_id", "embedding",
            threshold = 0.45, cells = 16)
          .orderBy(col("vec_id")),
      Some("""
        WITH nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        cent AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
                 FROM nrm WHERE vec_id < 16),
        member AS (
          SELECT vec_id AS m_id, CAST(c_id AS BIGINT) AS cell FROM (
            SELECT n.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(range(1, 65),
                       i -> CAST(n.embedding[i] AS DOUBLE) * c.c_vec[i]))
                       / (n.nrm * c.c_nrm) DESC, c.c_id) AS rk
            FROM nrm n, cent c)
          WHERE rk = 1),
        dup AS (
          SELECT DISTINCT b.m_id
          FROM member a
          JOIN member b ON a.cell = b.cell AND a.m_id < b.m_id
          JOIN nrm va ON va.vec_id = a.m_id
          JOIN nrm vb ON vb.vec_id = b.m_id
          WHERE list_sum(list_transform(range(1, 65),
                  i -> CAST(va.embedding[i] AS DOUBLE) * vb.embedding[i]))
                  / (va.nrm * vb.nrm) >= 0.45)
        SELECT m.m_id AS vec_id, m.cell, d.m_id IS NULL AS kept
        FROM member m LEFT JOIN dup d ON d.m_id = m.m_id
        ORDER BY vec_id"""))),

    // ---- corpus profiling (the dataset-card stats pass): per-language
    //      doc counts, token totals, and exact interpolated percentiles.
    //      The oracle replays Spark's (n-1)·q percentile interpolation
    //      arithmetic term-for-term so the doubles hash-match
    "q141_corpus_profile" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Profiling.corpusProfile(
            t(s, d, "documents"), "lang", col("text"))
          .orderBy(col("lang")),
      Some("""
        WITH toks AS (SELECT lang, len(string_split(text, ' ')) AS n
                      FROM documents WHERE text IS NOT NULL),
        g AS (SELECT lang, count(*) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS total_tokens,
                     list(n ORDER BY n) AS l
              FROM toks GROUP BY lang),
        q AS (SELECT lang, n_docs, total_tokens, l,
                     unnest([0.25, 0.5, 0.9]) AS qq
              FROM g),
        p AS (SELECT lang, n_docs, total_tokens, qq,
                     (n_docs - 1) * qq AS pos,
                     l[CAST(floor((n_docs - 1) * qq) AS BIGINT) + 1] AS lo,
                     l[CAST(ceil((n_docs - 1) * qq) AS BIGINT) + 1] AS hi
              FROM q),
        v AS (SELECT lang, n_docs, total_tokens, qq,
                     CASE WHEN ceil(pos) = floor(pos) OR lo = hi
                          THEN CAST(lo AS DOUBLE)
                          ELSE (ceil(pos) - pos) * CAST(lo AS DOUBLE)
                               + (pos - floor(pos)) * CAST(hi AS DOUBLE)
                     END AS pv
              FROM p)
        SELECT lang, any_value(n_docs) AS n_docs,
               any_value(total_tokens) AS total_tokens,
               CAST(any_value(total_tokens) AS DOUBLE) / any_value(n_docs)
                 AS mean_tokens,
               max(CASE WHEN qq = 0.25 THEN pv END) AS p25,
               max(CASE WHEN qq = 0.5 THEN pv END) AS p50,
               max(CASE WHEN qq = 0.9 THEN pv END) AS p90
        FROM v GROUP BY lang ORDER BY lang"""))),

    // ---- n-gram novelty vs earlier docs (boilerplate / re-crawl
    //      signal): inverted-index min-doc aggregation, join output =
    //      index size exactly — linear at any corpus size, no doc-freq
    //      cap needed (nothing is quadratic in shingle frequency)
    "q142_novelty" -> ((
      (s: SparkSession, d: String) =>
        Dedup.noveltyScores(t(s, d, "documents"), "doc_id", "text", n = 3)
          .orderBy(col("doc_id")),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
          FROM toks)),
        firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
        SELECT sh.doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN f.first_doc < sh.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_seen,
               1.0 - CAST(sum(CASE WHEN f.first_doc < sh.doc_id
                                   THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                 AS novelty
        FROM sh JOIN firsts f ON f.s = sh.s
        GROUP BY sh.doc_id ORDER BY doc_id"""))),

    // ---- leakage-safe split: near-dup clusters are the assignment
    //      unit, so no near-duplicate pair crosses train/val/test — the
    //      eval-contamination guard. The gated output carries the
    //      cross-split violation count (must be 0) alongside the census
    "q143_leak_safe_split" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
          threshold = 0.7, maxDocFreq = None) // oracle is exact/uncapped
        val assigned = graft.llm.Mixing.leakSafeSplit(docs, "doc_id", pairs,
          splits = Seq("val" -> 200000L, "test" -> 200000L))
        val sp = assigned.select(col("doc_id"), col("split"))
        val viol = pairs.select(col("doc_a"), col("doc_b"))
          .join(sp.select(col("doc_id").as("doc_a"), col("split").as("_sa")),
            "doc_a")
          .join(sp.select(col("doc_id").as("doc_b"), col("split").as("_sb")),
            "doc_b")
          .filter(col("_sa") =!= col("_sb"))
          .agg(count(lit(1)).as("violations"))
        assigned.groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("component").isNotNull, 1L).otherwise(0L))
              .as("n_clustered"))
          .crossJoin(broadcast(viol))
          .orderBy(col("split"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM toks)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        cpairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        edges AS (
          SELECT doc_a, doc_b FROM cpairs
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.7),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          WITH RECURSIVE r(node, target) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s.dst FROM r JOIN sym s ON s.src = r.target)
          SELECT node, min(target) AS component FROM r GROUP BY node),
        assigned AS (
          SELECT d.doc_id, r.component,
                 CASE WHEN CAST('0x'||substr(md5('split:'||CAST(
                        coalesce(r.component, d.doc_id) AS VARCHAR)),1,15)
                        AS BIGINT) % 1000000 < 200000 THEN 'val'
                      WHEN CAST('0x'||substr(md5('split:'||CAST(
                        coalesce(r.component, d.doc_id) AS VARCHAR)),1,15)
                        AS BIGINT) % 1000000 < 400000 THEN 'test'
                      ELSE 'train' END AS split
          FROM documents d LEFT JOIN reach r ON r.node = d.doc_id),
        viol AS (
          SELECT count(*) AS violations
          FROM edges e JOIN assigned a ON a.doc_id = e.doc_a
                       JOIN assigned b ON b.doc_id = e.doc_b
          WHERE a.split <> b.split)
        SELECT split, count(*) AS n,
               CAST(sum(CASE WHEN component IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clustered,
               v.violations
        FROM assigned, viol v
        GROUP BY split, v.violations ORDER BY split"""))),

    // ---- BPE tokenizer apply: the top-6 adjacent pairs (the q100
    //      census) become a ranked merge table, applied greedily
    //      left-to-right per merge by the codegen'd BpeApply kernel.
    //      The oracle replays the scan as a recursive-CTE state machine
    //      (one row per (doc, merge, position) step) — exact greedy
    //      semantics, not a string-replace approximation
    "q144_bpe_encode" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
        val merges = TF.topPairs(docs, col("text"), 6)
        docs.select(col("doc_id"),
            size(TF.wsTokens(col("text"))).cast("long").as("n_before"),
            TF.bpeApply(TF.wsTokens(col("text")), merges).as("_enc"))
          .select(col("doc_id"), col("n_before"),
            size(col("_enc")).cast("long").as("n_after"),
            array_join(col("_enc"), " ").as("enc_text"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents WHERE text IS NOT NULL),
        pc AS (SELECT unnest(list_transform(range(1, len(tk)),
                 i -> tk[i]||' '||tk[i+1])) AS pair
               FROM toks),
        merges AS (
          SELECT row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rnk,
                 string_split(pair, ' ')[1] AS a,
                 string_split(pair, ' ')[2] AS b,
                 string_split(pair, ' ')[1] || string_split(pair, ' ')[2] AS mc
          FROM (SELECT pair, count(*) AS cnt FROM pc
                GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 6)),
        walk AS (
          WITH RECURSIVE r(doc_id, m, i, cur, "out") AS (
            SELECT doc_id, 1, 1, tk, CAST([] AS VARCHAR[]) FROM toks
            UNION ALL
            SELECT r.doc_id,
                   CASE WHEN r.i > len(r.cur) THEN r.m + 1 ELSE r.m END,
                   CASE WHEN r.i > len(r.cur) THEN 1
                        WHEN r.i < len(r.cur) AND r.cur[r.i] = mg.a
                             AND r.cur[r.i + 1] = mg.b THEN r.i + 2
                        ELSE r.i + 1 END,
                   CASE WHEN r.i > len(r.cur) THEN r."out" ELSE r.cur END,
                   CASE WHEN r.i > len(r.cur) THEN CAST([] AS VARCHAR[])
                        WHEN r.i < len(r.cur) AND r.cur[r.i] = mg.a
                             AND r.cur[r.i + 1] = mg.b
                          THEN list_append(r."out", mg.mc)
                        ELSE list_append(r."out", r.cur[r.i]) END
            FROM r JOIN merges mg ON mg.rnk = r.m)
          SELECT doc_id, cur AS enc FROM r WHERE m = 7)
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_before,
               CAST(len(w.enc) AS BIGINT) AS n_after,
               array_to_string(w.enc, ' ') AS enc_text
        FROM toks t JOIN walk w ON w.doc_id = t.doc_id
        ORDER BY t.doc_id"""))),

    // ---- ANN recall harness: recall@5 of the LSH path vs exact brute
    //      force, per query — the tuning loop for bands/planes. The
    //      oracle replays BOTH searches and the hit join exactly
    "q145_ann_recall" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val qs = emb.filter(col("vec_id") < 5)
        val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
        val approx = Similarity.lshAnn(emb, qs, "vec_id", "embedding", k = 5)
        Similarity.topKRecall(exact, approx).orderBy(col("q_id"))
      },
      Some("""
        WITH nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        ex AS (SELECT q_id, n_id FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                 row_number() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
                     / (a.nrm * b.nrm) DESC, b.vec_id) AS rnk
          FROM nrm a JOIN nrm b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
          WHERE rnk <= 5),
        g AS (
          SELECT p, list_transform(range(1, 65),
            i -> CAST(CAST('0x'||substr(md5(CAST(p AS VARCHAR)||':'||CAST(i AS VARCHAR)),1,15) AS BIGINT) % 2001 - 1000 AS DOUBLE)) AS plane
          FROM range(0, 16) r(p)),
        sigbits AS (
          SELECT e.vec_id, g.p,
                 CASE WHEN list_sum(list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) * g.plane[i])) > 0
                 THEN 1 ELSE 0 END AS bit
          FROM embeddings e, g),
        sig AS (SELECT vec_id, list(bit ORDER BY p) AS bits
                FROM sigbits GROUP BY vec_id),
        bands AS (
          SELECT vec_id, b,
                 CAST(bits[b*4+1] AS VARCHAR)||CAST(bits[b*4+2] AS VARCHAR)||
                 CAST(bits[b*4+3] AS VARCHAR)||CAST(bits[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT q.vec_id AS q_id, x.vec_id AS n_id
          FROM bands q JOIN bands x
            ON q.b = x.b AND q.bucket = x.bucket
               AND q.vec_id < 5 AND x.vec_id <> q.vec_id),
        scored AS (
          SELECT c.q_id, c.n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
                   / (a.nrm * b.nrm) AS cos
          FROM cand c JOIN nrm a ON a.vec_id = c.q_id
                      JOIN nrm b ON b.vec_id = c.n_id),
        ap AS (SELECT q_id, n_id FROM (
          SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id) AS rnk
          FROM scored) WHERE rnk <= 5)
        SELECT e.q_id, count(*) AS n_exact,
               CAST(sum(CASE WHEN ap.n_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN ap.n_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS recall
        FROM ex e LEFT JOIN ap ON ap.q_id = e.q_id AND ap.n_id = e.n_id
        GROUP BY e.q_id ORDER BY e.q_id"""))),

    // ---- per-host document caps (anti-domination / crawl politeness):
    //      at most 3 docs per planted URL host, hostless docs exempt.
    //      One rank window keyed by host; the census gates kept counts
    "q146_host_caps" -> ((
      (s: SparkSession, d: String) => {
        val planted = replace(replace(replace(replace(col("text"),
          lit(" line"), lit(" http://spark.apache.org/docs/latest ")),
          lit(" slow"), lit(" https://spark.apache.org/examples.html ")),
          lit(" big"), lit(" https://github.com/apache/spark ")),
          lit(" dup"), lit(" http://ads.tracker.example/pixel?id=1 "))
        val withHost = t(s, d, "documents").select(col("doc_id"),
          TF.urlHost(get(TF.extractUrls(planted), lit(0))).as("host"))
        graft.llm.Mixing.perKeyCap(withHost, col("host"), col("doc_id"), cap = 3)
          .groupBy(coalesce(col("host"), lit("(none)")).as("host"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("host"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
                 replace(replace(replace(replace(text,
                   ' line', ' http://spark.apache.org/docs/latest '),
                   ' slow', ' https://spark.apache.org/examples.html '),
                   ' big', ' https://github.com/apache/spark '),
                   ' dup', ' http://ads.tracker.example/pixel?id=1 ') AS t
          FROM documents),
        h AS (SELECT doc_id,
                     lower(regexp_extract(
                       (regexp_extract_all(t,
                         '(?i)https?://[^ \t\n\f\r\x0B]*[^ \t\n\f\r\x0B.,;:!?)\]''"]'))[1],
                       '(?i)^https?://([^/:?#]+)', 1)) AS host
              FROM p),
        r AS (SELECT doc_id, host,
                     row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk
              FROM h)
        SELECT coalesce(host, '(none)') AS host, count(*) AS n_docs,
               CAST(sum(CASE WHEN host IS NULL OR rk <= 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM r GROUP BY coalesce(host, '(none)') ORDER BY host"""))),

    // ---- OOV / vocabulary coverage vs the corpus top-50 tokens (the
    //      tokenizer-fit / domain-shift diagnostic): one broadcast
    //      vocab join, instance-level counts
    "q152_oov_rate" -> ((
      (s: SparkSession, d: String) =>
        TF.oovRates(t(s, d, "documents"), "doc_id", col("text"), k = 50)
          .orderBy(col("doc_id")),
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                     FROM documents),
        vocab AS (SELECT t FROM (
          SELECT t, count(*) AS c FROM tok GROUP BY t
          ORDER BY c DESC, t ASC LIMIT 50)),
        j AS (SELECT tok.doc_id,
                     CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
              FROM tok LEFT JOIN vocab v ON v.t = tok.t)
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               CAST(sum(oov) AS DOUBLE) / count(*) AS oov_rate
        FROM j GROUP BY doc_id ORDER BY doc_id"""))),

    // ---- media resize plumbing: the stub's nearest-neighbor byte-grid
    //      resample (payload as a row-major width×height image, wrapped
    //      for short payloads) replayed index-for-index in SQL — the
    //      dataflow (typed batches, stamped dims) is what is under gate;
    //      a real codec swaps in per-record only. packDocuments gives
    //      each doc w = id%64+16, h = id%48+16; target 16×8
    "q153_media_resize" -> ((
      (s: SparkSession, d: String) => {
        val media = Multimodal.packDocuments(
          t(s, d, "documents").filter(col("text").isNotNull))
        Multimodal.resizeStub(media, outW = 16, outH = 8).toDF()
          .select(col("media_id").as("doc_id"),
            col("width").cast("long").as("out_w"),
            col("height").cast("long").as("out_h"),
            decode(col("payload"), "UTF-8").as("resized_text"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CAST(16 AS BIGINT) AS out_w,
               CAST(8 AS BIGINT) AS out_h,
               array_to_string(list_transform(range(0, 128), k ->
                 substring(text,
                   CAST(((((k // 16) * (doc_id % 48 + 16) // 8)
                          * (doc_id % 64 + 16)
                          + ((k % 16) * (doc_id % 64 + 16) // 16))
                         % greatest(length(text), 1)) AS INT) + 1, 1)), '')
                 AS resized_text
        FROM documents WHERE text IS NOT NULL
        ORDER BY doc_id"""))),

    // ---- the refinery composition over the NEW family: repetition
    //      quality gate → near-dup clusters → leakage-safe split →
    //      sequence packing of the train split, one declarative plan.
    //      Each stage is individually gated (q77/q143/q138); this
    //      checks the composition like q102 does for the cleaning chain
    "q154_refinery_pipeline" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val kept = docs.filter(TF.repetitionKeep(TF.wsTokens(col("text"))))
        val pairs = Dedup.jaccardPairs(kept, "doc_id", "text", n = 3,
          threshold = 0.7, maxDocFreq = None) // oracle is exact/uncapped
        val assigned = graft.llm.Mixing.leakSafeSplit(kept, "doc_id", pairs,
          splits = Seq("val" -> 200000L, "test" -> 200000L))
        val packed = graft.llm.Packing.packSequences(
          assigned.filter(col("split") === "train"),
          col("text"), col("doc_id"), seqLen = 64)
        val splitCensus = assigned.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"))
        val packCensus = packed.agg(
          countDistinct(col("seq_id")).as("n_sequences"),
          sum(col("tok_len")).as("train_tokens"))
        splitCensus.crossJoin(broadcast(packCensus)).orderBy(col("split"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        top AS (
          SELECT doc_id, max(c) AS top_cnt FROM (
            SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
          GROUP BY doc_id),
        base AS (
          SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        grams AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i + 1]) AS g2
          FROM base),
        m AS (
          SELECT b.doc_id, b.text, b.tk, len(tk) AS n_tokens,
                 CASE WHEN len(tk) > 0
                      THEN 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
                      ELSE 0.0 END AS dtf,
                 CASE WHEN len(g.g2) > 0
                      THEN 1.0 - CAST(len(list_distinct(g.g2)) AS DOUBLE) / len(g.g2)
                      ELSE 0.0 END AS d2f,
                 t.top_cnt
          FROM base b
          JOIN grams g ON b.doc_id = g.doc_id
          JOIN top t ON b.doc_id = t.doc_id),
        kept AS (
          SELECT doc_id, text, tk, n_tokens FROM m
          WHERE dtf <= 0.85 AND d2f <= 0.65
            AND (n_tokens = 0 OR CAST(top_cnt AS DOUBLE) / n_tokens <= 0.30)),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM kept)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        cpairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        edges AS (
          SELECT doc_a, doc_b FROM cpairs
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.7),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          WITH RECURSIVE r(node, target) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.node, s.dst FROM r JOIN sym s ON s.src = r.target)
          SELECT node, min(target) AS component FROM r GROUP BY node),
        assigned AS (
          SELECT k.doc_id, k.n_tokens,
                 CASE WHEN CAST('0x'||substr(md5('split:'||CAST(
                        coalesce(r.component, k.doc_id) AS VARCHAR)),1,15)
                        AS BIGINT) % 1000000 < 200000 THEN 'val'
                      WHEN CAST('0x'||substr(md5('split:'||CAST(
                        coalesce(r.component, k.doc_id) AS VARCHAR)),1,15)
                        AS BIGINT) % 1000000 < 400000 THEN 'test'
                      ELSE 'train' END AS split
          FROM kept k LEFT JOIN reach r ON r.node = k.doc_id),
        census AS (SELECT split, count(*) AS n_docs
                   FROM assigned GROUP BY split),
        pk AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS train_tokens
               FROM assigned WHERE split = 'train')
        SELECT c.split, c.n_docs,
               CAST((p.train_tokens + 63) // 64 AS BIGINT) AS n_sequences,
               p.train_tokens
        FROM census c, pk p ORDER BY c.split"""))),

    // ---- BPE tokenizer TRAINING (Sennrich et al. 2016): the learn
    //      side of q144's apply. One corpus scan to the word-type
    //      histogram; the merge loop runs on the vocab-sized types
    //      table. Gated output = the learned merge table PLUS each
    //      step's post-merge weighted symbol count, so every
    //      intermediate state of the loop is hash-checked, not just
    //      the chosen pairs. The oracle replays all 6 steps as stacked
    //      CTEs (see bpeTrainOracle)
    "q157_bpe_train" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Tokenizer
          .bpeTrainDF(s, t(s, d, "documents"), col("text"), numMerges = 6)
          .orderBy(col("rnk")),
      Some(bpeTrainOracle(6)))),

    // ---- WordPiece training (Schuster & Nakajima 2012; the BERT
    //      tokenizer) — completes the tokenizer trio next to BPE (q157)
    //      and unigram-LM (q178). Same word-TYPE-histogram scale posture;
    //      the selection rule is the LIKELIHOOD score
    //      count(ab)/(count(a)·count(b)) over ##-marked symbols, gated
    //      per step with its score, merged token, and post-state corpus
    //      symbol count; the oracle replays all 6 steps as stacked CTEs
    //      with the same pair+unigram censuses and IEEE-double argmax
    "q190_wordpiece_train" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Tokenizer
          .wpTrainDF(s, t(s, d, "documents"), col("text"), numMerges = 6)
          .orderBy(col("rnk")),
      Some(wpTrainOracle(6)))),

    // ---- WordPiece greedy encoding: train on the ENGLISH slice, derive
    //      the vocab (initial ##-marked alphabet + merge products), then
    //      greedy longest-match-first encode EVERY document — non-English
    //      characters miss the vocab and fall back to [UNK], exercising
    //      BERT's unknown-word path. Spark side is a pure Catalyst fold
    //      per word (no UDF, no shuffle); the oracle precomputes the best
    //      match per (word type, position) and replays the walk as a
    //      recursive CTE, then maps word types back through each
    //      document's token sequence
    "q191_wordpiece_encode" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
        val en = docs.filter(col("lang") === "en")
        val merges = graft.llm.Tokenizer.wpTrain(en, col("text"), numMerges = 6)
        val vocab = graft.llm.Tokenizer.wpVocab(en, col("text"), merges)
        val maxLen = vocab.map { p =>
          val core = p.stripPrefix(graft.llm.Tokenizer.WpMark)
          core.codePointCount(0, core.length)
        }.max
        val vm = vocab.zipWithIndex.toMap
        val toks = filter(TF.wsTokens(col("text")), w => w =!= "")
        val unk = lit(graft.llm.Tokenizer.UnkToken)
        docs.select(col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            graft.llm.Tokenizer.wpEncode(col("text"), typedlit(vm), maxLen).as("_e"))
          .select(col("doc_id"), col("n_tokens"),
            size(col("_e")).cast("long").as("n_pieces"),
            size(filter(col("_e"), x => x === unk)).cast("long").as("n_unk"),
            array_join(col("_e"), " ").as("enc_text"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${wpTrainCtes(6, where = "AND lang = 'en'")},
        v AS (
          SELECT DISTINCT unnest(sym) AS piece FROM wt0
          UNION ${(1 to 6).map(i => s"SELECT mc FROM wb$i").mkString(" UNION ")}),
        ml AS (SELECT max(len(piece) -
                 CASE WHEN piece LIKE '##%' THEN 2 ELSE 0 END) AS l FROM v),
        toks AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS tk
                 FROM documents WHERE text IS NOT NULL),
        aw AS (SELECT DISTINCT unnest(tk) AS w FROM toks),
        wpos AS (SELECT w, unnest(range(0, len(w))) AS pos FROM aw),
        cand AS (
          SELECT p.w, p.pos, u.l,
                 CASE WHEN p.pos = 0 THEN substr(p.w, 1, u.l)
                      ELSE '##' || substr(p.w, p.pos + 1, u.l) END AS pc
          FROM wpos p, ml, unnest(range(1, ml.l + 1)) AS u(l)
          WHERE p.pos + u.l <= len(p.w)),
        best AS (
          SELECT c.w, c.pos, max(struct_pack(l := c.l, pc := c.pc)) AS m
          FROM cand c JOIN v ON v.piece = c.pc
          GROUP BY c.w, c.pos),
        walk AS (
          WITH RECURSIVE r(w, pos, pieces, failed) AS (
            SELECT w, 0, CAST([] AS VARCHAR[]), FALSE FROM aw
            UNION ALL
            SELECT r.w,
                   CASE WHEN b.m IS NULL THEN len(r.w)
                        ELSE r.pos + struct_extract(b.m, 'l') END,
                   CASE WHEN b.m IS NULL THEN ['[UNK]']
                        ELSE list_append(r.pieces, struct_extract(b.m, 'pc')) END,
                   b.m IS NULL
            FROM r LEFT JOIN best b ON b.w = r.w AND b.pos = r.pos
            WHERE r.pos < len(r.w) AND NOT r.failed)
          SELECT w, pieces FROM r WHERE pos >= len(w)),
        dt AS (SELECT doc_id, u.j, tk[u.j] AS t
               FROM toks, unnest(range(1, len(tk)+1)) AS u(j)),
        de AS (SELECT dt.doc_id, dt.j, wk.pieces
               FROM dt JOIN walk wk ON wk.w = dt.t),
        agg AS (SELECT doc_id, flatten(list(pieces ORDER BY j)) AS enc
                FROM de GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CAST(coalesce(len(a.enc), 0) AS BIGINT) AS n_pieces,
               CAST(coalesce(len(list_filter(a.enc, x -> x = '[UNK]')), 0)
                 AS BIGINT) AS n_unk,
               coalesce(array_to_string(a.enc, ' '), '') AS enc_text
        FROM toks t LEFT JOIN agg a USING (doc_id)
        ORDER BY t.doc_id"""))),

    // ---- DSIR importance resampling (Xie et al. 2023): hashed
    //      unigram+bigram log importance ratios (target = the English
    //      slice) scored per-row against a 256-bucket literal table —
    //      no join and no shuffle on the scoring pass — then
    //      Gumbel-top-50 sampling without replacement via the md5
    //      uniform. The oracle replays the hashing, the smoothing,
    //      the fold and the Gumbel arithmetic exactly
    "q158_dsir_resample" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        graft.llm.Selection
          .dsirResample(docs, docs.filter(col("lang") === "en"),
            "doc_id", col("text"), n = 50, dim = 256, salt = "dsir0")
          .orderBy(col("samp_key").desc, col("doc_id"))
      },
      Some("""
        WITH gl AS (
          SELECT doc_id,
                 list_concat(tk, list_transform(range(1, len(tk)),
                   i -> tk[i]||' '||tk[i+1])) AS g
          FROM (SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents WHERE text IS NOT NULL)),
        bl AS (
          SELECT doc_id,
                 list_transform(g, x ->
                   CAST(CAST('0x'||substr(md5(x),1,15) AS BIGINT) % 256 AS INT)) AS bl
          FROM gl),
        tcnt AS (
          SELECT b, count(*) AS c
          FROM (SELECT unnest(bl.bl) AS b FROM bl JOIN documents USING (doc_id)
                WHERE documents.lang = 'en')
          GROUP BY b),
        rcnt AS (SELECT b, count(*) AS c
                 FROM (SELECT unnest(bl) AS b FROM bl) GROUP BY b),
        tt AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS s FROM tcnt),
        rt AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS s FROM rcnt),
        lam AS (
          SELECT r.b,
                 ln((coalesce(t.c, 0) + 1.0) / (tt.s + 256.0))
                   - ln((coalesce(rr.c, 0) + 1.0) / (rt.s + 256.0)) AS l
          FROM range(0, 256) r(b)
          LEFT JOIN tcnt t ON t.b = r.b
          LEFT JOIN rcnt rr ON rr.b = r.b, tt, rt),
        ll AS (SELECT list(l ORDER BY b) AS v FROM lam),
        scored AS (
          SELECT bl.doc_id,
                 CAST(len(bl.bl) AS BIGINT) AS n_grams,
                 coalesce(list_sum(list_transform(bl.bl, x -> ll.v[x + 1])), 0.0)
                   AS log_weight
          FROM bl, ll)
        SELECT doc_id, n_grams, log_weight,
               log_weight - ln(-ln((CAST('0x'||substr(md5('dsir0:'||
                   CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) % 1000000 + 0.5)
                   / 1000000.0)) AS samp_key
        FROM scored
        ORDER BY samp_key DESC, doc_id LIMIT 50"""))),

    // ---- corpus-level line dedup (RefinedWeb/CCNet boilerplate pass,
    //      the cross-document complement of q128): two trigger words
    //      plant the SAME banner line across many docs, ' line' makes
    //      multi-line pages; any line whose hash shows up in >= 2
    //      distinct docs is removed from every carrier. Line text never
    //      crosses an exchange — the index is (id, hash60) pairs
    "q159_corpus_line_dedup" -> ((
      (s: SparkSession, d: String) => {
        val page = replace(replace(replace(col("text"),
          lit(" dup"), lit("\nSubscribe to our newsletter\n")),
          lit(" big"), lit("\nSubscribe to our newsletter\n")),
          lit(" line"), lit("\n"))
        graft.llm.Dedup
          .corpusLineDedup(
            t(s, d, "documents").select(col("doc_id"), page.as("text")),
            "doc_id", col("text"), minDocs = 2)
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
                 replace(replace(replace(text,
                   ' dup', chr(10) || 'Subscribe to our newsletter' || chr(10)),
                   ' big', chr(10) || 'Subscribe to our newsletter' || chr(10)),
                   ' line', chr(10)) AS t
          FROM documents WHERE text IS NOT NULL),
        l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM p),
        e AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(list_filter(ls, x -> x <> ''),
                       x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS lh
              FROM l),
        f AS (SELECT lh FROM e GROUP BY lh HAVING count(*) >= 2),
        rmv AS (SELECT e.doc_id, list(e.lh) AS rm
                FROM e JOIN f USING (lh) GROUP BY e.doc_id),
        c AS (
          SELECT l.doc_id, l.ls,
                 list_filter(l.ls, x -> x = '' OR NOT list_contains(
                   coalesce(rmv.rm, []),
                   CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS kept
          FROM l LEFT JOIN rmv USING (doc_id))
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(ls) - len(kept) AS BIGINT) AS n_removed,
               coalesce(array_to_string(kept, chr(10)), '') AS cleaned
        FROM c ORDER BY doc_id"""))),

    // ---- fastText-style quality classifier (the CCNet/LLaMA
    //      "looks-like-a-reference-page" filter): Naive Bayes log-odds
    //      over hashed unigram+bigram buckets, trained on labeled
    //      slices (pos = English docs, neg = the rest), scored per-row
    //      against a 256-entry literal table — no join, no shuffle on
    //      the scoring pass. pred_pos = score >= 0 keeps the gate free
    //      of cross-engine exp()
    "q160_nb_quality_classifier" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        graft.llm.Selection
          .nbScore(docs,
            docs.filter(col("lang") === "en"),
            docs.filter(col("lang") =!= "en"),
            "doc_id", col("text"), dim = 256)
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH gl AS (
          SELECT doc_id,
                 list_concat(tk, list_transform(range(1, len(tk)),
                   i -> tk[i]||' '||tk[i+1])) AS g
          FROM (SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents WHERE text IS NOT NULL)),
        bl AS (
          SELECT doc_id,
                 list_transform(g, x ->
                   CAST(CAST('0x'||substr(md5(x),1,15) AS BIGINT) % 256 AS INT)) AS bl
          FROM gl),
        pcnt AS (
          SELECT b, count(*) AS c
          FROM (SELECT unnest(bl.bl) AS b FROM bl JOIN documents USING (doc_id)
                WHERE documents.lang = 'en')
          GROUP BY b),
        ncnt AS (
          SELECT b, count(*) AS c
          FROM (SELECT unnest(bl.bl) AS b FROM bl JOIN documents USING (doc_id)
                WHERE documents.lang <> 'en')
          GROUP BY b),
        tp AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS s FROM pcnt),
        tn AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS s FROM ncnt),
        lam AS (
          SELECT r.b,
                 ln((coalesce(p.c, 0) + 1.0) / (tp.s + 256.0))
                   - ln((coalesce(nn.c, 0) + 1.0) / (tn.s + 256.0)) AS l
          FROM range(0, 256) r(b)
          LEFT JOIN pcnt p ON p.b = r.b
          LEFT JOIN ncnt nn ON nn.b = r.b, tp, tn),
        ll AS (SELECT list(l ORDER BY b) AS v FROM lam),
        pri AS (
          SELECT ln(((SELECT count(*) FROM documents
                      WHERE lang = 'en' AND text IS NOT NULL) + 1.0)
                  / ((SELECT count(*) FROM documents
                      WHERE lang <> 'en' AND text IS NOT NULL) + 1.0)) AS p)
        SELECT bl.doc_id,
               CAST(len(bl.bl) AS BIGINT) AS n_grams,
               pri.p + coalesce(list_sum(list_transform(bl.bl, x -> ll.v[x + 1])),
                 0.0) AS score,
               pri.p + coalesce(list_sum(list_transform(bl.bl, x -> ll.v[x + 1])),
                 0.0) >= 0.0 AS pred_pos
        FROM bl, ll, pri
        ORDER BY bl.doc_id"""))),

    // ---- tf-idf keyword extraction: top-3 most characteristic terms
    //      per doc. tf is the BM25 inverted index's aggregation; df
    //      joins back term-keyed (index-sized); the top-k window
    //      partitions by doc — nothing corpus-quadratic
    "q161_tfidf_keywords" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Retrieval
          .tfidfKeywords(t(s, d, "documents"), "doc_id", "text", k = 3)
          .orderBy(col("doc_id"), col("rnk")),
      Some("""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents WHERE text IS NOT NULL),
        tf AS (SELECT doc_id, w AS term, count(*) AS tf
               FROM (SELECT doc_id, unnest(t) AS w FROM tk) GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tk),
        sc AS (SELECT doc_id, term, tf,
                      CAST(tf AS DOUBLE) * ln((n.n + 1.0) / (df + 1.0)) AS tfidf
               FROM tf JOIN dfq USING (term), n),
        r AS (SELECT *, row_number() OVER
                (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
              FROM sc)
        SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
               CAST(tf AS BIGINT) AS tf, tfidf
        FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"""))),

    // ---- BPE train -> encode composition: merges LEARNED from the
    //      corpus (q157's loop) applied back to the corpus via the
    //      codegen'd kernel — the full tokenizer lifecycle under one
    //      hash gate. The oracle composes the train CTE chain with six
    //      gaps-and-islands greedy passes over each doc's flattened
    //      char-symbol stream — the same validated machinery the train
    //      side uses, partitioned by doc instead of word type (linear,
    //      unlike q144's recursive walk, which is O(len^2) per doc from
    //      list copying). Flattened == per-word because no merge can
    //      cross the </w> mark — TokenizerSpec proves it
    "q162_bpe_train_encode" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
        val merges = graft.llm.Tokenizer
          .bpeTrain(docs, col("text"), numMerges = 6).map(m => (m.a, m.b))
        val stream = flatten(transform(TF.wsTokens(col("text")),
          w => graft.llm.Tokenizer.charSymbols(w)))
        val enc = graft.llm.Tokenizer.bpeEncode(col("text"), merges)
        docs.select(col("doc_id"),
            size(stream).cast("long").as("n_before"),
            size(enc).cast("long").as("n_after"),
            (size(stream).cast("double") / size(enc)).as("compression"),
            array_join(enc, " ").as("enc_text"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${bpeTrainCtes(6)},
        d0 AS MATERIALIZED (
          SELECT doc_id,
                 flatten(list_transform(string_split(text, ' '),
                   w -> list_append(regexp_extract_all(w, '(?s).'), '</w>')))
                   AS sym
          FROM documents WHERE text IS NOT NULL),
        ${(1 to 6).map(i => s"""
        du$i AS (
          SELECT d.doc_id, u.j, d.sym[u.j] AS s,
                 coalesce(d.sym[u.j] = mb.a AND d.sym[u.j+1] = mb.b, FALSE)
                   AS m
          FROM d${i - 1} d, b$i mb, unnest(range(1, len(d.sym)+1)) AS u(j)),
        dg$i AS (
          SELECT *, j - row_number() OVER (PARTITION BY doc_id, m ORDER BY j)
                   AS isl
          FROM du$i),
        dh$i AS (
          SELECT *, m AND (row_number() OVER
                   (PARTITION BY doc_id, m, isl ORDER BY j) % 2 = 1) AS take
          FROM dg$i),
        dr$i AS (
          SELECT *, coalesce(lag(take) OVER
                   (PARTITION BY doc_id ORDER BY j), FALSE) AS consumed,
                 lead(s) OVER (PARTITION BY doc_id ORDER BY j) AS nxt
          FROM dh$i),
        d$i AS MATERIALIZED (
          SELECT doc_id,
                 list(CASE WHEN take THEN s || nxt ELSE s END ORDER BY j)
                   AS sym
          FROM dr$i WHERE NOT consumed GROUP BY doc_id)""").mkString(",\n")}
        SELECT s.doc_id,
               CAST(len(s.sym) AS BIGINT) AS n_before,
               CAST(len(d6.sym) AS BIGINT) AS n_after,
               CAST(len(s.sym) AS DOUBLE) / len(d6.sym) AS compression,
               array_to_string(d6.sym, ' ') AS enc_text
        FROM d0 s JOIN d6 USING (doc_id)
        ORDER BY s.doc_id"""))),

    // ---- directed containment dedup (Broder's asymmetric resemblance):
    //      12-token excerpt pages are planted for the first 50 docs;
    //      each is FULLY contained in its original (containment 1.0)
    //      while its Jaccard vs the original is near zero — the
    //      quote/aggregator case symmetric dedup misses. Exact
    //      semantics here, so maxDocFreq pins None (capped path is
    //      separately tested in LlmSpec)
    "q163_containment_pairs" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
        val quotes = docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000).as("doc_id"),
            array_join(slice(TF.wsTokens(col("text")), 1, 12), " ").as("text"))
        val corp = docs.select(col("doc_id"), col("text")).unionByName(quotes)
        graft.llm.Dedup
          .containmentPairs(corp, "doc_id", "text", n = 3,
            threshold = 0.6, maxDocFreq = None)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH corp AS (
          SELECT doc_id, text FROM documents WHERE text IS NOT NULL
          UNION ALL
          SELECT doc_id + 100000,
                 array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ')
          FROM documents WHERE text IS NOT NULL AND doc_id < 50),
        tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM corp),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, array_to_string(list_slice(t, j, j + 2), ' ') AS s
          FROM tk, unnest(range(1, len(t) - 1)) AS u(j)
          WHERE len(t) >= 3)),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        cm AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        cs AS (
          SELECT cm.ida, cm.idb, cm.common,
                 za.n_sh AS na, zb.n_sh AS nb
          FROM cm JOIN sz za ON za.doc_id = cm.ida
                  JOIN sz zb ON zb.doc_id = cm.idb),
        u AS (
          SELECT ida AS doc_a, idb AS doc_b, common,
                 CAST(common AS DOUBLE) / na AS containment FROM cs
          UNION ALL
          SELECT idb, ida, common,
                 CAST(common AS DOUBLE) / nb FROM cs)
        SELECT doc_a, doc_b, common, containment
        FROM u WHERE containment >= 0.6
        ORDER BY doc_a, doc_b"""))),

    // ---- hybrid retrieval: BM25 keyword top-10 and exact-cosine dense
    //      top-10 fused by reciprocal-rank fusion — rank-only, so the
    //      two scoring scales never need calibration. The oracle
    //      replays both searches AND the list-ordered fusion fold
    "q164_hybrid_rrf" -> ((
      (s: SparkSession, d: String) => {
        import s.implicits._
        val queries = Seq(
          (0L, Seq("spark", "merge")),
          (1L, Seq("window", "filter")),
          (2L, Seq("customer", "vector"))).toDF("q_id", "terms")
        val sparse = graft.llm.Retrieval.bm25TopK(
          t(s, d, "documents"), "doc_id", "text", queries, k = 10)
        val emb = t(s, d, "embeddings")
        val dense = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 10)
          .withColumnRenamed("n_id", "doc_id")
        graft.llm.Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        d AS (SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS dl FROM toks),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                         CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
                  FROM toks),
        tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
               FROM (SELECT doc_id, dl, unnest(tk) AS term FROM d)
               GROUP BY 1, 2, 3),
        dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
                  GROUP BY 1),
        q(q_id, term) AS (VALUES
          (0, 'spark'), (0, 'merge'),
          (1, 'window'), (1, 'filter'),
          (2, 'customer'), (2, 'vector')),
        contrib AS (
          SELECT q.q_id, tf.doc_id, tf.term,
                 ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)) AS c
          FROM tf
          JOIN q ON q.term = tf.term
          JOIN dfreq ON dfreq.term = tf.term, stats s),
        bscored AS (
          SELECT q_id, doc_id,
                 list_sum(list_transform(
                   list_sort(list(struct_pack(term := term, c := c))),
                   x -> x.c)) AS score
          FROM contrib GROUP BY 1, 2),
        sparse AS (
          SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, rnk FROM (
            SELECT q_id, doc_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY score DESC, doc_id) AS rnk
            FROM bscored)
          WHERE rnk <= 10),
        nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        dscored AS (
          SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
                 list_sum(list_transform(range(1,65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * c.embedding[i]))
                   / (q.nrm * c.nrm) AS cos
          FROM nrm q JOIN nrm c ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
        dense AS (
          SELECT q_id, doc_id, rnk FROM (
            SELECT q_id, doc_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, doc_id) AS rnk
            FROM dscored)
          WHERE rnk <= 10),
        fused AS (
          SELECT q_id, doc_id, 0 AS li, 1.0 / (60.0 + rnk) AS c FROM sparse
          UNION ALL
          SELECT q_id, doc_id, 1 AS li, 1.0 / (60.0 + rnk) AS c FROM dense),
        rscored AS (
          SELECT q_id, doc_id,
                 list_sum(list_transform(
                   list_sort(list(struct_pack(li := li, c := c))),
                   x -> x.c)) AS rrf
          FROM fused GROUP BY 1, 2)
        SELECT q_id, rnk, doc_id, rrf FROM (
          SELECT q_id, doc_id, rrf,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY rrf DESC, doc_id) AS rnk
          FROM rscored)
        WHERE rnk <= 10 ORDER BY q_id, rnk"""))),

    // ---- cluster-balanced sampling: semantic cells capped at 3 docs
    //      each, picked in salted-md5 order — the embedding-space
    //      anti-domination pass (q146's per-host cap in vector space)
    "q165_cluster_sample" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Selection.clusterBalancedSample(
            t(s, d, "embeddings"), "vec_id", "embedding",
            cells = 16, perCell = 3)
          .orderBy(col("vec_id")),
      Some("""
        WITH nrm AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * x))) AS nrm
          FROM embeddings),
        cent AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
                 FROM nrm WHERE vec_id < 16),
        member AS (
          SELECT vec_id AS m_id, CAST(c_id AS BIGINT) AS cell FROM (
            SELECT n.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY n.vec_id ORDER BY
                     list_sum(list_transform(range(1, 65),
                       i -> CAST(n.embedding[i] AS DOUBLE) * c.c_vec[i]))
                       / (n.nrm * c.c_nrm) DESC, c.c_id) AS rk
            FROM nrm n, cent c)
          WHERE rk = 1),
        b AS (
          SELECT m_id, cell,
                 CAST('0x'||substr(md5('cbs:'||CAST(m_id AS VARCHAR)),1,15)
                   AS BIGINT) % 1000000 AS bk
          FROM member)
        SELECT m_id AS vec_id, cell, rk, rk <= 3 AS picked FROM (
          SELECT m_id, cell,
                 row_number() OVER (PARTITION BY cell ORDER BY bk, m_id) AS rk
          FROM b)
        ORDER BY vec_id"""))),

    // ---- sign random projection (Johnson–Lindenstrauss): 64 -> 16
    //      dims with a deterministic md5-derived ±1 matrix; pure
    //      per-row fold math, and the oracle replays every product and
    //      the fold order bit-for-bit
    "q166_rp_reduce" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "embeddings")
          .select(col("vec_id"),
            posexplode(Similarity.rpReduce(
              col("embedding"), dims = 64, outDim = 16)).as(Seq("j", "x")))
          .orderBy(col("vec_id"), col("j")),
      Some("""
        SELECT vec_id, CAST(j AS INTEGER) AS j,
               list_sum(list_transform(range(1, 65), i ->
                 CAST(embedding[i] AS DOUBLE) *
                 CAST((CAST('0x'||substr(md5('rp:'||CAST(j AS VARCHAR)||':'
                   ||CAST(i AS VARCHAR)),1,15) AS BIGINT) % 2) * 2 - 1
                   AS DOUBLE)))
               / sqrt(16.0) AS x
        FROM embeddings, range(0, 16) r(j)
        ORDER BY vec_id, j"""))),

    // ---- URL-level dedup: four link-decoration variants per page
    //      (utm param / fragment / www + trailing slash / port + leading
    //      tracker) collapse to one canonical fetch; the oracle replays
    //      the whole canonicalization regex chain
    "q167_url_dedup" -> ((
      (s: SparkSession, d: String) => {
        val m = pmod(col("doc_id"), lit(4))
        val page = floor(col("doc_id") / 4).cast("long").cast("string")
        val url = when(m === 0,
            concat(lit("https://Example.com/Page/"), page, lit("?utm_source=feed")))
          .when(m === 1, concat(lit("https://example.com/Page/"), page, lit("#top")))
          .when(m === 2, concat(lit("https://www.example.com/Page/"), page, lit("/")))
          .otherwise(concat(lit("http://Other.org:80/q"),
            pmod(col("doc_id"), lit(7)).cast("string"),
            lit("?fbclid=track123&x=1")))
        graft.llm.Dedup.urlDedup(
            t(s, d, "documents").select(col("doc_id"), url.as("url")),
            "doc_id", col("url"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
                 CASE doc_id % 4
                   WHEN 0 THEN 'https://Example.com/Page/'
                     || CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed'
                   WHEN 1 THEN 'https://example.com/Page/'
                     || CAST(doc_id // 4 AS VARCHAR) || '#top'
                   WHEN 2 THEN 'https://www.example.com/Page/'
                     || CAST(doc_id // 4 AS VARCHAR) || '/'
                   ELSE 'http://Other.org:80/q'
                     || CAST(doc_id % 7 AS VARCHAR) || '?fbclid=track123&x=1'
                 END AS url
          FROM documents),
        s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS x FROM u),
        s2 AS (SELECT doc_id, regexp_replace(x,
                 '(?i)&(utm_[a-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g') AS x
               FROM s1),
        s3 AS (SELECT doc_id, regexp_replace(x,
                 '(?i)\?(utm_[a-z0-9_]*|fbclid|gclid)=[^&]*&', '?') AS x
               FROM s2),
        s4 AS (SELECT doc_id, regexp_replace(x,
                 '(?i)\?(utm_[a-z0-9_]*|fbclid|gclid)=[^&]*$', '') AS x
               FROM s3),
        s5 AS (SELECT doc_id, x,
                 lower(regexp_extract(x, '(?i)^https?://[^/?#]*', 0)) AS pfx,
                 regexp_replace(x, '(?i)^https?://[^/?#]*', '') AS rest
               FROM s4),
        s6 AS (SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(pfx,
                   '^(http://[^/:?#]+):80$', '\1'),
                   '^(https://[^/:?#]+):443$', '\1'),
                   '^(https?)://www\.', '\1://') || rest AS y
               FROM s5),
        canon AS (SELECT doc_id,
                    regexp_replace(y, '[/?]+$', '') AS canon_url
                  FROM s6),
        g AS (SELECT canon_url, min(doc_id) AS canonical_id,
                     count(*) AS n_dups
              FROM canon GROUP BY 1)
        SELECT c.doc_id, c.canon_url, g.canonical_id, g.n_dups,
               c.doc_id = g.canonical_id AS is_canonical
        FROM canon c JOIN g USING (canon_url)
        ORDER BY c.doc_id"""))),

    // ---- dataset-card vocabulary table: Zipf-ranked top-25 tokens
    //      with occurrence + document counts (TakeOrdered, never a
    //      global sort; the rank window sees 25 rows)
    "q168_token_profile" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Profiling.tokenProfile(
            t(s, d, "documents"), "doc_id", col("text"), k = 25)
          .orderBy(col("rnk")),
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE text IS NOT NULL),
        c AS (SELECT token, count(*) AS n_occ,
                     count(DISTINCT doc_id) AS n_docs
              FROM toks WHERE token <> '' GROUP BY 1)
        SELECT rnk, token, n_occ, n_docs FROM (
          SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, token ASC)
                   AS BIGINT) AS rnk,
                 token, n_occ, n_docs
          FROM c)
        WHERE rnk <= 25 ORDER BY rnk"""))),

    // ---- per-label mean-pooled centroids (class prototypes), exact
    //      mode: the per-(group,dim) sum folds in (id, value) sorted
    //      order so the float mean is bit-stable across engines; the
    //      production mode is the same plan with a plain hash-agg avg
    "q170_group_centroids" -> ((
      (s: SparkSession, d: String) =>
        Similarity.groupCentroids(
            t(s, d, "embeddings"), "vec_id", "embedding", "label",
            exact = true)
          .orderBy(col("label"), col("j")),
      Some("""
        WITH e AS (
          SELECT label, vec_id, CAST(j AS BIGINT) - 1 AS j,
                 CAST(embedding[CAST(j AS INTEGER)] AS DOUBLE) AS x
          FROM embeddings, range(1, 65) r(j))
        SELECT label, j, CAST(count(*) AS BIGINT) AS n,
               list_sum(list_transform(
                 list_sort(list(struct_pack(id := vec_id, x := x))),
                 s -> s.x)) / count(*) AS c
        FROM e GROUP BY label, j ORDER BY label, j"""))),

    // ---- distribution-shift audit: KL(P_source || P_corpus) over the
    //      corpus top-64 tokens with add-one smoothing — one census
    //      pass, vocabulary-rank-ordered fold, bit-replayed term by term
    "q171_token_kl_shift" -> ((
      (s: SparkSession, d: String) =>
        graft.llm.Profiling.tokenKlShift(
            t(s, d, "documents"), "source", col("text"), vocabK = 64)
          .orderBy(col("source")),
      Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE text IS NOT NULL),
        gt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
               FROM toks WHERE token <> '' GROUP BY 1, 2),
        corp AS (SELECT token, CAST(sum(c) AS BIGINT) AS gc FROM gt GROUP BY 1),
        vocab AS (
          SELECT token, gc, rnk FROM (
            SELECT token, gc,
                   row_number() OVER (ORDER BY gc DESC, token ASC) AS rnk
            FROM corp)
          WHERE rnk <= 64),
        tot AS (SELECT CAST(sum(gc) AS DOUBLE) AS n_all,
                       CAST(count(*) AS DOUBLE) AS v FROM vocab),
        grid AS (
          SELECT g.source, v.token, v.gc, v.rnk, COALESCE(gt.c, 0) AS c
          FROM (SELECT DISTINCT source FROM gt) g
          CROSS JOIN vocab v
          LEFT JOIN gt ON gt.source = g.source AND gt.token = v.token),
        pg AS (
          SELECT source, CAST(sum(c) AS BIGINT) AS n_g,
                 list(struct_pack(rnk := rnk, c := c, gc := gc)) AS terms
          FROM grid GROUP BY source)
        SELECT source, n_g AS n_tokens,
               list_sum(list_transform(list_sort(terms), s ->
                 ((CAST(s.c AS DOUBLE) + 1.0) / (CAST(n_g AS DOUBLE) + t.v))
                 * ln(((CAST(s.c AS DOUBLE) + 1.0) / (CAST(n_g AS DOUBLE) + t.v))
                      / ((CAST(s.gc AS DOUBLE) + 1.0) / (t.n_all + t.v))))) AS kl
        FROM pg, tot t ORDER BY source"""))),

    // ---- hard-negative mining: planted exact copies of each query
    //      (scaled ×2, cosine exactly 1.0) MUST be excluded by the
    //      near-dup gate before the rank window; the top-10 survivors
    //      are the contrastive-training negatives
    "q172_hard_negatives" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val planted = emb.filter(col("vec_id") < 4)
          .select((col("vec_id") + 1000).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        Similarity.hardNegatives(
            emb.select("vec_id", "embedding").unionByName(planted),
            emb.filter(col("vec_id") < 4), "vec_id", "embedding",
            k = 10, maxCos = 0.999)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000,
                 list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
          FROM embeddings WHERE vec_id < 4),
        nc AS (SELECT vec_id, embedding,
                      sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * x))) AS nrm
               FROM corpus),
        nq AS (SELECT vec_id, embedding,
                      sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * x))) AS nrm
               FROM embeddings WHERE vec_id < 4),
        sc AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(q.embedding[i] AS DOUBLE) * c.embedding[i]))
                   / (q.nrm * c.nrm) AS cos
          FROM nq q JOIN nc c ON c.vec_id <> q.vec_id)
        SELECT q_id, rnk, n_id, cos FROM (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rnk
          FROM sc WHERE cos < 0.999)
        WHERE rnk <= 10 ORDER BY q_id, rnk"""))),

    // ---- LSH-bucketed decontamination: benchmark docs (exact copies
    //      at doc_id%50=7, first-half excerpts at %50=23) probe the
    //      corpus signature store new-vs-all style; flagged corpus docs
    //      carry their worst benchmark match by minhash-estimated
    //      Jaccard. The oracle replays signatures, banding, the
    //      bench-side probe, and the worst-match window
    "q173_lsh_decontam" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val tk = graft.llm.TextFunctions.wsTokens(col("text"))
        val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 7)
          .select(col("doc_id"), col("text"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(50)) === 23)
            .select(col("doc_id"),
              array_join(slice(tk, lit(1), (size(tk) / 2).cast("int")), " ")
                .as("text")))
        graft.llm.Contamination.lshContaminatedDocs(
            docs, bench, "doc_id", "text", n = 3, k = 16, bands = 4,
            minEst = 0.5)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH bench AS (
          SELECT doc_id AS bid, text FROM documents WHERE doc_id % 50 = 7
          UNION ALL
          SELECT doc_id, array_to_string(list_slice(
                   string_split(text, ' '), 1,
                   len(string_split(text, ' ')) // 2), ' ')
          FROM documents WHERE doc_id % 50 = 23),
        uni AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents
          UNION ALL
          SELECT -bid - 1, string_split(text, ' ') FROM bench),
        sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])) AS s FROM uni)),
        mh AS (
          SELECT doc_id, i,
                 min((a * (CAST('0x'||substr(md5(s),1,15) AS BIGINT) % ${Dedup.MinhashPrime})
                      + b) % ${Dedup.MinhashPrime}) AS h
          FROM sh, (VALUES ${Dedup.minhashParamsSql(16)}) params(i, a, b)
          GROUP BY doc_id, i),
        sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, b,
                 CAST(sig[b*4+1] AS VARCHAR)||','||CAST(sig[b*4+2] AS VARCHAR)||','||
                 CAST(sig[b*4+3] AS VARCHAR)||','||CAST(sig[b*4+4] AS VARCHAR) AS bucket
          FROM sig, range(0, 4) r(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS bench_key, b.doc_id AS doc_id
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bucket = b.bucket
               AND a.doc_id < 0 AND b.doc_id >= 0),
        scored AS (
          SELECT c.doc_id, -c.bench_key - 1 AS bench_id,
                 CAST(len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS n_match,
                 len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) / 16.0 AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.bench_key
          JOIN sig sb ON sb.doc_id = c.doc_id
          WHERE len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) >= 8)
        SELECT doc_id, bench_id AS worst_bench_id, n_match, est_jaccard FROM (
          SELECT doc_id, bench_id, n_match, est_jaccard,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY est_jaccard DESC, bench_id ASC) AS rk
          FROM scored)
        WHERE rk = 1 ORDER BY doc_id"""))),

    // ---- winnowing fingerprint overlap (Schleimer et al. 2003 / MOSS):
    //      20-token excerpts planted from position 5 of the first 40
    //      docs guarantee (passage >= w+k-1 = 6 tokens) at least one
    //      shared selected fingerprint with the original. Exact gate
    //      (maxDocFreq=None); the capped path is tested in LlmSpec
    "q174_winnow_overlap" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
        val excerpts = docs.filter(col("doc_id") < 40)
          .select((col("doc_id") + 100000).as("doc_id"),
            array_join(slice(TF.wsTokens(col("text")), 5, 20), " ").as("text"))
        val corp = docs.select(col("doc_id"), col("text")).unionByName(excerpts)
        graft.llm.Dedup
          .winnowOverlap(corp, "doc_id", "text", k = 3, w = 4,
            minShared = 2L, maxDocFreq = None)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH corp AS (
          SELECT doc_id, text FROM documents WHERE text IS NOT NULL
          UNION ALL
          SELECT doc_id + 100000,
                 array_to_string(list_slice(string_split(text, ' '), 5, 24), ' ')
          FROM documents WHERE text IS NOT NULL AND doc_id < 40),
        tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM corp),
        hs AS (SELECT doc_id,
                 list_transform(range(1, len(t) - 1), j ->
                   CAST('0x' || substr(md5(t[j]||' '||t[j+1]||' '||t[j+2]), 1, 15)
                     AS BIGINT)) AS h
               FROM tk WHERE len(t) >= 3),
        fp AS (SELECT DISTINCT doc_id, unnest(list_distinct(
                 list_transform(range(1, greatest(len(h) - 3, 1) + 1),
                   i -> list_min(h[i : i + 3])))) AS s
               FROM hs),
        sz AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
        cm AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM fp a JOIN fp b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, common,
               CAST(common AS DOUBLE) / least(za.n_fp, zb.n_fp) AS overlap
        FROM cm JOIN sz za ON za.doc_id = doc_a JOIN sz zb ON zb.doc_id = doc_b
        WHERE common >= 2
        ORDER BY doc_a, doc_b"""))),

    // ---- token-budget mixture planning (waterfilling): fr and de are
    //      too small for their 40% shares of the 12k-token budget, so
    //      they saturate at 1.0x and their surplus redistributes to en.
    //      The oracle unrolls the same waterfill rounds term-for-term
    //      (exact longs in, one multiply + divide per share), then
    //      replays the ppm membership rule
    "q175_token_budget_mix" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), col("lang"),
            size(TF.wsTokens(col("text"))).cast("long").as("n_toks"))
        graft.llm.Mixing
          .tokenBudgetMix(docs, "lang", "doc_id", col("n_toks"),
            Map("en" -> 20L, "fr" -> 40L, "de" -> 40L),
            budgetTokens = 12000L)
          .groupBy(col("lang"))
          .agg(max(col("rate_ppm")).as("rate_ppm"),
            count(lit(1)).as("kept_docs"),
            sum(col("n_toks")).as("kept_tokens"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM documents
          WHERE text IS NOT NULL AND lang IN ('en', 'fr', 'de')),
        t(lang, part) AS (VALUES ('en', 20), ('fr', 40), ('de', 40)),
        -- zero-mass target domains are excluded up front (HAVING), matching
        -- waterfillRatesPpm's absent-domain = rate-0 contract; the unroll
        -- below is 3 rounds deep and MUST be >= the number of target
        -- domains (at most one saturation round per domain; extra rounds
        -- are idempotent when nothing saturates)
        av AS (SELECT t.lang, t.part, sum(d.n_toks) AS avail
               FROM t JOIN d USING (lang) GROUP BY 1, 2
               HAVING sum(d.n_toks) > 0),
        r1 AS (SELECT lang, part, avail,
                 CAST(12000 AS DOUBLE) * part / (SELECT sum(part) FROM av) AS share
               FROM av),
        s1 AS (SELECT * FROM r1 WHERE avail <= share),
        u1 AS (SELECT * FROM r1 WHERE avail > share),
        r2 AS (SELECT lang, part, avail,
                 CAST(12000 - coalesce((SELECT sum(avail) FROM s1), 0) AS DOUBLE)
                   * part / (SELECT sum(part) FROM u1) AS share
               FROM u1),
        s2 AS (SELECT * FROM r2 WHERE avail <= share),
        u2 AS (SELECT * FROM r2 WHERE avail > share),
        r3 AS (SELECT lang, part, avail,
                 CAST(12000 - coalesce((SELECT sum(avail) FROM s1), 0)
                            - coalesce((SELECT sum(avail) FROM s2), 0) AS DOUBLE)
                   * part / (SELECT sum(part) FROM u2) AS share
               FROM u2),
        s3 AS (SELECT * FROM r3 WHERE avail <= share),
        u3 AS (SELECT * FROM r3 WHERE avail > share),
        rates AS (
          SELECT lang, CAST(1000000 AS BIGINT) AS rate_ppm FROM s1
          UNION ALL SELECT lang, CAST(1000000 AS BIGINT) FROM s2
          UNION ALL SELECT lang, CAST(1000000 AS BIGINT) FROM s3
          UNION ALL SELECT lang,
            CAST(least(1000000, floor(share / avail * 1000000)) AS BIGINT)
          FROM u3),
        kept AS (
          SELECT d.lang, d.n_toks, r.rate_ppm
          FROM d JOIN rates r USING (lang)
          WHERE CAST('0x' || substr(md5('budget:' || CAST(d.doc_id AS VARCHAR)),
                  1, 15) AS BIGINT) % 1000000 < r.rate_ppm)
        SELECT lang, max(rate_ppm) AS rate_ppm, count(*) AS kept_docs,
               CAST(sum(n_toks) AS BIGINT) AS kept_tokens
        FROM kept GROUP BY lang ORDER BY lang"""))),

    // ---- edit-distance verification of near-dup candidates: unigram
    //      Jaccard is order-BLIND, so a token-reversed copy scores 1.0
    //      — the planted false accept the verifier must kill — while a
    //      re-crawl with an appended tail verifies at a tiny ratio.
    //      ASCII-scrubbed (DuckDB's levenshtein is byte-based, Spark's
    //      is char-based; on ASCII they agree), en slice only
    "q177_edit_verify" -> ((
      (s: SparkSession, d: String) => {
        val base = t(s, d, "documents")
          .filter(col("text").isNotNull && col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        val reversed = base.filter(col("doc_id") < 60)
          .select((col("doc_id") + 100000).as("doc_id"),
            array_join(reverse(TF.wsTokens(col("text"))), " ").as("text"))
        val recrawl = base
          .filter(col("doc_id") >= 60 && col("doc_id") < 120)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" appended tail token")).as("text"))
        val corp = base.unionByName(reversed).unionByName(recrawl)
        val cand = graft.llm.Dedup
          .jaccardPairs(corp, "doc_id", "text", n = 1,
            threshold = 0.8, maxDocFreq = None)
          .select(col("doc_a"), col("doc_b"))
        graft.llm.Dedup
          .editVerify(cand, corp, "doc_id", "text",
            maxRatio = 0.3, maxChars = 500)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH base AS (
          SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
          FROM documents WHERE text IS NOT NULL AND lang = 'en'),
        corp AS (
          SELECT doc_id, text FROM base
          UNION ALL
          SELECT doc_id + 100000,
                 array_to_string(list_reverse(string_split(text, ' ')), ' ')
          FROM base WHERE doc_id < 60
          UNION ALL
          SELECT doc_id + 200000, text || ' appended tail token'
          FROM base WHERE doc_id >= 60 AND doc_id < 120),
        tok AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS s FROM corp)),
        sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      count(*) AS common
               FROM tok a JOIN tok b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        cand AS (
          SELECT doc_a, doc_b FROM cm
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
        t AS (SELECT doc_id, substr(text, 1, 500) AS tt FROM corp),
        v AS (SELECT doc_a, doc_b,
                CAST(levenshtein(ta.tt, tb.tt) AS BIGINT) AS dist,
                CASE WHEN greatest(len(ta.tt), len(tb.tt)) = 0 THEN 0.0
                     ELSE CAST(levenshtein(ta.tt, tb.tt) AS DOUBLE)
                          / greatest(len(ta.tt), len(tb.tt)) END AS edit_ratio
              FROM cand
              JOIN t ta ON ta.doc_id = doc_a
              JOIN t tb ON tb.doc_id = doc_b)
        SELECT doc_a, doc_b, dist, edit_ratio FROM v
        WHERE edit_ratio <= 0.3
        ORDER BY doc_a, doc_b"""))),

    // ---- unigram-LM tokenizer training (Kudo 2018 / SentencePiece,
    //      Viterbi-EM variant) — the OTHER real tokenizer algorithm
    //      next to q157's BPE: substring seed census -> seed
    //      log-probs -> one Viterbi-EM round over the word-type
    //      histogram -> renormalized, pruned vocab. The oracle replays
    //      every stage, the per-word DP as a recursive CTE carrying
    //      (score, pieces) cells with the SAME larger-split tie-break
    //      (list_sort[-1] == Spark's struct array_max)
    "q178_unigram_train" -> ((
      (s: SparkSession, d: String) => {
        val en = t(s, d, "documents")
          .filter(col("text").isNotNull && col("lang") === "en")
        graft.llm.Tokenizer.unigramTrainDF(s, en, col("text"),
            vocabSize = 60, maxPieceLen = 3, seedSize = 120, emRounds = 1)
          .orderBy(col("cnt").desc, col("piece").asc)
      },
      Some(s"""
        WITH ${unigramTrainCtes()}
        SELECT piece, CAST(cnt AS BIGINT) AS cnt,
               ln(cnt / (SELECT sum(cnt)::DOUBLE FROM fcounts)) AS logprob
        FROM keptf ORDER BY cnt DESC, piece ASC"""))),

    // ---- unigram train → encode: the full tokenizer round trip. The
    //      vocab trained by q178's pipeline segments every en document
    //      (per-word Viterbi, flattened in token order); the oracle
    //      re-derives the vocab with the same CTEs, re-runs the DP with
    //      the FINAL log-probs, and rebuilds each document's exact
    //      piece stream
    "q179_unigram_encode" -> ((
      (s: SparkSession, d: String) => {
        val en = t(s, d, "documents")
          .filter(col("text").isNotNull && col("lang") === "en")
        val vocab = graft.llm.Tokenizer.unigramTrain(en, col("text"),
          vocabSize = 60, maxPieceLen = 3, seedSize = 120, emRounds = 1)
        val lp = vocab.map(p => p.piece -> p.logprob).toMap
        en.select(col("doc_id"),
            graft.llm.Tokenizer.unigramEncode(col("text"), typedlit(lp), 3)
              .as("p"))
          .select(col("doc_id"), size(col("p")).cast("long").as("n_pieces"),
            array_join(col("p"), " ").as("enc"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${unigramTrainCtes()},
        mfin AS (
          SELECT map(list(piece ORDER BY piece),
                     list(ln(cnt / (SELECT sum(cnt)::DOUBLE FROM fcounts))
                          ORDER BY piece)) AS m
          FROM keptf),
        ${unigramVitCte("vit2", "mfin")},
        dt AS (
          SELECT doc_id, u.i AS i, u.tok AS tok FROM (
            SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents WHERE text IS NOT NULL AND lang = 'en') s,
            unnest(list_transform(range(1, len(tk) + 1), i ->
              {'i': i, 'tok': tk[i::INT]})) AS t(u)
          WHERE u.tok <> ''),
        enc AS (
          SELECT dt.doc_id, flatten(list(vit2.pieces ORDER BY dt.i)) AS p
          FROM dt JOIN vit2 ON vit2.w = dt.tok
          GROUP BY dt.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(len(e.p), 0) AS BIGINT) AS n_pieces,
               coalesce(array_to_string(e.p, ' '), '') AS enc
        FROM (SELECT doc_id FROM documents
              WHERE text IS NOT NULL AND lang = 'en') d
        LEFT JOIN enc e USING (doc_id)
        ORDER BY doc_id"""))),

    // ---- MULTI-round Viterbi-EM unigram training: 3 EM rounds over a
    //      LARGER seed pool (200) pruned to a SMALLER vocab (40) — the
    //      combination that forces pruning churn (pieces the round-1
    //      model kept drop to count 0 under the round-2 model and leave
    //      it, so later DPs run against a shrunken piece set and the
    //      single-char -100 UNK fallback fires for dropped chars). Pins
    //      the trainer's recount loop ACROSS rounds; the oracle unrolls
    //      the identical 3 rounds term-for-term
    "q181_unigram_train_multiround" -> ((
      (s: SparkSession, d: String) => {
        val en = t(s, d, "documents")
          .filter(col("text").isNotNull && col("lang") === "en")
        graft.llm.Tokenizer.unigramTrainDF(s, en, col("text"),
            vocabSize = 40, maxPieceLen = 3, seedSize = 200, emRounds = 3)
          .orderBy(col("cnt").desc, col("piece").asc)
      },
      Some(s"""
        WITH ${unigramTrainCtes(emRounds = 3, seedSize = 200, vocabSize = 40)}
        SELECT piece, CAST(cnt AS BIGINT) AS cnt,
               ln(cnt / (SELECT sum(cnt)::DOUBLE FROM fcounts)) AS logprob
        FROM keptf ORDER BY cnt DESC, piece ASC"""))),

    // ---- incremental ANN index kept fresh through the WRITE path: the
    //      stored-codes table (q136) lives through three commits — bulk
    //      load, a later-arriving batch, then a RE-EMBEDDING wave that
    //      upserts refreshed codes for changed vectors (ids % 5 == 1 get
    //      re-embedded as the reversed vector) — and search quality is
    //      then judged against brute force over the UPDATED corpus with
    //      q145's recall harness. A stale index (old codes for changed
    //      ids) would tank recall for exactly those queries; the
    //      incremental refresh keeps it at the from-scratch level, and
    //      strictCoverage would raise loudly on ids the rerank cannot
    //      resolve
    "q182_ann_index_refresh" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val upd = emb.select(col("vec_id"),
          when(col("vec_id") % 5 === 1, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"))
        val b1 = emb.filter(col("vec_id") % 3 =!= 0)
        val b2 = emb.filter(col("vec_id") % 3 === 0)
        // codebooks seeded from the ORIGINAL initial corpus — the index
        // never retrains on refresh, only re-encodes (the incremental
        // contract: refresh cost is batch-sized, never corpus-sized)
        val cb = Similarity.pqInitCodebooks(b1, "vec_id", "embedding",
          m = 8, ksub = 16)
        val tbl = graft.write.GraftTable.create(s, freshDir(),
          graft.core.TableConfig(
            name = "pq_refresh", tableType = graft.core.TableType.COW,
            keyFields = Seq("vec_id"), targetFileRows = 500000))
        tbl.bulkInsert(b1.select(col("vec_id"),
          Similarity.pqCodes(col("embedding"), cb).as("codes")))
        tbl.upsert(b2.select(col("vec_id"),
          Similarity.pqCodes(col("embedding"), cb).as("codes")))
        tbl.upsert(upd.filter(col("vec_id") % 5 === 1)
          .select(col("vec_id"),
            Similarity.pqCodes(col("embedding"), cb).as("codes")))
        val r = graft.read.GraftReader(tbl)
        val stored = r.dataOnly(r.snapshot()).select(col("vec_id"), col("codes"))
        val qs = upd.filter(col("vec_id") < 5)
        val approx = Similarity.pqTopKFromCodes(stored, upd, qs,
          "vec_id", "codes", "embedding", k = 3, cb, rerank = 10)
        val exact = Similarity.bruteForceTopK(upd, qs, "vec_id", "embedding", k = 3)
        Similarity.topKRecall(exact, approx).orderBy(col("q_id"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        u AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 5 = 1 THEN list_reverse(v) ELSE v END AS v
          FROM e),
        cbs AS (
          SELECT s, list(blk ORDER BY j) AS cb
          FROM (
            SELECT s, seed.vec_id AS j,
                   list_transform(range(1, 9), i -> seed.v[s*8 + i]) AS blk
            FROM (SELECT vec_id, v FROM e WHERE vec_id % 3 <> 0
                  ORDER BY vec_id LIMIT 16) seed,
                 (SELECT unnest(range(0, 8)) AS s))
          GROUP BY s),
        codes AS (
          SELECT vec_id, s,
                 CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS code
          FROM (
            SELECT u.vec_id, c.s,
                   list_transform(range(1, 17), j ->
                     list_sum(list_transform(range(1, 9), i ->
                       (u.v[c.s*8 + i] - c.cb[j][i])
                         * (u.v[c.s*8 + i] - c.cb[j][i])))) AS d
            FROM u, cbs c)),
        dec AS (
          SELECT vec_id, flatten(list(blk ORDER BY s)) AS dvec
          FROM (SELECT cd.vec_id, cd.s, c.cb[cd.code + 1] AS blk
                FROM codes cd JOIN cbs c ON c.s = cd.s)
          GROUP BY vec_id),
        nrm AS (
          SELECT vec_id, dvec,
                 sqrt(list_sum(list_transform(dvec, x -> x * x))) AS dnrm
          FROM dec),
        qn AS (
          SELECT vec_id AS q_id, v AS qv,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS qnrm
          FROM u WHERE vec_id < 5),
        adc AS (
          SELECT q.q_id, c.vec_id AS n_id,
                 list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.dvec[i])) / (q.qnrm * c.dnrm) AS cos_adc
          FROM qn q JOIN nrm c ON c.vec_id <> q.q_id),
        short AS (
          SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_adc DESC, n_id) AS srnk
            FROM adc) WHERE srnk <= 10),
        un AS (
          SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nr
          FROM u),
        ap AS (
          SELECT q_id, n_id FROM (
            SELECT s.q_id, s.n_id,
                   row_number() OVER (PARTITION BY s.q_id ORDER BY
                     list_sum(list_transform(range(1, 65),
                       i -> q.qv[i] * n.v[i])) / (q.qnrm * n.nr) DESC,
                     s.n_id) AS rnk
            FROM short s JOIN qn q ON q.q_id = s.q_id
                         JOIN un n ON n.vec_id = s.n_id)
          WHERE rnk <= 3),
        bf AS (
          SELECT q_id, n_id FROM (
            SELECT q.q_id, n.vec_id AS n_id,
                   row_number() OVER (PARTITION BY q.q_id ORDER BY
                     list_sum(list_transform(range(1, 65),
                       i -> q.qv[i] * n.v[i])) / (q.qnrm * n.nr) DESC,
                     n.vec_id) AS rnk
            FROM qn q JOIN un n ON n.vec_id <> q.q_id)
          WHERE rnk <= 3)
        SELECT bf.q_id, count(*) AS n_exact,
               CAST(sum(CASE WHEN ap.n_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN ap.n_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS recall
        FROM bf LEFT JOIN ap ON ap.q_id = bf.q_id AND ap.n_id = bf.n_id
        GROUP BY bf.q_id ORDER BY bf.q_id"""))),

    // ---- DoReMi-style domain reweighting (Xie et al. 2023, Algorithm
    //      1's EG update over fixed excess losses): census each source's
    //      mean unigram xent, excess over the corpus mean, then 3
    //      multiplicative-weights rounds from uniform with smoothing
    //      c=0.2; output weights are the per-round AVERAGE. eta=25 scales
    //      the step to this corpus' tight xent spread (~1e-2 nats) so the
    //      probe exercises genuinely non-uniform weights. The oracle
    //      unrolls the same three rounds as stacked CTEs — identical
    //      census, clamp, exp and averaging arithmetic
    "q194_doremi_weights" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val scored = graft.llm.QualityModel
          .unigramXent(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        graft.llm.Mixing
          .doremiWeights(scored, "source", "xent",
            rounds = 3, eta = 25.0, smoothing = 0.2)
          .orderBy(col("domain"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM documents),
        freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
        sc AS (SELECT t2.doc_id, d.source,
                      sum(-ln(CAST(cnt AS DOUBLE) / total)) / count(*) AS xent
               FROM toks t2 JOIN freq USING (tok) JOIN documents d
                 ON d.doc_id = t2.doc_id, tot
               GROUP BY t2.doc_id, d.source),
        cen AS (SELECT source AS domain, count(*) AS n_docs,
                       avg(xent) AS mean_loss
                FROM sc GROUP BY 1),
        ex AS (SELECT domain, n_docs, mean_loss,
                      greatest(0, mean_loss - (SELECT avg(xent) FROM sc))
                        AS excess_loss
               FROM cen),
        kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM ex),
        w0 AS (SELECT domain, 1.0 / (SELECT k FROM kk) AS w FROM ex),
        w1 AS (SELECT e.domain,
                 0.8 * (p.w * exp(25.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(25.0 * b.excess_loss))
                        FROM w0 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w0 p ON p.domain = e.domain),
        w2 AS (SELECT e.domain,
                 0.8 * (p.w * exp(25.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(25.0 * b.excess_loss))
                        FROM w1 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w1 p ON p.domain = e.domain),
        w3 AS (SELECT e.domain,
                 0.8 * (p.w * exp(25.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(25.0 * b.excess_loss))
                        FROM w2 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w2 p ON p.domain = e.domain)
        SELECT e.domain, e.n_docs, e.mean_loss, e.excess_loss,
               (w1.w + w2.w + w3.w) / 3.0 AS weight
        FROM ex e JOIN w1 ON w1.domain = e.domain
                  JOIN w2 ON w2.domain = e.domain
                  JOIN w3 ON w3.domain = e.domain
        ORDER BY e.domain"""))),

    // ---- Luhn-validated payment-card scrubbing: card-shaped digit runs
    //      (13–19 digits, space/dash separators) found by regex, then the
    //      mod-10 checksum — a pure Catalyst fold, no UDF — separates
    //      real card numbers from arbitrary digit runs. Docs are planted
    //      with one valid (4111-1111-1111-1111) or one invalid
    //      (…1112) number; redaction conservatively eats BOTH. The
    //      oracle replays candidate regex + checksum with range-indexed
    //      list arithmetic
    "q196_pii_cards" -> ((
      (s: SparkSession, d: String) => {
        val planted = t(s, d, "documents").filter(col("text").isNotNull)
          .withColumn("ptext", concat(col("text"),
            when(col("doc_id") % 3 === 0, lit(" pay 4111-1111-1111-1111 now"))
              .when(col("doc_id") % 3 === 1, lit(" ref 4111111111111112 order"))
              .otherwise(lit(""))))
        val (nCand, nValid) = TF.cardCounts(col("ptext"))
        planted.select(col("doc_id"),
            nCand.as("n_card_cand"), nValid.as("n_card_valid"),
            length(TF.redactCards(col("ptext"))).cast("long").as("redacted_len"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id, text ||
            CASE WHEN doc_id % 3 = 0 THEN ' pay 4111-1111-1111-1111 now'
                 WHEN doc_id % 3 = 1 THEN ' ref 4111111111111112 order'
                 ELSE '' END AS ptext
          FROM documents WHERE text IS NOT NULL),
        flat AS (
          SELECT doc_id, unnest(regexp_extract_all(ptext,
            '\b(?:[0-9][ -]?){12,18}[0-9]\b')) AS c
          FROM p),
        norm AS (SELECT doc_id, replace(replace(c, ' ', ''), '-', '') AS ds
                 FROM flat),
        lv AS (SELECT doc_id,
                 CASE WHEN list_sum(list_transform(range(1, len(ds) + 1), i ->
                        CASE WHEN i % 2 = 0 THEN
                          CASE WHEN 2 * CAST(ds[len(ds)-i+1] AS INT) > 9
                               THEN 2 * CAST(ds[len(ds)-i+1] AS INT) - 9
                               ELSE 2 * CAST(ds[len(ds)-i+1] AS INT) END
                        ELSE CAST(ds[len(ds)-i+1] AS INT) END)) % 10 = 0
                      THEN 1 ELSE 0 END AS ok
               FROM norm),
        agg AS (SELECT doc_id, count(*) AS n_cand, sum(ok) AS n_valid
                FROM lv GROUP BY doc_id)
        SELECT p.doc_id,
               CAST(coalesce(a.n_cand, 0) AS BIGINT) AS n_card_cand,
               CAST(coalesce(a.n_valid, 0) AS BIGINT) AS n_card_valid,
               CAST(len(regexp_replace(ptext,
                 '\b(?:[0-9][ -]?){12,18}[0-9]\b', '[CARD]', 'g')) AS BIGINT)
                 AS redacted_len
        FROM p LEFT JOIN agg a USING (doc_id) ORDER BY p.doc_id"""))),

    // ---- DoReMi weights REALIZED as a corpus mixture: the q194 weights
    //      become integral proportion parts (floor(w·1e6)) feeding the
    //      q175 token-budget waterfill, whose ppm membership keeps whole
    //      docs — the full plan→materialize loop of a mixture recipe.
    //      Budget 9k tokens is far under every source's availability,
    //      so no waterfill saturation wave fires (the oracle still
    //      unrolls 3 idempotent rounds, same as q175)
    "q198_doremi_budget_mix" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val scored = graft.llm.QualityModel
          .unigramXent(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        val parts = graft.llm.Mixing
          .doremiWeights(scored, "source", "xent",
            rounds = 3, eta = 25.0, smoothing = 0.2)
          .collect()
          .map(r => r.getString(0) -> math.floor(r.getDouble(4) * 1e6).toLong)
          .toMap
        val sized = docs.filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            size(TF.wsTokens(col("text"))).cast("long").as("n_toks"))
        graft.llm.Mixing
          .tokenBudgetMix(sized, "source", "doc_id", col("n_toks"),
            parts, budgetTokens = 9000L, salt = "doremi")
          .groupBy(col("source"))
          .agg(max(col("rate_ppm")).as("rate_ppm"),
            count(lit(1)).as("kept_docs"),
            sum(col("n_toks")).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM documents),
        freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
        sc AS MATERIALIZED (SELECT t2.doc_id, d.source,
                      sum(-ln(CAST(cnt AS DOUBLE) / total)) / count(*) AS xent
               FROM toks t2 JOIN freq USING (tok) JOIN documents d
                 ON d.doc_id = t2.doc_id, tot
               GROUP BY t2.doc_id, d.source),
        cen AS MATERIALIZED (SELECT source AS domain, avg(xent) AS mean_loss
                FROM sc GROUP BY 1),
        ex AS MATERIALIZED (SELECT domain,
                      greatest(0, mean_loss - (SELECT avg(xent) FROM sc))
                        AS excess_loss
               FROM cen),
        kk AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS k FROM ex),
        w0 AS (SELECT domain, 1.0 / (SELECT k FROM kk) AS w FROM ex),
        w1 AS MATERIALIZED (SELECT e.domain,
                 0.8 * (p.w * exp(25.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(25.0 * b.excess_loss))
                        FROM w0 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w0 p ON p.domain = e.domain),
        w2 AS MATERIALIZED (SELECT e.domain,
                 0.8 * (p.w * exp(25.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(25.0 * b.excess_loss))
                        FROM w1 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w1 p ON p.domain = e.domain),
        w3 AS MATERIALIZED (SELECT e.domain,
                 0.8 * (p.w * exp(25.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(25.0 * b.excess_loss))
                        FROM w2 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w2 p ON p.domain = e.domain),
        parts AS MATERIALIZED (
          SELECT e.domain AS source,
                 CAST(floor((w1.w + w2.w + w3.w) / 3.0 * 1000000) AS BIGINT)
                   AS part
          FROM ex e JOIN w1 ON w1.domain = e.domain
                    JOIN w2 ON w2.domain = e.domain
                    JOIN w3 ON w3.domain = e.domain),
        dd AS MATERIALIZED (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
               FROM documents WHERE text IS NOT NULL),
        av AS MATERIALIZED (SELECT p.source, p.part, sum(dd.n_toks) AS avail
               FROM parts p JOIN dd USING (source)
               WHERE p.part > 0
               GROUP BY 1, 2 HAVING sum(dd.n_toks) > 0),
        r1 AS (SELECT source, part, avail,
                 CAST(9000 AS DOUBLE) * part / (SELECT sum(part) FROM av) AS share
               FROM av),
        s1 AS (SELECT * FROM r1 WHERE avail <= share),
        u1 AS (SELECT * FROM r1 WHERE avail > share),
        r2 AS (SELECT source, part, avail,
                 CAST(9000 - coalesce((SELECT sum(avail) FROM s1), 0) AS DOUBLE)
                   * part / (SELECT sum(part) FROM u1) AS share
               FROM u1),
        s2 AS (SELECT * FROM r2 WHERE avail <= share),
        u2 AS (SELECT * FROM r2 WHERE avail > share),
        r3 AS (SELECT source, part, avail,
                 CAST(9000 - coalesce((SELECT sum(avail) FROM s1), 0)
                            - coalesce((SELECT sum(avail) FROM s2), 0) AS DOUBLE)
                   * part / (SELECT sum(part) FROM u2) AS share
               FROM u2),
        s3 AS (SELECT * FROM r3 WHERE avail <= share),
        u3 AS (SELECT * FROM r3 WHERE avail > share),
        rates AS (
          SELECT source, CAST(1000000 AS BIGINT) AS rate_ppm FROM s1
          UNION ALL SELECT source, CAST(1000000 AS BIGINT) FROM s2
          UNION ALL SELECT source, CAST(1000000 AS BIGINT) FROM s3
          UNION ALL SELECT source,
            CAST(least(1000000, floor(share / avail * 1000000)) AS BIGINT)
          FROM u3),
        kept AS (
          SELECT dd.source, dd.n_toks, r.rate_ppm
          FROM dd JOIN rates r USING (source)
          WHERE CAST('0x' || substr(md5('doremi:' || CAST(dd.doc_id AS VARCHAR)),
                  1, 15) AS BIGINT) % 1000000 < r.rate_ppm)
        SELECT source, max(rate_ppm) AS rate_ppm, count(*) AS kept_docs,
               CAST(sum(n_toks) AS BIGINT) AS kept_tokens
        FROM kept GROUP BY source ORDER BY source"""))),

    // ---- DoReMi's faithful TWO-MODEL form: excess loss = proxy minus
    //      reference per domain (here: corpus-fit unigram LM as the
    //      proxy, JM-smoothed bigram LM as the stronger reference — the
    //      gap measures how much a better model helps each domain), fed
    //      through the same EG rounds via the baselinePerDomain arm.
    //      Domains where the reference closes more of the gap get less
    //      upweight. The oracle fuses q97's and q137's censuses with the
    //      q194 round unroll
    "q200_doremi_two_model" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        val refLoss = graft.llm.QualityModel
          .bigramXent(docs, "doc_id", "text")
          .join(src, "doc_id")
          .groupBy(col("source")).agg(avg(col("xent")).as("ref"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val scored = graft.llm.QualityModel
          .unigramXent(docs, "doc_id", "text")
          .join(src, "doc_id")
        graft.llm.Mixing
          .doremiWeights(scored, "source", "xent",
            rounds = 3, eta = 10.0, smoothing = 0.2,
            baselinePerDomain = Some(refLoss))
          .orderBy(col("domain"))
      },
      Some("""
        WITH toks AS MATERIALIZED (
          SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        uni AS MATERIALIZED (
          SELECT t AS tok, CAST(count(*) AS DOUBLE) AS c
          FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni),
        usc AS MATERIALIZED (
          SELECT u.doc_id, d.source,
                 sum(-ln(c / (SELECT total FROM tot))) / count(*) AS xent
          FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) u
          JOIN uni USING (tok) JOIN documents d ON d.doc_id = u.doc_id
          GROUP BY u.doc_id, d.source),
        pp AS MATERIALIZED (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
                 unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
          FROM toks),
        bi AS MATERIALIZED (
          SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
          FROM pp GROUP BY 1, 2),
        bsc AS MATERIALIZED (
          SELECT pp.doc_id, d.source,
                 sum(-ln(0.75 * (bi.cb / u1.c)
                         + 0.25 * (u2.c / (SELECT total FROM tot))))
                   / count(*) AS xent
          FROM pp
          JOIN bi ON bi.w1 = pp.w1 AND bi.w2 = pp.w2
          JOIN uni u1 ON u1.tok = pp.w1
          JOIN uni u2 ON u2.tok = pp.w2
          JOIN documents d ON d.doc_id = pp.doc_id
          GROUP BY pp.doc_id, d.source),
        cen AS MATERIALIZED (
          SELECT source AS domain, count(*) AS n_docs, avg(xent) AS mean_loss
          FROM usc GROUP BY 1),
        ref AS MATERIALIZED (
          SELECT source AS domain, avg(xent) AS ref_loss FROM bsc GROUP BY 1),
        ex AS MATERIALIZED (
          SELECT c.domain, c.n_docs, c.mean_loss,
                 greatest(0, c.mean_loss
                             - coalesce(r.ref_loss, c.mean_loss)) AS excess_loss
          FROM cen c LEFT JOIN ref r ON r.domain = c.domain),
        kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM ex),
        w0 AS (SELECT domain, 1.0 / (SELECT k FROM kk) AS w FROM ex),
        w1 AS MATERIALIZED (SELECT e.domain,
                 0.8 * (p.w * exp(10.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(10.0 * b.excess_loss))
                        FROM w0 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w0 p ON p.domain = e.domain),
        w2 AS MATERIALIZED (SELECT e.domain,
                 0.8 * (p.w * exp(10.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(10.0 * b.excess_loss))
                        FROM w1 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w1 p ON p.domain = e.domain),
        w3 AS MATERIALIZED (SELECT e.domain,
                 0.8 * (p.w * exp(10.0 * e.excess_loss))
                     / (SELECT sum(a.w * exp(10.0 * b.excess_loss))
                        FROM w2 a JOIN ex b ON a.domain = b.domain)
                 + 0.2 / (SELECT k FROM kk) AS w
               FROM ex e JOIN w2 p ON p.domain = e.domain)
        SELECT e.domain, e.n_docs, e.mean_loss, e.excess_loss,
               (w1.w + w2.w + w3.w) / 3.0 AS weight
        FROM ex e JOIN w1 ON w1.domain = e.domain
                  JOIN w2 ON w2.domain = e.domain
                  JOIN w3 ON w3.domain = e.domain
        ORDER BY e.domain""")))
  )
}
