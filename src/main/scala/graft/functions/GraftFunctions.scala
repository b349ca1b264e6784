package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registrations for the custom Catalyst kernels, so pure-SQL users
  * get the same codegen'd fast paths the DataFrame API uses (reference
  * analog: the hudi-spark `hudi_query`-style function surface; our
  * kernels replace payload/keygen classloading with expressions).
  *
  * Registered by [[org.apache.spark.sql.graft.GraftSparkSessionExtension]]
  * via `injectFunction`, e.g.:
  * {{{
  *   SELECT dot_product(a.embedding, b.embedding)
  *        / (sqrt(sum_squares(a.embedding)) * sqrt(sum_squares(b.embedding)))
  *   FROM emb a JOIN emb b ON a.id < b.id
  * }}}
  *
  * Shape arguments (plane counts, shingle sizes) must be literal
  * integers — they parameterize the generated code itself.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression
  type Registration = (FunctionIdentifier, ExpressionInfo, Builder)

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be a literal integer, got $other")
  }

  private def expect(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn takes $n arguments, got ${args.length}")

  /** A foldable ARRAY<STRING> argument (array literal / foldable expr),
    * evaluated at registration-build time — merge tables and vocabularies
    * parameterize the generated code itself, like the shape ints. */
  private def strArray(e: Expression, fn: String, arg: String): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val ok = e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be a literal array of strings, got $e")
    val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (ad == null) throw new IllegalArgumentException(
      s"$fn: argument <$arg> must not be null")
    ad.toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(s => if (s == null) null else s.toString).toSeq
  }

  private def reg(name: String, usage: String)(b: Builder): Registration =
    (FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, null, name, usage, ""),
      b)

  /** Every registration, in one place so the extension and tests agree. */
  val all: Seq[Registration] = Seq(
    reg("dot_product",
      "dot_product(a, b) - IEEE-double dot product of two float/double arrays, " +
        "left-to-right fold; null on length mismatch or null element") { args =>
      expect(args, 2, "dot_product"); DotProductD(args(0), args(1))
    },
    reg("sum_squares",
      "sum_squares(a) - squared L2 norm of a float/double array") { args =>
      expect(args, 1, "sum_squares"); SumSquaresD(args(0))
    },
    reg("z_value",
      "z_value(r1, r2, ...) - bit-interleaved Z-order value of long cell ranks") {
      args => ZValue(args)
    },
    reg("hilbert_value",
      "hilbert_value(rx, ry) - distance along the order-31 2-D Hilbert curve") {
      args => expect(args, 2, "hilbert_value"); HilbertValue(args(0), args(1))
    },
    reg("lsh_band_buckets",
      "lsh_band_buckets(vec, planes, bands, dims) - random-hyperplane LSH band " +
        "bucket keys of an embedding, one pass over the array") { args =>
      expect(args, 4, "lsh_band_buckets")
      val planes = intLit(args(1), "lsh_band_buckets", "planes")
      val bands = intLit(args(2), "lsh_band_buckets", "bands")
      val dims = intLit(args(3), "lsh_band_buckets", "dims")
      LshBandBuckets(args(0),
        graft.llm.Similarity.planeMatrix(planes, dims), planes, bands, dims)
    },
    reg("minhash_sig",
      "minhash_sig(tokens, n, k) - k-hash MinHash signature over the token " +
        "array's word n-gram shingles; null when too short to shingle") { args =>
      expect(args, 3, "minhash_sig")
      val n = intLit(args(1), "minhash_sig", "n")
      val k = intLit(args(2), "minhash_sig", "k")
      val (as, bs) = (0 until k).map(graft.llm.Dedup.minhashParam).unzip
      MinHashSig(args(0), n, as, bs, graft.llm.Dedup.MinhashPrime)
    },
    reg("simhash48",
      "simhash48(tokens) - 48-bit SimHash fingerprint of a token array") { args =>
      expect(args, 1, "simhash48"); SimHash48(args(0))
    },
    // ---- text-quality / sampling family: composed Catalyst columns
    //      (built-in functions end to end, so they stay codegen'd)
    //      exposed to pure SQL through the Column bridge
    reg("span_hashes",
      "span_hashes(tokens, width) - md5 hashes of the non-overlapping " +
        "width-token spans (exact-substring dedup unit); empty when " +
        "shorter than one span") { args =>
      expect(args, 2, "span_hashes")
      val width = intLit(args(1), "span_hashes", "width")
      bridge(graft.llm.TextFunctions.spanHashes(asCol(args(0)), width))
    },
    reg("repetition_keep",
      "repetition_keep(tokens) - Gopher repetition-rule keep/drop verdict " +
        "(duplicate token/2-gram fractions, top-token mass)") { args =>
      expect(args, 1, "repetition_keep")
      bridge(graft.llm.TextFunctions.repetitionKeep(asCol(args(0))))
    },
    reg("gopher_verdict",
      "gopher_verdict(tokens, stopwords) - full Gopher/MassiveText filter " +
        "chain; returns the first failing rule's name or 'keep'") { args =>
      expect(args, 2, "gopher_verdict")
      val tf = graft.llm.TextFunctions
      bridge(tf.gopherVerdict(
        asCol(args(0)), asCol(args(1)),
        tf.GopherMinWords, tf.GopherMaxWords, tf.GopherMinMeanLen,
        tf.GopherMaxMeanLen, tf.GopherMinAlphaFrac, tf.GopherMinDistinctStops))
    },
    reg("lang_id",
      "lang_id(tokens) - stopword-profile language guess ('und' when no " +
        "profile hits)") { args =>
      expect(args, 1, "lang_id")
      bridge(graft.llm.TextFunctions.langId(asCol(args(0))))
    },
    reg("ppm_bucket",
      "ppm_bucket(id, salt) - deterministic uniform bucket in [0, 1e6) " +
        "from md5(salt:id); the membership primitive behind hash " +
        "sampling / splits / mixing") { args =>
      expect(args, 2, "ppm_bucket")
      bridge(graft.llm.Mixing.ppmBucket(asCol(args(0)), asCol(args(1))))
    },
    reg("normalize_text",
      "normalize_text(str, form) - unicode normalization (NFC/NFD/NFKC/" +
        "NFKD, a literal string); the pre-hash scrub step for dedup") { args =>
      expect(args, 2, "normalize_text")
      val form = args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"normalize_text: <form> must be a literal string, got $other")
      }
      NormalizeText(args(0), form)
    },
    reg("strip_html",
      "strip_html(str) - markup to plain text: drops script/style/" +
        "comment payloads, strips tags, decodes common entities, " +
        "collapses whitespace") { args =>
      expect(args, 1, "strip_html")
      bridge(graft.llm.TextFunctions.stripHtml(asCol(args(0))))
    },
    reg("url_host",
      "url_host(url) - lowercased hostname of an http(s) URL, '' when " +
        "the scheme is missing") { args =>
      expect(args, 1, "url_host")
      bridge(graft.llm.TextFunctions.urlHost(asCol(args(0))))
    },
    reg("canonical_url",
      "canonical_url(url) - dedup-canonical URL form: drops fragments " +
        "and tracking params (utm_*/fbclid/gclid), lowercases scheme+" +
        "host, strips www./default ports/trailing slashes") { args =>
      expect(args, 1, "canonical_url")
      bridge(graft.llm.TextFunctions.canonicalUrl(asCol(args(0))))
    },
    // ---- tokenizer kernels: the merge table / vocabulary is a literal
    //      array (trained driver-side, e.g. by Tokenizer.bpeTrain /
    //      wpTrain), so pure SQL gets the same codegen'd apply paths
    reg("bpe_apply",
      "bpe_apply(tokens, merges) - apply a ranked BPE merge table (array " +
        "of 'a b' literals, rank order) to a symbol array: one greedy " +
        "left-to-right non-overlapping pass per merge") { args =>
      expect(args, 2, "bpe_apply")
      val merges = strArray(args(1), "bpe_apply", "merges").map { m =>
        val parts = m.split(" ", 2)
        require(parts.length == 2,
          s"bpe_apply: each merge must be 'a b', got '$m'")
        (parts(0), parts(1))
      }
      BpeApply(args(0), merges)
    },
    reg("wp_encode",
      "wp_encode(text, vocab, max_len) - WordPiece greedy longest-match " +
        "encoding of whitespace-tokenized text against a literal piece " +
        "vocabulary (word-initial pieces plain, continuations ##-marked); " +
        "words with no matching piece become [UNK]") { args =>
      expect(args, 3, "wp_encode")
      val vocab = strArray(args(1), "wp_encode", "vocab")
      val maxLen = intLit(args(2), "wp_encode", "max_len")
      bridge(graft.llm.Tokenizer.wpEncode(
        asCol(args(0)),
        org.apache.spark.sql.functions.typedlit(vocab.zipWithIndex.toMap),
        maxLen))
    }
  )

  private def asCol(e: Expression) =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(e)
  private def bridge(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.toCatalyst(c)
}
