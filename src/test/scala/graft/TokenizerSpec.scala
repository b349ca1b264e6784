package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{TextFunctions => TF, Tokenizer}

class TokenizerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("tokenizer-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Independent in-memory BPE trainer (the textbook algorithm, word-type
    * histogram form) to pin [[Tokenizer.bpeTrain]] against. */
  private def refTrain(
      texts: Seq[String], k: Int): Seq[(Long, String, String, Long, Long)] = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts if t != null; w <- t.split(" ", -1) if w.nonEmpty)
      wc(w) = wc.getOrElse(w, 0L) + 1L
    var types: Map[String, Vector[String]] =
      wc.keys.map(w => w -> (w.map(_.toString).toVector :+ Tokenizer.EndMark)).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, sym) <- types; p <- sym.zip(sym.tail))
        pc(p) = pc.getOrElse(p, 0L) + wc(w)
      if (pc.isEmpty) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x + " " + y) }
        types = types.map { case (w, sym) =>
          val ns = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < sym.length) {
            if (j + 1 < sym.length && sym(j) == a && sym(j + 1) == b) {
              ns += (a + b); j += 2
            } else { ns += sym(j); j += 1 }
          }
          w -> ns.toVector
        }
        val symsAfter = types.map { case (w, s) => wc(w) * s.length }.sum
        out += ((step.toLong, a, b, c, symsAfter))
        step += 1
      }
    }
    out.toSeq
  }

  private def train(texts: Seq[String], k: Int) = {
    import spark.implicits._
    Tokenizer.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      col("text"), k)
      .map(m => (m.rnk, m.a, m.b, m.cnt, m.corpusSymbolsAfter))
  }

  test("bpeTrain matches the reference on a mixed corpus") {
    val texts = Seq(
      "low lower lowest low low", "new newer newest new", "wider wide wide",
      "low new wide lowest")
    assert(train(texts, 8) == refTrain(texts, 8))
  }

  test("bpeTrain handles a=b runs, ties, multi-space and null text") {
    val texts = Seq("aaaa aaaaaa aa a", "abab ababab xy", "aaaa  aaaa", null)
    assert(train(texts, 5) == refTrain(texts, 5))
  }

  test("bpeTrain stops when every word is a single symbol") {
    // tiny closed corpus: 'ab ab' exhausts after 2 merges (a+b, ab+</w>)
    val got = train(Seq("ab ab"), 10)
    assert(got == refTrain(Seq("ab ab"), 10))
    assert(got.length == 2)
  }

  test("bpeTrain minCount stops below the frequency floor") {
    import spark.implicits._
    val df = Seq((1L, "ab ab cd")).toDF("id", "text")
    val merges = Tokenizer.bpeTrain(df, col("text"), 10, minCount = 2L)
    // ('a','b') occurs twice, ('ab','</w>') twice; every pair in 'cd'
    // occurs once — training stops as soon as the best pair is unique
    assert(merges.forall(_.cnt >= 2L))
    assert(merges.length == 2)
  }

  test("bpeEncode over the flattened stream equals per-word application") {
    import spark.implicits._
    val texts = Seq(
      "low lower lowest low low", "new newer newest new", "aaaa aa a aaaa",
      "wider wide wide low new")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val merges = Tokenizer.bpeTrain(df, col("text"), 6)
      .map(m => (m.a, m.b))
    val flat = df
      .select(col("id"), Tokenizer.bpeEncode(col("text"), merges).as("enc"))
      .orderBy(col("id")).collect().map(_.getSeq[String](1))
    val perWord = df
      .select(col("id"),
        flatten(transform(TF.wsTokens(col("text")),
          w => TF.bpeApply(Tokenizer.charSymbols(w), merges))).as("enc"))
      .orderBy(col("id")).collect().map(_.getSeq[String](1))
    assert(flat.toSeq.map(_.toList) == perWord.toSeq.map(_.toList))
    // and no learned merge can cross a word boundary: none starts with
    // a symbol that ends in the end-of-word mark
    assert(merges.forall(m => !m._1.endsWith(Tokenizer.EndMark)))
  }

  test("learned merges compress the corpus monotonically") {
    val texts = Seq.tabulate(20)(i => s"alpha beta gamma alpha beta $i")
    val merges = train(texts, 6)
    val sizes = merges.map(_._5)
    assert(sizes == sizes.sorted.reverse)
    assert(merges.map(_._1) == (1L to 6L))
  }

  /** Independent in-memory Viterbi (same contract: max score, ties to
    * the larger split point, OOV single chars at UnkLogProb). */
  private def refViterbi(
      w: String, lp: Map[String, Double], maxLen: Int): Seq[String] = {
    val n = w.length
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    score(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val piece = w.substring(j, i)
      val p =
        if (i - j == 1) Some(lp.getOrElse(piece, Tokenizer.UnkLogProb))
        else lp.get(piece)
      p.foreach { x =>
        val s = score(j) + x
        // >= : the LARGER j wins exact ties (struct-max semantics)
        if (s >= score(i)) { score(i) = s; back(i) = j }
      }
    }
    val pieces = scala.collection.mutable.ListBuffer.empty[String]
    var i = n
    while (i > 0) { pieces.prepend(w.substring(back(i), i)); i = back(i) }
    pieces.toList
  }

  private def sparkViterbi(
      words: Seq[String], lp: Map[String, Double], maxLen: Int): Seq[Seq[String]] = {
    import spark.implicits._
    words.toDF("w")
      .select(Tokenizer.unigramViterbi(col("w"), typedlit(lp), maxLen).as("p"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  test("unigramViterbi picks the max-probability segmentation") {
    val lp = Map("ab" -> math.log(0.5), "a" -> math.log(0.25), "b" -> math.log(0.25))
    assert(sparkViterbi(Seq("ab"), lp, 2) == Seq(Seq("ab")))
    // equal-score paths: ab|c vs a|bc, the larger split point wins -> ab|c
    val flat = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0, "ab" -> -1.0, "bc" -> -1.0)
    assert(sparkViterbi(Seq("abc"), flat, 2) == Seq(Seq("ab", "c")))
    // OOV single char falls back to UnkLogProb; OOV multi-char never used
    assert(sparkViterbi(Seq("xy"), Map("x" -> -1.0), 2) == Seq(Seq("x", "y")))
    // empty word short-circuits to an empty segmentation (sequence(1,0)
    // is DESCENDING in Spark — the fold must never see it)
    assert(sparkViterbi(Seq(""), Map("x" -> -1.0), 2) == Seq(Seq()))
  }

  test("unigramViterbi matches the reference on random words and vocabs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    for (trial <- 1 to 8) {
      val pieces = (for (_ <- 1 to 12) yield {
        val len = 1 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }).distinct
      // distinct log-probs avoid cross-impl tie sensitivity beyond the
      // defined larger-j rule (which the flat-vocab case pins exactly)
      val lp = pieces.zipWithIndex
        .map { case (p, i) => p -> (-1.0 - i * 0.137) }.toMap
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(9)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val got = sparkViterbi(words, lp, 3)
      val want = words.map(w => refViterbi(w, lp, 3))
      assert(got == want, s"trial $trial: $words")
    }
  }

  test("unigramTrain treats a non-BMP char as a single piece (codepoints, not UTF-16 units)") {
    import spark.implicits._
    // U+1D569 is two UTF-16 code units. It survives EM as a standalone
    // word piece (count 2); with vocabSize = 1 every MULTI-char piece is
    // pruned and the higher-count "ab" (3) would crowd it out — so "𝕩"
    // stays in the vocab only if the coverage partition counts
    // CODEPOINTS (a UTF-16 .length == 1 check routes it to the pruned
    // multi-char pool)
    val df = Seq("𝕩 𝕩 ab ab ab").toDF("text")
    val vocab = Tokenizer.unigramTrain(df, col("text"), vocabSize = 1,
      maxPieceLen = 2, seedSize = 10, emRounds = 1)
    val pieces = vocab.map(_.piece).toSet
    assert(pieces.contains("𝕩"), s"non-BMP char pruned: $pieces")
    assert(!pieces.contains("ab"), s"vocabSize=1 must prune multi pieces: $pieces")
  }

  test("unigramTrain: seed covers chars, EM prunes, logprobs normalize") {
    import spark.implicits._
    val corpus = (Seq.fill(6)("low") ++ Seq.fill(3)("lower") ++
      Seq.fill(3)("lowest") ++ Seq.fill(4)("newer") ++ Seq.fill(2)("widest"))
      .mkString(" ")
    val df = Seq(corpus).toDF("text")
    val vocab = Tokenizer.unigramTrain(df, col("text"), vocabSize = 12,
      maxPieceLen = 3, seedSize = 20, emRounds = 2)
    assert(vocab.nonEmpty && vocab.forall(_.cnt > 0))
    // every surviving piece's logprob is ln(cnt / total)
    val total = vocab.map(_.cnt).sum.toDouble
    vocab.foreach(p => assert(p.logprob == math.log(p.cnt / total)))
    // deterministic: a second run is identical
    val again = Tokenizer.unigramTrain(df, col("text"), vocabSize = 12,
      maxPieceLen = 3, seedSize = 20, emRounds = 2)
    assert(vocab == again)
    // encode round-trips: concatenated pieces rebuild each word
    val lp = vocab.map(p => p.piece -> p.logprob).toMap
    val enc = Seq("lowest widest unseen").toDF("text")
      .select(Tokenizer.unigramEncode(col("text"), typedlit(lp), 3).as("p"))
      .head().getSeq[String](0)
    assert(enc.mkString == "lowestwidestunseen")
  }

  /** Independent in-memory WordPiece trainer (likelihood-greedy merges
    * over the word-type histogram) to pin [[Tokenizer.wpTrain]] against. */
  private def refWpTrain(texts: Seq[String], k: Int)
      : Seq[(Long, String, String, Long, Double, String)] = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts if t != null; w <- t.split(" ", -1) if w.nonEmpty)
      wc(w) = wc.getOrElse(w, 0L) + 1L
    var types: Map[String, Vector[String]] = wc.keys.map { w =>
      val cs = w.map(_.toString).toVector
      w -> (cs.head +: cs.tail.map("##" + _))
    }.toMap
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, Long, Double, String)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val uc = scala.collection.mutable.Map.empty[String, Long]
      for ((w, sym) <- types) {
        for (p <- sym.zip(sym.tail)) pc(p) = pc.getOrElse(p, 0L) + wc(w)
        for (s <- sym) uc(s) = uc.getOrElse(s, 0L) + wc(w)
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), n) =>
          (-(n.toDouble / (uc(x).toDouble * uc(y).toDouble)), x + " " + y)
        }
        val score = c.toDouble / (uc(a).toDouble * uc(b).toDouble)
        val merged = a + b.stripPrefix("##")
        types = types.map { case (w, sym) =>
          val outSym = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < sym.length) {
            if (j + 1 < sym.length && sym(j) == a && sym(j + 1) == b) {
              outSym += merged; j += 2
            } else { outSym += sym(j); j += 1 }
          }
          w -> outSym.toVector
        }
        out += ((step.toLong, a, b, c, score, merged))
        step += 1
      }
    }
    out.toSeq
  }

  test("wpTrain matches the likelihood-greedy reference on a mixed corpus") {
    import spark.implicits._
    val texts = Seq(
      "hugging hugging hugs hug", "bug bugs hugging b",
      "hug hug hug pug pugs", null, "", "  double  space ")
    val df = texts.toDF("text")
    val got = Tokenizer.wpTrain(df, col("text"), numMerges = 6)
      .map(m => (m.rnk, m.a, m.b, m.cnt, m.score, m.merged))
    assert(got == refWpTrain(texts, 6))
  }

  test("wpTrain scores by likelihood, not raw count") {
    import spark.implicits._
    // pair (a,##b) appears 3x but both symbols are everywhere (low
    // score); (x,##y) appears twice with rare symbols (high score):
    // WordPiece must pick (x,##y) first where BPE would pick (a,##b)
    val df = Seq("ab ab ab a a a a b b b b xy xy").toDF("text")
    val m = Tokenizer.wpTrain(df, col("text"), numMerges = 1).head
    assert((m.a, m.b) == ("x", "##y"), s"got (${m.a}, ${m.b})")
    // and the BPE rule on the same corpus picks by raw pair count
    val bpe = Tokenizer.bpeTrain(df, col("text"), numMerges = 1).head
    assert((bpe.a, bpe.b) != ("x", "##y"))
  }

  test("wpEncode is greedy longest-match with [UNK] fallback") {
    import spark.implicits._
    val vocab = Seq("un", "##aff", "##able", "##ffa", "a", "##a", "b",
      "##b", "##l", "##e", "##f", "hug", "##s").zipWithIndex.toMap
    val enc = Seq("unaffable hugs zebra unb").toDF("text")
      .select(Tokenizer.wpEncode(col("text"), typedlit(vocab), 6).as("p"))
      .head().getSeq[String](0)
    // 'unaffable' -> un ##aff ##able (longest-first at every step);
    // 'zebra' has no word-initial 'z' piece -> [UNK]; 'unb' -> un ##b
    assert(enc == Seq("un", "##aff", "##able", "hug", "##s",
      Tokenizer.UnkToken, "un", "##b"), s"got $enc")
  }

  test("wpTrain -> wpVocab -> wpEncode round-trips the training corpus") {
    import spark.implicits._
    val df = Seq("hugging hugging hugs hug", "bug bugs hugging").toDF("text")
    val merges = Tokenizer.wpTrain(df, col("text"), numMerges = 4)
    assert(merges.size == 4)
    // symbol counts shrink monotonically (each merge strictly compresses)
    assert(merges.map(_.corpusSymbolsAfter) ==
      merges.map(_.corpusSymbolsAfter).sorted.reverse)
    val vocab = Tokenizer.wpVocab(df, col("text"), merges)
    val maxLen = vocab.map(p => p.stripPrefix("##").length).max
    val vm = vocab.zipWithIndex.toMap
    val enc = df.select(col("text"),
        Tokenizer.wpEncode(col("text"), typedlit(vm), maxLen).as("p"))
      .collect()
    // training-corpus words always encode without UNK (alphabet covers
    // them), and concatenated pieces rebuild the text modulo marks
    enc.foreach { r =>
      val rebuilt = r.getSeq[String](1).map(_.stripPrefix("##")).mkString
      assert(rebuilt == r.getString(0).replace(" ", ""))
    }
  }
}
