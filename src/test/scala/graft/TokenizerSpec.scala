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
}
