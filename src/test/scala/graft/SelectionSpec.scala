package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Selection

class SelectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("selection-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus = {
    import spark.implicits._
    // target-flavored docs repeat "alpha beta"; off-target docs are
    // drawn from a disjoint vocabulary
    val rows =
      Seq.tabulate(10)(i => (i.toLong, "alpha beta alpha beta gamma", "en")) ++
        Seq.tabulate(10)(i => (10L + i, "zeta eta theta iota kappa", "de")) ++
        Seq((20L, "alpha beta gamma alpha", "de"), (21L, null, "en"))
    rows.toDF("doc_id", "text", "lang")
  }

  test("log weights rank target-like docs above off-target docs") {
    val docs = corpus
    val w = Selection
      .dsirLogWeights(docs, docs.filter(col("lang") === "en"), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 20 shares the target's n-grams, docs 10..19 share none
    assert(w(20L) > w(10L))
    assert((0L until 10L).forall(i => w(i) > w(10L)))
    // null text is dropped, not scored
    assert(!w.contains(21L))
  }

  test("n_grams counts unigrams plus bigrams") {
    val docs = corpus
    val row = Selection
      .dsirLogWeights(docs, docs, "doc_id", col("text"))
      .filter(col("doc_id") === 0L).collect()(0)
    assert(row.getLong(1) == 5L + 4L)
  }

  test("unseen n-grams stay finite via smoothing") {
    val docs = corpus
    val w = Selection
      .dsirLogWeights(docs, docs.filter(col("lang") === "en"), "doc_id",
        col("text"), dim = 8)
      .collect().map(_.getDouble(2))
    assert(w.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("resample is deterministic, without replacement, and salt-sensitive") {
    val docs = corpus
    def run(salt: String) = Selection
      .dsirResample(docs, docs.filter(col("lang") === "en"), "doc_id",
        col("text"), n = 8, salt = salt)
      .collect().map(_.getLong(0)).toSeq
    val a = run("s1")
    assert(a == run("s1"))
    assert(a.distinct.length == a.length)
    assert(a.length == 8)
    assert(a != run("s2"))
  }

  test("NB classifier separates the classes by content, not by label") {
    val docs = corpus
    val scored = Selection
      .nbScore(docs, docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    // target-vocab docs classify positive, off-vocab negative
    (0L until 10L).foreach(i => assert(scored(i)._2, s"doc $i"))
    (10L until 20L).foreach(i => assert(!scored(i)._2, s"doc $i"))
    // doc 20 is LABELED de but written in the positive class's
    // vocabulary — a content-based classifier must score it positive
    assert(scored(20L)._2)
    assert(scored(20L)._1 > scored(10L)._1)
    // null text dropped, finite scores everywhere (smoothing)
    assert(!scored.contains(21L))
    assert(scored.values.forall(s => !s._1.isNaN && !s._1.isInfinite))
  }

  test("NB scoring pass plans no join (literal log-odds table)") {
    val docs = corpus
    val plan = Selection
      .nbScore(docs, docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"), "doc_id", col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"NB scoring pass plans a join:\n$plan")
  }

  test("the scoring pass plans no join and selection plans TakeOrdered") {
    val docs = corpus
    val plan = Selection
      .dsirResample(docs, docs.filter(col("lang") === "en"), "doc_id",
        col("text"), n = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"DSIR scoring pass plans a join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"DSIR selection is not a TakeOrdered:\n$plan")
  }
}
