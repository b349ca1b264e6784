package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the scale paths: the gated
  * banded/bucketed near-dup variants must contain NO cartesian product
  * anywhere (their whole point is replacing the all-pairs comparison
  * with bucket equi-joins), filters must reach the parquet scans, and
  * small dimension sides must broadcast. */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("banded/bucketed near-dup plans contain no cartesian join at all") {
    for (q <- Seq("q26_dedup_minhash", "q27b_dedup_simhash_banded",
      "q29b_embed_neardup_bucketed")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("ANN plans: no cartesian; cross joins only against broadcast tiny sides") {
    // lshAnn / ivfAnn broadcast the query set / centroids — a
    // BroadcastNestedLoopJoin against those tiny sides is the intended
    // shape; an un-broadcast CartesianProduct is not
    for (q <- Seq("q30_ann_lsh", "q38_ann_ivf")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
  }

  test("the exact all-pairs variants DO declare their cross join (sanity)") {
    // q27/q29 are the documented small-corpus exact tools; this guards
    // against silently swapping the gate queries back
    val p = planOf("q29_embed_neardup")
    assert(p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("filters and projections reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.replaceAll("\\s", "").contains("PushedFilters:[Is") ||
      p.contains("GreaterThan") || p.contains("EqualTo"),
      s"expected real pushed predicates, got scan: ${p.linesIterator.filter(_.contains("PushedFilters")).mkString}")
  }

  test("small dimension sides broadcast in join-heavy queries") {
    val p = planOf("q03_top_revenue_orders")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast hash join")
    assert(!p.contains("CartesianProduct"))
  }

  test("contamination joins through the shingle inverted index, no cartesian") {
    val p = planOf("q88_contamination")
    assert(!p.contains("CartesianProduct"), "contamination plans a CartesianProduct")
    assert(!p.contains("BroadcastNestedLoopJoin"), "contamination plans a nested-loop join")
  }

  test("sampling/split/upsample stay joinless single-scan pipelines") {
    for (q <- Seq("q89_stratified_sample", "q92_upsample_epochs")) {
      val p = planOf(q)
      assert(!p.contains("Join"), s"$q plans a join — membership must be a filter")
    }
  }

  test("span dedup and canonical selection join by hash/component, no cartesian") {
    for (q <- Seq("q95_span_dedup", "q96_canonical_docs")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("unigram xent rides a broadcast of the vocab-sized frequency table") {
    val p = planOf("q97_unigram_xent")
    assert(p.contains("BroadcastHashJoin"),
      "the frequency join must broadcast, not shuffle the corpus tokens")
    assert(!p.contains("CartesianProduct"))
  }

  test("deterministic shuffle windows are partitioned by shard (no global sort)") {
    val p = planOf("q98_deterministic_shuffle")
    assert(!p.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"found an unpartitioned window in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("as-of joins are union+window: no join operator, one key shuffle") {
    // AsofJoin's contract is O((|L|+|R|)·log) via a single window over
    // the union — an inequality join sneaking in would be O(|L|·|R|)
    for (q <- Seq("q104_asof_purchase_click", "q105_click_conversion")) {
      val p = planOf(q)
      assert(!p.contains("Join"), s"$q plans a join — as-of must be union+window")
      val keyShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(keyShuffles == 1,
        s"$q has $keyShuffles hash exchanges, want exactly 1 (the window)")
    }
  }

  test("interval join buckets to an equi-join, no cartesian") {
    val p = planOf("q106_purchase_in_view_window")
    assert(!p.contains("CartesianProduct"), "interval join plans a CartesianProduct")
    assert(!p.contains("BroadcastNestedLoopJoin"), "interval join plans a nested-loop join")
  }

  test("no shuffle exchange carries embedding vectors in the ANN/bucketed plans") {
    // the scale contract for the similarity family: candidate generation,
    // dedup, and cell-assignment exchanges move bare ids (plus band/cell/
    // score scalars) only — the wide array<float> columns are re-joined
    // AFTER the distinct, never shuffled through it
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // DoubleType arrays count too: the SQ8/PQ paths DECODE to double
      // vectors scan-side, and those must be pruned before any exchange
      for (q <- Seq("q29b_embed_neardup_bucketed", "q30_ann_lsh", "q38_ann_ivf",
          "q123_sq8_ann", "q130_pq_ann", "q131_ivfpq_ann", "q145_ann_recall")) {
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val offenders = plan.collect { case e: ShuffleExchangeExec =>
          e.output.collect {
            case a if a.dataType.isInstanceOf[ArrayType] &&
              (a.dataType.asInstanceOf[ArrayType].elementType == FloatType ||
                a.dataType.asInstanceOf[ArrayType].elementType == DoubleType) =>
              a.name
          }
        }.flatten
        assert(offenders.isEmpty,
          s"$q shuffles embedding columns ${offenders.distinct.mkString(", ")} through an Exchange")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("sequence packing computes offsets without a global window") {
    // the global-cumsum trap: one unpartitioned window = one task for
    // the whole corpus. Packing must ride the bucketed prefix-sum.
    val p = planOf("q138_seq_packing")
    assert(!p.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"found an unpartitioned window in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("semDedup: vectors only ever shuffle keyed by cell (the bounded self-join)") {
    // assignment is per-row kernel math against the driver-collected
    // quantizer — no exchange at all; the ONLY exchanges allowed to
    // carry a vector are the two cell-keyed self-join sides
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q139_semdedup")(spark, sf)
        .queryExecution.executedPlan
      val vecExchanges = plan.collect {
        case e: ShuffleExchangeExec
          if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
      }
      assert(vecExchanges.size <= 2,
        s"${vecExchanges.size} vector-carrying exchanges, want <= 2")
      vecExchanges.foreach { e =>
        val ok = e.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.exists(_.references.exists(_.name == "cell"))
          case _ => false
        }
        assert(ok, s"vector exchange not keyed by cell:\n$e")
      }
      assert(!plan.toString.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("cluster sampling and random projection never shuffle a vector") {
    // q165: assignment is kernel math, and the per-cell rank window sees
    // (id, cell) only — the vector is projected away BEFORE the window's
    // exchange. q166: the projection is per-row folds; the only exchange
    // is the output sort, carrying scalars. Neither plan may move an
    // array column through any Exchange, and neither joins at all.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q165_cluster_sample", "q166_rp_reduce")) {
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val offenders = plan.collect {
          case e: ShuffleExchangeExec
            if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
        }
        assert(offenders.isEmpty,
          s"$q shuffles an array column:\n${offenders.mkString("\n")}")
        assert(!plan.toString.contains("Join"), s"$q plans a join")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("novelty / leak-safe split / recall / host-cap plans stay cartesian-free") {
    // q142's inverted-index join output is index-sized by construction;
    // q143/q145 may broadcast tiny sides (the violation scalar, the
    // query set) through a nested-loop, but never a real cartesian
    for (q <- Seq("q142_novelty", "q143_leak_safe_split",
        "q145_ann_recall", "q146_host_caps")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
    val novelty = planOf("q142_novelty")
    assert(!novelty.contains("BroadcastNestedLoopJoin"),
      "novelty join must stay an equi-join on the shingle")
    val caps = planOf("q146_host_caps")
    assert(!caps.contains("Join"), "host caps is one window pass, no join")
  }

  test("the one-pass LSH kernel runs fused in the banded plans") {
    val p = planOf("q29b_embed_neardup_bucketed")
    assert(p.contains("lshbandbuckets("), s"expected the LSH kernel in the plan")
  }

  test("winnow/edit-verify/budget-mix plans: no cartesian, budget apply joinless") {
    // winnow overlap joins through the fingerprint inverted index like
    // jaccard; edit verify joins candidate ids to capped text, never
    // all-pairs; the budget-mix rate table rides the closure as a CASE —
    // the sampled scan must plan NO join at all
    for (q <- Seq("q174_winnow_overlap", "q177_edit_verify",
        "q175_token_budget_mix")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "en", 40L), (2L, "fr", 10L))
      .toDF("doc_id", "lang", "n_toks")
    val mix = graft.llm.Mixing.tokenBudgetMix(
      docs, "lang", "doc_id", col("n_toks"), Map("en" -> 1L, "fr" -> 1L), 30L)
    val p = mix.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"budget-mix apply plans a join:\n$p")
  }

  test("unigram EM round: one aggregation exchange, vocab as a single literal") {
    // the EM recount is explode(viterbi) -> hash agg: exactly one hash
    // exchange (the groupBy), and the vocab map must ride the plan as a
    // broadcast-free literal (keys would appear as a join otherwise)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // AQE off: the adaptive wrapper hides exchanges in the plan string
    // until execution, which would make the count vacuously 0
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq("low lower lowest low low newer").toDF("text")
      val lp = Map("low" -> -1.0, "er" -> -2.0, "l" -> -3.0, "o" -> -3.0,
        "w" -> -3.0, "e" -> -3.0, "n" -> -3.0, "s" -> -3.0, "t" -> -3.0)
      val counts = df
        .select(explode(graft.llm.TextFunctions.wsTokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .select(explode(
          graft.llm.Tokenizer.unigramViterbi(col("w"), typedlit(lp), 3))
          .as("piece"))
        .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
      val p = counts.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"EM recount plans a join:\n$p")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1, s"EM recount has $exchanges hash exchanges:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("card scrubbing is a joinless, shuffle-free per-row pipeline") {
    // the Luhn fold + regex family must never move a row: no join, no
    // exchange beyond the gate's own final ORDER BY range partitioning
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, sf, "documents")
    val (nCand, nValid) = graft.llm.TextFunctions.cardCounts(col("text"))
    val p = docs.select(col("doc_id"), nCand, nValid,
        graft.llm.TextFunctions.redactCards(col("text")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"card scrub plans a join:\n$p")
    assert(!p.contains("Exchange"), s"card scrub plans an exchange:\n$p")
  }

  test("doremi weights cost ONE census aggregation; the mix apply stays joinless") {
    import org.apache.spark.sql.functions._
    // census plan: one hash-aggregate pair over one scan, no join
    val scored = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("double").as("loss"))
    val census = scored.filter(col("source").isNotNull && col("loss").isNotNull)
      .groupBy(col("source")).agg(count(lit(1)), avg(col("loss")))
    val pc = census.queryExecution.executedPlan.toString
    assert(!pc.contains("Join"), s"doremi census plans a join:\n$pc")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(pc).size
    assert(exchanges == 1, s"doremi census has $exchanges exchanges:\n$pc")
    // the realized mix (q198's apply phase): rates ride a CASE — the only
    // joins in the WHOLE gated plan are the xent scoring's broadcast of
    // the vocab-sized frequency table; nothing shuffles twice for rates
    val p = planOf("q198_doremi_budget_mix")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q198 plans a cartesian:\n$p")
    val sorts = "SortMergeJoin".r.findAllIn(p).size
    assert(sorts <= 1, s"q198 plans $sorts sort-merge joins — rate apply " +
      s"must be a CASE filter, not a join:\n$p")
  }
}
