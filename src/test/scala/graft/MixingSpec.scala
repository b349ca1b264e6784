package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Contamination, Mixing}

class MixingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("mixing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = {
    import spark.implicits._
    (0L until 400L).map { i =>
      val src = (i % 4) match {
        case 0 => "web"; case 1 => "web"; case 2 => "books"; case _ => "code"
      }
      (i, src, s"document number $i from $src with some words")
    }.toDF("doc_id", "source", "text")
  }

  test("hash sampling is deterministic and monotone in the rate") {
    val s25 = Mixing.hashSample(docs, "doc_id", 250000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s25again = Mixing.hashSample(docs, "doc_id", 250000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s50 = Mixing.hashSample(docs, "doc_id", 500000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s25 == s25again, "same salt+rate must reproduce the same sample")
    assert(s25.subsetOf(s50), "raising the rate must only add rows")
    // md5 buckets are uniform: 400 rows at 25% should land near 100
    assert(s25.size > 60 && s25.size < 140, s"got ${s25.size} of 400 at 25%")
    // a different salt draws a different (but equally sized-ish) sample
    val other = Mixing.hashSample(docs, "doc_id", 250000L, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != s25)
  }

  test("split partitions every row exactly once with stable labels") {
    val out = Mixing.split(docs, "doc_id",
      splits = Seq("val" -> 100000L, "test" -> 100000L), rest = "train")
    assert(out.count() == 400)
    val byLabel = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("val", "test", "train"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // membership is per-row deterministic: re-evaluating agrees
    val again = Mixing.split(docs, "doc_id",
      splits = Seq("val" -> 100000L, "test" -> 100000L), rest = "train")
    assert(out.select("doc_id", "split").except(again.select("doc_id", "split")).isEmpty)
  }

  test("leakSafeSplit assigns near-dup clusters atomically") {
    import spark.implicits._
    // two explicit clusters ({1,2,4} via a chain, {7,8}) + singletons
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = Mixing.leakSafeSplit(docs, "doc_id", pairs,
      splits = Seq("val" -> 300000L, "test" -> 300000L)).collect()
    val splitOf = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(splitOf(1L) == splitOf(2L) && splitOf(2L) == splitOf(4L))
    assert(splitOf(7L) == splitOf(8L))
    assert(out.length == 400, "left join must keep every doc")
    // clustered docs carry their component; singletons fall back to id
    val comp = out.map(r => r.getAs[Long]("doc_id") ->
      Option(r.getAs[Any]("component"))).toMap
    assert(comp(1L).contains(1L) && comp(4L).contains(1L) && comp(7L).contains(7L))
    assert(comp(0L).isEmpty && comp(3L).isEmpty)
    val units = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("split_unit")).toMap
    assert(units(4L) == "1" && units(3L) == "3")
    // string ids must hash like Mixing.split's own id cast — not null
    // out through a long cast
    import spark.implicits._
    val sdocs = (0 until 50).map(i => s"doc-$i").toDF("doc_id")
    val sout = Mixing.leakSafeSplit(sdocs, "doc_id",
      Seq(("doc-1", "doc-2")).toDF("doc_a", "doc_b"),
      splits = Seq("val" -> 300000L, "test" -> 300000L)).collect()
    val ssplits = sout.map(_.getAs[String]("split")).toSet
    assert(ssplits.size > 1, s"string ids collapsed into one split: $ssplits")
    val splain = Mixing.split(sdocs, "doc_id",
      splits = Seq("val" -> 300000L, "test" -> 300000L)).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[String]("split")).toMap
    sout.filterNot(r => Set("doc-1", "doc-2")(r.getAs[String]("doc_id")))
      .foreach(r => assert(r.getAs[String]("split") ==
        splain(r.getAs[String]("doc_id"))))
    // singleton assignment matches the plain doc-keyed split (same
    // value space, so overall ratios are preserved)
    val plain = Mixing.split(docs, "doc_id",
      splits = Seq("val" -> 300000L, "test" -> 300000L)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clustered = Set(1L, 2L, 4L, 7L, 8L)
    assert(splitOf.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)))
  }

  test("perKeyCap keeps the first N per key and exempts null keys") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"),
      (6L, null), (7L, null)
    ).toDF("id", "host")
    val out = Mixing.perKeyCap(rows, col("host"), col("id"), cap = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> true, 6L -> true, 7L -> true))
  }

  test("stratified sample applies per-stratum rates") {
    val out = Mixing.stratifiedSample(docs, "source", "doc_id",
      ratesPpm = Map("web" -> 1000000L, "books" -> 0L), defaultPpm = 500000L)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("web") == 200L, "rate 1e6 keeps every web row")
    assert(!bySrc.contains("books"), "rate 0 drops the stratum")
    val code = bySrc("code")
    assert(code > 20 && code < 80, s"default 50% of 100 code rows, got $code")
  }

  test("temperature mix follows n^(1/tau) composition and caps at the source size") {
    // sources sized 200/100/100; tau=2 weights sqrt(200):sqrt(100):sqrt(100)
    val out = Mixing.temperatureMix(docs, "source", "doc_id",
      tau = 2.0, targetTotal = 200L)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wWeb = math.sqrt(200.0)
    val wOther = math.sqrt(100.0)
    val expWeb = 200.0 * wWeb / (wWeb + 2 * wOther)
    val expOther = 200.0 * wOther / (wWeb + 2 * wOther)
    assert(math.abs(bySrc("web") - expWeb) < 30, s"web ${bySrc("web")} vs ~$expWeb")
    assert(math.abs(bySrc("books") - expOther) < 25, s"books ${bySrc("books")} vs ~$expOther")
    assert(math.abs(bySrc("code") - expOther) < 25, s"code ${bySrc("code")} vs ~$expOther")
    // a target beyond the corpus caps every rate at 1e6 = the full table
    val all = Mixing.temperatureMix(docs, "source", "doc_id",
      tau = 2.0, targetTotal = 10000L)
    assert(all.count() == 400)
    assert(all.select(max(col("rate_ppm"))).head().getLong(0) == 1000000L)
  }

  test("temperature mix tolerates null and non-string source values") {
    import spark.implicits._
    // a null source must not crash planning; its rows plan rate 0 and
    // drop from the output. A numeric source column plans via string cast.
    val withNull = docs.withColumn("source",
      when(col("doc_id") % 10 === 0, lit(null)).otherwise(col("source")))
    val out = Mixing.temperatureMix(withNull, "source", "doc_id",
      tau = 1.0, targetTotal = 10000L)
    assert(out.filter(col("source").isNull).count() == 0)
    assert(out.count() == withNull.filter(col("source").isNotNull).count())
    val numeric = docs.withColumn("srcnum", (col("doc_id") % 3).cast("long"))
    val outNum = Mixing.temperatureMix(numeric, "srcnum", "doc_id",
      tau = 1.0, targetTotal = 10000L)
    assert(outNum.count() == 400)
  }

  test("upsample repeats rows by weight with observable epochs") {
    val out = Mixing.upsample(docs, "source", "doc_id",
      weightsPpm = Map("books" -> 2500000L, "web" -> 500000L))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // books ×2.5 over 100 rows → between strictly-2 and strictly-3 copies
    assert(bySrc("books") > 200 && bySrc("books") < 300, s"books ${bySrc("books")}")
    // web ×0.5 over 200 rows → a strict subset, roughly half
    assert(bySrc("web") > 60 && bySrc("web") < 140, s"web ${bySrc("web")}")
    // default weight 1.0 passes code through exactly once
    assert(bySrc("code") == 100L)
    // epochs are dense 0..rep-1 per row: every books doc has epochs {0,1}
    // at least, and any third copy is epoch 2
    val epochs = out.filter(col("source") === "books")
      .groupBy("doc_id").agg(collect_set(col("epoch")).as("es"))
      .collect().map(_.getSeq[Long](1).sorted)
    assert(epochs.forall(es => es == (0L until es.length.toLong)))
    assert(epochs.forall(es => es.length == 2 || es.length == 3))
    // weight 0 drops the stratum entirely
    val none = Mixing.upsample(docs, "source", "doc_id",
      weightsPpm = Map("code" -> 0L))
    assert(none.filter(col("source") === "code").count() == 0)
  }

  test("contamination flags verbatim n-gram overlap with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // contains eval 100 fully
      (2L, "totally unrelated words about storage engines and columns"),
      (3L, "alpha beta gamma something else entirely here now")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "beta gamma delta epsilon zeta"),
      (200L, "unmatched benchmark prompt nothing shares this")
    ).toDF("doc_id", "text")

    val overlaps = Contamination.ngramOverlap(corpus, eval, "doc_id", "text",
        n = 3, minFrac = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // doc 1 contains all 3 of eval-100's trigrams
    assert(overlaps((1L, 100L)) == 1.0)
    // doc 3 shares only "alpha beta gamma"? that trigram is NOT in eval 100
    // (eval 100 starts at beta) -> no pair for doc 3
    assert(!overlaps.contains((3L, 100L)))
    assert(!overlaps.exists { case ((_, e), _) => e == 200L })

    val flagged = Contamination.contaminatedDocs(corpus, eval, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged == Map(1L -> 100L))
  }

  test("contamination doc-frequency cap drops boilerplate shingles") {
    import spark.implicits._
    // the same boilerplate trigram in every corpus doc would fan out the
    // join; the cap removes it while the rare overlap stays
    val corpus = (1L to 5L).map(i =>
      (i, s"shared boiler plate text plus unique token$i rare overlap phrase"))
      .toDF("doc_id", "text")
    val eval = Seq((9L, "unique token3 rare overlap phrase tail")).toDF("doc_id", "text")
    val capped = Contamination.ngramOverlap(corpus, eval, "doc_id", "text",
      n = 3, minFrac = 0.0, maxShingleDocFreq = Some(2))
    val hits = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((3L, 9L)), "the rare doc-3 overlap must survive the cap")
    // "rare overlap phrase" appears in all 5 corpus docs -> capped away,
    // so docs 1,2,4,5 (which share ONLY capped shingles with eval) vanish
    assert(hits == Set((3L, 9L)))
  }

  test("deterministic shuffle is a stable permutation into dense shard positions") {
    val out = Mixing.deterministicShuffle(docs, "doc_id", nShards = 7,
      salt = "epoch0")
    val rows = out.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 400 && rows.map(_._1).distinct.length == 400,
      "a permutation: every row exactly once")
    // positions are dense 1..n within each shard
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq)
    }
    // re-running with the same salt reproduces the identical assignment
    val again = Mixing.deterministicShuffle(docs, "doc_id", nShards = 7,
      salt = "epoch0")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSet == again.toSet)
    // a different salt is a genuinely different permutation
    val other = Mixing.deterministicShuffle(docs, "doc_id", nShards = 7,
      salt = "epoch1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSet != other.toSet)
  }

  test("deterministic shuffle preserves graft meta columns and breaks id ties") {
    import spark.implicits._
    // a graft-read frame carries _g_key; the shuffle's scratch column
    // must not clobber it
    val withMeta = docs.withColumn("_g_key", col("doc_id").cast("string"))
    val kept = Mixing.deterministicShuffle(withMeta, "doc_id", nShards = 3,
      salt = "ep0")
    assert(kept.columns.contains("_g_key"))
    assert(kept.select("_g_key").as[String].collect().sorted.toSeq ==
      (0L until 400L).map(_.toString).sorted)

    // upsampled input: same doc_id appears once per epoch — the epoch
    // tiebreak pins the copies' relative order deterministically
    val epochs = docs.limit(20)
      .withColumn("epoch", explode(array(lit(0), lit(1), lit(2))))
    val a = Mixing.deterministicShuffle(epochs, "doc_id", nShards = 2,
      salt = "s", tiebreak = Seq("epoch"))
      .select("doc_id", "epoch", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val b = Mixing.deterministicShuffle(
      epochs.repartition(5), // different input layout, same permutation
      "doc_id", nShards = 2, salt = "s", tiebreak = Seq("epoch"))
      .select("doc_id", "epoch", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(a == b, "epoch tiebreak must make duplicate-id shuffles stable")
  }

  test("doremi EG rounds: simplex, monotonicity, smoothing floor, uniform fixpoint") {
    val losses = Seq("web" -> 0.5, "books" -> 0.0, "code" -> 0.2)
    val w = Mixing.doremiRounds(losses, rounds = 5, eta = 1.0, smoothing = 0.1)
    assert(math.abs(w.values.sum - 1.0) < 1e-12, "weights must sum to 1")
    assert(w("web") > w("code") && w("code") > w("books"),
      "higher excess loss must receive higher weight")
    // every averaged round mixes in c/K uniform, so no domain can fall
    // below the smoothing floor
    assert(w.values.forall(_ >= 0.1 / 3 - 1e-12), s"smoothing floor violated: $w")
    // zero excess everywhere -> EG step is the identity -> exactly uniform
    val u = Mixing.doremiRounds(
      Seq("a" -> 0.0, "b" -> 0.0), rounds = 3, eta = 2.0, smoothing = 0.2)
    assert(u.values.forall(v => math.abs(v - 0.5) < 1e-12))
    assert(Mixing.doremiRounds(Nil, 3, 1.0, 0.1).isEmpty)
  }

  test("doremiWeights censuses per-domain losses and joins weights back") {
    import spark.implicits._
    // books docs carry clearly higher loss than web/code
    val scored = (0L until 300L).map { i =>
      val dom = (i % 3) match {
        case 0 => "web"; case 1 => "books"; case _ => "code"
      }
      val loss = if (dom == "books") 4.0 + (i % 7) * 0.01 else 2.0 + (i % 5) * 0.01
      (i, dom, loss)
    }.toDF("doc_id", "domain", "loss")
    val out = Mixing.doremiWeights(scored, "domain", "loss",
      rounds = 3, eta = 1.0, smoothing = 0.2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == Set("web", "books", "code"))
    assert(out.values.map(_._1).sum == 300L)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-12)
    assert(out("books")._2 > 0.0, "books must show positive excess loss")
    assert(out("web")._2 == 0.0 && out("code")._2 == 0.0,
      "below-baseline domains clamp to zero excess")
    assert(out("books")._3 > out("web")._3 && out("books")._3 > out("code")._3)
    // explicit per-domain baselines: the two-model (proxy - reference) form
    val ref = Map("web" -> 2.0, "books" -> 4.05, "code" -> 2.0)
    val out2 = Mixing.doremiWeights(scored, "domain", "loss",
      rounds = 3, eta = 1.0, smoothing = 0.2, baselinePerDomain = Some(ref))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(out2.values.sum - 1.0) < 1e-12)
  }
}
