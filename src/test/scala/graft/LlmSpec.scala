package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm._

class LlmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("llm-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (3L, "completely different content about query engines and columnar storage systems"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical text and keeps the min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("canonical_id").collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("canonical_id") == 1L).get
    assert(dup.getAs[Long]("n_copies") == 2L)
  }

  test("jaccard pairs find near-dups and exact dups but not distinct docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH candidates cover the true near-dup pairs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 16, bands = 4, minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: all bands collide
    assert(pairs.contains((1L, 2L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental LSH probe rounds compose to the one-shot answer") {
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 16)
    val full = Dedup.minhashLshFromSigs(sigs, k = 16, bands = 4, minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch split {1,3} then {2,4}: round 1 = pairs within the old set,
    // round 2 = probe of the new ids against everything
    val oldSigs = sigs.filter(col("doc_id") % 2 === 1)
    val round1 = Dedup.minhashLshFromSigs(oldSigs, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val round2 = Dedup.minhashLshFromSigs(sigs, 16, 4, 0.5,
        probeIds = Some(Seq(2L, 4L).toDF("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(round1.union(round2) == full, "incremental rounds must compose exactly")
    assert(round1.intersect(round2).isEmpty, "probe mode must not re-report old pairs")
    assert(round2.forall { case (a, b) => a == 2 || a == 4 || b == 2 || b == 4 })
  }

  test("simhash: exact dup at distance 0; banded variant agrees with all-pairs") {
    val all = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0L))
    val banded = Dedup.simhashPairsBanded(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == all) // pigeonhole banding loses nothing within distance d
  }

  test("near-dup clustering is transitive (a~b, b~c => one component)") {
    import spark.implicits._
    // chain: 1-2 and 2-3 are pairs, 1-3 is NOT; plus isolated pair 8-9
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("doc_a", "doc_b")
    val comps = Dedup.nearDupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(8L) == 8L && comps(9L) == 8L)
  }

  test("shingle doc-frequency cap drops hot shingles") {
    val uncapped = Dedup.shingleIndex(docs, "doc_id", "text", 3).count()
    val capped = Dedup.shingleIndex(docs, "doc_id", "text", 3, maxDocFreq = Some(2)).count()
    assert(capped < uncapped) // the 3x-repeated doc's shingles are dropped
  }

  test("jaccardPairs doc-freq cap bounds candidates on a stop-shingle corpus") {
    import spark.implicits._
    // 40 otherwise-unrelated docs all carrying one boilerplate phrase:
    // uncapped, the hot shingles alone produce 40*39/2 candidate pairs;
    // capped, the boilerplate drops from the index and no pair survives
    val boiler = (0 until 40).map { i =>
      (i.toLong, s"unique${i}a unique${i}b unique${i}c all rights reserved worldwide unique${i}d unique${i}e")
    }.toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(boiler, "doc_id", "text", n = 3,
      threshold = 0.1, maxDocFreq = Some(10))
    assert(capped.count() == 0, "capped index must drop the stop-shingle pairs")
    val uncappedCand = Dedup.jaccardPairs(boiler, "doc_id", "text", n = 3,
      threshold = 0.0, maxDocFreq = None)
    assert(uncappedCand.count() == 40L * 39 / 2,
      "sanity: uncapped index candidate set is quadratic in the hot shingle's doc-freq")
    // the default cap (1000) is inert on tame corpora: same answer as uncapped
    val dflt = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
      maxDocFreq = None).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt == exact)
  }

  test("clustering converges on a 40-hop chain (lineage-truncated long run)") {
    import spark.implicits._
    // path graph 0-1-...-40: min-label propagation moves the 0 label one
    // hop per round, so this genuinely runs 40+ rounds — the
    // localCheckpoint every 5 rounds keeps each round's plan flat
    // instead of nesting 40 generations of joins
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Dedup.nearDupClusters(chain, maxIterations = 50)
    assert(comps.filter(col("component") =!= 0L).count() == 0,
      "every chain node must converge to component 0")
    assert(comps.count() == 41)
  }

  test("trigram language ID identifies real multilingual sentences") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and looked out of the window"),
      ("de", "der hund lief durch den wald und suchte einen schattigen platz"),
      ("es", "el perro corre por el parque y la casa es bonita de verdad"),
      ("fr", "le chien et le chat sont dans le jardin de la maison")
    ).toDF("expected", "text")
    val out = samples.withColumn("got", TextFunctions.langIdTrigram(col("text")))
      .collect().map(r => (r.getString(0), r.getString(2)))
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("stopword language ID returns und for text with no profile hits") {
    import spark.implicits._
    val out = Seq("zzz qqq xxx").toDF("text")
      .select(TextFunctions.langId(TextFunctions.wsTokens(col("text"))))
      .head().getString(0)
    assert(out == "und")
  }

  test("repetition rules: dup fractions, top-token mass, keep decision") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val rows = Seq(
      (1L, "a a a a a a a a a a"),                    // one token repeated: drop
      (2L, "one two three four five six seven eight"), // all distinct: keep
      (3L, "x y x y x y x y x y"),                    // 2-gram loop: drop
      (4L, "")                                         // empty-ish (one "" token)
    ).toDF("doc_id", "text")
    val toks = TF.wsTokens(col("text"))
    val got = rows.select(
        col("doc_id"),
        TF.dupTokenFrac(toks).as("dt"),
        TF.dupNgramFrac(toks, 2).as("d2"),
        TF.topTokenCount(toks).as("top"),
        TF.repetitionKeep(toks).as("keep"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(got(0) == ((1L, 0.9, 8.0 / 9.0, 10L, false)), s"got ${got(0)}")
    assert(got(1) == ((2L, 0.0, 0.0, 1L, true)), s"got ${got(1)}")
    assert(got(2)._5 == false, "2-gram loop must be dropped")
    assert(got(2)._2 == 0.8 && got(2)._3 > 0.7, s"got ${got(2)}")
    assert(got(3)._4 == 1L && got(3)._2 == 0.0, s"got ${got(3)}")
  }

  test("PII scrubbing: counts and redaction for emails, IPs, phones") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val rows = Seq(
      (1L, "contact jane.doe+x@example.co.uk or 10.0.255.1 or 555-867-5309 now"),
      (2L, "no pii here, just text with an @ sign and 1.2 decimals"),
      (3L, "two mails a@b.io c.d@e.org and ip 192.168.0.1")
    ).toDF("doc_id", "text")
    val (em, ip, ph) = TF.piiCounts(col("text"))
    val got = rows.select(col("doc_id"), em.as("e"), ip.as("i"), ph.as("p"),
        TF.redactPii(col("text")).as("red"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(got(0)._2 == 1 && got(0)._3 == 1 && got(0)._4 == 1, s"got ${got(0)}")
    assert(got(0)._5 == "contact [EMAIL] or [IP] or [PHONE] now", got(0)._5)
    assert(got(1) == ((2L, 0L, 0L, 0L, "no pii here, just text with an @ sign and 1.2 decimals")))
    assert(got(2)._2 == 2 && got(2)._3 == 1, s"got ${got(2)}")
    assert(got(2)._5 == "two mails [EMAIL] [EMAIL] and ip [IP]", got(2)._5)
  }

  test("brute-force top-k is exact and deterministic") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)), // closest to 0
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0f, 0.9f, 0.1f)) // closest to 2
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 1)
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_id") == 1L)
  }

  test("LSH ANN returns ranked candidates with exact cosine scores") {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat))
    }
    val vecs = base.toDF("vec_id", "embedding")
    val out = Similarity.lshAnn(vecs, vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // ranks are 1..k per query, cosine non-increasing
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("k-means IVF quantizer improves over the id-seeded one") {
    import spark.implicits._
    // two tight clusters around orthogonal directions + noise
    val base = (0 until 60).map { i =>
      val axis = i % 2
      (i.toLong, Array.tabulate(8)(d =>
        (if (d == axis) 1f else 0f) + (math.sin(i * 8 + d) * 0.05).toFloat))
    }
    val vecs = base.toDF("vec_id", "embedding")
    val cent = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
      cells = 2, iters = 3)
    val cs = cent.collect()
    assert(cs.length == 2)
    assert(cs.forall(_.getAs[scala.collection.Seq[Float]]("c_vec").length == 8))
    // trained centroids separate the two clusters: each cluster's axis
    // component dominates in exactly one centroid
    val axes = cs.map(_.getAs[scala.collection.Seq[Float]]("c_vec")).map(v =>
      if (v(0) > v(1)) 0 else 1).toSet
    assert(axes == Set(0, 1), s"centroids collapsed: $axes")
    // ANN through the trained quantizer returns well-formed ranked hits
    val out = Similarity.ivfAnn(vecs, vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, cells = 2, nprobe = 1,
      centroids = Some(cent)).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val top = rs.minBy(_.getAs[Long]("rnk"))
      // nearest neighbor shares the query's cluster (same parity axis)
      assert(top.getAs[Long]("n_id") % 2 == q % 2)
    }
  }

  test("semDedup keeps one representative per within-cell duplicate group") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),       // cell-A seed
      (1L, Array(0f, 1f, 0f, 0f)),       // cell-B seed
      (2L, Array(0.99f, 0.01f, 0f, 0f)), // dup of 0 in cell A
      (3L, Array(0f, 0.98f, 0.02f, 0f)), // dup of 1 in cell B
      (4L, Array(0.7f, 0.7f, 0f, 0f)),   // borderline, not a dup of anything
      (5L, Array(0f, 0f, 1f, 0f))        // far from everything
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, cells = 2).collect()
    assert(out.length == 6)
    val kept = out.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(Set(0L, 1L, 4L, 5L).subsetOf(kept), s"kept $kept")
    assert(!kept.contains(2L) && !kept.contains(3L), s"kept $kept")
    // invariant: the min id of every cell always survives
    out.groupBy(_.getAs[Long]("cell")).foreach { case (_, rs) =>
      val minId = rs.map(_.getAs[Long]("vec_id")).min
      assert(rs.find(_.getAs[Long]("vec_id") == minId).get.getAs[Boolean]("kept"))
    }
  }

  test("semDedup does not chase duplicates across cells (the paper's approximation)") {
    import spark.implicits._
    // a near-identical pair straddling the cell decision boundary: each
    // member lands in a different cell, so the pair is never compared
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.72f, 0.69f)), // assigned to 0's cell
      (3L, Array(0.69f, 0.72f))  // assigned to 1's cell; cos(2,3) ≈ 0.999
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
      threshold = 0.9, cells = 2).collect()
    val cellOf = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(cellOf(2L) != cellOf(3L), s"fixture broken: $cellOf")
    assert(out.forall(_.getAs[Boolean]("kept")), "cross-cell pair must survive")
  }

  test("semDedup accepts a trained quantizer and filters null vectors") {
    import spark.implicits._
    val base = (0 until 30).map { i =>
      val axis = i % 2
      (i.toLong, Array.tabulate(8)(d =>
        (if (d == axis) 1f else 0f) + (math.sin(i * 8 + d) * 0.02).toFloat))
    }
    val vecs = base.toDF("vec_id", "embedding")
      .unionByName(Seq((99L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val cent = Similarity.trainIvfCentroids(vecs.filter(col("embedding").isNotNull),
      "vec_id", "embedding", cells = 2, iters = 2)
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
      threshold = 0.999, cells = 2, centroids = Some(cent)).collect()
    assert(out.length == 30, "null-vector row must be filtered")
    assert(out.map(_.getAs[Long]("cell")).toSet.size == 2)
    // near-identical same-axis vectors collapse: far fewer than 30 survive
    val kept = out.count(_.getAs[Boolean]("kept"))
    assert(kept >= 2 && kept < 30, s"kept $kept of 30")
  }

  test("sequence packing tiles the concatenated corpus exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "f g h"),
      (3L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (4L, ""), // splits to one empty token — still packed
      (5L, null.asInstanceOf[String]) // filtered
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(df, col("text"), col("doc_id"), seqLen = 8)
      .select("doc_id", "seq_id", "seg_start", "tok_from", "tok_len", "seg_text")
      .collect()
    // 5 + 3 + 20 + 1 = 29 tokens → sequences 0..3 sized (8, 8, 8, 5)
    assert(out.map(_.getAs[Long]("tok_len")).sum == 29)
    assert(!out.map(_.getAs[Long]("doc_id")).contains(5L))
    out.groupBy(_.getAs[Long]("seq_id")).foreach { case (s, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("seg_start"))
      var pos = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seg_start") == pos,
          s"seq $s: gap at ${r.getAs[Long]("seg_start")} vs $pos")
        pos += r.getAs[Long]("tok_len")
      }
      assert(pos == (if (s < 3) 8L else 5L), s"seq $s holds $pos tokens")
    }
    // a doc's segments partition the doc, in order
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("tok_from"))
      var pos = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_from") == pos)
        pos += r.getAs[Long]("tok_len")
      }
    }
    // reconstruction: segments reassemble the original concatenated stream
    val packed = out
      .sortBy(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("seg_start")))
      .map(_.getAs[String]("seg_text")).filter(_.nonEmpty).mkString(" ")
    val orig = (Seq("a b c d e", "f g h") :+
      (1 to 20).map(i => s"t$i").mkString(" ")).mkString(" ")
    assert(packed == orig)
  }

  test("BPE apply is greedy, rank-ordered, and matches a scala reference") {
    import spark.implicits._
    // one greedy left-to-right pass per ranked merge
    def ref(tokens: Seq[String], merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(tokens) { case (cur, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += cur(i); i += 1 }
        }
        out.toSeq
      }
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "b"))
    val rnd = new scala.util.Random(7)
    val fixed = Seq("a a a", "a b a b c", "x", "b a a b", "a a a a b")
    val fuzz = (0 until 100).map(_ =>
      (0 until rnd.nextInt(12) + 1).map(_ => "ab".charAt(rnd.nextInt(2)).toString)
        .mkString(" "))
    val docs = (fixed ++ fuzz).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = docs.select(col("id"),
        TextFunctions.bpeApply(TextFunctions.wsTokens(col("text")), merges)
          .as("enc"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    (fixed ++ fuzz).zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t.split(" ", -1).toSeq, merges),
        s"doc $i '$t': ${got(i.toLong)}")
    }
    // pinned expectations: greedy non-overlap + later merges see the
    // earlier merges' output
    assert(got(0L) == Seq("aa", "a"))
    assert(got(3L) == Seq("b", "aab"))
    assert(got(4L) == Seq("aa", "aab"))
  }

  test("topKRecall scores hits per query against the exact set") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("q_id", "n_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 20L), (2L, 21L))
      .toDF("q_id", "n_id")
    val got = Similarity.topKRecall(exact, approx).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 2L, 2.0 / 3)))
    assert(got(2L) == ((2L, 2L, 1.0)))
    // duplicate pairs in either input must not fan the join out
    val dupApprox = approx.unionByName(approx.limit(2))
    val got2 = Similarity.topKRecall(exact, dupApprox).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got2 == got, s"$got2 vs $got")
  }

  test("semDedup with one cell matches the all-pairs dedup semantics") {
    import spark.implicits._
    // one cell = no clustering approximation left: dropped must equal
    // "has a lower-id neighbor with cos >= threshold" exactly
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 37 + d * 11).toFloat))
    }.toDF("vec_id", "embedding")
    val thr = 0.6
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", thr, cells = 1)
      .collect()
    val dropped = out.filter(!_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("vec_id")).toSet
    val expected = Similarity.nearDupPairs(vecs, "vec_id", "embedding", thr)
      .collect().map(_.getAs[Long]("id_b")).toSet
    assert(expected.nonEmpty, "fixture produced no near-dup pairs")
    assert(dropped == expected, s"dropped $dropped vs all-pairs $expected")
  }

  test("sequence packing equals a naive driver-side reference") {
    import spark.implicits._
    val docs = (1 to 60).map { i =>
      (i.toLong, (0 until ((i * 13) % 23) + 1).map(j => s"x$i-$j").mkString(" "))
    }
    val L = 10
    val got = Packing
      .packSequences(docs.toDF("doc_id", "text"), col("text"), col("doc_id"), L)
      .select("doc_id", "seq_id", "seg_start", "tok_from", "tok_len", "seg_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    // naive reference: global offsets by doc order, then span enumeration
    var off = 0L
    val want = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      val start = off; off += tk.length
      (start / L to (start + tk.length - 1) / L).map { s =>
        val from = math.max(0L, s * L - start)
        val len = math.min(start + tk.length, (s + 1) * L) - math.max(start, s * L)
        (id, s, math.max(0L, start - s * L), from, len,
          tk.slice(from.toInt, (from + len).toInt).mkString(" "))
      }
    }.toSet
    assert(got == want)
  }

  test("sequence packing is bucket-count invariant") {
    import spark.implicits._
    // lengths 1..40 tokens: many docs cross sequence boundaries, some
    // span several whole sequences
    val df = (1 to 40).map(i =>
      (i.toLong, (0 until ((i * 7) % 40) + 1).map(j => s"w$i-$j").mkString(" ")))
      .toDF("doc_id", "text")
    def run(buckets: Int) = Packing
      .packSequences(df, col("text"), col("doc_id"), seqLen = 16, buckets = buckets)
      .select("doc_id", "seq_id", "seg_start", "tok_from", "tok_len", "seg_text")
      .orderBy("doc_id", "seq_id").collect().map(_.toSeq).toSeq
    assert(run(1) == run(3) && run(3) == run(13))
  }

  test("resizeStub resamples the byte grid and tolerates empty payloads") {
    import spark.implicits._
    val media = Multimodal.packDocuments(
      Seq((1L, ""), (2L, "ab cd")).toDF("doc_id", "text"))
    val out = Multimodal.resizeStub(media, outW = 4, outH = 2)
      .collect().sortBy(_.media_id)
    assert(out(0).payload.isEmpty && out(0).width == 4 && out(0).height == 2)
    assert(out(1).payload.length == 8 && out(1).width == 4 && out(1).height == 2)
  }

  test("multimodal pipeline: schema, batching, frame sampling") {
    import spark.implicits._
    val d = docs.withColumnRenamed("doc_id", "doc_id") // documents-shaped
    val media = Multimodal.packDocuments(d)
    assert(media.schema.fieldNames.toSet ==
      Set("media_id", "modality", "payload", "width", "height", "format"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.decodeStub(media, batchSize = 2).collect()
    assert(feats.length == 4)
    assert(feats.forall(_.features.length == 10))
    // histogram bins are normalized frequencies
    assert(feats.forall(f => math.abs(f.features.take(8).sum - 1.0) < 1e-5))
    val frames = Multimodal.frameSample(media, frames = 4).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach(fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length)))
    // frames reassemble a prefix of the payload (chunking is lossless up to len/n rounding)
    val m = media.filter(_.modality == "video").head()
    val rejoined = byId(m.media_id).sortBy(_.frame_idx).flatMap(_.frame_bytes)
    assert(rejoined.sameElements(m.payload.take(rejoined.length)))
  }

  test("token sharding: bucketed prefix-sum equals the global window exactly") {
    val documents = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sharding.tokenShards(
        documents, col("text"), col("doc_id"), budget = 3000L, buckets = 5)
      .select(col("doc_id"), col("n_tokens"), col("token_start"), col("shard"))
    // the naive single-partition global window is the spec
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    val want = documents
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("token_start",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", (col("token_start") / 3000L).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("token_start"), col("shard"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "parallel prefix-sum must match the global window bit for bit")
    // shards are order-contiguous: doc ranges never interleave
    val ranges = got.groupBy(col("shard"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .orderBy(col("shard"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "contiguous shards")
      case _ => ()
    }
    // scale shape: every window in the plan is partitioned (no global
    // single-task window stage)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"found an unpartitioned window in:\n$plan")
  }

  test("unigram xent on an empty corpus returns an empty frame, no crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(QualityModel.unigramXent(empty, "doc_id", "text").count() == 0)
  }

  test("gopher verdict fires rules in order: each branch reachable") {
    import spark.implicits._
    val stops = Seq("the", "a")
    val longDoc = ("the a " + (1 to 60).map(i => s"word$i").mkString(" "))
    val d = Seq(
      (1L, longDoc),                                       // keep
      (2L, "the a short doc"),                             // word_count
      (3L, ("the a " + (1 to 60).map(_ => "xy").mkString(" "))), // mean_word_len < 3
      (4L, ("the a " + (1 to 60).map(i => s"12345$i").mkString(" "))), // alpha_frac (digits)
      (5L, (1 to 62).map(i => s"word$i").mkString(" ")),   // stopwords (none)
      (6L, ("the a " + (1 to 60).map(_ => "loop loop").mkString(" "))) // repetition
    ).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        graft.llm.TextFunctions.gopherVerdict(
          graft.llm.TextFunctions.wsTokens(col("text")), stops).as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "keep", 2L -> "word_count", 3L -> "mean_word_len",
      4L -> "alpha_frac", 5L -> "stopwords", 6L -> "repetition"))
  }

  test("span stats count corpus-wide duplicate token spans") {
    import spark.implicits._
    // width=3 spans; "a b c" opens docs 11 and 12 (cross-doc dup), and
    // doc 13 repeats "x y z" twice within itself (same-doc dup); doc 14
    // is too short for a full span and must not appear
    val d = Seq(
      (11L, "a b c d e f"),
      (12L, "a b c q r s"),
      (13L, "x y z x y z"),
      (14L, "t u")
    ).toDF("doc_id", "text")
    val out = Dedup.spanStats(d, "doc_id", "text", width = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(11L, 12L, 13L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byId(11L) == ((2L, 1L, 0.5)), "one of doc 11's two spans dups")
    assert(byId(12L) == ((2L, 1L, 0.5)))
    assert(byId(13L) == ((2L, 2L, 1.0)), "same-doc repeats count")
  }

  test("canonicalize keeps the longest doc per cluster, ties to min id") {
    import spark.implicits._
    val d = docs.withColumn("n_tokens",
      size(split(col("text"), " ")).cast("long"))
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.7)
    val out = Dedup.canonicalize(d, pairs, "doc_id", col("n_tokens"))
      .select("doc_id", "component", "is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // docs 1,2,4 cluster (component = min id 1); 1 and 4 tie on length
    // with 2 (all 13 tokens) -> min id 1 is canonical; 3 is a singleton
    assert(out == Set(
      (1L, 1L, true), (2L, 1L, false), (4L, 1L, false), (3L, 3L, true)))
  }

  test("unigram xent: uniform corpus scores ln(V); rare tokens score higher") {
    import spark.implicits._
    // 4 docs over a 4-token uniform vocabulary: every token has p=1/4,
    // so every doc's xent is exactly ln(4)
    val uni = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "aa cc"), (4L, "bb dd"))
      .toDF("doc_id", "text")
    val scored = QualityModel.unigramXent(uni, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scored.length == 4)
    scored.foreach { case (_, n, x) =>
      assert(n == 2L && math.abs(x - math.log(4)) < 1e-12)
    }
    // a doc of one common + one rare token outranks an all-common doc
    val skew = Seq((1L, "the the"), (2L, "the the"), (3L, "the zyx"))
      .toDF("doc_id", "text")
    val byId = QualityModel.unigramXent(skew, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(3L) > byId(1L), "rare token raises xent")
    assert(math.abs(byId(1L) - byId(2L)) < 1e-15, "identical docs tie")
    // band labels split on the given boundaries
    val bands = QualityModel.unigramXent(skew, "doc_id", "text")
      .withColumn("band", QualityModel.xentBand(col("xent"),
        headBelow = byId(1L) + 1e-9, tailAbove = byId(3L) - 1e-9))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(bands(1L) == "head" && bands(3L) == "tail")
  }

  test("chunking: overlapping windows cover every token; final chunk may be short") {
    import spark.implicits._
    // 10 tokens, chunkSize 4, overlap 1 -> stride 3 -> starts 0,3,6,9
    val df = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out.map(_.getAs[String]("chunk_key")).toSeq ==
      Seq("7#0", "7#1", "7#2", "7#3"))
    // every token appears in at least one chunk, neighbors share `overlap`
    val covered = out.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(covered == (0 to 9).map(i => s"t$i").toSet)
  }

  test("chunking: a doc shorter than chunkSize emits exactly one chunk") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(df, "doc_id", "text", 32, 8).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("chunk_text") == "a b c")
    assert(out.head.getAs[Long]("n_tokens") == 3L)
  }

  test("c4 line rules: terminal punct, min words, javascript; page verdict order") {
    import spark.implicits._
    val page = Seq(
      "This line survives cleaning fine.",     // kept
      "No terminal punctuation here",          // dropped: no punct
      "Too short.",                            // dropped: < 3 words
      "Enable javascript to continue reading.",// dropped: javascript
      "Another good sentence stays right here!" // kept
    ).mkString("\n")
    val df = Seq((1L, page)).toDF("doc_id", "text")
    val cleaned = df.select(TextFunctions.c4Clean(col("text")).as("c"))
      .head.getAs[String]("c")
    assert(cleaned == "This line survives cleaning fine.\nAnother good sentence stays right here!")

    def verdictOf(text: String, blocklist: Seq[String] = Nil, minS: Int = 2): String =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(TextFunctions.c4Verdict(col("text"), blocklist, minS).as("v"))
        .head.getAs[String]("v")
    assert(verdictOf("function f() { return. Second sentence.") == "brace")
    assert(verdictOf("Lorem Ipsum dolor sit. Second sentence.") == "lorem_ipsum")
    assert(verdictOf("A page with a bad word. Second sentence.",
      blocklist = Seq("bad word")) == "blocklist")
    assert(verdictOf("Only one sentence.") == "too_few_sentences")
    assert(verdictOf("First sentence. Second sentence.") == "keep")
  }

  test("sq8 quantization: codes bounded, decode error within one bucket, recall holds") {
    import spark.implicits._
    // deterministic synthetic vectors incl. a constant dimension
    val vecs = (0L until 40L).map { id =>
      (id, Array.tabulate(8) { d =>
        if (d == 7) 1.5f // constant dim: hi == lo
        else ((id * (d + 3) % 17).toFloat - 8f) / 4f
      })
    }.toDF("vec_id", "embedding")
    val (lo, hi) = Similarity.sq8Train(vecs, "embedding")
    assert(lo.length == 8 && hi.length == 8)
    assert(lo(7) == 1.5 && hi(7) == 1.5)

    val enc = vecs.select(col("vec_id"),
      col("embedding"),
      Similarity.sq8Codes(col("embedding"), lo, hi).as("codes"),
      Similarity.sq8Decode(Similarity.sq8Codes(col("embedding"), lo, hi), lo, hi)
        .as("dec")).collect()
    enc.foreach { r =>
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      assert(codes.forall(c => c >= 0 && c <= 255))
      val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
      val dec = r.getAs[scala.collection.Seq[Double]]("dec")
      (0 until 8).foreach { d =>
        val bucket = (hi(d) - lo(d)) / 256.0
        assert(math.abs(dec(d) - orig(d)) <= math.max(bucket, 1e-12),
          s"dim $d: ${orig(d)} decoded as ${dec(d)} (bucket $bucket)")
      }
    }

    // ADC search approximates exact search: recall@3 >= 2/3 per query
    val queries = vecs.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
    val approx = Similarity.sq8TopK(vecs, queries, "vec_id", "embedding", 3, lo, hi)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
    exact.foreach { case (q, ex) =>
      val hits = ex.map(_._2).toSet.intersect(approx(q).map(_._2).toSet).size
      assert(hits >= 2, s"query $q: recall@3 = $hits/3")
    }
  }

  test("jaccard doc-freq cap never INFLATES a pair's score (sizes stay uncapped)") {
    import spark.implicits._
    // A carries heavy boilerplate shared by 20 filler docs; B shares only
    // A's unique prefix. Exact J(A,B) = 3/(8+5-3) = 0.3; sizing from a
    // CAPPED index would shrink |A| and report 3/(5+5-3) ≈ 0.43 — a
    // false near-dup. The cap must only ever LOWER scores.
    val docs = (
      Seq(
        (100L, "ua ub uc ud ue all rights reserved worldwide tonight"),
        (101L, "ua ub uc ud ue vf vg")) ++
      (0 until 20).map(i =>
        (i.toLong, s"f${i}a f${i}b all rights reserved worldwide tonight"))
    ).toDF("doc_id", "text")
    def j(cap: Option[Int]): Map[(Long, Long), Double] =
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.0,
          maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val exact = j(None)
    val capped = j(Some(10))
    assert(math.abs(exact((100L, 101L)) - 0.3) < 1e-12)
    assert(math.abs(capped((100L, 101L)) - 0.3) < 1e-12,
      "cap must not inflate the asymmetric pair's score")
    capped.foreach { case (pair, score) =>
      assert(score <= exact(pair) + 1e-12,
        s"pair $pair: capped $score > exact ${exact(pair)}")
    }
  }

  test("bm25: tf saturation, idf rarity, and length normalization behave") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),          // one 'alpha', len 4
      (2L, "alpha alpha beta gamma"),          // two 'alpha', len 4
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // len 8
      (4L, "common common common common"),     // no query terms
      (5L, "rare beta gamma delta")            // unique term 'rare'
    ).toDF("doc_id", "text")
    val queries = Seq((0L, Seq("alpha")), (1L, Seq("rare", "beta")))
      .toDF("q_id", "terms")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    val q0 = out.filter(_._1 == 0L).sortBy(_._2)
    // higher tf wins at equal length; equal tf at longer length loses
    assert(q0.map(_._3).take(3).toSeq == Seq(2L, 1L, 3L),
      s"expected tf then length ordering, got ${q0.toSeq}")
    assert(!q0.exists(_._3 == 4L), "docs without the term never match")
    val q1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 'rare' (df=1) dominates 'beta' (df=4): doc 5 must rank first
    assert(q1.head._3 == 5L, s"rare-term doc must win: ${q1.toSeq}")
  }

  test("stripHtml drops script/style/comment payloads and decodes entities once") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val rows = Seq(
      (1L, "<html><body><p>Hello   <b>world</b></p>" +
        "<script type=\"text/javascript\">var hidden = 1 < 2;</script>" +
        "<style>p { color: red }</style><!-- note -->bye</body></html>"),
      // double-escaped text must decode exactly ONCE: &amp;lt; -> &lt;
      (2L, "Tom &amp; Jerry &lt;3 say &amp;lt;never twice&amp;gt; &#39;hi&#39;"),
      // a stray < that is NOT a tag start survives entity decode order
      (3L, "x &lt;tag&gt; y"),
      (4L, "SCRIPT in caps: <SCRIPT>alert(1)</SCRIPT>done")
    ).toDF("id", "html")
    val got = rows.select(col("id"), TF.stripHtml(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Hello world bye", got(1L))
    assert(got(2L) == "Tom & Jerry <3 say &lt;never twice&gt; 'hi'", got(2L))
    assert(got(3L) == "x <tag> y", got(3L))
    assert(got(4L) == "SCRIPT in caps: done", got(4L))
    // vertical tab collapses like RE2 would (explicit class, not Java \s)
    val vt = Seq(Tuple1("a\u000bb")).toDF("h")
      .select(TF.stripHtml(col("h"))).head().getString(0)
    assert(vt == "a b", vt)
  }

  test("extractUrls + urlHost: hosts are lowercased, ports/paths cut, no-match is ''") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val rows = Seq(
      (1L, "see http://Spark.Apache.ORG/docs and https://github.com:443/apache?x=1 end"),
      (2L, "no urls at all"),
      (3L, "trailing https://example.com")
    ).toDF("id", "text")
    val urls = rows.select(col("id"), TF.extractUrls(col("text")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(urls(1L) == Seq("http://Spark.Apache.ORG/docs", "https://github.com:443/apache?x=1"))
    assert(urls(2L).isEmpty)
    assert(urls(3L) == Seq("https://example.com"))
    val hosts = rows.where(col("id") === 1L).select(col("id"),
        TF.urlHost(element_at(TF.extractUrls(col("text")), 1)).as("h"))
      .head().getString(1)
    assert(hosts == "spark.apache.org", hosts)
    val port = rows.select(TF.urlHost(lit("https://github.com:443/apache?x=1")))
      .head().getString(0)
    assert(port == "github.com", port)
    assert(rows.select(TF.urlHost(lit("not a url"))).head().getString(0) == "")
    // whitespace beyond spaces terminates a URL; uppercase schemes match
    val multi = Seq(Tuple1("see https://a.com\nnext line\tand HTTP://B.org/x end"))
      .toDF("text").select(TF.extractUrls(col("text"))).head().getSeq[String](0)
    assert(multi == Seq("https://a.com", "HTTP://B.org/x"), multi.toString)
    assert(rows.select(TF.urlHost(lit("HTTPS://Example.COM/x"))).head().getString(0)
      == "example.com")
    // trailing sentence punctuation never rides into the URL (a suffixed
    // host would evade blocklist equality)
    val punct = Seq(Tuple1("go to (https://ads.example), or https://a.com/x. done"))
      .toDF("text").select(TF.extractUrls(col("text"))).head().getSeq[String](0)
    assert(punct == Seq("https://ads.example", "https://a.com/x"), punct.toString)
  }

  test("dedupLines keeps the FIRST occurrence of each line, in reading order") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val doc = "intro\nSubscribe now\nbody one\nSubscribe now\nbody two\nintro"
    val got = Seq(Tuple1(doc)).toDF("t")
      .select(TF.dedupLines(col("t"))).head().getString(0)
    assert(got == "intro\nSubscribe now\nbody one\nbody two", got)
  }

  test("normalize: NFC composes, NFKC folds compatibility forms, ASCII is a no-op") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val rows = Seq(
      (1L, "cafe\u0301"),        // e + combining acute
      (2L, "\u2460 \uFB01ne"),  // circled one + fi ligature
      (3L, "plain ascii")
    ).toDF("id", "s")
    val nfc = rows.select(col("id"), TF.normalize(col("s"), "NFC").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == "caf\u00e9", nfc(1L))
    assert(nfc(2L) == "\u2460 \uFB01ne")  // NFC leaves compatibility forms alone
    assert(nfc(3L) == "plain ascii")
    val nfkc = rows.select(col("id"), TF.normalize(col("s"), "NFKC").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfkc(1L) == "caf\u00e9")
    assert(nfkc(2L) == "1 fine", nfkc(2L))  // compatibility folds
    // idempotence + null propagation
    val twice = rows.select(TF.normalize(TF.normalize(col("s"), "NFKC"), "NFKC").as("n"))
      .collect().map(_.getString(0)).toSet
    assert(twice == Set("caf\u00e9", "1 fine", "plain ascii"))
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("s")
      .select(TF.normalize(col("s"), "NFC")).head()
    assert(n.isNullAt(0))
    intercept[IllegalArgumentException] { TF.normalize(col("s"), "NFX") }
  }

  test("PQ: codes round-trip seed vectors exactly; Lloyd lowers quantization error; rerank restores exact ranking") {
    import spark.implicits._
    import graft.llm.Similarity
    // deterministic corpus: 40 vectors of dim 8, m=4 subspaces of 2 dims
    val vecs = (0 until 40).map { id =>
      (id.toLong, Array.tabulate(8)(i => ((id * 31 + i * 17) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqInitCodebooks(vecs, "vec_id", "embedding", m = 4, ksub = 8)
    assert(cb.length == 4 && cb.head.length == 8 && cb.head.head.length == 2)
    // a seed vector decodes to ITSELF (its own blocks are codebook entries)
    val seedDecoded = vecs.filter(col("vec_id") === 3L)
      .select(Similarity.pqDecode(
        Similarity.pqCodes(col("embedding").cast("array<double>"), cb), cb))
      .head().getSeq[Double](0)
    val seedOrig = vecs.filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    assert(seedDecoded == seedOrig, s"seed must round-trip: $seedDecoded vs $seedOrig")
    // quantization error must not increase under Lloyd refinement
    def qerr(codebooks: Seq[Seq[Seq[Double]]]): Double =
      vecs.select(col("embedding").cast("array<double>").as("v"))
        .select(Similarity.pqDecode(Similarity.pqCodes(col("v"), codebooks), codebooks).as("d"), col("v"))
        .select(aggregate(zip_with(col("v"), col("d"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("e"))
        .agg(sum(col("e"))).head().getDouble(0)
    val e0 = qerr(cb)
    val e3 = qerr(Similarity.pqTrain(vecs, "vec_id", "embedding", m = 4, ksub = 8, iters = 3))
    assert(e3 <= e0 + 1e-9, s"Lloyd must not worsen quantization error: $e0 -> $e3")
    // reranked top-k equals the exact brute-force top-k when the
    // shortlist is the whole corpus (rerank stage is exact cosine)
    val queries = vecs.filter(col("vec_id") < 2L)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .select("q_id", "rnk", "n_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val reranked = Similarity.pqTopK(vecs, queries, "vec_id", "embedding", k = 3, cb, rerank = 39)
      .select("q_id", "rnk", "n_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reranked == exact, s"full-shortlist rerank must equal exact: $reranked vs $exact")
  }

  test("IVF-PQ: candidates come only from probed cells; full-probe + full-shortlist equals exact") {
    import spark.implicits._
    import graft.llm.Similarity
    val vecs = (0 until 40).map { id =>
      (id.toLong, Array.tabulate(8)(i => ((id * 31 + i * 17) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqInitCodebooks(vecs, "vec_id", "embedding", m = 4, ksub = 8)
    val queries = vecs.filter(col("vec_id") < 2L)
    // probing EVERY cell with a corpus-sized shortlist degenerates to
    // the exact answer (rerank stage is exact cosine over all candidates)
    val full = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding",
        k = 3, cb, cells = 4, nprobe = 4, rerank = 39)
      .select("q_id", "rnk", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .select("q_id", "rnk", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact, s"full-probe IVF-PQ must equal exact: $full vs $exact")
    // nprobe=1 returns at most the single probed cell's occupancy
    val narrow = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding",
        k = 39, cb, cells = 4, nprobe = 1, rerank = 0)
    assert(narrow.count() < 2L * 39, "nprobe=1 must restrict candidates to one cell")
  }

  test("dropDupSpans removes corpus-repeated spans, keeps tails and unique spans") {
    import spark.implicits._
    // width=3; docs 1 and 2 share the span "a b c"; doc 3 is unique;
    // doc 4 repeats a span WITHIN itself (intra-doc counts toward the
    // corpus count); doc 5 is shorter than one span (all tail)
    val rows = Seq(
      (1L, "a b c x y z tail1"),
      (2L, "a b c q r s"),
      (3L, "u v w m n o"),
      (4L, "p p p p p p extra"),
      (5L, "ti ny")
    ).toDF("doc_id", "text")
    val got = Dedup.dropDupSpans(rows, "doc_id", "text", width = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 1L, "x y z tail1")), got(1L).toString)
    assert(got(2L) == ((2L, 1L, "q r s")), got(2L).toString)
    assert(got(3L) == ((2L, 0L, "u v w m n o")), got(3L).toString)
    // doc 4: both "p p p" spans are duplicates of each other -> dropped,
    // tail survives
    assert(got(4L) == ((2L, 2L, "extra")), got(4L).toString)
    assert(got(5L) == ((0L, 0L, "ti ny")), got(5L).toString)
    // null text: null span count (never -1), empty clean_text
    val n = Dedup.dropDupSpans(
        Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text", width = 3).head()
    assert(n.isNullAt(1), "null text must yield null n_spans")
    assert(n.getLong(2) == 0L && n.getString(3) == "")
  }

  test("chunkTokens skips null text; bm25TopK over an empty corpus returns empty") {
    import spark.implicits._
    val chunks = Chunking.chunkTokens(
      Seq((1L, "a b c"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", chunkSize = 2, overlap = 0)
    assert(chunks.select("doc_id").as[Long].collect().toSet == Set(1L),
      "null text yields no chunks, non-null docs unaffected")
    val out = Retrieval.bm25TopK(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      Seq((0L, Seq("x"))).toDF("q_id", "terms"), k = 3)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("q_id", "rnk", "doc_id", "score"))
  }

  test("bigramXent: hand-checked interpolated probabilities; short docs drop") {
    import spark.implicits._
    // corpus: "a b a b" + "a c" + single-token "z" (no bigram -> no row)
    val rows = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z")).toDF("doc_id", "text")
    val got = QualityModel.bigramXent(rows, "doc_id", "text", lambda = 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!got.contains(3L), "a 1-token doc has no bigram positions")
    // model: c(a)=3 c(b)=2 c(c)=1 c(z)=1 total=7; bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    val t = 7.0
    def p(cb: Double, c1: Double, c2: Double) = 0.75 * (cb / c1) + 0.25 * (c2 / t)
    val x1 = -(math.log(p(2, 3, 2)) + math.log(p(1, 2, 3)) + math.log(p(2, 3, 2))) / 3
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - x1) < 1e-12, s"${got(1L)} vs $x1")
    val x2 = -math.log(p(1, 3, 1))
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - x2) < 1e-12, s"${got(2L)} vs $x2")
  }

  test("stored-codes PQ search fails loudly when the index is stale vs the corpus") {
    import spark.implicits._
    import graft.llm.Similarity
    val vecs = (0 until 20).map { id =>
      (id.toLong, Array.tabulate(8)(i => ((id * 31 + i * 17) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqInitCodebooks(vecs, "vec_id", "embedding", m = 4, ksub = 8)
    val codes = vecs.select(col("vec_id"),
      Similarity.pqCodes(col("embedding"), cb).as("codes"))
    val queries = vecs.filter(col("vec_id") < 1L)
    // complete coverage: fine
    assert(Similarity.pqTopKFromCodes(codes, vecs, queries,
      "vec_id", "codes", "embedding", k = 3, cb, rerank = 5).count() == 3)
    // the corpus lost a doc the index still carries -> the rerank must
    // error, not silently return fewer/wrong neighbors
    val stale = vecs.filter(col("vec_id") =!= 2L)
    val e = intercept[Exception] {
      Similarity.pqTopKFromCodes(codes, stale, queries,
        "vec_id", "codes", "embedding", k = 3, cb, rerank = 19).collect()
    }
    def rootMsg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("missing from the rerank corpus"), rootMsg(e))
    // a query losing its WHOLE shortlist must also raise — a count-based
    // coverage check inner-joined through the corpus would silently
    // return zero rows for it instead
    val gone = vecs.filter(col("vec_id") === 0L)
    val e2 = intercept[Exception] {
      Similarity.pqTopKFromCodes(codes, gone, queries,
        "vec_id", "codes", "embedding", k = 3, cb, rerank = 19).collect()
    }
    assert(rootMsg(e2).contains("missing from the rerank corpus"), rootMsg(e2))
    // a DUPLICATED corpus id must raise too — it would occupy two ranks
    // and silently evict the true k-th neighbor
    val dup = vecs.unionByName(vecs.filter(col("vec_id") === 3L))
    val e3 = intercept[Exception] {
      Similarity.pqTopKFromCodes(codes, dup, queries,
        "vec_id", "codes", "embedding", k = 3, cb, rerank = 19).collect()
    }
    assert(rootMsg(e3).contains("duplicate rerank-corpus ids"), rootMsg(e3))
  }

  test("normalize_text / strip_html / url_host are callable from pure SQL") {
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.all.foreach { case (id, info, b) =>
      s2.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    val got = s2.sql(
      "SELECT normalize_text('cafe\u0301', 'NFC') AS n, " +
        "strip_html('<p>a &amp; b</p>') AS h, " +
        "url_host('https://Ads.Example.COM/x') AS u, " +
        "canonical_url('HTTPS://WWW.A.com/P/?utm_source=x') AS c").head()
    assert(got.getString(0) == "caf\u00e9")
    assert(got.getString(1) == "a & b")
    assert(got.getString(2) == "ads.example.com")
    assert(got.getString(3) == "https://a.com/P")
  }

  test("containment catches the excerpt page that Jaccard misses") {
    import spark.implicits._
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val quote = (1 to 8).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, long), (2L, quote),
      (3L, "totally unrelated content over here now")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3,
        threshold = 0.9, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // the quote's 6 shingles all live in the original: containment 1.0
    assert(cont((2L, 1L)) == 1.0)
    // the reverse orientation (28 shingles, 6 shared) doesn't pass 0.9
    assert(!cont.contains((1L, 2L)))
    assert(!cont.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // same pair under symmetric Jaccard: 6/(28+6-6) ≈ 0.21 — invisible
    val jac = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.9, maxDocFreq = None)
    assert(jac.count() == 0)
    // the doc-freq cap can only shrink a containment score, never raise
    val exact = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3,
        threshold = 0.0, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val capped = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3,
        threshold = 0.0, maxDocFreq = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // cap=1 drops every shared shingle: the pair set can only shrink
    // (sizes stay uncapped, so no score can inflate — same guard as
    // the jaccardPairs "never inflates" case, shared sizing code)
    assert(capped.size < exact.size)
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (k, v) => assert(v <= exact(k) + 1e-12) }
  }

  test("corpusLineDedup removes cross-doc lines everywhere, keeps unique ones") {
    import spark.implicits._
    val pages = Seq(
      (1L, "unique opening\nSubscribe now\nreal content one"),
      (2L, "Subscribe now\nreal content two"),
      (3L, "only original text here"),
      // within-doc repeat but single-doc: NOT boilerplate at minDocs=2
      (4L, "echo line\necho line\nfourth closer"),
      (5L, "Subscribe now"), // fully boilerplate -> emptied, kept as a row
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.corpusLineDedup(pages, "doc_id", col("text"), minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "unique opening\nreal content one")))
    assert(out(2L) == ((2L, 1L, "real content two")))
    assert(out(3L) == ((1L, 0L, "only original text here")))
    // the within-doc repeat survives: both copies stay (cross-doc op only)
    assert(out(4L) == ((3L, 0L, "echo line\necho line\nfourth closer")))
    assert(out(5L) == ((1L, 1L, "")))
    assert(!out.contains(6L)) // null text dropped, documented semantics
  }

  test("corpusLineDedup never treats blank lines as boilerplate") {
    import spark.implicits._
    // two unrelated docs share only a blank line (and a trailing-newline
    // artifact); neither doc may lose structure
    val pages = Seq(
      (1L, "alpha\n\nbeta\n"),
      (2L, "gamma\n\ndelta\n")).toDF("doc_id", "text")
    val out = Dedup.corpusLineDedup(pages, "doc_id", col("text"), minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L && out(1).getLong(2) == 0L)
    assert(out(0).getString(3) == "alpha\n\nbeta\n")
    assert(out(1).getString(3) == "gamma\n\ndelta\n")
    // blank lines survive even INSIDE a doc that loses a real banner
    val mixed = Seq(
      (1L, "one\n\nSubscribe now\ntail"),
      (2L, "Subscribe now\n\ntwo")).toDF("doc_id", "text")
    val cleaned = Dedup.corpusLineDedup(mixed, "doc_id", col("text"), minDocs = 2)
      .orderBy("doc_id").collect()
    assert(cleaned(0).getString(3) == "one\n\ntail")
    assert(cleaned(1).getString(3) == "\ntwo")
  }

  test("corpusLineDedup ships only hashes through its exchanges") {
    import spark.implicits._
    // AQE wraps the plan and hides the exchanges until execution
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val pages = Seq((1L, "a\nb"), (2L, "b\nc")).toDF("doc_id", "text")
    val out = Dedup.corpusLineDedup(pages, "doc_id", col("text"))
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the index/census path (every exchange carrying _lh) must move
    // only ids and 60-bit hashes; the final id-join rebuild is the one
    // place text may cross (documented posture, as in dropDupSpans)
    val indexSide = exchanges.filter(_.output.exists(_.name == "_lh"))
    assert(indexSide.nonEmpty)
    indexSide.foreach { e =>
      val cols = e.output.map(a => (a.name, a.dataType.typeName)).toSet
      assert(!cols.exists(_._2 == "string"),
        s"an index-side exchange carries text: $cols")
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("tfidfKeywords ranks distinctive terms above corpus-wide ones") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the the the quark"),
      (2L, "the boson boson"),
      (3L, "the muon")).toDF("doc_id", "text")
    val out = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // 'the' is in every doc (idf = ln(4/4) = 0) so any unique term beats
    // it despite tf=3 in doc 1
    assert(out((1L, 1L)) == "quark")
    assert(out((2L, 1L)) == "boson")
    assert(out((3L, 1L)) == "muon")
    // doc 1's second keyword is the zero-idf 'the' (nothing else left)
    assert(out((1L, 2L)) == "the")
  }

  test("corpusLineDedup paragraph mode: cross-doc paragraphs drop, lines inside survive") {
    import spark.implicits._
    val boiler = "subscribe now\nget our app"
    val df = Seq(
      (1L, s"unique one\n\n$boiler"),
      (2L, s"$boiler\n\nunique two"),
      (3L, "all original\n\nnothing shared")).toDF("doc_id", "text")
    val out = Dedup.corpusLineDedup(df, "doc_id", col("text"), minDocs = 2,
        sep = "\n\n")
      .orderBy("doc_id").collect()
    assert(out(0).getString(3) == "unique one")
    assert(out(1).getString(3) == "unique two")
    assert(out(2).getString(3) == "all original\n\nnothing shared")
    // the shared PARAGRAPH dropped whole; its inner newline was never a
    // split point in paragraph mode
    assert(out(0).getLong(2) == 1L && out(1).getLong(2) == 1L)
  }

  test("tokenProfile ranks by count then token, counts docs distinctly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b"),
      (2L, "a b  c")).toDF("doc_id", "text")
    val out = Profiling.tokenProfile(df, "doc_id", col("text"), k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // 'a' x3 in 2 docs; 'b' x2 in 2 docs; the double space yields an
    // empty token that must not rank
    assert(out.toSeq == Seq((1L, "a", 3L, 2L), (2L, "b", 2L, 2L)))
  }

  test("canonicalUrl: trackers, fragments, www, default ports, case rules") {
    import spark.implicits._
    import graft.llm.{TextFunctions => TF}
    val cases = Seq(
      // leading tracker donates '?' to the next param; non-leading drops
      "https://a.com/p?utm_source=x&q=1&utm_medium=y" -> "https://a.com/p?q=1",
      // lone tracker drops with its '?'
      "https://a.com/p?gclid=abc" -> "https://a.com/p",
      // fragment, trailing slash, www
      "HTTPS://WWW.A.com/Path/#sec" -> "https://a.com/Path",
      // default ports per scheme; non-default kept
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // path case preserved, host lowered
      "https://A.com/CaseSensitive" -> "https://a.com/CaseSensitive",
      // scheme-less input passes through untouched (minus trim rules)
      "ftp://a.com/x" -> "ftp://a.com/x")
    val got = cases.map(_._1).toDF("u")
      .select(TF.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("urlDedup groups decorated re-crawls under the min-id canonical") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://a.com/p?utm_source=x"),
      (2L, "https://www.a.com/p/"),
      (3L, "https://a.com/p#frag"),
      (4L, "https://a.com/other"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "url")
    val out = Dedup.urlDedup(df, "doc_id", col("url"))
      .orderBy("doc_id").collect()
    assert(out.length == 4) // the null-url row drops
    assert(out.take(3).forall(r => r.getString(1) == "https://a.com/p"
      && r.getLong(2) == 1L && r.getLong(3) == 3L))
    assert(out(0).getBoolean(4) && !out(1).getBoolean(4) && !out(2).getBoolean(4))
    assert(out(3).getLong(2) == 4L && out(3).getBoolean(4))
  }

  test("rrfFuse: hand-checked fusion; docs on one list only still score") {
    import spark.implicits._
    val a = Seq((0L, 1L, 10L), (0L, 2L, 20L))
      .toDF("q_id", "rnk", "doc_id")
    val b = Seq((0L, 1L, 20L), (0L, 2L, 30L))
      .toDF("q_id", "rnk", "doc_id")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 3, k0 = 60.0)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).toSeq
    // doc 20: 1/62 + 1/61 (list order: a then b); 10: 1/61; 30: 1/62
    val s20 = 1.0 / 62 + 1.0 / 61
    assert(out.sortBy(_._2) == Seq(
      (20L, 1L, s20), (10L, 2L, 1.0 / 61), (30L, 3L, 1.0 / 62)))
  }

  test("clusterBalancedSample caps every cell at perCell, deterministically") {
    import spark.implicits._
    // two obvious clusters on a 4-dim axis pair; centroids = ids 0,1
    val rows = (0L until 20L).map { i =>
      val v = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (i, v.map(x => x + (i / 100.0f)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Selection.clusterBalancedSample(
      df, "vec_id", "embedding", cells = 2, perCell = 4)
    val picked = out.filter(col("picked")).collect()
      .map(r => (r.getLong(1), r.getLong(0)))
    assert(picked.groupBy(_._1).forall(_._2.length == 4))
    assert(out.count() == 20)
    // deterministic: a rerun picks the identical ids
    val again = Selection.clusterBalancedSample(
        df, "vec_id", "embedding", cells = 2, perCell = 4)
      .filter(col("picked")).collect().map(r => (r.getLong(1), r.getLong(0)))
    assert(picked.sorted.toSeq == again.sorted.toSeq)
    // every even id landed in the even-seed cell (cell 0), odds in 1
    val cells = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 20L).forall(i => cells(i) == i % 2))
  }

  test("rpReduce: output dim, null passthrough, and neighborhood preservation") {
    import spark.implicits._
    val n = 40
    val rows = (0 until n).map { i =>
      // two tight clusters far apart in 16-dim space
      val base = if (i < n / 2) 0 else 8
      (i.toLong, Array.tabulate(16)(d =>
        (if (d == base) 10f else 0f) + (i % 5) * 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val red = df.select(col("vec_id"),
      graft.llm.Similarity.rpReduce(col("embedding"), dims = 16, outDim = 8)
        .as("embedding"))
    val first = red.orderBy("vec_id").head()
    assert(first.getSeq[Double](1).length == 8)
    // JL property on separated clusters: full-dim top-3 survives the
    // projection for every query (clusters are far apart)
    val q = df.filter(col("vec_id") < 2)
    val exact = graft.llm.Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 3)
    val approx = graft.llm.Similarity.bruteForceTopK(
      red, red.filter(col("vec_id") < 2), "vec_id", "embedding", 3)
    val rec = graft.llm.Similarity.topKRecall(exact, approx)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(rec >= 0.9, s"reduced-space recall $rec")
    // null vectors project to null, not a crash
    val withNull = Seq((99L, null: Array[Float])).toDF("vec_id", "embedding")
    val np = withNull.select(
      graft.llm.Similarity.rpReduce(col("embedding"), 16, 8).as("r")).head()
    assert(np.isNullAt(0))
  }

  test("groupCentroids: exact mode matches hand math and the production avg") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Array(1f, 3f)),
      (2L, "a", Array(3f, 5f)),
      (3L, "b", Array(10f, 0f)),
      (4L, "b", null.asInstanceOf[Array[Float]])).toDF("id", "g", "vec")
    val exact = Similarity.groupCentroids(df, "id", "vec", "g", exact = true)
      .orderBy("g", "j").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(exact.toSeq == Seq(
      ("a", 0L, 2L, 2.0), ("a", 1L, 2L, 4.0),
      ("b", 0L, 1L, 10.0), ("b", 1L, 1L, 0.0)))
    val prod = Similarity.groupCentroids(df, "id", "vec", "g", exact = false)
      .orderBy("g", "j").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // same values on this data; the modes differ only in summation order
    assert(prod.toSeq == exact.toSeq)
  }

  test("tokenKlShift: an on-mix slice scores near zero, a drifted slice scores high") {
    import spark.implicits._
    val base = "the data engine reads rows and writes rows"
    val df = Seq(
      ("s1", base), ("s1", base),
      ("s2", base), ("s2", base),
      // s3 drifts: mostly off-mix vocabulary
      ("s3", "zebra yak xylophone walrus vulture zebra yak xylophone")
    ).toDF("source", "text")
    val out = Profiling.tokenKlShift(df, "source", col("text"), vocabK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // identical slices get the identical (low) score
    assert(out("s1") == out("s2"))
    assert(out("s3")._2 > out("s1")._2 + 0.1,
      s"drifted slice must stand out: $out")
    // n_tokens is vocab-restricted: s1 = 16 tokens, all in the top-10
    // vocab only if its 7 distinct tokens all rank — they do (corpus
    // has 12 distinct tokens; top-10 keeps every s1 token)
    assert(out("s1")._1 == 16L)
  }

  test("hardNegatives: near-dup positives are excluded before ranks are assigned") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f)),       // the query
      (2L, Array(2f, 0f, 0f)),       // exact-direction copy (cos 1.0)
      (3L, Array(1f, 1f, 0f)),       // cos ~0.707 — the real hard negative
      (4L, Array(0f, 1f, 0f))        // cos 0
    ).toDF("id", "vec")
    val out = Similarity.hardNegatives(
        corpus, corpus.filter(col("id") === 1L), "id", "vec",
        k = 2, maxCos = 0.99)
      .orderBy("rnk")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // id 2 (cosine 1.0) must not appear NOR occupy rank 1
    assert(out == Seq((1L, 3L), (2L, 4L)))
  }

  test("lshContaminatedDocs shuffles signatures, never document text") {
    import spark.implicits._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val corpus = Seq((10L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
      val bench = Seq((0L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
      val out = Contamination.lshContaminatedDocs(
        corpus, bench, "doc_id", "text", n = 3, k = 16, bands = 4,
        minEst = 0.5)
      val exchanges = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      // every exchange moves ids, band buckets, and 16-long sigs — the
      // raw text stays columnar-local (the sig kernel folds it per-row)
      exchanges.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"an exchange carries document text: ${e.output.map(_.name)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("lshContaminatedDocs flags bench copies and excerpts, not clean docs") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "one two three four five six seven eight nine ten eleven twelve"),
      (12L, "unrelated totally clean document with its own words here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy of 10
      (1L, "one two three four five six seven eight nine ten")          // prefix of 11
    ).toDF("doc_id", "text")
    val out = Contamination.lshContaminatedDocs(
        corpus, bench, "doc_id", "text", n = 3, k = 16, bands = 8,
        minEst = 0.3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(10L, 11L), s"flagged: ${out.toSeq}")
    val byDoc = out.map(x => x._1 -> x).toMap
    assert(byDoc(10L)._2 == 0L && byDoc(10L)._3 == 1.0)
    assert(byDoc(11L)._2 == 1L && byDoc(11L)._3 >= 0.3)
  }

  test("waterfillRatesPpm redistributes saturated domains' surplus") {
    // fr and de are too small for their 40% shares of 120: both keep
    // everything (1e6 ppm) and the 70 leftover goes to en
    val rates = Mixing.waterfillRatesPpm(
      Seq("en" -> 100L, "fr" -> 30L, "de" -> 20L),
      Map("en" -> 20L, "fr" -> 40L, "de" -> 40L), budget = 120L)
    assert(rates("fr") == 1000000L && rates("de") == 1000000L)
    assert(rates("en") == 700000L, s"got ${rates("en")}")
    // budget covers everything: every domain saturates
    val all = Mixing.waterfillRatesPpm(
      Seq("en" -> 100L, "fr" -> 30L), Map("en" -> 1L, "fr" -> 1L), 1000L)
    assert(all == Map("en" -> 1000000L, "fr" -> 1000000L))
    // domains outside the target (or with no mass) are absent = rate 0
    val partial = Mixing.waterfillRatesPpm(
      Seq("en" -> 100L, "zz" -> 50L, "empty" -> 0L),
      Map("en" -> 1L, "empty" -> 1L, "ghost" -> 1L), 50L)
    assert(partial.keySet == Set("en"))
    assert(partial("en") == 500000L)
  }

  test("tokenBudgetMix plans rates in one scan, no join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 40L), (2L, "en", 60L), (3L, "fr", 10L), (4L, "de", 5L),
      (5L, "zh", 99L) // outside the target -> dropped
    ).toDF("doc_id", "lang", "n_toks")
    val out = Mixing.tokenBudgetMix(docs, "lang", "doc_id", col("n_toks"),
      Map("en" -> 20L, "fr" -> 40L, "de" -> 40L), budgetTokens = 120L)
    val rates = out.select("lang", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!rates.contains("zh"))
    rates.get("fr").foreach(r => assert(r == 1000000L))
    rates.get("de").foreach(r => assert(r == 1000000L))
    // the apply side is a single filter over the scan — no join node
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"plan has a join:\n$plan")
  }

  test("winnowing guarantees a shared fingerprint for shared passages") {
    import spark.implicits._
    // k=3, w=4: any shared passage of >= w+k-1 = 6 tokens must select at
    // least one common fingerprint in both docs, wherever it sits
    val passage = "quick brown fox jumps over lazy"
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"$passage omega psi chi phi upsilon tau"),
      (3L, "totally unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowIndex(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared passage must share a print")
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // winnowing stores a fraction of the grams (~2/(w+1))
    val nGrams1 = docs.filter($"doc_id" === 1L)
      .select(explode(TextFunctions.shingles(TextFunctions.wsTokens($"text"), 3)))
      .count()
    assert(byDoc(1L).size < nGrams1)
    // shorter than k tokens -> no grams, no rows; shorter than w+k-1 ->
    // one window, the global min
    val shorts = Seq((10L, "one two"), (11L, "one two three four"))
      .toDF("doc_id", "text")
    val sfp = Dedup.winnowIndex(shorts, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!sfp.map(_._1).contains(10L))
    assert(sfp.count(_._1 == 11L) == 1)
  }

  test("winnowing guarantee fuzz: every shared passage >= w+k-1 tokens shares a print") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val k = 2 + rnd.nextInt(2) // 2..3
      val w = 2 + rnd.nextInt(4) // 2..5
      val need = w + k - 1
      def tok() = s"t${rnd.nextInt(5000)}"
      val passage = (1 to (need + rnd.nextInt(4))).map(_ => tok()).mkString(" ")
      def pad(n: Int) = (1 to n).map(_ => tok()).mkString(" ")
      // the passage sits at a random offset in both docs
      val docs = Seq(
        (1L, s"${pad(rnd.nextInt(8))} $passage ${pad(rnd.nextInt(8))}".trim),
        (2L, s"${pad(rnd.nextInt(8))} $passage ${pad(rnd.nextInt(8))}".trim))
        .toDF("doc_id", "text")
      val fp = Dedup.winnowIndex(docs, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert((byDoc(1L) & byDoc(2L)).nonEmpty,
        s"trial $trial (k=$k w=$w): shared passage selected no common print")
    }
  }

  test("waterfill invariants: budget respected, saturation exact, monotone") {
    val avail = Seq("a" -> 100L, "b" -> 40L, "c" -> 10L, "d" -> 250L)
    val parts = Map("a" -> 10L, "b" -> 30L, "c" -> 30L, "d" -> 30L)
    for (budget <- Seq(0L, 50L, 120L, 300L, 399L, 400L, 10000L)) {
      val rates = Mixing.waterfillRatesPpm(avail, parts, budget)
      // expected kept token mass never exceeds the budget (floor-ppm
      // rates only round DOWN) and never exceeds availability
      val mass = avail.map { case (d, a) =>
        rates.getOrElse(d, 0L).toDouble / 1e6 * a }.sum
      assert(mass <= budget + 1e-6, s"budget=$budget mass=$mass")
      assert(rates.values.forall(r => r >= 0L && r <= 1000000L))
      // budget >= total avail saturates everything
      if (budget >= 400L) assert(rates.values.forall(_ == 1000000L))
    }
    // monotone: a bigger budget never lowers any domain's rate
    val steps = Seq(50L, 120L, 200L, 300L, 400L)
      .map(b => Mixing.waterfillRatesPpm(avail, parts, b))
    steps.sliding(2).foreach { case Seq(lo, hi) =>
      (lo.keySet ++ hi.keySet).foreach { d =>
        assert(lo.getOrElse(d, 0L) <= hi.getOrElse(d, 0L),
          s"rate for $d dropped when the budget grew: $lo -> $hi")
      }
    }
  }

  test("winnowIndex dedups across rows: a split doc never doubles postings") {
    import spark.implicits._
    val doc = "alpha beta gamma delta epsilon zeta eta theta"
    val once = Seq((1L, doc), (2L, doc + " extra tail words here"))
      .toDF("doc_id", "text")
    val twice = once.unionByName(Seq((1L, doc)).toDF("doc_id", "text"))
    val a = Dedup.winnowOverlap(once, "doc_id", "text", 3, 4, 1L, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val b = Dedup.winnowOverlap(twice, "doc_id", "text", 3, 4, 1L, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSet == b.toSet, s"duplicated input row changed overlap: $a vs $b")
    assert(b.forall(_._4 <= 1.0))
  }

  test("tokenBudgetMix fails loudly on a null token count, naming the domain") {
    import spark.implicits._
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val docs = Seq(
      (1L, "en", Some(40L)), (2L, "fr", Some(10L)),
      (3L, "fr", None) // unscored row: must raise, not under-count fr
    ).toDF("doc_id", "lang", "n_toks")
    val e = intercept[Exception] {
      Mixing.tokenBudgetMix(docs, "lang", "doc_id", col("n_toks"),
        Map("en" -> 1L, "fr" -> 1L), budgetTokens = 40L).collect()
    }
    assert(chain(e).contains("null token count in domain fr"), chain(e))
  }

  test("winnowOverlap finds planted excerpts; the doc-freq cap bounds hot prints") {
    import spark.implicits._
    val body = "the original document discusses sorting networks and their " +
      "depth bounds in considerable detail across many sections"
    val docs = Seq(
      (1L, body),
      (2L, "an excerpt page quoting sorting networks and their depth bounds verbatim"),
      (3L, "different topic entirely about cooking pasta with fresh tomatoes")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlap(docs, "doc_id", "text", k = 3, w = 4,
        minShared = 1L, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // a boilerplate print shared by every doc explodes pairs; the cap
    // drops it and the pair count collapses
    val boiler = (1L to 20L).map(i => (i, s"subscribe to our newsletter now $i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.winnowOverlap(boiler, "doc_id", "text", 3, 4,
      minShared = 1L, maxDocFreq = None).count()
    val capped = Dedup.winnowOverlap(boiler, "doc_id", "text", 3, 4,
      minShared = 1L, maxDocFreq = Some(5)).count()
    assert(uncapped > 0 && capped == 0, s"uncapped=$uncapped capped=$capped")
  }

  test("editVerify kills order-blind false accepts, keeps true near-dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "theta eta zeta epsilon delta gamma beta alpha"), // reversed: bag-identical
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"), // true near-dup of 1
      (4L, ""), (5L, "")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.editVerify(pairs, docs, "doc_id", "text", maxRatio = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(!out.contains((1L, 2L)), "reversed copy must fail the verifier")
    assert(out.contains((1L, 3L)) && out((1L, 3L)) <= 0.3)
    assert(out((4L, 5L)) == 0.0, "two empty texts are identical")
    // the cap bounds the comparison: wildly different tails beyond
    // maxChars cannot fail a pair whose prefixes match
    val long = Seq(
      (10L, ("x " * 50) + "shared prefix " + ("a " * 200)),
      (11L, ("x " * 50) + "shared prefix " + ("b " * 200))).toDF("doc_id", "text")
    val capped = Dedup.editVerify(Seq((10L, 11L)).toDF("doc_a", "doc_b"),
      long, "doc_id", "text", maxRatio = 0.1, maxChars = 100)
    assert(capped.count() == 1)
    // a pair whose doc is missing (or has null text) fails loudly — a
    // silent drop would mark a real near-dup as verified-not-duplicate
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val missing = intercept[Exception] {
      Dedup.editVerify(Seq((1L, 99L)).toDF("doc_a", "doc_b"),
        docs, "doc_id", "text", maxRatio = 1.0).collect()
    }
    assert(chain(missing).contains("doc_b 99"), chain(missing))
    val nulled = intercept[Exception] {
      Dedup.editVerify(Seq((1L, 6L)).toDF("doc_a", "doc_b"),
        docs.unionByName(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text")),
        "doc_id", "text", maxRatio = 1.0).collect()
    }
    assert(chain(nulled).contains("doc_b 6"), chain(nulled))
  }

  test("lshContaminatedDocs fails loudly on negative ids, either side") {
    import spark.implicits._
    val good = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bad = Seq((-7L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // a silently dropped negative corpus id would let a contaminated doc
    // through unflagged; a negative bench id would alias into the corpus
    // key space after the sign flip
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception] {
      Contamination.lshContaminatedDocs(bad, good, "doc_id", "text").collect()
    }
    assert(chain(e1).contains("corpus ids must be >= 0"), s"got: ${chain(e1)}")
    val e2 = intercept[Exception] {
      Contamination.lshContaminatedDocs(good, bad, "doc_id", "text").collect()
    }
    assert(chain(e2).contains("benchmark ids must be >= 0"), s"got: ${chain(e2)}")
  }

  test("luhn card validation: checksum truth table, separators, redaction") {
    import spark.implicits._
    val rows = Seq(
      // classic test numbers: valid Visa / MasterCard / Amex (15-digit)
      (1L, "pay 4111111111111111 now", 1L, 1L),
      (2L, "pay 5500-0055-5555-5559 now", 1L, 1L),
      (3L, "amex 3400 0000 0000 009 ok", 1L, 1L),
      // off-by-one checksum fails; short digit runs aren't candidates
      (4L, "ref 4111111111111112 order", 1L, 0L),
      (5L, "call 555-123-4567 maybe 123456789012", 0L, 0L),
      (6L, "two cards 4111111111111111 and 4111111111111112", 2L, 1L)
    ).toDF("id", "text", "exp_cand", "exp_valid")
    val (nCand, nValid) = TextFunctions.cardCounts(col("text"))
    val got = rows.select(col("id"), nCand.as("c"), nValid.as("v"),
        col("exp_cand"), col("exp_valid"),
        TextFunctions.redactCards(col("text")).as("red"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"candidates for id ${r.getLong(0)}: $r")
      assert(r.getLong(2) == r.getLong(4), s"valid count for id ${r.getLong(0)}: $r")
      if (r.getLong(3) > 0)
        assert(r.getString(5).contains("[CARD]") &&
          !"\\d{13}".r.findFirstIn(r.getString(5)).isDefined,
          s"redaction must eat every card-shaped run: ${r.getString(5)}")
    }
  }
}
