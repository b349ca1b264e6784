package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.hash60

/** Similarity search over an embedding column (`array<float>`).
  *
  * All float math is promoted to IEEE double and folded strictly
  * left-to-right (functions.aggregate), so scores are bit-identical
  * across engines — the DuckDB oracles reproduce them exactly.
  *
  * Scale posture: [[bruteForceTopK]] broadcasts the (small) query set
  * against the corpus — one corpus scan, no corpus shuffle. [[lshAnn]]
  * is the 100 TB path: a signature bucket join bounds the candidate set
  * per query, so cost tracks bucket occupancy instead of corpus size.
  */
object Similarity {

  private def toExpr(c: Column) =
    org.apache.spark.sql.graft.ColumnBridge.toExpr(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(e)

  /** Left-fold dot product in double — a codegen'd kernel
    * ([[graft.functions.DotProductD]]) with semantics bit-identical to
    * `aggregate(zip_with(...))`, minus its per-element lambda
    * interpretation cost. */
  def dotD(a: Column, b: Column): Column =
    toCol(graft.functions.DotProductD(toExpr(a), toExpr(b)))

  /** L2 norm in double (same fold order, codegen'd). */
  def normD(a: Column): Column =
    sqrt(toCol(graft.functions.SumSquaresD(toExpr(a))))

  def cosineD(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotD(a, b) / (normA * normB)

  /** Exact top-k cosine neighbors for each query row. `queries` is
    * expected to be small (it is broadcast); the corpus is scanned once.
    * Ties broken by neighbor id for determinism. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("cvec"))
      .withColumn("cnrm", normD(col("cvec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qvec"))
      .withColumn("qnrm", normD(col("qvec")))
    val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cos", cosineD(col("qvec"), col("cvec"), col("qnrm"), col("cnrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos"))
  }

  /** Hard-negative mining for contrastive training (DPR / SimCSE
    * style): each query's top-`k` most-similar corpus vectors AFTER
    * excluding near-duplicates — neighbors at `cos >= maxCos` are
    * presumed positives/copies of the query (the same threshold the
    * dedup family uses) and must not be served as negatives, while the
    * highest-cosine survivors are exactly the "hard" negatives worth
    * training against. Same scan shape as [[bruteForceTopK]]: queries
    * broadcast, one corpus pass, per-query rank window over scalar rows;
    * at scale the shortlist can come from the ANN family instead with
    * the same post-filter. Output: (q_id, rnk, n_id, cos). */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, maxCos: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("cvec"))
      .withColumn("cnrm", normD(col("cvec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qvec"))
      .withColumn("qnrm", normD(col("qvec")))
    val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cos", cosineD(col("qvec"), col("cvec"), col("qnrm"), col("cnrm")))
      // the near-dup exclusion runs BEFORE the rank window, so
      // positives never occupy (or shift) negative ranks
      .filter(col("cos") < maxCos)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos"))
  }

  /** Per-group mean-pooled centroids (class prototypes / per-source
    * embedding profiles), output exploded as one row per (group,
    * dimension): `(groupCol, j, n, c)` with `c = Σ x_j / n` over the
    * group's non-null vectors.
    *
    * Two summation modes. `exact = false` (production default) is a
    * plain hash-aggregated `avg` per (group, dim) after a posexplode —
    * map-side combined, one exchange keyed by (group, dim), any corpus
    * size. `exact = true` folds each (group, dim)'s addends in (id,
    * value) sorted order, making the float sum bit-stable across
    * engines and partitionings — the mode the DuckDB gate replays;
    * its per-key state is the group's value list, so reserve it for
    * gating/auditing, not the 100 TB path. */
  def groupCentroids(
      df: DataFrame, idCol: String, vecCol: String, groupCol: String,
      exact: Boolean = false): DataFrame = {
    val expl = df.filter(col(vecCol).isNotNull)
      .select(col(groupCol), col(idCol).as("_id"),
        posexplode(col(vecCol)).as(Seq("j", "_x")))
      .select(col(groupCol), col("_id"), col("j").cast("long").as("j"),
        col("_x").cast("double").as("_x"))
    val summed =
      if (!exact)
        expl.groupBy(col(groupCol), col("j"))
          .agg(count(lit(1)).as("n"), avg(col("_x")).as("c"))
      else
        expl.groupBy(col(groupCol), col("j"))
          .agg(count(lit(1)).as("n"),
            (aggregate(
              array_sort(collect_list(struct(col("_id"), col("_x")))),
              lit(0.0), (acc, e) => acc + e("_x")) / count(lit(1))).as("c"))
    summed.select(col(groupCol), col("j"), col("n"), col("c"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold. All-pairs — only
    * for modest corpora or within LSH buckets; the scale path routes
    * through [[lshAnn]]-style bucketing first. */
  def nearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", normD(col("vec")))
    c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineD(col("a.vec"), col("b.vec"), col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Near-dup pairs through the LSH bucket join (the scale path next to
    * [[nearDupPairs]]): every vector is banded once, pairs sharing any
    * band get exact cosine, the threshold applies after. Recall follows
    * the banded contract — a pair agreeing on no band is not reported —
    * which is the trade every 100 TB near-dup pass makes; tighten by
    * raising `bands`. Cost is bucket occupancy, not corpus². */
  def nearDupPairsBucketed(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 16, bands: Int = 4,
      dims: Int = 64): DataFrame = {
    // bands carry ONLY (id, band, bucket): candidate pairs are deduped as
    // bare id pairs and the vectors join back afterwards — the wide
    // embedding arrays never ride the bucket join or the distinct
    val banded = corpus.select(col(idCol).as("id"),
        posexplode(bandBuckets(col(vecCol), planes, bands, dims)).as(Seq("b", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val nrm = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", normD(col("vec")))
    cand
      .join(nrm.select(col("id").as("id_a"), col("vec").as("va"), col("nrm").as("na")), "id_a")
      .join(nrm.select(col("id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        cosineD(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim i): an integer in [-1000, 1000] derived from md5 — identical
    * in any engine, no RNG state. */
  private[graft] def planeComponent(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble
  }

  /** Random-hyperplane LSH signature: bit p = sign(v · g_p) for
    * `planes` fixed pseudo-random hyperplanes. Returns bit array. */
  def lshSignature(vec: Column, planes: Int, dims: Int): Seq[Column] =
    (0 until planes).map { p =>
      val comps = (1 to dims).map(i => planeComponent(p, i))
      // left fold in index order, double throughout (oracle-identical)
      val dot = aggregate(
        zip_with(vec, lit(comps.toArray), (x, g) => x.cast("double") * g),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, 1).otherwise(0)
    }

  /** All LSH band bucket keys in one codegen'd pass over the vector
    * ([[graft.functions.LshBandBuckets]]) — bit-identical to banding
    * [[lshSignature]] but without the per-plane array traversals. */
  def bandBuckets(vec: Column, planes: Int, bands: Int, dims: Int): Column =
    toCol(graft.functions.LshBandBuckets(
      toExpr(vec), planeMatrix(planes, dims), planes, bands, dims))

  /** The transposed hyperplane matrix [[graft.functions.LshBandBuckets]]
    * consumes: entry (i·planes + p) = component i+1 of plane p. */
  private[graft] def planeMatrix(planes: Int, dims: Int): IndexedSeq[Double] = {
    val compsT = new Array[Double](planes * dims)
    for (i <- 0 until dims; p <- 0 until planes)
      compsT(i * planes + p) = planeComponent(p, i + 1)
    compsT.toIndexedSeq
  }

  /** Deterministic Lloyd iterations training an IVF coarse quantizer:
    * init = the `cells` lowest-id vectors, then `iters` rounds of
    * max-cosine assignment + element-wise mean update. All dataflow is
    * DataFrame aggregation — the only driver-sized object is the
    * centroid set itself (tiny, broadcast each round). Cells that end
    * up empty keep their previous centroid. Returns (c_id, c_vec). */
  def trainIvfCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = corpus.select(col(idCol).as("v_id"), col(vecCol).as("v_vec"))
    var cent = vecs.orderBy(col("v_id")).limit(cells)
      .select(col("v_id").cast("long").as("c_id"), col("v_vec").as("c_vec"))
      .withColumn("c_id",
        (row_number().over(Window.orderBy(col("c_id"))) - 1).cast("long"))
    (0 until iters).foreach { _ =>
      val withNorm = cent.withColumn("c_nrm", normD(col("c_vec")))
      val scored = vecs
        .withColumn("v_nrm", normD(col("v_vec")))
        .crossJoin(broadcast(withNorm))
        .withColumn("c_cos", cosineD(col("v_vec"), col("c_vec"), col("v_nrm"), col("c_nrm")))
      val w = Window.partitionBy(col("v_id")).orderBy(col("c_cos").desc, col("c_id"))
      val assigned = scored.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .select(col("v_id"), col("v_vec"), col("c_id"))
      // element-wise mean per cell: positional explode -> avg -> re-pack
      val means = assigned
        .select(col("c_id"), posexplode(col("v_vec")).as(Seq("pos", "x")))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("c_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("c_id"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("c_vec"))
      // empty cells keep their previous centroid
      cent = cent.select(col("c_id"), col("c_vec").as("c_prev"))
        .join(means, Seq("c_id"), "left")
        .select(col("c_id"), coalesce(col("c_vec"), col("c_prev")).as("c_vec"))
      // materialize the tiny centroid set: bounds lineage across rounds
      cent = spark.createDataFrame(
        java.util.Arrays.asList(cent.collect(): _*), cent.schema)
    }
    cent
  }

  /** IVF-flat approximate top-k with a FIXED coarse quantizer: `cells`
    * corpus vectors (chosen by id — deterministic, no RNG/k-means
    * state) act as centroids; every corpus vector is assigned to its
    * max-cosine centroid, a query probes its `nprobe` nearest cells,
    * and exact cosine runs over those cells' members only.
    *
    * Scale shape: the centroid set broadcasts (it is tiny), assignment
    * is one corpus scan, and per-query cost is the probed cells'
    * occupancy — the inverted-file idea without the training step. A
    * production deployment would swap the id-chosen centroids for
    * k-means ones; nothing else changes. */
  def ivfAnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cells: Int = 16, nprobe: Int = 4,
      /** trained quantizer (c_id, c_vec) — e.g. [[trainIvfCentroids]];
        * None = the deterministic id-chosen default */
      centroids: Option[DataFrame] = None): DataFrame = {
    val cent = centroids
      .map(_.select(col("c_id"), col("c_vec")))
      .getOrElse(corpus.filter(col(idCol) < cells)
        .select(col(idCol).as("c_id"), col(vecCol).as("c_vec")))
      .withColumn("c_nrm", normD(col("c_vec")))
    // cell membership carries ONLY (id, cell): the candidate dedup
    // exchanges id pairs, never the embedding arrays — vectors join back
    // once per survivor (same shape as [[nearDupPairsBucketed]])
    val corpusCells = assignCells(corpus, cent, idCol, vecCol, "n_id")
      .filter(col("_rk") === 1)
      .select(col("n_id"), col("n_id_cell"))
    val queryCells = assignCells(queries, cent, idCol, vecCol, "q_id")
      .filter(col("_rk") <= nprobe)
      .select(col("q_id"), col("q_id_cell"))
    val cand = corpusCells.join(broadcast(queryCells),
        col("n_id_cell") === col("q_id_cell") && col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"))
      .distinct()
    rescoreTopK(cand, corpus, queries, idCol, vecCol, k)
  }

  /** Cell assignment: one scan × broadcast centroids, argmax cosine
    * (ties break toward the smaller centroid id). The per-cell scores
    * drop the vector BEFORE the rank window, so the argmax exchange
    * moves (id, c_id, cos) triples only — never the embedding arrays.
    * `cent` must carry (c_id, c_vec, c_nrm). */
  private def assignCells(
      df: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String, id: String): DataFrame = {
    val scored = df.select(col(idCol).as(id), col(vecCol).as("_v"))
      .withColumn("_vn", normD(col("_v")))
      .crossJoin(broadcast(cent))
      .withColumn("c_cos", cosineD(col("_v"), col("c_vec"), col("_vn"), col("c_nrm")))
      .select(col(id), col("c_id"), col("c_cos"))
    val w = Window.partitionBy(col(id)).orderBy(col("c_cos").desc, col("c_id"))
    scored.withColumn("_rk", row_number().over(w))
      .select(col(id), col("c_id").as(s"${id}_cell"), col("_rk"))
  }

  /** Exact-cosine rescoring of bare (q_id, n_id) candidate pairs: the
    * (small) query vectors broadcast, the corpus vectors join back once,
    * and only ids ride the candidate exchanges upstream of this call. */
  private def rescoreTopK(
      cand: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_id_vec"))
      .withColumn("q_nrm", normD(col("q_id_vec")))
    val nv = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_id_vec"))
      .withColumn("n_nrm", normD(col("n_id_vec")))
    val scored = cand
      .join(broadcast(qv), "q_id")
      .join(nv, "n_id")
      .withColumn("cos",
        cosineD(col("q_id_vec"), col("n_id_vec"), col("q_nrm"), col("n_nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .select(col("q_id"), col("n_id"), col("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering. The corpus is coarse-clustered with
    * the same quantizer as [[ivfAnn]] (deterministic id-chosen
    * centroids by default, or a [[trainIvfCentroids]] quantizer), then
    * WITHIN each cell every vector whose cosine to a lower-id cell-mate
    * reaches `threshold` is marked a semantic duplicate — one
    * representative (the min id) survives per duplicate group, and
    * duplicates are NOT chased transitively across cells, exactly the
    * paper's per-cluster pairwise rule.
    *
    * Scale posture (the paper's design point): the cells bound the
    * quadratic — pairwise work is Σ|cell|², never |corpus|². The
    * quantizer collects to the driver (codebook-sized, like
    * [[sq8Train]]'s bounds), so cell assignment is pure per-row fused
    * kernel math with NO exchange at all; the within-cell self-join
    * then moves each (vector, norm) across the wire exactly once per
    * side — O(corpus) network, like a shuffle write — and cosines are
    * computed in the join projection, so no pair-many vector copies
    * ever enter an exchange.
    *
    * Returns one row per non-null corpus vector: (idCol, cell, kept),
    * cell typed long. */
  def semDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, cells: Int = 16,
      centroids: Option[DataFrame] = None): DataFrame = {
    val member = kernelMembers(corpus, idCol, vecCol, cells, centroids, "semDedup")
    val a = member.select(col("m_id").as("q_id"), col("m_vec").as("q_vec"),
      col("m_nrm").as("q_nrm"), col("cell"))
    val b = member.select(col("m_id").as("n_id"), col("m_vec").as("n_vec"),
      col("m_nrm").as("n_nrm"), col("cell"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("q_id") < col("n_id"))
      .filter(cosineD(col("q_vec"), col("n_vec"),
        col("q_nrm"), col("n_nrm")) >= threshold)
      .select(col("n_id").as("m_id")).distinct()
      .withColumn("_dup", lit(true))
    member.select(col("m_id"), col("cell"))
      .join(dropped, Seq("m_id"), "left")
      .select(col("m_id").as(idCol), col("cell"),
        col("_dup").isNull.as("kept"))
  }

  /** Shared fused-kernel cell membership for the clustering family
    * ([[semDedup]], [[graft.llm.Selection.clusterBalancedSample]]):
    * collect the (codebook-sized) quantizer to the driver, then assign
    * every non-null corpus vector to its argmax-cosine centroid with
    * per-row kernel math — NO exchange at all in the assignment pass.
    * Ties break to the smaller c_id (cents are c_id-ordered,
    * array_position finds the FIRST max); norm folds are strict
    * left-to-right so DuckDB oracles reproduce the cos bit-for-bit.
    * Returns (m_id, m_vec, m_nrm, cell). */
  private[llm] def kernelMembers(
      corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, centroids: Option[DataFrame], who: String): DataFrame = {
    val centRows = centroids
      .map(_.select(col("c_id").cast("long").as("c_id"), col("c_vec")))
      // the id-chosen default skips null vectors (an arbitrary seed
      // choice anyway); user-supplied quantizers fail loudly below
      .getOrElse(corpus.filter(col(idCol) < cells && col(vecCol).isNotNull)
        .select(col(idCol).cast("long").as("c_id"), col(vecCol).as("c_vec")))
      .orderBy(col("c_id"))
      .collect()
    require(centRows.nonEmpty, s"$who needs at least one centroid")
    val cents: Seq[(Long, Seq[Double])] = centRows.toSeq.map { r =>
      val raw = r.getSeq[Any](1)
      require(raw != null, s"$who centroid ${r.getLong(0)} has a null vector")
      val v = raw.toSeq.map {
        case f: java.lang.Float  => f.toDouble
        case d: java.lang.Double => d.doubleValue
        case null => throw new IllegalArgumentException(
          s"$who centroid ${r.getLong(0)} has a null element")
      }
      (r.getLong(0), v)
    }
    val vNrm = normD(col(vecCol))
    val scores = array(cents.map { case (_, cv) =>
      cosineD(col(vecCol), typedlit(cv), vNrm,
        lit(math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x))))
    }: _*)
    corpus.filter(col(vecCol).isNotNull).select(
      col(idCol).as("m_id"),
      col(vecCol).as("m_vec"),
      vNrm.as("m_nrm"),
      element_at(typedlit(cents.map(_._1)),
        array_position(scores, array_max(scores)).cast("int")).as("cell"))
  }

  /** ±1 entry (j, i) of the sign random-projection matrix: the parity
    * of the same leading-60-md5-bit derivation the LSH planes use —
    * deterministic, engine-portable (DuckDB replays the identical
    * string-hash-parity arithmetic). */
  private[graft] def rpSign(salt: String, j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$j:$i".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 2L) * 2.0 - 1.0
  }

  /** Sign random projection (Achlioptas 2003's database-friendly
    * Johnson–Lindenstrauss transform): out[j] = Σᵢ v[i]·s(j,i) / √outDim
    * with s = ±1 derived from md5 — distance-preserving in expectation,
    * fully deterministic, no trained state. The narrow output feeds the
    * ANN family as a cheaper exact-rescore space (reduced vectors are
    * outDim/dims the bytes of the originals through every downstream
    * exchange) or as the input space for LSH/IVF at high source dims.
    *
    * Scale shape: the matrix rides as outDim literal arrays (codebook-
    * sized, like the LSH planes); the projection is pure per-row fold
    * math — no shuffle, no join, no exchange anywhere. Each fold is
    * strict left-to-right in doubles, so the DuckDB oracle replays the
    * arithmetic bit-for-bit. Null vectors project to null. */
  def rpReduce(
      vec: Column, dims: Int, outDim: Int, salt: String = "rp"): Column = {
    require(outDim >= 1 && dims >= 1, "rpReduce dims must be >= 1")
    val scale = math.sqrt(outDim.toDouble)
    // the when-guard turns a null INPUT into a null output (not an
    // array of null elements, which downstream kernels would reject)
    when(vec.isNotNull, array((0 until outDim).map { j =>
      val signs = (1 to dims).map(i => rpSign(salt, j, i))
      aggregate(
        zip_with(vec, lit(signs.toArray), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x) / scale
    }: _*))
  }

  /** Recall@k evaluation: per query, the fraction of the EXACT top-k
    * (e.g. [[bruteForceTopK]]) recovered by an approximate result
    * ([[lshAnn]]/[[ivfAnn]]/the PQ family) — the tuning harness for
    * bands/cells/nprobe/rerank. Both inputs carry (q_id, n_id); rank
    * and score columns are ignored. One id-pair join + a per-query
    * aggregation — nothing here scales with the corpus, only with
    * queries × k. Output: (q_id, n_exact, n_hit, recall). */
  def topKRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    // dedup both sides: a multi-probe/banded approx list (or a union of
    // runs) may repeat a pair, and a repeated pair would fan the join
    // out and inflate BOTH n_exact and n_hit
    val e = exact.select(col("q_id"), col("n_id")).dropDuplicates("q_id", "n_id")
    val a = approx.select(col("q_id"), col("n_id")).dropDuplicates("q_id", "n_id")
      .withColumn("_hit", lit(1L))
    e.join(a, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
  }

  /** Approximate top-k: candidates = corpus rows sharing at least one
    * LSH band with the query, then exact cosine over candidates only.
    * bands × bitsPerBand = planes. The bucket join is the whole point:
    * per-query work is bucket occupancy, not corpus size. */
  def lshAnn(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 16, bands: Int = 4, dims: Int = 64): DataFrame = {
    // band rows carry ONLY (id, band, bucket): the candidate distinct
    // exchanges bare id pairs; vectors join back in [[rescoreTopK]]
    def withBands(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        posexplode(bandBuckets(col(vecCol), planes, bands, dims))
          .as(Seq(s"${id}_b", s"${id}_bucket")))
    val qb = withBands(queries, "q_id")
    val cb = withBands(corpus, "n_id")
    val cand = cb.join(broadcast(qb),
        col("n_id_b") === col("q_id_b") && col("n_id_bucket") === col("q_id_bucket") &&
          col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"))
      .distinct()
    rescoreTopK(cand, corpus, queries, idCol, vecCol, k)
  }

  // ==========================================================================
  // SQ8 scalar quantization (compressed-vector search economics)
  // ==========================================================================
  // At 100 TB the embedding column IS the storage bill: a float32[d]
  // vector costs 4d bytes/row, its SQ8 code d bytes — the standard 4×
  // compression used by vector indexes (FAISS's ScalarQuantizer QT_8bit).
  // Train = per-dimension [lo, hi] over the corpus (one aggregation);
  // encode = per-row linear bucketing into 0..255; search = asymmetric
  // distance (exact query vector against midpoint-decoded codes). All
  // arithmetic is fixed-order double, so scores are engine-reproducible.

  /** Per-dimension [lo, hi] training bounds (one map-side-combined
    * aggregation over the corpus; output is d rows collected to the
    * driver — vector dims, not data rows). */
  def sq8Train(corpus: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val stats = corpus
      .select(posexplode(col(vecCol)).as(Seq("_i", "_x")))
      .groupBy(col("_i"))
      .agg(min(col("_x").cast("double")).as("lo"), max(col("_x").cast("double")).as("hi"))
      .orderBy(col("_i"))
      .collect()
    (stats.map(_.getDouble(1)).toSeq, stats.map(_.getDouble(2)).toSeq)
  }

  /** Encode a vector into SQ8 codes (int 0..255 per dimension):
    * `floor((x - lo) * 255 / (hi - lo))` clamped; a constant dimension
    * (hi = lo) encodes as 0. */
  def sq8Codes(vec: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    toCol(graft.functions.Sq8EncodeExpr(toExpr(vec), lo, hi))

  /** Midpoint decode of SQ8 codes back to doubles:
    * `lo + (code + 0.5) * (hi - lo) / 256` (a constant dimension decodes
    * to lo). */
  def sq8Decode(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    toCol(graft.functions.Sq8DecodeExpr(toExpr(codes), lo, hi))

  /** Top-k by asymmetric distance: EXACT query vectors scored against
    * the SQ8-decoded corpus — the memory-bound search mode where only
    * codes live in the scan (broadcast queries, one corpus scan, same
    * shape as [[bruteForceTopK]]). Returns `(q_id, rnk, n_id, cos)`
    * where `cos` is the approximate (ADC) cosine. */
  def sq8TopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      lo: Seq[Double], hi: Seq[Double]): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
        sq8Decode(sq8Codes(col(vecCol), lo, hi), lo, hi).as("cvec"))
      .withColumn("cnrm", normD(col("cvec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qvec"))
      .withColumn("qnrm", normD(col("qvec")))
    val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cos", cosineD(col("qvec"), col("cvec"), col("qnrm"), col("cnrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos"))
  }

  // ---- product quantization (PQ / FAISS IndexPQ analog) --------------------
  // The vector is split into `m` contiguous subspaces; each subspace has
  // its own ksub-entry codebook, and a vector stores one byte-sized code
  // per subspace — m bytes instead of 4·dims (32x smaller at 64 float
  // dims, m=8). At 100 TB the embedding column IS the bill: PQ is the
  // standard next step past SQ8 when even 1 byte/dim doesn't fit the
  // scan budget. Search is asymmetric: exact query vectors against
  // codebook-decoded corpus codes, optionally re-ranked exactly.

  /** Deterministic `[m][ksub][dsub]` codebooks seeded from the first
    * `ksub` corpus vectors in id order (the oracle-replayable init, like
    * [[ivfAnn]]'s first-n centroid seed); refine with [[pqTrain]] for
    * real quality. Collects ksub·dims doubles — codebook-sized, not
    * data-sized. */
  def pqInitCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Seq[Seq[Seq[Double]]] = {
    val seeds = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0))
    require(seeds.nonEmpty, "pqInitCodebooks: empty corpus")
    val dims = seeds.head.length
    require(dims % m == 0, s"pqInitCodebooks: dims $dims not divisible by m=$m")
    val dsub = dims / m
    (0 until m).map { s =>
      (0 until ksub).map { j =>
        seeds(j % seeds.length).slice(s * dsub, s * dsub + dsub).toSeq
      }
    }
  }

  /** Lloyd-refined PQ codebooks: `iters` rounds of assign (via
    * [[pqCodes]], all executor-side) + per-(subspace, centroid, dim)
    * mean. Each round is one distributed aggregation; only the
    * m·ksub·dsub means come back to the driver. An emptied centroid
    * keeps its previous position. Float means are partition-order
    * dependent, so refined codebooks are for quality, not oracle
    * replay — the gated query uses the deterministic init. */
  def pqTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    var cb = pqInitCodebooks(corpus, idCol, vecCol, m, ksub)
    val dsub = cb.head.head.length
    for (_ <- 0 until iters) {
      val means = corpus
        .select(col(vecCol).cast("array<double>").as("_v"))
        .select(col("_v"), posexplode(pqCodes(col("_v"), cb)).as(Seq("_s", "_j")))
        .select(col("_s"), col("_j"),
          posexplode(slice(col("_v"), col("_s") * dsub + 1, lit(dsub)))
            .as(Seq("_i", "_x")))
        .groupBy(col("_s"), col("_j"), col("_i"))
        .agg(avg(col("_x")).as("_mu"))
        .collect()
      val mu = means.map(r =>
        (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      cb = cb.zipWithIndex.map { case (cents, s) =>
        cents.zipWithIndex.map { case (cent, j) =>
          cent.zipWithIndex.map { case (old, i) => mu.getOrElse((s, j, i), old) }
        }
      }
    }
    cb
  }

  /** Encode a vector to its `m` PQ codes: per subspace, the index of the
    * L2-nearest codebook entry (fixed-order double math; first-minimum
    * tie-break, so codes are engine-reproducible). */
  def pqCodes(vec: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    toCol(graft.functions.PqEncodeExpr(toExpr(vec), flatCb(cb),
      cb.length, cb.head.length, cb.head.head.length))

  /** Row-major flattening of `[m][ksub][dsub]` codebooks for the
    * kernels: index `s·ksub·dsub + j·dsub + i`. */
  private def flatCb(cb: Seq[Seq[Seq[Double]]]): Seq[Double] =
    cb.flatten.flatten

  /** Decode PQ codes back to the concatenated centroid blocks. */
  def pqDecode(codes: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    toCol(graft.functions.PqDecodeExpr(toExpr(codes), flatCb(cb),
      cb.length, cb.head.length, cb.head.head.length))

  /** Top-k by PQ asymmetric distance: exact (broadcast) query vectors
    * against the codebook-decoded corpus — one corpus scan, and only
    * `(q_id, n_id, cos_adc)` scalars enter the ranking shuffle (the
    * decoded vectors never leave the scan side). With `rerank > 0`, the
    * per-query top-`rerank` ADC shortlist is broadcast back against the
    * corpus for EXACT cosines — the standard two-stage recall fix, and
    * still only shortlist-sized data moves. Returns `(q_id, rnk, n_id,
    * cos[, cos_adc])` ranked by the final (exact when reranked) score. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cb: Seq[Seq[Seq[Double]]], rerank: Int = 0): DataFrame =
    pqTopKFromCodes(
      corpus.select(col(idCol), pqCodes(col(vecCol), cb).as("_codes")),
      corpus, queries, idCol, "_codes", vecCol, k, cb, rerank,
      // codes derive from the rerank corpus itself: the id sets cannot
      // diverge, so skip the coverage windows entirely
      strictCoverage = false)

  /** ADC top-k over PRECOMPUTED codes — the stored-index search mode:
    * codes live in a (graft) table maintained incrementally per crawl
    * batch (like the MinHash signature store of `minhashLshFromSigs`),
    * so search scans m bytes/vector without touching the raw
    * embeddings; `corpus` supplies exact vectors only for the rerank
    * shortlist. `codesDf` carries (idCol, codesCol). */
  def pqTopKFromCodes(
      codesDf: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, codesCol: String, vecCol: String, k: Int,
      cb: Seq[Seq[Seq[Double]]], rerank: Int = 0,
      /** stored codes can go stale vs the raw corpus — verify the
        * rerank covered every shortlisted id (see [[adcRankRerank]]) */
      strictCoverage: Boolean = true): DataFrame = {
    val c = codesDf.select(col(idCol).as("n_id"),
        pqDecode(col(codesCol), cb).as("cvec"))
      .withColumn("cnrm", normD(col("cvec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qvec"))
      .withColumn("qnrm", normD(col("qvec")))
    val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cos_adc",
        cosineD(col("qvec"), col("cvec"), col("qnrm"), col("cnrm")))
      .select(col("q_id"), col("n_id"), col("cos_adc"))
    adcRankRerank(scored, corpus, queries, idCol, vecCol, k, rerank,
      strictCoverage = strictCoverage)
  }

  /** Shared ADC ranking tail of [[pqTopK]] and [[ivfPqTopK]]: rank the
    * `(q_id, n_id, cos_adc)` scores; with `rerank > 0`, broadcast the
    * per-query shortlist back against the corpus for exact cosines and
    * re-rank. Without rerank the ADC score IS the result score, so it
    * is returned as `cos` (every TopK in this file names its ranking
    * score `cos`). */
  private def adcRankRerank(
      scored: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, rerank: Int,
      /** fail loudly when a shortlisted id has no corpus vector (stored
        * indexes can go stale vs the raw corpus; silent drops would
        * masquerade as lower-quality neighbors). Off for the derive-
        * from-corpus paths, where the sets cannot diverge. */
      strictCoverage: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_adc").desc, col("n_id"))
    if (rerank <= 0) {
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"),
          col("cos_adc").as("cos"))
    } else {
      val short = scored.withColumn("_srnk", row_number().over(w))
        .filter(col("_srnk") <= math.max(k, rerank))
        .select(col("q_id"), col("n_id"), col("cos_adc"))
      val joined = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nvec"))
        .join(broadcast(short), "n_id")
        .join(broadcast(queries.select(col(idCol).as("q_id"),
          col(vecCol).as("qv2"))), "q_id")
      val cosExpr =
        dotD(col("qv2"), col("nvec")) / (normD(col("qv2")) * normD(col("nvec")))
      // cos evaluates inside the joined projection, so the vectors are
      // dropped per-row and nothing downstream exchanges them
      val exact0 = joined.withColumn("cos", cosExpr)
        .select(col("q_id"), col("n_id"), col("cos"), col("cos_adc"))
      // coverage = a lazy poison branch: shortlisted ids with NO corpus
      // vector anti-join into rows whose cos evaluation raises. Compared
      // to counting windows this also catches a query losing its WHOLE
      // shortlist (the inner join above would silently drop it), and it
      // moves only bare ids (the corpus side prunes to its id column).
      // A DUPLICATED corpus id is the other stale-index hazard (it would
      // occupy two ranks and push the true k-th neighbor out), so strict
      // mode also raises when a shortlisted id joined more than once —
      // a per-(q,n) count over the id-sized projection, vectors long gone
      val exact =
        if (strictCoverage) {
          val dupW = Window.partitionBy(col("q_id"), col("n_id"))
          exact0.withColumn("_dup_n", count(lit(1)).over(dupW))
            .withColumn("cos", when(col("_dup_n") > 1,
              raise_error(concat(
                lit("duplicate rerank-corpus ids for query "),
                col("q_id").cast("string"))).cast("double"))
              .otherwise(col("cos")))
            .drop("_dup_n")
            .unionByName(short
              .join(corpus.select(col(idCol).as("n_id")), Seq("n_id"), "left_anti")
              .select(col("q_id"), col("n_id"),
                raise_error(concat(
                  lit("stored-index ids missing from the rerank corpus for query "),
                  col("q_id").cast("string"))).cast("double").as("cos"),
                col("cos_adc")))
        } else exact0
      val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      exact.withColumn("rnk", row_number().over(w2))
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"),
          col("cos"), col("cos_adc"))
    }
  }

  /** IVF-PQ (FAISS IndexIVFPQ analog): the coarse quantizer restricts
    * candidates to the query's `nprobe` nearest cells, PQ asymmetric
    * distance ranks within them, and `rerank` survivors get exact
    * cosines. The composition every billion-vector deployment runs:
    * per-query cost is probed-cell occupancy (IVF), scan bytes are
    * m codes/vector (PQ), and exactness is restored where it matters
    * (the shortlist). Candidate and shortlist sets are broadcast back
    * against the corpus, so no exchange ever carries a vector. */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cb: Seq[Seq[Seq[Double]]],
      cells: Int = 16, nprobe: Int = 4, rerank: Int = 0): DataFrame = {
    val cent = corpus.filter(col(idCol) < cells)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .withColumn("c_nrm", normD(col("c_vec")))
    val corpusCells = assignCells(corpus, cent, idCol, vecCol, "n_id")
      .filter(col("_rk") === 1)
      .select(col("n_id"), col("n_id_cell"))
    val queryCells = assignCells(queries, cent, idCol, vecCol, "q_id")
      .filter(col("_rk") <= nprobe)
      .select(col("q_id"), col("q_id_cell"))
    // a corpus vector lives in exactly one cell, so (q_id, n_id) pairs
    // are already unique — no distinct needed
    val cand = corpusCells.join(broadcast(queryCells),
        col("n_id_cell") === col("q_id_cell") && col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"))
    val dec = corpus.select(col(idCol).as("n_id"),
        pqDecode(pqCodes(col(vecCol), cb), cb).as("cvec"))
      .withColumn("cnrm", normD(col("cvec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qvec"))
      .withColumn("qnrm", normD(col("qvec")))
    // candidates broadcast back against the decoded scan: one corpus
    // pass, decoded vectors never enter an exchange
    val adc = dec.join(broadcast(cand), "n_id")
      .join(broadcast(q), "q_id")
      .withColumn("cos_adc",
        cosineD(col("qvec"), col("cvec"), col("qnrm"), col("cnrm")))
      .select(col("q_id"), col("n_id"), col("cos_adc"))
    adcRankRerank(adc, corpus, queries, idCol, vecCol, k, rerank)
  }
}
