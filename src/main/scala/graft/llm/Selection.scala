package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.TextFunctions.hash60
import graft.llm.{TextFunctions => TF}

/** Data selection via importance resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its hashed
  * bag-of-ngrams is under the TARGET distribution than under the RAW
  * distribution, then sample without replacement proportionally to the
  * importance weights via the Gumbel-top-k trick.
  *
  * Scale shape: the two n-gram distributions reduce to `dim`-bucket
  * count vectors (two aggregations whose RESULT is codebook-sized —
  * the only collects). The per-bucket log-ratio table then rides the
  * scoring pass as a literal array, so scoring is pure per-row math:
  * no explode, no join, no shuffle. Selection is `orderBy(...).limit(n)`
  * — Spark plans TakeOrdered (per-partition top-n + driver merge),
  * never a global sort. Everything is md5-derived and deterministic:
  * no RNG state, identical replay in the DuckDB oracle.
  */
object Selection {

  /** Hashed unigram+bigram bucket ids of `textCol`, in token order
    * (order matters only for the fold-order parity of the score). */
  def ngramBuckets(textCol: Column, dim: Int): Column = {
    val toks = TF.wsTokens(textCol)
    transform(concat(toks, TF.shingles(toks, 2)),
      g => (hash60(g) % dim).cast("int"))
  }

  /** Per-bucket counts of `df`'s hashed n-grams as a dense vector
    * (driver-side, `dim`-sized — a codebook, like a quantizer). */
  private def bucketCounts(
      df: DataFrame, textCol: Column, dim: Int): Array[Long] = {
    val dense = Array.fill(dim)(0L)
    df.filter(textCol.isNotNull)
      .select(explode(ngramBuckets(textCol, dim)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect()
      .foreach(r => dense(r.getInt(0)) = r.getLong(1))
    dense
  }

  /** The add-`alpha` smoothed log importance ratio per bucket:
    * ln p_target(b) − ln p_raw(b). Buckets unseen in either corpus get
    * their mass from the smoothing, so every raw doc scores finitely. */
  def dsirLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: Column,
      dim: Int = 256,
      alpha: Double = 1.0): Seq[Double] = {
    val tc = bucketCounts(target, textCol, dim)
    val rc = bucketCounts(raw, textCol, dim)
    val tt = tc.sum.toDouble
    val tr = rc.sum.toDouble
    (0 until dim).map { b =>
      math.log((tc(b) + alpha) / (tt + alpha * dim)) -
        math.log((rc(b) + alpha) / (tr + alpha * dim))
    }
  }

  /** Per-document log importance weight: the sum of its n-gram
    * buckets' log ratios (left fold, so the DuckDB replay's
    * `list_sum(list_transform(...))` is bit-identical). Output:
    * (idCol, n_grams, log_weight). */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: Column,
      dim: Int = 256,
      alpha: Double = 1.0): DataFrame = {
    val lam = typedlit(dsirLogRatios(raw, target, textCol, dim, alpha))
    raw.filter(textCol.isNotNull)
      .select(col(idCol), ngramBuckets(textCol, dim).as("_b"))
      .select(col(idCol),
        size(col("_b")).cast("long").as("n_grams"),
        aggregate(col("_b"), lit(0.0d),
          (acc, b) => acc + element_at(lam, b + 1)).as("log_weight"))
  }

  /** Per-bucket Naive Bayes log-odds table for the fastText-style
    * quality classifier (the CCNet/LLaMA "does this look like a
    * reference page" filter): ln p(b|pos) − ln p(b|neg) with add-`alpha`
    * smoothing, learned from two labeled corpora. Like [[dsirLogRatios]]
    * this reduces each class to a `dim`-bucket count vector — the only
    * collects are codebook-sized. */
  def nbLogOdds(
      pos: DataFrame,
      neg: DataFrame,
      textCol: Column,
      dim: Int = 256,
      alpha: Double = 1.0): Seq[Double] = {
    val pc = bucketCounts(pos, textCol, dim)
    val nc = bucketCounts(neg, textCol, dim)
    val tp = pc.sum.toDouble
    val tn = nc.sum.toDouble
    (0 until dim).map { b =>
      math.log((pc(b) + alpha) / (tp + alpha * dim)) -
        math.log((nc(b) + alpha) / (tn + alpha * dim))
    }
  }

  /** Score `df` with the classifier: per-doc score = class-prior
    * log-odds (by labeled DOC counts) + the left-fold sum of its n-gram
    * buckets' log-odds; `pred_pos` = score ≥ 0 (the sigmoid threshold
    * at 0.5, without materializing exp — keeps the gate free of
    * cross-engine libm exp differences). The scoring pass is pure
    * per-row math against a literal table: no join, no shuffle.
    * Output: (idCol, n_grams, score, pred_pos). */
  def nbScore(
      df: DataFrame,
      pos: DataFrame,
      neg: DataFrame,
      idCol: String,
      textCol: Column,
      dim: Int = 256,
      alpha: Double = 1.0): DataFrame = {
    val lam = typedlit(nbLogOdds(pos, neg, textCol, dim, alpha))
    val nPos = pos.filter(textCol.isNotNull).count().toDouble
    val nNeg = neg.filter(textCol.isNotNull).count().toDouble
    val prior = math.log((nPos + alpha) / (nNeg + alpha))
    df.filter(textCol.isNotNull)
      .select(col(idCol), ngramBuckets(textCol, dim).as("_b"))
      .select(col(idCol),
        size(col("_b")).cast("long").as("n_grams"),
        // prior OUTSIDE the fold: the oracle's `prior + list_sum(...)`
        // then has the identical addition order (floats don't associate)
        (lit(prior) + aggregate(col("_b"), lit(0.0d),
          (acc, b) => acc + element_at(lam, b + 1))).as("score"))
      .withColumn("pred_pos", col("score") >= 0d)
  }

  /** Gumbel-top-`n` importance resampling: adding an md5-derived
    * Gumbel(0,1) to each log weight and taking the top n draws a
    * sample WITHOUT replacement proportional to exp(log_weight) — the
    * paper's resampling step, with the engine-portable md5 uniform
    * standing in for the RNG. Deterministic in `salt`. */
  def dsirResample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: Column,
      n: Int,
      dim: Int = 256,
      alpha: Double = 1.0,
      salt: String = "dsir0"): DataFrame = {
    val u = (Mixing.ppmBucket(col(idCol), salt).cast("double") + 0.5d) / 1000000.0d
    dsirLogWeights(raw, target, idCol, textCol, dim, alpha)
      .withColumn("samp_key", col("log_weight") - log(-log(u)))
      .orderBy(col("samp_key").desc, col(idCol).asc)
      .limit(n)
  }

  /** Cluster-balanced (diversity) sampling: cap every semantic
    * cluster's contribution at `perCell` docs — the embedding-space
    * twin of [[Mixing.perKeyCap]]'s per-host anti-domination pass, and
    * the selection step cluster-based pruning methods share (pick a
    * bounded, spread-out subset instead of letting one dense topic
    * dominate the mix). Clusters come from the same driver-collected
    * fused-kernel quantizer as [[Similarity.semDedup]] (id-chosen
    * centroids by default, or a trained [[Similarity.trainIvfCentroids]]
    * codebook); within a cell the pick order is a salted md5 draw with
    * id tiebreak — deterministic, engine-replayable, and uncorrelated
    * with ids or insertion order.
    *
    * Scale shape: assignment is per-row kernel math (no exchange); the
    * only shuffle is the per-cell rank window, whose key count is the
    * codebook size — size the codebook so corpus/cells rows fit a
    * partition (production cells are thousands, not sixteen).
    * Returns every non-null input vector: (idCol, cell, rk, picked). */
  def clusterBalancedSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int,
      perCell: Int,
      salt: String = "cbs",
      centroids: Option[DataFrame] = None): DataFrame = {
    require(perCell >= 1, "perCell must be >= 1")
    val member = Similarity.kernelMembers(
      corpus, idCol, vecCol, cells, centroids, "clusterBalancedSample")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"))
      .orderBy(Mixing.ppmBucket(col("m_id"), salt).asc, col("m_id").asc)
    member.select(col("m_id"), col("cell"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("m_id").as(idCol), col("cell"), col("rk"),
        (col("rk") <= perCell).as("picked"))
  }
}
