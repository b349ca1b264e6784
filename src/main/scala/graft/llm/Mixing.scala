package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.hash60

/** Deterministic corpus sampling and source mixing for training-data
  * pipelines.
  *
  * Every sampling decision is a pure function of (salt, row id): keep a
  * row iff `hash60(md5(salt:id)) mod 1e6 < rate_ppm`. That makes samples
  *  - reproducible across engines (the DuckDB oracles inline the same
  *    md5 arithmetic — no RNG state, no float thresholds),
  *  - stable under retries/re-partitioning (no `rand()` anywhere),
  *  - monotone in the rate (raising the rate only ADDS rows — a re-mix
  *    at a higher budget is a superset, which downstream incremental
  *    pipelines rely on).
  *
  * Rates are integral parts-per-million, so membership is pure integer
  * arithmetic. At 100 TB all of these are embarrassingly parallel
  * scans — no shuffle, no driver data movement; only
  * [[temperatureMix]] collects the per-source COUNTS (a handful of
  * rows) to plan its rates.
  */
object Mixing {

  /** Uniform bucket in [0, 1e6): leading 60 md5 bits of "salt:id" mod
    * 1e6. Integral and engine-portable. The Column-salt form is the
    * single source of the bucket arithmetic — the SQL `ppm_bucket`
    * registration binds here too, so DataFrame and SQL sampling can
    * never diverge. */
  def ppmBucket(id: Column, salt: Column): Column =
    hash60(concat_ws(":", salt, id.cast("string"))) % 1000000L

  def ppmBucket(id: Column, salt: String): Column = ppmBucket(id, lit(salt))

  /** Deterministic Bernoulli sample: keep iff bucket < rate_ppm. */
  def hashSample(df: DataFrame, idCol: String, ratePpm: Long,
      salt: String = "mix"): DataFrame =
    df.filter(ppmBucket(col(idCol), salt) < ratePpm)

  /** Deterministic train/val/test split: assign each row the first
    * label whose cumulative ppm range contains its bucket. `splits` are
    * (label, ppm) and must sum to ≤ 1e6; rows past the last boundary
    * get `rest`. Adds a `split` column. */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Long)],
      rest: String = "train", salt: String = "split"): DataFrame =
    df.withColumn("split", splitLabel(ppmBucket(col(idCol), salt), splits, rest))

  /** First label whose cumulative ppm range contains `bucket`. */
  private def splitLabel(
      bucket: Column, splits: Seq[(String, Long)], rest: String): Column = {
    val bounds = splits.scanLeft(0L) { case (acc, (_, ppm)) => acc + ppm }.tail
    require(bounds.lastOption.forall(_ <= 1000000L), "splits exceed 1e6 ppm")
    splits.zip(bounds).foldRight(lit(rest): Column) {
      case (((label, _), hi), alt) => when(bucket < hi, label).otherwise(alt)
    }
  }

  /** Per-key document cap (crawl-politeness / anti-domination pass):
    * keep at most `cap` rows per key in `orderCol` order — the standard
    * "at most N docs per host" rule that stops one megasite from
    * dominating the mix. Null keys are exempt (no host → nothing to
    * dominate). Adds a `kept` boolean; the caller filters.
    *
    * Scale note: the rank window shuffles once by key; a pathological
    * megakey serializes ITS rows through one task, which is exactly the
    * row set the cap is about to cut — acceptable, but salt-and-recount
    * if a single key's row count itself is storage-scale. Null-key rows
    * never enter the window at all (they are exempt, and a web corpus's
    * hostless slice is a megakey nothing would ever cut). */
  def perKeyCap(
      df: DataFrame, keyCol: Column, orderCol: Column, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val ranked = df.filter(keyCol.isNotNull)
      .withColumn("_rk", row_number().over(
        Window.partitionBy(keyCol).orderBy(orderCol)))
      .withColumn("kept", col("_rk") <= cap)
      .drop("_rk")
    ranked.unionByName(df.filter(keyCol.isNull).withColumn("kept", lit(true)))
  }

  /** Leakage-safe split: the assignment unit is the near-dup CLUSTER,
    * not the document, so no near-duplicate pair ever crosses a split
    * boundary — the standard eval-contamination guard run before
    * carving a held-out set. `pairs` is any near-dup edge list
    * ((doc_a, doc_b) — jaccard/minhash/simhash/embedding, the caller
    * picks recall); every doc inherits the split of its connected
    * component's min id (via [[Dedup.nearDupClusters]]) and singletons
    * hash on their own id — the same value space, so ratios hold.
    *
    * Scale shape: the component map is id-pairs only (label
    * propagation, all shuffle-side), the assignment itself is one
    * left join + per-row hash. Adds `component` (null for singletons),
    * `split_unit` and `split`. */
  def leakSafeSplit(
      df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Long)], rest: String = "train",
      salt: String = "split"): DataFrame = {
    val comp = Dedup.nearDupClusters(pairs)
      .select(col("node").as(idCol), col("component"))
    // the unit is STRING-normalized so non-numeric ids (URLs, content
    // hashes) hash like Mixing.split's own id cast — a long cast here
    // would null out every such singleton and funnel them into one split
    df.join(comp, Seq(idCol), "left")
      .withColumn("split_unit",
        coalesce(col("component").cast("string"), col(idCol).cast("string")))
      .withColumn("split",
        splitLabel(ppmBucket(col("split_unit"), salt), splits, rest))
  }

  /** Stratified sample: per-stratum ppm rates (missing strata get
    * `defaultPpm`). One scan, no shuffle; the rate table rides the
    * closure as a CASE expression. */
  def stratifiedSample(
      df: DataFrame, strataCol: String, idCol: String,
      ratesPpm: Map[String, Long], defaultPpm: Long = 0L,
      salt: String = "mix"): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(defaultPpm): Column) {
      case (alt, (stratum, ppm)) =>
        when(col(strataCol) === stratum, lit(ppm)).otherwise(alt)
    }
    df.filter(ppmBucket(col(idCol), salt) < rate)
  }

  /** Deterministic fractional upsampling: each row repeats
    * `floor(weight)` times, plus once more when its ppm bucket falls
    * under the fractional remainder — so a source weighted 2.3 (its
    * "epoch count" in a training recipe) contributes each doc 2 or 3
    * times, expected 2.3. Weights are per-stratum ppm (1e6 = 1.0×;
    * values < 1e6 downsample exactly like [[stratifiedSample]]). An
    * `epoch` column (0-based repeat index) keeps the copies
    * distinguishable for downstream shuffling/sharding.
    *
    * Scale shape: one scan; the repeat is a `sequence`+`explode` whose
    * fan-out per row is `ceil(weight)` — no join, no shuffle, no driver
    * state. */
  def upsample(
      df: DataFrame, strataCol: String, idCol: String,
      weightsPpm: Map[String, Long], defaultPpm: Long = 1000000L,
      salt: String = "epoch"): DataFrame = {
    require((weightsPpm.values ++ Seq(defaultPpm)).forall(_ >= 0), "negative weight")
    val w = weightsPpm.foldLeft(lit(defaultPpm): Column) {
      case (alt, (stratum, ppm)) =>
        when(col(strataCol) === stratum, lit(ppm)).otherwise(alt)
    }
    val whole = (w / 1000000L).cast("long")
    val frac = w % 1000000L
    val extra = when(ppmBucket(col(idCol), salt) < frac, 1L).otherwise(0L)
    df.withColumn("_g_rep", whole + extra)
      .filter(col("_g_rep") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_g_rep") - 1)))
      .drop("_g_rep")
  }

  /** Temperature-weighted source mixing (the Pile/ROOTS recipe): target
    * composition p_s ∝ n_s^(1/tau) — tau = 1 keeps natural proportions,
    * tau → ∞ approaches uniform across sources — scaled to an expected
    * `targetTotal` rows, capped at each source's actual size (no
    * upsampling; a rate is at most 1e6 ppm).
    *
    * The per-source COUNTS (a handful of rows) come to the driver to
    * plan integral ppm rates; membership is then the same one-scan
    * integer filter as [[hashSample]]. Returns the sampled rows plus
    * the planned `rate_ppm` column for auditability. */
  def temperatureMix(
      df: DataFrame, sourceCol: String, idCol: String,
      tau: Double, targetTotal: Long,
      salt: String = "mix"): DataFrame = {
    // planning keys go through a string cast (any source-column type
    // plans correctly) and rows with a NULL source are excluded up
    // front: they could never match the equality rate CASE below, so
    // excluding them from the weight pool keeps plan and output
    // consistent instead of crashing the driver sort on a null key
    val counts = df.groupBy(col(sourceCol).cast("string").as("_g_src"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .sortBy(_._1) // deterministic fold order for the weight sum
    val inv = 1.0 / tau
    // pow(x, 0.5) == sqrt(x) per fdlibm, but route explicitly so the
    // oracle's sqrt() is bit-identical beyond doubt
    val weights = counts.map { case (s, n) =>
      s -> (if (inv == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, inv))
    }
    val wSum = weights.map(_._2).sum
    val rates = counts.zip(weights).map { case ((s, n), (_, w)) =>
      val expect = targetTotal.toDouble * (w / wSum)
      s -> math.min(1000000L, math.max(0L, math.floor(expect / n * 1000000.0).toLong))
    }.toMap
    val rate = rates.foldLeft(lit(0L): Column) {
      case (alt, (stratum, ppm)) =>
        when(col(sourceCol).cast("string") === stratum, lit(ppm)).otherwise(alt)
    }
    df.withColumn("rate_ppm", rate)
      .filter(ppmBucket(col(idCol), salt) < col("rate_ppm"))
  }

  /** Deterministic reproducible global shuffle for training-data
    * loading: each row's sort key is hash60(md5(salt:id)) — uniform,
    * engine-portable, stable under retries and re-partitioning, and a
    * new salt (e.g. the epoch number) is a fresh independent
    * permutation. Emits `shard` (= key mod nShards — the loader file
    * the row lands in) and `pos` (1-based position within the shard;
    * key ties break by id, then by `tiebreak`). Readers streaming shard
    * files in pos order reproduce the exact permutation without any
    * coordination.
    *
    * When `idCol` is NOT unique in `df` — e.g. the output of
    * [[upsample]], where the same doc appears once per epoch — pass the
    * disambiguating columns as `tiebreak` (the epoch column), or the
    * copies' relative order is input order and the permutation is no
    * longer stable under retries.
    *
    * Scale shape: the per-shard rank is a window partitioned by shard —
    * pick nShards well above the executor count so each shard's sort is
    * one task-sized run (at 100 TB: thousands of shards, which is the
    * file count a loader wants anyway). No global ordering pass exists
    * anywhere. */
  def deterministicShuffle(df: DataFrame, idCol: String, nShards: Int,
      salt: String, tiebreak: Seq[String] = Nil): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = hash60(concat_ws(":", lit(salt), col(idCol).cast("string")))
    // scratch column name must stay clear of the graft meta columns
    // (_g_key IS the record-key meta column on graft-read frames)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("_g_shuf") +: col(idCol) +: tiebreak.map(col): _*)
    df.withColumn("_g_shuf", key)
      .withColumn("shard", col("_g_shuf") % nShards)
      .withColumn("pos", row_number().over(w))
      .drop("_g_shuf")
  }

  /** Waterfilling allocation for a token budget over target mix
    * proportions — the planning step [[temperatureMix]] skips: when a
    * domain is too small for its target share, its surplus must be
    * REDISTRIBUTED to the remaining domains (a recipe asking 40% French
    * of 12B tokens from a 3.7B-token French slice cannot just cap at
    * 1.0× and silently deliver a smaller mix; the budget is the
    * contract). Classic waterfill: hand every active domain its
    * proportional share of the remaining budget; domains whose available
    * mass is at or under their share saturate (keep everything, leave
    * the pool); repeat on the survivors — at most one round per domain.
    *
    * All arithmetic is engine-replayable by construction: availabilities
    * and proportion parts are exact longs, every share is a single
    * `remaining * part / partSum` double expression, and the final rates
    * are integral ppm — the DuckDB oracle unrolls the same rounds
    * term-for-term.
    *
    * Returns (domain -> rate_ppm); domains with no target part (or no
    * mass) are absent = rate 0. NOTE: a target domain present with ZERO
    * token mass is excluded up front here (absent = rate 0), whereas a
    * naive waterfill would saturate it at 1e6 ppm and count its part in
    * the round-1 shares — the q175 oracle states the same exclusion
    * explicitly (`HAVING sum(n_toks) > 0`), keeping the two contracts
    * aligned even off the fixture path. */
  private[graft] def waterfillRatesPpm(
      avail: Seq[(String, Long)], parts: Map[String, Long],
      budget: Long): Map[String, Long] = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(parts.values.forall(_ >= 0), "proportion parts must be >= 0")
    var active = avail
      .filter { case (d, a) => parts.getOrElse(d, 0L) > 0 && a > 0 }
      .sortBy(_._1)
    var remaining = budget
    val rates = scala.collection.mutable.Map[String, Long]()
    var settled = false
    while (!settled && active.nonEmpty) {
      val pSum = active.map { case (d, _) => parts(d) }.sum
      val shares = active.map { case (d, a) =>
        (d, a, remaining.toDouble * parts(d).toDouble / pSum.toDouble)
      }
      val saturated = shares.filter { case (_, a, sh) => a.toDouble <= sh }
      if (saturated.isEmpty) {
        shares.foreach { case (d, a, sh) =>
          rates(d) = math.min(1000000L,
            math.floor(sh / a.toDouble * 1000000.0).toLong)
        }
        settled = true
      } else {
        saturated.foreach { case (d, _, _) => rates(d) = 1000000L }
        remaining -= saturated.map(_._2).sum
        val done = saturated.map(_._1).toSet
        active = active.filterNot { case (d, _) => done(d) }
      }
    }
    rates.toMap
  }

  /** Token-budget mix: sample the corpus so each target domain
    * contributes (up to availability) its proportional share of
    * `budgetTokens`, with shortfall redistributed by
    * [[waterfillRatesPpm]]. `targetParts` are integral proportion parts
    * (e.g. en->20, fr->40, de->40); domains outside the target get rate
    * 0 and drop. Membership is the standard [[ppmBucket]] rule on the
    * DOCUMENT id, so a kept doc is kept whole and the expected kept
    * token mass per domain is rate × available (document sampling, the
    * same estimator every recipe's "epochs per source" table assumes).
    *
    * Scale shape: one census aggregation (per-domain token sums — a
    * handful of rows to the driver to plan), then one scan whose rate
    * table rides the closure as a CASE expression — no join, no second
    * shuffle. Returns kept rows + their domain's `rate_ppm`. */
  def tokenBudgetMix(
      df: DataFrame, domainCol: String, idCol: String, tokensCol: Column,
      targetParts: Map[String, Long], budgetTokens: Long,
      salt: String = "budget"): DataFrame = {
    // a null token count is a misconfigured pipeline (wrong column, an
    // unscored slice) — fail loudly with the domain, never NPE on the
    // driver or silently under-count a domain's mass
    val checkedToks = when(tokensCol.isNotNull, tokensCol)
      .otherwise(raise_error(concat(
        lit("tokenBudgetMix: null token count in domain "),
        coalesce(col(domainCol).cast("string"), lit("null")))))
    val avail = df
      .filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("_g_dom"))
      .agg(sum(checkedToks).cast("long").as("a"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSeq
    val rates = waterfillRatesPpm(avail, targetParts, budgetTokens)
    val rate = rates.foldLeft(lit(0L): Column) {
      case (alt, (domain, ppm)) =>
        when(col(domainCol).cast("string") === domain, lit(ppm)).otherwise(alt)
    }
    df.withColumn("rate_ppm", rate)
      .filter(ppmBucket(col(idCol), salt) < col("rate_ppm"))
  }

  /** Group-DRO exponentiated-gradient rounds on the domain simplex —
    * the weight-update rule of DoReMi (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * arXiv:2305.10429, Algorithm 1). From uniform weights, each round
    *
    *   α'_k  =  α_k · exp(η · ℓ_k)                   (EG ascent step)
    *   α_k   ←  (1−c) · α'_k / Σ_j α'_j  +  c / K    (renormalize +
    *                                                  uniform smoothing)
    *
    * and the returned reference weights are the AVERAGE of α over the
    * rounds (the paper's output is the per-step average, not the final
    * iterate). ℓ_k ≥ 0 is domain k's excess loss.
    *
    * Honest scope: the full recipe re-trains a proxy model between
    * steps, so ℓ moves; as a data-pipeline operator the losses are a
    * fixed census and only the paper's weight arithmetic runs here —
    * the inner proxy-training loop belongs to the caller's trainer.
    * With fixed losses the iteration is a deterministic driver-side
    * fold over K domains (K is tiny), replayable term-for-term by the
    * SQL oracle. */
  private[graft] def doremiRounds(
      excess: Seq[(String, Double)], rounds: Int, eta: Double,
      smoothing: Double): Map[String, Double] = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(eta > 0, s"eta must be > 0: $eta")
    require(smoothing >= 0 && smoothing < 1, s"smoothing in [0,1): $smoothing")
    require(excess.forall(_._2 >= 0), "excess losses must be >= 0")
    val doms = excess.sortBy(_._1)
    val k = doms.size
    if (k == 0) return Map.empty
    var w = Vector.fill(k)(1.0 / k)
    val acc = Array.fill(k)(0.0)
    for (_ <- 1 to rounds) {
      val up = doms.indices.map(i => w(i) * math.exp(eta * doms(i)._2))
      val s = up.sum
      w = doms.indices
        .map(i => (1.0 - smoothing) * up(i) / s + smoothing / k).toVector
      doms.indices.foreach(i => acc(i) += w(i))
    }
    doms.indices.map(i => doms(i)._1 -> acc(i) / rounds).toMap
  }

  /** DoReMi-style domain reweighting over per-document losses: one
    * census aggregation computes each domain's mean loss, its excess
    * over a baseline, and [[doremiRounds]] turns the excesses into
    * simplex weights. `baseline` per domain is the corpus-wide mean
    * loss by default (upweight domains that score worse than the
    * average document — the zero-extra-model reading of the paper's
    * proxy-minus-reference gap), or a caller-supplied per-domain map
    * (e.g. a reference model's measured per-domain loss) for the
    * faithful two-model form. Excess clamps at 0: domains at or below
    * baseline exert no upward pull but still receive the smoothing
    * floor c/K.
    *
    * Returns one row per domain: (domain, n_docs, mean_loss,
    * excess_loss, weight); weights sum to 1. Feed `weight` (scaled to
    * integral parts) into [[tokenBudgetMix]] to realize the mixture.
    *
    * Scale shape: the census is one hash aggregate (domains-sized
    * result to the driver); the EG rounds are O(rounds × K) driver
    * arithmetic; nothing else moves. At 100 TB the cost is the single
    * scan that computes the per-doc losses upstream. */
  def doremiWeights(
      perDoc: DataFrame, domainCol: String, lossCol: String,
      rounds: Int = 3, eta: Double = 1.0, smoothing: Double = 0.2,
      baselinePerDomain: Option[Map[String, Double]] = None): DataFrame = {
    val filtered = perDoc
      .filter(col(domainCol).isNotNull && col(lossCol).isNotNull)
    // default-baseline mode needs the corpus-wide mean TOO: a ROLLUP
    // computes the per-domain census and the grand-total group (the
    // same avg-over-all-docs the former separate aggregate produced,
    // from the same raw rows) in ONE job — the per-doc loss pipeline
    // upstream (at 100 TB, the corpus scan) previously executed twice,
    // once per collect (guide §1.2 step 1: don't compute things twice)
    val (rows, globalMean) = baselinePerDomain match {
      case Some(_) =>
        val census = filtered
          .groupBy(col(domainCol).cast("string").as("domain"))
          .agg(count(lit(1)).as("n_docs"), avg(col(lossCol)).as("mean_loss"))
        (census.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))), 0.0)
      case None =>
        // the filter above excludes null domains, so the one null-domain
        // row rollup emits IS the grand-total group
        val all = filtered
          .rollup(col(domainCol).cast("string").as("domain"))
          .agg(count(lit(1)).as("n_docs"), avg(col(lossCol)).as("mean_loss"))
          .collect()
        val (totalRow, domainRows) = all.partition(_.isNullAt(0))
        (domainRows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))),
          totalRow.headOption.map(_.getDouble(2)).getOrElse(0.0))
    }
    val excess = rows.toSeq.map { case (dom, _, m) =>
      val base = baselinePerDomain.map(_.getOrElse(dom, m)).getOrElse(globalMean)
      dom -> math.max(0.0, m - base)
    }
    val weights = doremiRounds(excess, rounds, eta, smoothing)
    val exMap = excess.toMap
    // materialize from the ONE collected census: returning
    // census.withColumn(literal CASE ...) would re-execute the
    // aggregation, and with a nondeterministic input (sampled or
    // rand-derived losses) the re-aggregated rows could disagree with
    // the weights computed from the first execution — and the
    // when/otherwise chain grows linearly with domain count
    val spark = perDoc.sparkSession
    import spark.implicits._
    rows.toSeq
      .map { case (dom, n, m) => (dom, n, m, exMap(dom), weights(dom)) }
      .sortBy(_._1)
      .toDF("domain", "n_docs", "mean_loss", "excess_loss", "weight")
  }
}
