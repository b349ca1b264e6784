package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sharding: slice an ordered corpus into contiguous shards
  * of ~`budget` tokens each (the sharding step of a distributed training
  * pipeline — each shard becomes one trainer input file / data-loader
  * unit). A doc's shard is decided by its starting token offset, so
  * shard boundaries are stable under re-partitioning and appends past
  * the end.
  *
  * Scale design: a naive `sum(tokens) OVER (ORDER BY id)` forces ALL
  * rows through ONE window partition — the classic global-cumsum
  * bottleneck (at 100 TB: one task). Instead, a parallel prefix-sum:
  *   1. bucket docs by deterministic, order-contiguous id ranges
  *      (explicit arithmetic on the order key — no sampled partitioner,
  *      so re-evaluation of the lazy plan always lands each row in the
  *      same bucket);
  *   2. cumsum WITHIN each bucket (parallel window, bucket-local sort);
  *   3. per-bucket subtotals → driver prefix-sum (#buckets longs) →
  *      broadcast offset join.
  * The result equals the global window exactly (buckets are
  * order-contiguous); the driver step is O(#buckets), never O(rows).
  */
object Sharding {

  /** Add `n_tokens`, `token_start` (global 0-based offset of the doc's
    * first token in `orderCol` order) and `shard` (= token_start /
    * budget) columns. `orderCol` must be a unique numeric id. */
  def tokenShards(
      df: DataFrame, textCol: Column, orderCol: Column,
      budget: Long, buckets: Int = 0): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val nBuckets =
      if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val withTokens = df.withColumn("n_tokens",
      size(TextFunctions.wsTokens(textCol)).cast("long"))
    // the two planning aggregates (id bounds, per-bucket subtotals) run
    // over a cached two-long projection, so the text column is tokenized
    // once to build it and once in the final output scan — not once per
    // planning pass
    val counts = withTokens
      .select(orderCol.cast("long").as("_g_ord"), col("n_tokens"))
      .cache()
    try {
      // order-contiguous deterministic buckets from the id span: one tiny
      // driver agg; near-dense ids (the normal case) spread evenly
      val bounds = counts.agg(min(col("_g_ord")), max(col("_g_ord"))).collect()(0)
      if (bounds.isNullAt(0)) // empty input: keep the output schema
        return withTokens
          .withColumn("token_start", lit(0L)).withColumn("shard", lit(0L))
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val span = math.max(1L, (hi - lo) / nBuckets + 1L)
      val bucket = ((orderCol.cast("long") - lit(lo)) / lit(span)).cast("long")
      val local = withTokens
        .withColumn("_g_bkt", bucket)
        .withColumn("_g_cum", sum(col("n_tokens")).over(
          Window.partitionBy(col("_g_bkt")).orderBy(orderCol)))
      // driver prefix-sum over #buckets subtotals (a few KB)
      val subtotals = counts
        .groupBy((((col("_g_ord") - lit(lo)) / lit(span)).cast("long")).as("_g_bkt"))
        .agg(sum(col("n_tokens")).as("_g_sub"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      val offsets = subtotals.map { case (b, sub) =>
        val off = acc; acc += sub; (b, off)
      }
      val spark = df.sparkSession
      val offsetsDf = spark.createDataFrame(
        java.util.Arrays.asList(offsets.map { case (b, o) =>
          org.apache.spark.sql.Row(b, o) }: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("_g_bkt2",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_g_off",
            org.apache.spark.sql.types.LongType))))
      local.join(broadcast(offsetsDf), col("_g_bkt") === col("_g_bkt2"))
        .withColumn("token_start", col("_g_cum") + col("_g_off") - col("n_tokens"))
        .withColumn("shard", (col("token_start") / budget).cast("long"))
        .drop("_g_bkt", "_g_bkt2", "_g_cum", "_g_off")
    } finally counts.unpersist()
  }
}
