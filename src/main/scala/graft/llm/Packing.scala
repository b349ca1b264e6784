package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: concatenate the corpus in `orderCol` order and cut
  * the token stream into fixed `seqLen`-token training sequences,
  * emitting one row per (document, sequence) overlap segment — the
  * standard "concat-and-chunk" packing step that turns a cleaned corpus
  * into fixed-context training examples while keeping document
  * boundaries as metadata (so the trainer can reset attention masks /
  * loss at boundaries).
  *
  * No reference counterpart (the reference is a table format); the
  * semantics follow the GPT-style packing used by LLM data pipelines.
  *
  * Scale posture: the only global state is each document's starting
  * token offset, computed by [[Sharding.tokenShards]]'s parallel
  * prefix-sum (bucket-local windows + a driver-side prefix over
  * #buckets subtotals — never a single global window). Everything after
  * that is per-row arithmetic plus one explode, so packing 100 TB is
  * one scan with no extra shuffle: a doc's segments are emitted where
  * the doc lives, and a downstream `repartition(seq_id)`/bulk_insert
  * regroups them only if the trainer needs physical co-location.
  */
object Packing {

  /** One row per (doc, sequence) segment. A document whose tokens span
    * `[token_start, token_start + n_tokens)` in the concatenated stream
    * contributes a segment to every sequence `s` with
    * `s*seqLen < token_start + n_tokens && (s+1)*seqLen > token_start`.
    * Null-text docs are filtered explicitly (same stance as
    * [[Chunking.chunkTokens]]); empty docs still hold one token (both
    * engines split '' to a single empty token), so every surviving doc
    * emits at least one segment.
    *
    * Output: all input columns plus
    *   - `n_tokens` (long) — the doc's token count
    *   - `token_start` (long) — the doc's first token's global offset
    *   - `seq_id` (long) — the training-sequence index
    *   - `seg_start` (long) — the segment's 0-based offset WITHIN the sequence
    *   - `tok_from` (long) — the segment's 0-based offset WITHIN the doc
    *   - `tok_len` (long) — tokens in the segment
    *   - `seg_text` (string) — the segment's tokens re-joined
    */
  def packSequences(
      df: DataFrame, textCol: Column, orderCol: Column,
      seqLen: Int, buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val L = lit(seqLen.toLong)
    val sharded = Sharding.tokenShards(
        df.filter(textCol.isNotNull), textCol, orderCol, seqLen.toLong, buckets)
      .withColumnRenamed("shard", "_p_s0") // tokenShards' shard IS floor(start/L)
    val start = col("token_start")
    val endEx = col("token_start") + col("n_tokens")
    val s1 = ((endEx - 1) / L).cast("long")
    sharded
      // tokenize ONCE per doc before the fan-out: a doc spanning many
      // sequences would otherwise re-split its full text per segment
      .withColumn("_p_tk", TextFunctions.wsTokens(textCol))
      .withColumn("seq_id", explode(sequence(col("_p_s0"), s1)))
      .drop("_p_s0")
      .withColumn("tok_from", greatest(col("seq_id") * L - start, lit(0L)))
      .withColumn("seg_start", greatest(start - col("seq_id") * L, lit(0L)))
      .withColumn("tok_len",
        least(endEx, (col("seq_id") + 1) * L) - greatest(start, col("seq_id") * L))
      .withColumn("seg_text",
        array_join(
          slice(col("_p_tk"),
            (col("tok_from") + 1).cast("int"), col("tok_len").cast("int")),
          " "))
      .drop("_p_tk")
  }
}
