package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training/RAG pipelines: split each document
  * into fixed-size token windows with a configurable overlap, each
  * chunk carrying a deterministic id.
  *
  * No reference counterpart (the reference is a table format); the
  * semantics follow the standard fixed-window chunkers used by
  * retrieval and context-packing pipelines.
  *
  * Scale posture: pure per-row array math + one explode — shuffle-free,
  * so chunking 100 TB is embarrassingly parallel and the output can
  * stream straight into a graft bulk_insert without a repartition.
  */
object Chunking {

  /** One row per (doc, window). Windows start at multiples of
    * `chunkSize - overlap` and every start strictly inside the document
    * emits a chunk (the final chunk may be short; a document shorter
    * than `chunkSize` emits exactly one chunk). A null text yields no
    * chunks (filtered explicitly — letting it reach `sequence` would
    * drop the row silently under ANSI and THROW under non-ANSI, where
    * `size(null)` is -1). Output columns: `idCol, chunk_idx (long),
    * chunk_key (string), n_tokens (long), chunk_text (string)`.
    */
  def chunkTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val stride = chunkSize - overlap
    val toks: Column = TextFunctions.wsTokens(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("_tk"))
      .withColumn("_n", size(col("_tk")))
      // starts = 0, stride, 2*stride, ... < n  (n >= 1 always: splitting
      // an empty string yields a single empty token in both engines)
      .select(col(idCol), col("_tk"),
        posexplode(sequence(lit(0), col("_n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "_start")))
      .withColumn("_chunk", slice(col("_tk"), col("_start") + 1, lit(chunkSize)))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        concat(col(idCol).cast("string"), lit("#"),
          col("chunk_idx").cast("string")).as("chunk_key"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }
}
