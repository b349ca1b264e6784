package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}

import graft.core.Action
import graft.write.GraftTable

/** Streaming write into a graft table via `foreachBatch` (reference
  * analog: HoodieStreamingSink.scala:41 — per micro-batch, run the full
  * table write; idempotency via a batchId → instant mapping persisted
  * in commit metadata).
  *
  * On restart, Structured Streaming replays the last uncommitted batch;
  * the sink skips any batchId already recorded in a completed instant,
  * giving exactly-once table state on top of at-least-once delivery. */
object GraftStreamSink {

  val BatchIdKey = "streaming.batchId"
  val QueryIdKey = "streaming.queryId"

  /** Largest batchId already committed for `queryId` (None = none). */
  def lastCommittedBatch(table: GraftTable, queryId: String): Option[Long] = {
    val tl = table.timeline
    tl.completed()
      .filter(i => Action.dataActions.contains(i.action))
      .reverseIterator
      .map(tl.metadataOf(_).extra)
      .collectFirst {
        case e if e.get(QueryIdKey).contains(queryId) && e.contains(BatchIdKey) =>
          e(BatchIdKey).toLong
      }
  }

  /** A `(batch, batchId) => Unit` function for
    * `df.writeStream.foreachBatch(...)`. `operation`: "upsert" |
    * "insert" | "bulk_insert". */
  def apply(
      table: GraftTable,
      queryId: String,
      operation: String = "upsert"): (Dataset[Row], Long) => Unit = {
    (batch: Dataset[Row], batchId: Long) =>
      writeBatch(table, queryId, operation, batch.toDF(), batchId)
  }

  private[graft] def writeBatch(
      table: GraftTable,
      queryId: String,
      operation: String,
      batch: DataFrame,
      batchId: Long): Unit = {
    val already = lastCommittedBatch(table, queryId).exists(_ >= batchId)
    if (already) return // replay of a committed batch — skip (idempotent)
    val extra = Map(QueryIdKey -> queryId, BatchIdKey -> batchId.toString)
    operation match {
      case "insert"      => table.insert(batch, extra)
      case "bulk_insert" => table.bulkInsert(batch, extra = extra)
      case _             => table.upsert(batch, extra)
    }
  }
}
