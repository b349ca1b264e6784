package org.apache.spark.sql.graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.core.{Action, Snapshot}
import graft.read.GraftReader
import graft.write.GraftTable

/** Structured Streaming offset for a graft table = a commit instant
  * time (reference analog: HoodieSourceOffset.scala:26 — offsets are
  * commit timestamps, `getBatch(start, end]` is an incremental query).
  * The sentinel "" means "table origin" (read everything). */
case class GraftSourceOffset(commitTime: String) extends Offset {
  override def json: String = commitTime
}

object GraftSourceOffset {
  /** V1 restart path hands back SerializedOffset(json). */
  def of(o: Offset): GraftSourceOffset = o match {
    case g: GraftSourceOffset => g
    case other                => GraftSourceOffset(other.json)
  }
}

/** V1 streaming source over a graft table: each micro-batch is the
  * incremental change stream between two instants (reference analog:
  * HoodieStreamSource.scala:50 — same design, same package trick to
  * reach `internalCreateDataFrame` for the isStreaming flag).
  *
  * Scale posture: `getOffset` is a driver-side timeline listing
  * (O(#instants), no data IO); `getBatch` plans the same pruned
  * incremental scan the batch reader uses — only file groups touched
  * by the offset range are opened. */
class GraftStreamSource(
    sqlContext: SQLContext,
    tablePath: String,
    /** cdc = each micro-batch is the I/U/D change stream (an
      * `_g_operation` column rides along) instead of latest-state rows */
    cdc: Boolean = false)
  extends Source {

  private val spark = sqlContext.sparkSession
  private lazy val table = GraftTable.load(spark, tablePath)
  private lazy val reader = GraftReader(table)

  /** Resolved ONCE at stream start (lazy val) and pinned for the stream's
    * lifetime — the V1 Source contract the reference's stream source also
    * follows. Mid-stream schema evolution on the table does NOT propagate
    * to a running query; restart the stream to pick up added columns. */
  override lazy val schema: StructType =
    GraftStreamSource.streamSchema(table, cdc)

  /** Latest completed data instant, if any. */
  override def getOffset: Option[Offset] = {
    val latest = table.timeline.completed()
      .filter(i => Action.dataActions.contains(i.action))
      .lastOption
    latest.map(i => GraftSourceOffset(i.time))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val begin = start.map(GraftSourceOffset.of(_).commitTime).getOrElse("")
    val endT = GraftSourceOffset.of(end).commitTime
    val batch =
      if (cdc) reader.incrementalCdc(begin, Some(endT))
      else reader.incremental(begin, Some(endT))
    // Re-plan as a streaming DataFrame (the physical rows are identical;
    // only the isStreaming marker differs — exactly what the reference
    // does in HoodieStreamSource.getBatch).
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(
        batch.queryExecution.toRdd, batch.schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

object GraftStreamSource {
  /** The pinned stream schema: the table's read schema, plus the
    * `_g_operation` tag in CDC mode (matching incrementalCdc's output
    * shape exactly). */
  def streamSchema(table: GraftTable, cdc: Boolean): StructType = {
    val base = table.readSchema(Snapshot.resolve(table.timeline))
    if (!cdc) base
    else StructType(base.fields :+ org.apache.spark.sql.types.StructField(
      "_g_operation", org.apache.spark.sql.types.StringType))
  }
}

/** `spark.readStream.format(classOf[GraftStreamProvider].getName)
  * .option("path", tablePath).load()` (reference analog:
  * DefaultSource.createSource, DefaultSource.scala:265). Pass
  * `option("query.type", "cdc")` for the change-stream mode. */
class GraftStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val p = path(parameters)
    val table = GraftTable.load(sqlContext.sparkSession, p)
    (shortName(), GraftStreamSource.streamSchema(table, isCdc(parameters)))
  }

  private def isCdc(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("query.type", "incremental") match {
      case "cdc"         => true
      case "incremental" => false
      case other => throw new IllegalArgumentException(
        s"unknown streaming query.type: $other (expected incremental | cdc)")
    }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStreamSource(sqlContext, path(parameters), isCdc(parameters))
}
