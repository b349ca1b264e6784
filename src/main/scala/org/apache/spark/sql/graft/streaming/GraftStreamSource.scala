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
    cdc: Boolean = false,
    /** admission control: cap each micro-batch at this many commit
      * instants (None = drain to latest, the V1 default). The throttle
      * that keeps a backfill from materializing months of commits as ONE
      * giant batch — reference analog: HoodieIncrSource's
      * `hoodie.deltastreamer.source.hoodieincr.num_instants`
      * (HoodieIncrSource.java:61, default 1 instant per round); Spark
      * users know the shape as FileStreamSource's maxFilesPerTrigger. */
    maxInstantsPerTrigger: Option[Int] = None,
    /** the per-source checkpoint dir Spark hands createSource — the
      * throttle's watermark lives here so a restart resumes instead of
      * re-serving the backlog */
    metadataPath: String = "")
  extends Source {

  private val spark = sqlContext.sparkSession
  private lazy val table = GraftTable.load(spark, tablePath)
  private lazy val reader = GraftReader(table)

  /** The throttle's watermark file. Spark's V1 restart flow never tells
    * a source the committed offset after a CLEAN stop (getBatch replays
    * only uncommitted batches), so a paced source must persist its own
    * high-water mark — the same reason FileStreamSource keeps a seen-
    * files log under this very directory. Unthrottled sources stay
    * stateless (no file, no behavior change). */
  private val watermarkFile: Option[org.apache.hadoop.fs.Path] =
    maxInstantsPerTrigger.flatMap { _ =>
      if (metadataPath.isEmpty) None
      else Some(new org.apache.hadoop.fs.Path(metadataPath, "graft-throttle-watermark"))
    }

  /** Highest offset this source has advertised or served — the throttle
    * advances at most `maxInstantsPerTrigger` instants past it per
    * getOffset. Restored from the watermark file on (re)start; getBatch
    * additionally folds replayed checkpoint offsets in as defense. */
  private var advertised: String = watermarkFile match {
    case Some(p) =>
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) ""
      else {
        val in = fs.open(p)
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      }
    case None => ""
  }

  private def persistWatermark(): Unit = watermarkFile.foreach { p =>
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.RenameCommitStore.putAtomic(fs, p, advertised)
  }

  /** Resolved ONCE at stream start (lazy val) and pinned for the stream's
    * lifetime — the V1 Source contract the reference's stream source also
    * follows. Mid-stream schema evolution on the table does NOT propagate
    * to a running query; restart the stream to pick up added columns. */
  override lazy val schema: StructType =
    GraftStreamSource.streamSchema(table, cdc)

  /** Latest completed data instant — or, under the throttle, the
    * instant `maxInstantsPerTrigger` steps past the last advertised
    * offset. Driver-side timeline listing either way; no data IO.
    *
    * Crash-recovery fine print: the throttle watermark is persisted
    * HERE (at advertise time), before Spark durably logs the offset to
    * its own WAL. A crash in that window leaves the watermark ahead of
    * the last committed offset, so the first post-restart batch spans
    * (lastCommitted, advertised+n] — up to 2n instants. Exactly-once is
    * untouched (getBatch's `start` always comes from Spark's committed
    * offset); the admission cap alone is best-effort across crash
    * recovery, the same contract as maxOffsetsPerTrigger on a restarted
    * Kafka source. */
  override def getOffset: Option[Offset] = {
    val data = table.timeline.completed()
      .filter(i => Action.dataActions.contains(i.action))
      .map(_.time)
    if (data.isEmpty) return None
    val next = maxInstantsPerTrigger match {
      case None => data.last
      case Some(n) =>
        val pending = data.filter(_ > advertised)
        if (pending.isEmpty) advertised else pending.take(n).last
    }
    if (next.isEmpty) None
    else {
      if (next != advertised) {
        advertised = next
        persistWatermark()
      }
      Some(GraftSourceOffset(next))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val begin = start.map(GraftSourceOffset.of(_).commitTime).getOrElse("")
    val endT = GraftSourceOffset.of(end).commitTime
    if (endT > advertised) advertised = endT // checkpoint-recovery replay
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
  * `option("query.type", "cdc")` for the change-stream mode and
  * `option("maxInstantsPerTrigger", n)` to cap each micro-batch at n
  * commit instants. */
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
      parameters: Map[String, String]): Source = {
    val throttle = parameters.get("maxInstantsPerTrigger").map { v =>
      val n = v.toInt
      require(n >= 1, s"maxInstantsPerTrigger must be >= 1: $n")
      n
    }
    new GraftStreamSource(sqlContext, path(parameters), isCdc(parameters),
      throttle, metadataPath)
  }
}
