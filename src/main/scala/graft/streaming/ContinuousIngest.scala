package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Action
import graft.read.GraftReader
import graft.write.GraftTable

/** A pull source for the continuous-ingest loop: given the last
  * checkpoint, return (new data, new checkpoint) — or None when caught
  * up (reference analog: utilities/sources/Source.java fetchNext). */
trait IngestSource {
  def fetch(checkpoint: Option[String]): Option[(DataFrame, String)]
}

/** Source-schema provider seam (reference analog:
  * utilities/schema/SchemaProvider — schemas are supplied to sources,
  * not inferred, so ingest is stable under empty/partial batches). The
  * registry variant (SchemaRegistryProvider.java:45) is an
  * external-service binding of this same trait. */
trait SchemaProvider {
  def sourceSchema: org.apache.spark.sql.types.StructType
}

/** Schema from a file containing either a Spark DDL string
  * ("id LONG, v STRING") or a StructType JSON document (reference
  * analog: utilities/schema/FilebasedSchemaProvider.java:37). */
class FileBasedSchemaProvider(spark: SparkSession, path: String) extends SchemaProvider {
  override def sourceSchema: org.apache.spark.sql.types.StructType = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    SchemaText.parse(text)
  }
}

/** Shared schema-document parsing: a registry envelope
  * `{"schema": "<payload>", ...}`, a raw StructType JSON document, or a
  * Spark DDL string — whichever the source serves. */
private[streaming] object SchemaText {
  def parse(text: String): org.apache.spark.sql.types.StructType = {
    val t = text.trim
    if (!t.startsWith("{")) return org.apache.spark.sql.types.StructType.fromDDL(t)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
    if (node.has("schema") && node.get("schema").isTextual)
      parse(node.get("schema").asText()) // registry envelope: unwrap payload
    else org.apache.spark.sql.types.DataType.fromJson(t)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  }
}

/** Schema fetched over HTTP from a registry endpoint (reference analog:
  * utilities/schema/SchemaRegistryProvider.java:45, which GETs a
  * Confluent-style `{"schema": "<escaped>"}` envelope). Spark-first
  * deviation: the payload is a Spark DDL string or StructType JSON
  * rather than an Avro schema — there is no Avro IR in this engine.
  * Re-fetches on every call so ingest picks up registry updates between
  * sync rounds, like the reference. */
class HttpSchemaProvider(url: String, timeoutMs: Long = 5000L) extends SchemaProvider {
  override def sourceSchema: org.apache.spark.sql.types.StructType = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"schema registry GET $url returned ${resp.statusCode()}: ${resp.body()}")
    SchemaText.parse(resp.body())
  }
}

/** DFS directory source for any Spark batch format (parquet / json /
  * csv / orc / avro): checkpoint = last ingested file name (file names
  * sort by arrival when producers write part-<seq> or timestamped
  * names). New files = names > checkpoint (reference analog:
  * sources/ParquetDFSSource.java:35, JsonDFSSource.java:34,
  * CsvDFSSource.java:60 + DFSPathSelector). */
class DfsDirSource(
    spark: SparkSession, dir: String,
    format: String, suffix: String,
    options: Map[String, String] = Map.empty,
    schema: Option[org.apache.spark.sql.types.StructType] = None,
    /** per-sync byte budget: files (in name order) accumulate until the
      * budget is exceeded, always taking at least one — backlog catch-up
      * proceeds in bounded batches instead of one giant read (reference
      * analog: `--source-limit`, DFSPathSelector.java:118
      * getNextFilePathsAndMaxModificationTime's sourceLimit cut) */
    maxBytesPerBatch: Long = Long.MaxValue) extends IngestSource {
  override def fetch(checkpoint: Option[String]): Option[(DataFrame, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .sortBy(_.getPath.toString)
    val fresh = checkpoint match {
      case Some(ck) => files.filter(_.getPath.toString > ck)
      case None     => files
    }
    if (fresh.isEmpty) return None
    var budget = maxBytesPerBatch
    val take = fresh.takeWhile { st =>
      val fits = budget >= st.getLen
      budget -= st.getLen
      fits
    } match {
      case Seq() => fresh.take(1) // budget below one file: still progress
      case ts    => ts
    }
    val paths = take.map(_.getPath.toString)
    val reader = spark.read.format(format).options(options)
    val withSchema = schema.fold(reader)(reader.schema)
    Some((withSchema.load(paths: _*), paths.last))
  }
}

class ParquetDirSource(spark: SparkSession, dir: String,
    maxBytesPerBatch: Long = Long.MaxValue)
  extends DfsDirSource(spark, dir, "parquet", ".parquet",
    maxBytesPerBatch = maxBytesPerBatch)

class JsonDirSource(spark: SparkSession, dir: String,
    schema: Option[org.apache.spark.sql.types.StructType] = None)
  extends DfsDirSource(spark, dir, "json", ".json", schema = schema)

class CsvDirSource(spark: SparkSession, dir: String,
    options: Map[String, String] = Map("header" -> "true", "inferSchema" -> "true"),
    schema: Option[org.apache.spark.sql.types.StructType] = None)
  extends DfsDirSource(spark, dir, "csv", ".csv", options, schema)

class OrcDirSource(spark: SparkSession, dir: String)
  extends DfsDirSource(spark, dir, "orc", ".orc")

/** One-shot SQL source: fetches the query result once, then reports
  * caught-up forever (reference analog: sources/SqlSource.java:52 —
  * used for backfills riding the same ingest harness). */
class SqlSource(spark: SparkSession, query: String) extends IngestSource {
  override def fetch(checkpoint: Option[String]): Option[(DataFrame, String)] =
    if (checkpoint.contains("done")) None
    else Some((spark.sql(query), "done"))
}

/** Sequential multi-table ingest round — each table advances its own
  * checkpoint-in-commit independently (reference analog:
  * HoodieMultiTableDeltaStreamer.java:60). */
class MultiTableIngest(ingests: Seq[ContinuousIngest]) {
  /** One sync round across every table; returns per-table commits. */
  def syncOnce(): Seq[Option[String]] = ingests.map(_.syncOnce())
}

/** Graft-table-as-source: checkpoint = commit instant; fetch = the
  * incremental change stream since it (reference analog:
  * sources/HoodieIncrSource.java:41). Chains tables into pipelines.
  *
  * `maxInstantsPerFetch` caps each round at that many commit instants —
  * the reference's `hoodie.deltastreamer.source.hoodieincr.num_instants`
  * (HoodieIncrSource.java:61): a lagging pipeline catches up in paced
  * rounds instead of one giant pull. No extra state: the checkpoint
  * already rides IN the target's commit, so pacing is just a smaller
  * `end` per round. None = drain to latest (previous behavior). */
class GraftIncrSource(spark: SparkSession, tablePath: String,
    maxInstantsPerFetch: Option[Int] = None) extends IngestSource {
  require(maxInstantsPerFetch.forall(_ >= 1),
    s"maxInstantsPerFetch must be >= 1: $maxInstantsPerFetch")
  override def fetch(checkpoint: Option[String]): Option[(DataFrame, String)] = {
    val src = GraftTable.load(spark, tablePath)
    val data = src.timeline.completed()
      .filter(i => Action.dataActions.contains(i.action))
      .map(_.time)
    val from = checkpoint.getOrElse("")
    val pending = data.filter(_ > from)
    if (pending.isEmpty) None // caught up
    else {
      val end = maxInstantsPerFetch match {
        case Some(n) => pending.take(n).last
        case None    => pending.last
      }
      Some((GraftReader(src).incremental(from, Some(end)), end))
    }
  }
}

/** Micro-batch continuous-ingest harness (reference analog:
  * DeltaStreamer — HoodieDeltaStreamer.java:88 / DeltaSync.java:276):
  * loop { read checkpoint from last commit metadata → fetch from
  * source → optional transform → upsert with the new checkpoint stored
  * IN the commit }. Crash-safe: data and checkpoint commit atomically
  * together, so restart resumes exactly where the table state is. */
/** Background compaction executor for the continuous-ingest loop: the
  * ingest thread SCHEDULES plans inline (cheap, driver-only) and this
  * worker EXECUTES them off the ingest path, so folding never blocks a
  * sync round (reference analog: async/AsyncCompactService.java:41 —
  * DeltaStreamer continuous mode enqueues pending compaction instants
  * to a background executor). `shutdown()` drains queued plans before
  * returning, so a bounded run ends with every scheduled fold applied. */
class AsyncCompactor(table: GraftTable) {
  private val svc = graft.services.TableServices(table)
  private val queue = new java.util.concurrent.LinkedBlockingQueue[String]()
  private val queued =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile private var stopped = false
  @volatile private var failure: Option[Throwable] = None
  private val worker = new Thread(() => {
    while (!stopped || !queue.isEmpty) {
      val t = queue.poll(25, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (t != null)
        try { svc.runScheduledCompaction(t); queued.remove(t) }
        catch {
          // IllegalStateException = the documented benign contention
          // states ("still pending" / "kept losing to earlier writers"):
          // the plan stays parked and maybeSchedule re-offers it at a
          // later sync. Anything else is a real failure to surface.
          case _: IllegalStateException => queued.remove(t)
          case e: Throwable => queued.remove(t); failure = Some(e)
        }
    }
  }, "graft-async-compactor")
  worker.setDaemon(true)
  worker.start()

  /** Schedule a plan when `every` delta commits have stacked since the
    * last compaction — completed, queued, or still pending — and hand it
    * to the worker. Parked plans (scheduled earlier but skipped on
    * benign contention, or left by a previous run) are re-offered first.
    * Never throws: a plan raced by concurrent writers is simply retried
    * at a later sync. */
  def maybeSchedule(every: Int): Unit = {
    svc.pendingCompactions().foreach(t => if (queued.add(t)) queue.put(t))
    val tl = table.timeline
    val mark = (tl.completed().filter(_.action == Action.Compaction).map(_.time) ++
      svc.pendingCompactions()).maxOption.getOrElse("")
    val deltas = tl.completed()
      .count(i => i.action == Action.DeltaCommit && i.time > mark)
    if (deltas >= every)
      try svc.scheduleCompaction().foreach(t => if (queued.add(t)) queue.put(t))
      catch { case _: IllegalStateException => () }
  }

  /** Stop accepting work, drain the queue, surface any executor error. */
  def shutdown(): Unit = {
    stopped = true
    worker.join()
    failure.foreach(throw _)
  }
}

class ContinuousIngest(
    table: GraftTable,
    source: IngestSource,
    transform: DataFrame => DataFrame = identity,
    operation: String = "upsert",
    /** drop incoming records whose key ALREADY exists in the table
      * before writing — the insert-dedupe mode for append-style
      * pipelines (reference analog: DeltaStreamer `--filter-dupes`,
      * HoodieDeltaStreamer.java:413 + DeltaSync.java:441
      * filterDupeRecords). Rejected for `upsert`, as in the reference
      * (updates would be silently dropped). */
    filterDupes: Boolean = false,
    /** >0 on a MOR table: [[runContinuous]] schedules a compaction once
      * this many delta commits stack and executes it on an
      * [[AsyncCompactor]] background thread — ingestion never waits for
      * the fold (reference analog: HoodieDeltaStreamer.java:178
      * continuous loop + AsyncCompactService). */
    asyncCompactDeltaCommits: Int = 0) {

  require(!(filterDupes && operation == "upsert"),
    "filter-dupes with upsert would drop updates (reference: " +
      "DeltaSync rejects this combination)")

  val CheckpointKey = "ingest.checkpoint"

  /** Checkpoint recovery from the newest data instant that carries one
    * (reference analog: DeltaSync.java:325-380). */
  def checkpoint: Option[String] = {
    val tl = table.timeline
    tl.completed()
      .filter(i => Action.dataActions.contains(i.action))
      .reverseIterator
      .map(tl.metadataOf(_).extra)
      .collectFirst { case e if e.contains(CheckpointKey) => e(CheckpointKey) }
  }

  /** One sync round; returns the commit time if data was written. */
  def syncOnce(): Option[String] = {
    source.fetch(checkpoint).map { case (df, newCk) =>
      val extra = Map(CheckpointKey -> newCk)
      try {
        val batch0 = transform(df)
        val batch =
          if (filterDupes) graft.read.GraftReader(table).filterExists(batch0)
          else batch0
        operation match {
          case "insert"      => table.insert(batch, extra)
          case "bulk_insert" => table.bulkInsert(batch, extra = extra)
          case _             => table.upsert(batch, extra)
        }
      } finally df.unpersist() // sources may cache the batch (e.g. JDBC)
    }
  }

  /** Bounded continuous mode: sync until caught-up `maxRounds` times
    * (a test/driver harness; a production deployment would wrap
    * [[syncOnce]] in its own scheduler, as the reference's
    * `--continuous` loop does). */
  def runContinuous(maxRounds: Int, sleepMs: Long = 0L): Seq[String] = {
    val compactor =
      if (asyncCompactDeltaCommits > 0) Some(new AsyncCompactor(table)) else None
    try {
      var done = 0
      val commits = Seq.newBuilder[String]
      while (done < maxRounds) {
        syncOnce() match {
          case Some(c) =>
            commits += c
            compactor.foreach(_.maybeSchedule(asyncCompactDeltaCommits))
          case None    => done += 1; if (sleepMs > 0) Thread.sleep(sleepMs)
        }
        if (done == 0 && sleepMs > 0) Thread.sleep(sleepMs)
      }
      commits.result()
    } finally compactor.foreach(_.shutdown())
  }
}
