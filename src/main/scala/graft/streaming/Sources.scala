package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}

/** A half-open offset range `[from, until)` of one partition of a
  * partitioned log (reference analog: the Kafka OffsetRange consumed by
  * utilities/sources/helpers/KafkaOffsetGen.java:102). */
case class LogOffsetRange(partition: Int, from: Long, until: Long) {
  def count: Long = until - from
}

/** Client seam for a Kafka-shaped partitioned log. The sandbox has no
  * broker, so the engine-side logic (checkpoint codec, fair-share range
  * allocation, caught-up detection) lives here against this trait and a
  * production binding would implement it with a real consumer — the
  * same seam the reference splits at (KafkaOffsetGen holds the consumer;
  * AvroKafkaSource.java:48 / JsonKafkaSource.java:41 hold the dataflow). */
trait PartitionedLogClient {
  /** Next offset to be written per partition (exclusive end of data). */
  def latestOffsets(): Map[Int, Long]
  /** Oldest retained offset per partition. */
  def earliestOffsets(): Map[Int, Long]
  /** Read the given ranges as one DataFrame. Zero-count ranges contribute
    * no rows but must still yield a correctly-schemed (empty) frame — the
    * LATEST reset path materializes one to pin its starting position. */
  def read(ranges: Seq[LogOffsetRange]): DataFrame
}

object LogOffsets {

  /** Checkpoint string `topic,0:off0,1:off1,...` — offsets are the
    * exclusive end of what was ingested (reference analog:
    * KafkaOffsetGen.CheckpointUtils.offsetsToStr, KafkaOffsetGen.java:88). */
  def encode(topic: String, upto: Map[Int, Long]): String =
    (topic +: upto.toSeq.sortBy(_._1).map { case (p, o) => s"$p:$o" }).mkString(",")

  /** Inverse of [[encode]]; returns (topic, partition → offset). */
  def decode(checkpoint: String): (String, Map[Int, Long]) = {
    val parts = checkpoint.split(",").toSeq
    val offsets = parts.tail.map { kv =>
      val Array(p, o) = kv.split(":"): @unchecked
      p.toInt -> o.toLong
    }.toMap
    (parts.head, offsets)
  }

  /** Allocate up to `maxEvents` across partitions fairly: repeatedly deal
    * an equal share of the remaining budget to every partition that still
    * has unread data, so one hot partition cannot starve the others but
    * spare budget flows to whoever has lag (reference analog:
    * KafkaOffsetGen.CheckpointUtils.computeOffsetRanges,
    * KafkaOffsetGen.java:102-146). Partitions absent from `committed`
    * (newly added) start at their earliest retained offset. */
  def allocate(
      committed: Map[Int, Long],
      earliest: Map[Int, Long],
      latest: Map[Int, Long],
      maxEvents: Long): Seq[LogOffsetRange] = {
    val starts = latest.keys.map { p =>
      p -> committed.getOrElse(p, earliest.getOrElse(p, 0L))
    }.toMap
    var until = starts
    var budget = math.max(0L, maxEvents)
    var remaining = latest.filter { case (p, end) => until(p) < end }
    while (budget > 0 && remaining.nonEmpty) {
      val share = math.max(1L, budget / remaining.size)
      remaining.toSeq.sortBy(_._1).foreach { case (p, end) =>
        if (budget > 0) {
          val take = math.min(share, math.min(budget, end - until(p)))
          until = until.updated(p, until(p) + take)
          budget -= take
        }
      }
      remaining = latest.filter { case (p, end) => until(p) < end }
    }
    starts.toSeq.sortBy(_._1).map { case (p, from) =>
      LogOffsetRange(p, from, until(p))
    }
  }
}

/** Kafka-shaped ingest source: checkpoint = `topic,p:offset,...` stored
  * in commit metadata; each fetch reads at most `maxEvents` new records,
  * fair-shared across partitions (reference analog:
  * sources/AvroKafkaSource.java:48 + KafkaOffsetGen; maxEvents default
  * mirrors hoodie.deltastreamer.kafka.source.maxEvents = 5,000,000). */
class PartitionedLogSource(
    client: PartitionedLogClient,
    topic: String,
    maxEvents: Long = 5000000L,
    startFromEarliest: Boolean = true) extends IngestSource {

  override def fetch(checkpoint: Option[String]): Option[(DataFrame, String)] = {
    val committed: Map[Int, Long] = checkpoint match {
      case Some(ck) =>
        val (t, offs) = LogOffsets.decode(ck)
        require(t == topic, s"checkpoint is for topic $t, source reads $topic")
        offs
      case None if startFromEarliest => Map.empty // allocate() falls back to earliest
      case None                      => client.latestOffsets() // LATEST reset strategy
    }
    val ranges = LogOffsets.allocate(
      committed, client.earliestOffsets(), client.latestOffsets(), maxEvents)
    val upto = ranges.map(r => r.partition -> r.until).toMap
    if (ranges.forall(_.count == 0L)) {
      // First fetch under LATEST with nothing new yet: pin the position by
      // returning an EMPTY batch carrying the encoded offsets (committed
      // with it by the ingest harness). Returning None here would re-reset
      // to the then-current latest on every poll, permanently skipping
      // whatever arrives between polls.
      if (checkpoint.isEmpty && !startFromEarliest)
        Some((client.read(ranges), LogOffsets.encode(topic, upto)))
      else None
    } else {
      Some((client.read(ranges.filter(_.count > 0)), LogOffsets.encode(topic, upto)))
    }
  }
}

/** What one incremental fetch asks of the RDBMS: an optional pushed
  * predicate and an optional (orderColumn, limit) cap — production
  * loaders render BOTH into the pushed-down subquery so a large backlog
  * is bounded at the database, not after a full fetch into Spark. */
case class JdbcQuery(
    predicate: Option[String] = None,
    orderLimit: Option[(String, Long)] = None)

/** Incremental JDBC ingest: checkpoint = max value of a monotonically
  * increasing column; each fetch selects `incrCol > checkpoint` (strict,
  * exclusive of the last checkpoint), optionally capped by `limit`
  * smallest values so a backlog drains in bounded batches. First fetch
  * (no checkpoint) is a full scan. The actual RDBMS read is injected as
  * `load(query)` — the production binding builds
  * `spark.read.format("jdbc")` with a pushed-down subquery (see
  * [[JdbcIncrementalSource.jdbcLoader]]); tests bind a local frame
  * (reference analog: sources/JdbcSource.java:57-343 — incrementalFetch
  * pushes `WHERE incrCol > ckpt [ORDER BY incrCol LIMIT n]`, checkpoint()
  * records max(incrCol), full-scan fallback on incremental failure).
  *
  * The returned batch is PERSISTED: the checkpoint aggregate and the
  * caller's write both read the cache, so the source query executes
  * exactly once per sync — rows committed upstream mid-sync can never
  * land above the recorded checkpoint (which would re-ingest them next
  * sync and duplicate under `insert`). [[ContinuousIngest.syncOnce]]
  * unpersists after the write. */
class JdbcIncrementalSource(
    load: JdbcQuery => DataFrame,
    incrementalColumn: String,
    limit: Long = 0L,
    fallbackToFullScan: Boolean = true) extends IngestSource {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[JdbcIncrementalSource])

  private def orderLimit: Option[(String, Long)] =
    if (limit > 0) Some((incrementalColumn, limit)) else None

  /** Whether the incremental column is numeric at the source — probed once
    * via a no-row query (`WHERE 1=0` pushes down; only schema comes back),
    * so numeric checkpoints compare as numbers instead of relying on the
    * database to coerce a quoted literal. */
  private lazy val numericIncrCol: Boolean =
    scala.util.Try {
      load(JdbcQuery(Some("1=0"))).schema
        .find(_.name.equalsIgnoreCase(incrementalColumn))
        .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    }.getOrElse(false)

  private def predicate(ck: String): String = {
    // escape embedded quotes (SQL-standard doubling) so a string checkpoint
    // can never break out of — or break — the pushed literal
    val literal = if (numericIncrCol) ck else "'" + ck.replace("'", "''") + "'"
    s"$incrementalColumn > $literal"
  }

  override def fetch(checkpoint: Option[String]): Option[(DataFrame, String)] = {
    val raw = checkpoint.filter(_.nonEmpty) match {
      case Some(ck) =>
        try load(JdbcQuery(Some(predicate(ck)), orderLimit))
        catch {
          // mirror the reference's guarded fallback: a broken incremental
          // query (e.g. column dropped upstream) degrades to a full scan
          // rather than wedging ingest
          case e: Exception if fallbackToFullScan =>
            log.warn(s"incremental fetch ($incrementalColumn > ...) failed; " +
              s"falling back to full scan: ${e.getMessage}")
            load(JdbcQuery())
        }
      case None => load(JdbcQuery(None, orderLimit))
    }
    // defensive Spark-side cap for loaders that cannot push ORDER BY/LIMIT
    // (a no-op over a batch the database already bounded to `limit` rows)
    val batch =
      if (limit > 0) raw.orderBy(col(incrementalColumn)).limit(limit.toInt) else raw
    val cached = batch.persist()
    // one driver-side scalar: the new checkpoint; empty batch = caught up
    val newCk = cached.agg(max(col(incrementalColumn)).cast("string")).head.getString(0)
    if (newCk == null) { cached.unpersist(); None }
    else Some((cached, newCk))
  }
}

object JdbcIncrementalSource {
  /** The pushed-down subquery for one fetch: predicate AND order/limit
    * render inside it, so the database does the filtering and bounding. */
  private[graft] def dbtable(table: String, q: JdbcQuery): String = {
    val where = q.predicate.fold("")(p => s" WHERE $p")
    val cap = q.orderLimit.fold("") { case (c, n) => s" ORDER BY $c LIMIT $n" }
    if (where.isEmpty && cap.isEmpty) table
    else s"(SELECT * FROM $table$where$cap) graft_incr_src"
  }

  /** Production loader: pushes the incremental predicate and the batch
    * cap into the RDBMS as a subquery, so the database — not Spark —
    * filters by the incremental column and bounds the backlog. */
  def jdbcLoader(
      spark: SparkSession,
      url: String,
      table: String,
      options: Map[String, String]): JdbcQuery => DataFrame = { q =>
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable(table, q))
      .options(options)
      .load()
  }
}

/** Object-storage event-notification ingest (reference analog:
  * sources/S3EventsSource.java:44 + S3EventsHoodieIncrSource.java:62 —
  * there, S3 bucket notifications land in SQS / a hudi "events" table
  * and each record names a newly-written object; the data source reads
  * exactly those objects instead of LISTing the bucket, which at
  * millions of objects is the difference between O(new) and O(all)).
  *
  * Spark-first, service-neutral decomposition: the event feed is a DFS
  * directory of JSON event files (the SQS/event-table stand-in — each
  * line carries at least `{"key": "<data file path>"}`), consumed
  * through the same checkpoint contract as every other source; each
  * fetch parses the NEW event files and bulk-reads the named data
  * objects. Checkpoint = last consumed event FILE, so replays are
  * exactly-once at event-file granularity, like the reference's SQS
  * delete-after-commit.
  */
class ObjectEventsSource(
    spark: SparkSession,
    /** directory receiving event-notification JSON files */
    eventsDir: String,
    /** format of the named data objects (parquet/json/csv/orc) */
    dataFormat: String = "parquet",
    /** resolve a raw event `key` to a readable path (e.g. prefix a
      * bucket mount); identity by default */
    resolveKey: String => String = identity,
    schema: Option[org.apache.spark.sql.types.StructType] = None,
    /** per-sync cap on EVENT files consumed (backlog catch-up in
      * bounded rounds, like `--source-limit`) */
    maxEventFilesPerBatch: Int = Int.MaxValue) extends IngestSource {

  override def fetch(checkpoint: Option[String]): Option[(DataFrame, String)] = {
    val p = new org.apache.hadoop.fs.Path(eventsDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    // ONE listing per fetch; keyless batches are skipped by walking
    // forward in the same listing (a recursive skip would re-list and
    // re-parse per skipped batch — O(tail²) on a delete-heavy feed)
    val all = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .map(_.getPath.toString).sorted
      .dropWhile(n => checkpoint.exists(n <= _))
    import spark.implicits._
    val step = math.max(1, maxEventFilesPerBatch)
    var idx = 0
    while (idx < all.size) {
      val fresh = all.slice(idx, idx + step)
      idx += fresh.size
      // event files are tiny JSON (one record per new object) — parse
      // with a DECLARED event schema (`key` + the corrupt-record
      // column), so a batch without keys (empty files, delete-only
      // notification shapes) is keyless-but-valid, while a MALFORMED
      // record (a producer still writing its file, or plain garbage)
      // is detected and FAILS the sync. Classifying garbage as keyless
      // would advance the checkpoint past the batch and silently lose
      // the named objects forever; failing leaves the checkpoint put,
      // and the next sync retries the same batch.
      val evs = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, _corrupt_record STRING"))
        .json(fresh: _*)
        .cache()
      val keys = try {
        val bad = evs.filter(col("_corrupt_record").isNotNull).count()
        if (bad > 0) throw new IllegalStateException(
          s"$bad malformed event record(s) in [${fresh.head} .. ${fresh.last}]" +
            " — refusing to advance the events checkpoint past them")
        evs.select(col("key")).as[String]
          .collect().toSeq.filter(_ != null).distinct.map(resolveKey)
      } finally evs.unpersist()
      if (keys.nonEmpty) {
        val reader = spark.read.format(dataFormat)
        val withSchema = schema.fold(reader)(reader.schema)
        return Some((withSchema.load(keys: _*), fresh.last))
      }
    }
    // the whole fresh window is keyless. With a declared schema the
    // checkpoint still advances via an empty batch (the ingest loop
    // commits it as a checkpoint-only instant), so a delete-only tail is
    // parsed once, not on every subsequent sync; without a schema there
    // is nothing to type an empty frame with — leave the checkpoint put
    // and re-parse the (bounded-by-tail-length) keyless files next round
    if (all.nonEmpty && schema.isDefined)
      Some((spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema.get), all.last))
    else None
  }
}
