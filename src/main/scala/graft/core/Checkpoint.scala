package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** A serialized snapshot at an instant: the folded file-group state of
  * every completed data instant ≤ `asOf`, plus the table schema at that
  * point. Lives under `.graft/checkpoint/`.
  *
  * Two jobs (reference analogs):
  *  - O(1) snapshot load: resolution replays only instants AFTER the
  *    newest checkpoint instead of the whole timeline — the role the
  *    reference's metadata table plays (HoodieTableMetadata.java:92),
  *    done Delta-checkpoint-style since our commit metadata already
  *    carries complete file lists.
  *  - archiving enabler: instants folded into a checkpoint can leave
  *    the active timeline (HoodieTimelineArchiveLog.java:74) without
  *    losing snapshot reconstructability.
  */
case class SnapshotCheckpoint(
    asOf: String,
    schemaJson: String,
    slices: Seq[FileSlice])

/** Small sidecar describing a columnar checkpoint (the part that must
  * stay cheap to read no matter the table's file count). */
case class CheckpointManifest(
    asOf: String,
    schemaJson: String,
    sliceCount: Long,
    format: String = Checkpoint.FormatV2)

/** Checkpoint storage. v2 (current) keeps the file-slice list in a
  * PARQUET file beside a tiny JSON manifest — the Delta-checkpoint
  * shape — because the v1 single-JSON-blob form is a driver scaling
  * wall: at 1M file groups the blob measures 272 MB (one giant driver
  * string + that many bytes moved per cold load from an object store)
  * vs 24.6 MB of snappy parquet, ~11× smaller (SnapshotScaleSpec
  * timings: v2 cold read ≈ 2.3 s at 1M groups, ~linear from 100k). v1
  * checkpoints remain readable; new writes are always v2.
  *
  * Reads are served through a small modtime-keyed cache, so a WARM
  * snapshot resolution costs O(Δ instants since the checkpoint), not
  * O(files) — the 100 TB driver posture: the per-commit work on a
  * 1M-group table is the tail replay, never a re-parse of the world. */
object Checkpoint {
  val Dir = "checkpoint"
  val FormatV2 = "parquet-v2"

  private def dir(timeline: Timeline): Path = new Path(timeline.metaDir, Dir)
  private def manifestPath(timeline: Timeline, t: String): Path =
    new Path(dir(timeline), s"$t.manifest.json")
  private def dataPath(timeline: Timeline, t: String): Path =
    new Path(dir(timeline), s"$t.cp.parquet")
  private def legacyPath(timeline: Timeline, t: String): Path =
    new Path(dir(timeline), s"$t.json")

  def times(timeline: Timeline): Seq[String] = {
    val fs = timeline.fileSystem
    val d = dir(timeline)
    if (!fs.exists(d)) Nil
    else {
      val names = fs.listStatus(d).toSeq.map(_.getPath.getName)
      val v2 = names.filter(_.endsWith(".manifest.json"))
        .map(_.stripSuffix(".manifest.json"))
      val v1 = names.filter(n => n.endsWith(".json") && !n.endsWith(".manifest.json"))
        .map(_.stripSuffix(".json"))
      (v2 ++ v1).distinct.sorted
    }
  }

  /** One slice file-entry per parquet row; `kind` 0 = base, 1 = delta,
    * `seq` the delta stack order. Column stats ride as a small JSON
    * leaf per row (they are per-file-sized, not per-table-sized). */
  private val SliceSchema: MessageType = MessageTypeParser.parseMessageType(
    """message slice_entry {
      |  required binary partition (UTF8);
      |  required binary fileId (UTF8);
      |  required int32 kind;
      |  required int32 seq;
      |  required binary path (UTF8);
      |  required boolean isDelta;
      |  required int64 rows;
      |  required int64 bytes;
      |  required binary minKey (UTF8);
      |  required binary maxKey (UTF8);
      |  required boolean external;
      |  required binary colStatsJson (UTF8);
      |}""".stripMargin)

  /** How old an orphan temp must be before [[stage]] reaps it. Staging
    * legitimately happens OUTSIDE the timeline lock (the fold +
    * serialization half must not starve concurrent writers' lock
    * acquires), so a temp found on disk may belong to a LIVE twin — and
    * even a lock-held reap could not assume otherwise when the
    * `inprocess` provider is misconfigured across JVMs. The floor keeps
    * the worst cross-writer outcome "garbage leaks until it ages out"
    * instead of "a live twin's in-flight temp is deleted". */
  private[graft] val ReapTempAfterMs: Long = 30L * 60 * 1000

  def write(timeline: Timeline, cp: SnapshotCheckpoint, trim: Boolean = true): Unit = {
    val (tmp, n) = stage(timeline, cp)
    promote(timeline, cp, tmp, n, trim)
  }

  /** Serialize the checkpoint's slice list to an attempt-unique TEMP
    * file — the expensive O(#slices) half, safe WITHOUT the timeline
    * lock (the temp is invisible to readers; [[promote]] publishes it).
    * Returns (temp path, file-entry count for the manifest). */
  def stage(timeline: Timeline, cp: SnapshotCheckpoint): (Path, Long) = {
    val fs = timeline.fileSystem
    val d = dir(timeline)
    fs.mkdirs(d)
    // reap orphan temps a CRASHED archiver left behind (invisible to
    // readers, but they'd accumulate forever) — only once STALE, see
    // ReapTempAfterMs: a younger temp may be a live twin's in-flight
    // stage (staging runs outside the timeline lock by design).
    val now = System.currentTimeMillis()
    fs.listStatus(d).foreach { st =>
      if (st.getPath.getName.contains(".cp.parquet.tmp-") &&
          now - st.getModificationTime > ReapTempAfterMs)
        fs.delete(st.getPath, false)
    }
    val tmp = new Path(d, s"${cp.asOf}.cp.parquet.tmp-${java.util.UUID.randomUUID()}")
    val writer = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(tmp, fs.getConf))
      .withType(SliceSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val fac = new SimpleGroupFactory(SliceSchema)
    var n = 0L
    try {
      cp.slices.foreach { s =>
        s.baseFile.foreach { st => writer.write(entry(fac, s, st, 0, 0)); n += 1 }
        s.deltas.zipWithIndex.foreach { case (st, i) =>
          writer.write(entry(fac, s, st, 1, i)); n += 1
        }
        // a slice with no files at all still has to round-trip (a group
        // can exist pre-base in MOR bootstrap edges): kind 2 marker row
        if (s.baseFile.isEmpty && s.deltas.isEmpty) {
          writer.write(entry(fac, s,
            WriteStat(s.partition, s.fileId, ""), 2, 0)); n += 1
        }
      }
    } finally writer.close()
    (tmp, n)
  }

  /** Publish a staged temp: rename to the final data name, then the
    * atomic manifest (readers key off the manifest, so a crashed
    * half-promote is invisible), then retention. Cheap — one rename +
    * one small put, no fold and no serialization — so service-path
    * callers hold the TIMELINE LOCK across THIS call only and a
    * large-table checkpoint never starves concurrent writers' 30 s lock
    * acquires (TableServices.checkpoint/archive stage OUTSIDE the lock
    * and re-validate the stamped instant under it).
    *
    * `trim=false` skips retention: rollback's covering re-mint writes a
    * checkpoint OLDER than generations it is about to drop — ranking by
    * stamp would evict the re-mint itself and keep the doomed ones. */
  def promote(timeline: Timeline, cp: SnapshotCheckpoint, tmp: Path,
      n: Long, trim: Boolean = true): Unit = {
    val fs = timeline.fileSystem
    val dest = dataPath(timeline, cp.asOf)
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      // a twin that checkpointed the SAME asOf first is success, not
      // failure: checkpoint content is a deterministic function of the
      // timeline at asOf, so dest-already-present means our work is done
      if (!fs.exists(dest))
        throw new java.io.IOException(s"cannot promote checkpoint data $dest")
    }
    timeline.commitStore.putAtomic(fs, manifestPath(timeline, cp.asOf),
      Json.write(CheckpointManifest(cp.asOf, cp.schemaJson, n)))
    // bounded retention: drop all but the newest generations. The oldest
    // retained generation is the time-travel FAST-PATH floor once
    // anything is archived — deeper as-ofs replay the archived gap from
    // the archive's metadata (TableConfig.checkpointKeep trade-off).
    if (trim)
      times(timeline).dropRight(timeline.config.effectiveCheckpointKeep)
        .foreach(delete(timeline, _))
  }

  private def entry(fac: SimpleGroupFactory, s: FileSlice, st: WriteStat,
      kind: Int, seq: Int): Group = {
    val g = fac.newGroup()
    g.append("partition", s.partition)
    g.append("fileId", s.fileId)
    g.append("kind", kind)
    g.append("seq", seq)
    g.append("path", st.path)
    g.append("isDelta", st.isDelta)
    g.append("rows", st.rows)
    g.append("bytes", st.bytes)
    g.append("minKey", st.minKey)
    g.append("maxKey", st.maxKey)
    g.append("external", st.external)
    g.append("colStatsJson",
      if (st.columnStats.isEmpty) "" else Json.write(st.columnStats))
    g
  }

  /** Remove every file shape a checkpoint at `time` may have (v2 data +
    * manifest, v1 blob). The one deletion path — rollback/restore and
    * downgrade go through here. */
  def delete(timeline: Timeline, time: String): Unit = {
    val fs = timeline.fileSystem
    fs.delete(manifestPath(timeline, time), false)
    fs.delete(dataPath(timeline, time), false)
    fs.delete(legacyPath(timeline, time), false)
  }

  def read(timeline: Timeline, time: String): SnapshotCheckpoint = {
    val fs = timeline.fileSystem
    val mp = manifestPath(timeline, time)
    if (fs.exists(mp)) readV2(timeline, time, mp)
    else readLegacy(timeline, time)
  }

  private def readV2(timeline: Timeline, time: String, mp: Path): SnapshotCheckpoint = {
    val fs = timeline.fileSystem
    val manifest = Json.read(readFully(timeline, mp), classOf[CheckpointManifest])
    val reader = ParquetReader.builder(new GroupReadSupport(),
        dataPath(timeline, time))
      .withConf(fs.getConf).build()
    // fold rows back into slices; rows are written grouped per slice,
    // but re-group defensively (parquet guarantees order within the
    // file as written)
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (Option[WriteStat], scala.collection.mutable.ArrayBuffer[(Int, WriteStat)])]
    try {
      var g = reader.read()
      while (g != null) {
        val part = g.getString("partition", 0)
        val fid = g.getString("fileId", 0)
        val kind = g.getInteger("kind", 0)
        val slot = groups.getOrElseUpdate((part, fid),
          (None, scala.collection.mutable.ArrayBuffer.empty))
        kind match {
          case 0 => groups((part, fid)) = (Some(stat(g, part, fid)), slot._2)
          case 1 => slot._2 += ((g.getInteger("seq", 0), stat(g, part, fid)))
          case _ => () // kind 2: empty-slice marker, presence is enough
        }
        g = reader.read()
      }
    } finally reader.close()
    val slices = groups.iterator.map { case ((part, fid), (base, deltas)) =>
      FileSlice(part, fid, base, deltas.sortBy(_._1).map(_._2).toSeq)
    }.toSeq
    SnapshotCheckpoint(manifest.asOf, manifest.schemaJson, slices)
  }

  private def stat(g: Group, part: String, fid: String): WriteStat = {
    val csj = g.getString("colStatsJson", 0)
    WriteStat(
      partition = part,
      fileId = fid,
      path = g.getString("path", 0),
      isDelta = g.getBoolean("isDelta", 0),
      rows = g.getLong("rows", 0),
      bytes = g.getLong("bytes", 0),
      minKey = g.getString("minKey", 0),
      maxKey = g.getString("maxKey", 0),
      columnStats =
        if (csj.isEmpty) Map.empty
        else Json.read(csj,
          new com.fasterxml.jackson.core.`type`.TypeReference[Map[String, ColStat]] {}),
      external = g.getBoolean("external", 0))
  }

  /** (storage format, file-entry count) of the checkpoint at `time` —
    * the admin-surface view (SHOW CHECKPOINTS) that must stay cheap no
    * matter the slice count: v2 answers from the manifest alone. */
  def describe(timeline: Timeline, time: String): (String, Long) = {
    val mp = manifestPath(timeline, time)
    if (timeline.fileSystem.exists(mp)) {
      val m = Json.read(readFully(timeline, mp), classOf[CheckpointManifest])
      (m.format, m.sliceCount)
    } else ("json-v1",
      readLegacy(timeline, time).slices.map(_.allFiles.size.max(1)).sum.toLong)
  }

  private def readLegacy(timeline: Timeline, time: String): SnapshotCheckpoint =
    Json.read(readFully(timeline, legacyPath(timeline, time)),
      classOf[SnapshotCheckpoint])

  private def readFully(timeline: Timeline, p: Path): String = {
    val in = timeline.fileSystem.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8) finally in.close()
  }

  // ---------------------------------------------------------------------
  // resolve cache: a parsed checkpoint is immutable for a given file
  // identity, so repeated snapshot resolutions replay only the Δ tail
  // ---------------------------------------------------------------------

  /** (basePath, time, file length, file modtime) — the file identity in
    * the key makes a delete-and-recreate (rollback then re-archive, even
    * by another process) a cache MISS instead of a poison. */
  private type CacheKey = (String, String, Long, Long)
  private val CacheMax = 4
  private val cache =
    new java.util.LinkedHashMap[CacheKey, SnapshotCheckpoint](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[CacheKey, SnapshotCheckpoint]): Boolean =
        size() > CacheMax
    }

  /** Newest checkpoint usable for a read at `asOf` (None = latest),
    * served from the cache when the on-disk identity matches. */
  def latestAtOrBefore(timeline: Timeline, asOf: Option[String]): Option[SnapshotCheckpoint] = {
    val usable = asOf match {
      case Some(t) => times(timeline).filter(_ <= t)
      case None    => times(timeline)
    }
    usable.lastOption.map { t =>
      val fs = timeline.fileSystem
      val idFile = {
        val v2 = dataPath(timeline, t)
        if (fs.exists(v2)) v2 else legacyPath(timeline, t)
      }
      val st = fs.getFileStatus(idFile)
      val key = (timeline.basePath, t, st.getLen, st.getModificationTime)
      cache.synchronized(Option(cache.get(key))).getOrElse {
        val cp = read(timeline, t)
        cache.synchronized(cache.put(key, cp))
        cp
      }
    }
  }
}
