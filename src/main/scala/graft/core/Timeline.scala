package graft.core

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The MVCC timeline: ordered instants persisted as files under
  * `<base>/.graft/`, states advancing requested -> inflight -> completed.
  * A completed instant is published by an atomic rename, which is the
  * table's only commit point (reference analog:
  * table/timeline/HoodieActiveTimeline.java:60-167,525).
  *
  * Completed file:  <time>.<action>           (content = CommitMetadata JSON)
  * Pending files:   <time>.<action>.inflight / .requested
  */
/** Post-commit notification seam (reference analog:
  * callback/HoodieWriteCommitCallback.java:29). */
trait CommitCallback {
  def onCommit(instant: Instant, meta: CommitMetadata): Unit
}

class Timeline(val basePath: String, conf: Configuration) {
  val metaDir = new Path(basePath, Timeline.MetaDir)
  private val fs: FileSystem = metaDir.getFileSystem(conf)

  def exists: Boolean = fs.exists(new Path(metaDir, Timeline.ConfigFile))

  /** Storage-atomicity profile, from table config (`commitStore`).
    * Resolved lazily and cached once the table exists — during
    * `initTable` bootstrap (table.json not yet written) the default
    * rename profile applies, which is safe for any profile: the very
    * first write has nothing to conflict with. */
  @volatile private var storeCache: CommitStore = null
  private[graft] def commitStore: CommitStore = {
    val c = storeCache
    if (c != null) c
    else if (!exists) RenameCommitStore
    else {
      val s = CommitStore.forName(config.commitStore)
      storeCache = s
      s
    }
  }

  def initTable(config: TableConfig): Unit = {
    fs.mkdirs(metaDir)
    writeAtomic(new Path(metaDir, Timeline.ConfigFile), Json.write(config))
  }

  def config: TableConfig = {
    val p = new Path(metaDir, Timeline.ConfigFile)
    Json.read(readFully(p), classOf[TableConfig])
  }

  /** Replace table.json (rename-table / config evolution). Temp write +
    * rename-with-OVERWRITE: table.json exists at every point in time, so
    * concurrent readers (GraftTable.load / config) never observe a
    * missing file — the timeline lock only guards writers under OCC,
    * not readers. */
  def updateConfig(newConfig: TableConfig): Unit = {
    commitStore.putAtomic(fs, new Path(metaDir, Timeline.ConfigFile),
      Json.write(newConfig))
    storeCache = null // the profile itself may have been changed
  }

  /** All instants, time-ordered. Listing .graft is O(#active-instants),
    * independent of data size. */
  def instants(): Seq[Instant] = {
    if (!fs.exists(metaDir)) return Nil
    fs.listStatus(metaDir).toSeq
      .map(_.getPath.getName)
      .filterNot(n => n == Timeline.ConfigFile || n.startsWith(".") || n.startsWith("_"))
      .flatMap(parseFileName)
      .sortBy(i => (i.time, i.action))
  }

  def completed(): Seq[Instant] = instants().filter(_.isCompleted)

  private def parseFileName(n: String): Option[Instant] = n.split('.') match {
    case Array(t, a)    => Some(Instant(t, a, State.Completed))
    case Array(t, a, s) => Some(Instant(t, a, s))
    case _              => None
  }

  /** Generate a new strictly-increasing instant time (reference analog:
    * HoodieInstantTimeGenerator.java:38). */
  def newInstantTime(): String = Timeline.synchronized {
    var t = Timeline.fmt.format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
    if (t <= Timeline.lastIssued) {
      t = (BigInt(Timeline.lastIssued) + 1).toString
    }
    Timeline.lastIssued = t
    t
  }

  /** Open a new inflight instant. The inflight marker is created
    * EXCLUSIVELY: `newInstantTime()` is only serialized per-JVM, so two
    * writer processes can mint the same millisecond — the loser here
    * remints instead of sharing a file name. */
  def start(action: String): String =
    mintExclusive(t => s"$t.$action.${State.Inflight}", "{}")

  /** Open a new REQUESTED instant carrying a payload (e.g. a compaction
    * plan for a later, possibly concurrent, executor — reference analog:
    * the requested-state plan files written by
    * ScheduleCompactionActionExecutor.java:50). */
  def startRequested(action: String, meta: CommitMetadata): String =
    mintExclusive(t => s"$t.$action.${State.Requested}", Json.write(meta))

  /** Transition a requested instant to inflight (executor picked it up).
    * The requested file (and its plan payload) stays until completion. */
  def markInflight(time: String, action: String): Unit =
    writeAtomic(new Path(metaDir, s"$time.$action.${State.Inflight}"), "{}")

  private def mintExclusive(fileFor: String => String, content: String): String = {
    var attempts = 0
    var issued: String = null
    while (issued == null) {
      val time = newInstantTime()
      try {
        writeExclusive(new Path(metaDir, fileFor(time)), content)
        issued = time
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException if attempts < 16 =>
          attempts += 1 // another process holds this instant; mint a later one
      }
    }
    issued
  }

  private val callbacks =
    scala.collection.mutable.ArrayBuffer.empty[CommitCallback]

  /** Register a post-commit hook, fired after every successfully
    * published instant on this timeline handle (reference analog:
    * callback/HoodieWriteCommitCallback.java:29 — the http/kafka
    * callbacks are external bindings of this same seam). Callback
    * exceptions propagate: the commit itself is already durable. */
  def register(cb: CommitCallback): Unit = callbacks += cb

  /** Publish: write completed file atomically AND exclusively, drop
    * pending markers. Exclusive create is the cross-process collision
    * guard: if another writer process published the same instant name,
    * this fails loudly instead of silently replacing its commit. */
  def complete(time: String, action: String, meta: CommitMetadata): Instant = {
    writeExclusive(new Path(metaDir, s"$time.$action"), Json.write(meta))
    fs.delete(new Path(metaDir, s"$time.$action.${State.Inflight}"), false)
    fs.delete(new Path(metaDir, s"$time.$action.${State.Requested}"), false)
    Heartbeat.delete(this, time)
    val inst = Instant(time, action, State.Completed)
    callbacks.foreach(_.onCommit(inst, meta))
    inst
  }

  /** Abandon a pending instant (its data files are cleaned by rollback). */
  def deletePending(time: String, action: String): Unit = {
    fs.delete(new Path(metaDir, s"$time.$action.${State.Inflight}"), false)
    fs.delete(new Path(metaDir, s"$time.$action.${State.Requested}"), false)
    Heartbeat.delete(this, time)
  }

  /** Drop ONLY the inflight marker, keeping a `requested` plan file in
    * place — an aborted executor releases the instant for a later retry
    * without losing the pinned plan. */
  def deleteInflight(time: String, action: String): Unit =
    fs.delete(new Path(metaDir, s"$time.$action.${State.Inflight}"), false)

  /** Remove a completed instant from the active timeline (clean/archive). */
  def deleteCompleted(i: Instant): Unit = {
    val p = new Path(metaDir, i.fileName)
    fs.delete(p, false)
    Timeline.completedMetaCache.remove(p.toString) // hygiene, not staleness
  }

  /** Move a completed instant into the archive dir (metadata retained for
    * audit; the active listing no longer sees it). */
  def archiveCompleted(i: Instant): Unit = {
    val d = new Path(metaDir, Timeline.ArchiveDir)
    fs.mkdirs(d)
    val src = new Path(metaDir, i.fileName)
    commitStore.moveFile(fs, src, new Path(d, i.fileName))
    Timeline.completedMetaCache.remove(src.toString)
    archivedCache = null // same-JVM archivers invalidate exactly
  }

  /** (archive dir modtime, parsed times) — the archive only ever GROWS
    * (archiveCompleted is its sole writer), so a directory listing is
    * reusable until the dir changes. Without this, every time-travel
    * resolve pays an O(#archived) listing (Snapshot.resolve's gap
    * guards), and the archive grows without bound — an incremental
    * backfill pinned at historical instants would re-list it per query.
    * Cross-process archives invalidate via the modtime in the key (the
    * Checkpoint parse-cache shape); same-process ones exactly, in
    * [[archiveCompleted]] — which also covers filesystems with coarse
    * (1 s) modtime granularity for the only writer that can race a read
    * in the same tick. */
  @volatile private var archivedCache: (Long, Seq[Instant]) = null
  /** Test probe: physical archive-dir listings performed. */
  private[graft] val archivedListings = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Archived instants (time asc, parsed from file names); cached per dir
    * modtime. */
  private def archivedListing(): Seq[Instant] = {
    val d = new Path(metaDir, Timeline.ArchiveDir)
    val mod =
      try fs.getFileStatus(d).getModificationTime
      catch { case _: java.io.FileNotFoundException => return Nil }
    val cached = archivedCache
    if (cached != null && cached._1 == mod) cached._2
    else {
      archivedListings.incrementAndGet()
      val insts = fs.listStatus(d).toSeq.map(_.getPath.getName)
        .flatMap(parseFileName).sortBy(i => (i.time, i.action))
      archivedCache = (mod, insts)
      insts
    }
  }

  /** Times of archived instants (sorted asc); cached per dir modtime. */
  def archivedTimes(): Seq[String] = archivedListing().map(_.time)

  /** Remove archived instants with time > `t` — restore pruning: history
    * above the restore target ceases to exist, archived or not (keeping
    * it would poison later archive-gap replays with metadata whose data
    * files the restore deleted). */
  def pruneArchivedAfter(t: String): Unit = {
    val d = new Path(metaDir, Timeline.ArchiveDir)
    if (fs.exists(d)) {
      fs.listStatus(d).toSeq.map(_.getPath)
        .filter(p => parseFileName(p.getName).exists(_.time > t))
        .foreach { p =>
          fs.delete(p, false)
          archivedMetaCache.remove(p.toString)
        }
      archivedCache = null
    }
  }

  private def archivedMetaCache = Timeline.archivedMetaCache
  /** Test probe: physical archived-metadata file reads performed. */
  private[graft] def archivedMetaReads = Timeline.archivedMetaReads
  /** Test probe: physical completed-metadata file reads performed. */
  private[graft] def completedMetaReads = Timeline.completedMetaReads

  /** Load archived instants WITH their commit metadata back — audit /
    * lineage inspection, archive-gap time travel (Snapshot.resolve), and
    * behind-retention incremental reads (Snapshot.commitsInRange)
    * (reference analog: table/timeline/HoodieArchivedTimeline.java:61 —
    * loadInstantDetails over the archive). Time bounds prune the READS,
    * not just the result: only in-window files are opened, and repeat
    * reads are served from the parse cache above. */
  def archivedInstants(
      from: String = "", until: String = "~"): Seq[(Instant, CommitMetadata)] = {
    val d = new Path(metaDir, Timeline.ArchiveDir)
    archivedListing()
      .filter(i => i.time >= from && i.time <= until)
      .map { i =>
        val p = new Path(d, i.fileName)
        val key = p.toString
        val cached = Option(archivedMetaCache.get(key)).flatMap(r => Option(r.get))
        cached.getOrElse {
          archivedMetaReads.incrementAndGet()
          val parsed = i -> Json.read(readFully(p), classOf[CommitMetadata])
          archivedMetaCache.put(key, new java.lang.ref.SoftReference(parsed))
          parsed
        }
      }
  }

  /** Commit metadata of an instant. COMPLETED instants' files are
    * written once (create-exclusive publish) and never modified in
    * place, so their parse is cached JVM-wide behind a (modtime, length)
    * guard — one stat replaces a full read + JSON parse on every
    * re-resolve. The guard closes the cross-process rollback +
    * same-millisecond re-commit alias (the r11 snapshot-memo hole): a
    * re-minted instant file is a NEW file with a new mtime. Pending
    * instants (requested service plans) are deleted and re-minted in
    * normal operation — always read fresh. At 100 TB this is the
    * steady-state driver saving: a commit's metadata at ~1M file groups
    * is hundreds of MB of JSON, and every post-commit snapshot resolve
    * previously re-parsed the whole active window of them. */
  def metadataOf(i: Instant): CommitMetadata = {
    val p = new Path(metaDir, i.fileName)
    if (!i.isCompleted)
      return Json.read(readFully(p), classOf[CommitMetadata])
    val st = fs.getFileStatus(p)
    val key = p.toString
    val cached = Option(Timeline.completedMetaCache.get(key)).flatMap(r => Option(r.get))
    cached match {
      case Some((m, l, parsed)) if m == st.getModificationTime && l == st.getLen =>
        parsed
      case _ =>
        Timeline.completedMetaReads.incrementAndGet()
        val parsed = Json.read(readFully(p), classOf[CommitMetadata])
        Timeline.completedMetaCache.put(key, new java.lang.ref.SoftReference(
          (st.getModificationTime, st.getLen, parsed)))
        parsed
    }
  }

  // ---- raw FS helpers ----------------------------------------------------

  def fileSystem: FileSystem = fs

  private def readFully(p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomic overwrite of a small metadata object — delegated to the
    * table's [[CommitStore]] profile. */
  private def writeAtomic(p: Path, content: String): Unit =
    commitStore.putAtomic(fs, p, content)

  /** Create-exclusive publish (the commit point) — delegated to the
    * table's [[CommitStore]] profile, which fails with
    * FileAlreadyExistsException when another process got there first. */
  private def writeExclusive(p: Path, content: String): Unit =
    commitStore.createExclusive(fs, p, content)
}

object Timeline {
  val MetaDir = ".graft"
  val ConfigFile = "table.json"
  val ArchiveDir = "archive"
  /** writer-liveness files, one per inflight write instant — see
    * [[Heartbeat]] (reference analog: the `.hoodie/.heartbeat` folder,
    * HoodieHeartbeatClient.java:50) */
  val HeartbeatDir = ".heartbeat"
  private val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
  @volatile private var lastIssued: String = ""

  /** absolute file path -> parsed commit metadata for ARCHIVED instants,
    * shared JVM-wide (the DataSource read path constructs a fresh
    * Timeline per query — like the snapshot memo, the cache must outlive
    * the instance to serve repeat archive-gap time travels and
    * behind-retention incremental reads). An archive file is immutable
    * for its lifetime (archiveCompleted moves it in whole;
    * pruneArchivedAfter deletes it and evicts here) and its absolute
    * path is never reused (instant times are unique per table), so
    * entries cannot go stale — deleted files drop out of the directory
    * listing that drives archivedInstants. Values sit behind a
    * SoftReference: a long history's parsed stats (per-file write stats
    * per commit) can be large, and the JVM reclaims them under memory
    * pressure rather than OOM — the next read re-parses. */
  private val archivedMetaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.lang.ref.SoftReference[(Instant, CommitMetadata)]]()
  /** Test probe: physical archived-metadata file reads performed. */
  private[graft] val archivedMetaReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** absolute file path -> (modtime, length, parsed metadata) for
    * COMPLETED active-timeline instants, JVM-wide and SoftReference'd
    * like [[archivedMetaCache]] (see [[Timeline.metadataOf]] for the
    * staleness argument). */
  private val completedMetaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.lang.ref.SoftReference[(Long, Long, CommitMetadata)]]()
  /** Test probe: physical completed-metadata file reads performed. */
  private[graft] val completedMetaReads = new java.util.concurrent.atomic.AtomicLong(0L)
}
