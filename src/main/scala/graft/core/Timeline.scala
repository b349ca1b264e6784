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

  def initTable(config: TableConfig): Unit = {
    fs.mkdirs(metaDir)
    writeAtomic(new Path(metaDir, Timeline.ConfigFile), Json.write(config))
  }

  def config: TableConfig = {
    val p = new Path(metaDir, Timeline.ConfigFile)
    Json.read(readFully(p), classOf[TableConfig])
  }

  /** Replace table.json (rename-table / config evolution). Single-writer
    * DDL: delete-then-rename, not atomic on its own, guarded by the
    * timeline lock under OCC. */
  def updateConfig(newConfig: TableConfig): Unit = {
    val p = new Path(metaDir, Timeline.ConfigFile)
    fs.delete(p, false)
    writeAtomic(p, Json.write(newConfig))
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

  /** Open a new inflight instant. */
  def start(action: String): String = {
    val time = newInstantTime()
    writeAtomic(new Path(metaDir, s"$time.$action.${State.Inflight}"), "{}")
    time
  }

  private val callbacks =
    scala.collection.mutable.ArrayBuffer.empty[CommitCallback]

  /** Register a post-commit hook, fired after every successfully
    * published instant on this timeline handle (reference analog:
    * callback/HoodieWriteCommitCallback.java:29 — the http/kafka
    * callbacks are external bindings of this same seam). Callback
    * exceptions propagate: the commit itself is already durable. */
  def register(cb: CommitCallback): Unit = callbacks += cb

  /** Publish: write completed file atomically, drop pending markers. */
  def complete(time: String, action: String, meta: CommitMetadata): Instant = {
    writeAtomic(new Path(metaDir, s"$time.$action"), Json.write(meta))
    fs.delete(new Path(metaDir, s"$time.$action.${State.Inflight}"), false)
    fs.delete(new Path(metaDir, s"$time.$action.${State.Requested}"), false)
    val inst = Instant(time, action, State.Completed)
    callbacks.foreach(_.onCommit(inst, meta))
    inst
  }

  /** Abandon a pending instant (its data files are cleaned by rollback). */
  def deletePending(time: String, action: String): Unit = {
    fs.delete(new Path(metaDir, s"$time.$action.${State.Inflight}"), false)
    fs.delete(new Path(metaDir, s"$time.$action.${State.Requested}"), false)
  }

  /** Remove a completed instant from the active timeline (clean/archive). */
  def deleteCompleted(i: Instant): Unit =
    fs.delete(new Path(metaDir, i.fileName), false)

  /** Move a completed instant into the archive dir (metadata retained for
    * audit; the active listing no longer sees it). */
  def archiveCompleted(i: Instant): Unit = {
    val d = new Path(metaDir, Timeline.ArchiveDir)
    fs.mkdirs(d)
    if (!fs.rename(new Path(metaDir, i.fileName), new Path(d, i.fileName)))
      throw new IllegalStateException(s"archive move failed: ${i.fileName}")
  }

  /** Times of archived instants (sorted asc); O(#archived) listing. */
  def archivedTimes(): Seq[String] = {
    val d = new Path(metaDir, Timeline.ArchiveDir)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .flatMap(parseFileName).map(_.time).sorted
  }

  def metadataOf(i: Instant): CommitMetadata =
    Json.read(readFully(new Path(metaDir, i.fileName)), classOf[CommitMetadata])

  // ---- raw FS helpers ----------------------------------------------------

  def fileSystem: FileSystem = fs

  private def readFully(p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Create-temp-then-rename: rename is atomic on HDFS/local; on object
    * stores this seam is where a conditional-put provider plugs in. */
  private def writeAtomic(p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"atomic publish failed (exists?): $p")
    }
  }
}

object Timeline {
  val MetaDir = ".graft"
  val ConfigFile = "table.json"
  val ArchiveDir = "archive"
  private val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
  @volatile private var lastIssued: String = ""
}
