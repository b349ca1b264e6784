package graft.core

import org.apache.hadoop.fs.Path

/** One mutual-exclusion attempt: `tryLock` is a single atomic
  * acquire-if-free; retry/timeout policy lives in [[TimelineLock]]
  * (reference analog: client/transaction/lock/LockProvider.java:33 —
  * the seam where Zookeeper/Hive/DynamoDB bindings plug in). */
trait LockProvider {
  def tryLock(): Boolean
  def unlock(): Unit
  def describe: String
  /** Release any resource the provider holds beyond the lock itself
    * (sockets, sessions). A provider is created per lock SCOPE
    * (TimelineLock instantiates one per commit), so leaking here leaks
    * once per commit — a long-running ingest writer would exhaust file
    * descriptors. Idempotent; called after the final unlock. */
  def close(): Unit = ()
}

/** Filesystem lock file: `fs.create(path, overwrite = false)` is atomic
  * on HDFS and local filesystems; stale locks (a crashed writer) expire
  * after `staleMs` (reference analog:
  * FileSystemBasedLockProvider.java:53). */
class FileLockProvider(timeline: Timeline, staleMs: Long = 60000)
    extends LockProvider {
  private val lockPath = new Path(timeline.metaDir, TimelineLock.LockFile)
  private def fs = timeline.fileSystem

  override def tryLock(): Boolean =
    try {
      fs.create(lockPath, false).close() // atomic create-if-absent
      true
    } catch {
      case _: java.io.IOException =>
        // held by someone else; break a stale lock for the NEXT attempt
        try {
          val st = fs.getFileStatus(lockPath)
          if (st.getModificationTime < System.currentTimeMillis() - staleMs)
            fs.delete(lockPath, false)
        } catch { case _: java.io.FileNotFoundException => () }
        false
    }

  override def unlock(): Unit = fs.delete(lockPath, false)
  override def describe: String = lockPath.toString
}

/** JVM-wide lock keyed by table path — correct whenever every writer
  * shares one driver process (async compactor + ingest + services on a
  * session), standing in for an external lock service in exactly the
  * way the reference's in-process provider does (reference analog:
  * InProcessLockProvider.java:42). */
class InProcessLockProvider(key: String) extends LockProvider {
  override def tryLock(): Boolean = InProcessLockProvider.held.add(key)
  override def unlock(): Unit = { InProcessLockProvider.held.remove(key); () }
  override def describe: String = s"in-process:$key"
}

object InProcessLockProvider {
  private val held =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

/** Mutual exclusion around commit publication (reference analog:
  * client/transaction/TransactionManager.java:35): the retry/timeout
  * loop over a pluggable [[LockProvider]], chosen by the table's
  * `lockProvider` config. */
class TimelineLock(
    timeline: Timeline,
    timeoutMs: Long = 30000,
    staleMs: Long = 60000) {

  private val provider: LockProvider =
    TimelineLock.providerFor(timeline, staleMs)

  def withLock[T](f: => T): T =
    // close() in the OUTER finally: a timed-out acquire() has still
    // opened provider resources (e.g. the tcp session) that must not
    // leak on the failure path
    try {
      acquire()
      try f finally provider.unlock()
    } finally provider.close()

  private def acquire(): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!provider.tryLock()) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"timed out after ${timeoutMs}ms waiting for timeline lock " +
            provider.describe)
      Thread.sleep(50)
    }
  }
}

object TimelineLock {
  val LockFile = ".lock"
  val File = "file"
  val InProcess = "inprocess"
  /** `tcp:<host>:<port>` — the out-of-process [[LockServer]] binding
    * (the ZK-analog: exclusion state lives in an external service,
    * session loss releases the lock). */
  val TcpPrefix = "tcp:"

  def providerFor(timeline: Timeline, staleMs: Long = 60000): LockProvider = {
    // only the not-yet-initialized bootstrap may default; a config READ
    // failure on a live table must propagate — silently falling back to
    // the file provider would break mutual exclusion with peers that
    // did read 'inprocess'
    val n = Option(if (!timeline.exists) null else timeline.config.lockProvider)
      .map(_.trim).filter(_.nonEmpty).getOrElse(File)
    n match {
      case File      => new FileLockProvider(timeline, staleMs)
      case InProcess => new InProcessLockProvider(timeline.basePath)
      case tcp if tcp.startsWith(TcpPrefix) =>
        tcp.stripPrefix(TcpPrefix).split(":", 2) match {
          case Array(host, port) if host.nonEmpty && port.forall(_.isDigit) && port.nonEmpty =>
            new TcpLockProvider(host, port.toInt, timeline.basePath)
          case _ => throw new IllegalArgumentException(
            s"malformed lockProvider '$tcp' (expected 'tcp:<host>:<port>')")
        }
      case other => throw new IllegalArgumentException(
        s"unknown lockProvider '$other' " +
          s"(expected '$File', '$InProcess' or '$TcpPrefix<host>:<port>')")
    }
  }
}

/** A concurrent writer published an overlapping commit first; this
  * write was aborted and its files removed — retry it (reference
  * analog: HoodieWriteConflictException). */
class ConcurrentWriteConflictException(mine: String, theirs: String)
  extends RuntimeException(
    s"commit $mine conflicts with concurrently-completed instant $theirs " +
      "(overlapping file groups); the write was rolled back — retry")

/** The write targets file groups pinned by a pending clustering plan;
  * mutating them would be lost when the plan's replacecommit lands
  * (reference analog: SparkRejectUpdateStrategy.java:42). Retry after
  * the clustering executes, or roll the plan back. */
class ClusteringConflictException(op: String, groups: Iterable[(String, String)])
  extends RuntimeException(
    s"$op targets file groups pinned by a pending clustering plan " +
      s"(e.g. ${groups.mkString(", ")}); wait for the clustering to " +
      "execute or roll back its plan, then retry")
