package graft.core

import org.apache.hadoop.fs.Path

/** Filesystem-based mutual exclusion around commit publication
  * (reference analog: client/transaction/TransactionManager.java:35 with
  * a FileSystem lock provider instead of Zookeeper/Hive — the
  * atomic-create seam where a distributed lock service plugs in).
  *
  * `fs.create(path, overwrite = false)` is atomic on HDFS and local
  * filesystems; stale locks (a crashed writer) expire after `staleMs`. */
class TimelineLock(
    timeline: Timeline,
    timeoutMs: Long = 30000,
    staleMs: Long = 60000) {

  private val lockPath = new Path(timeline.metaDir, TimelineLock.LockFile)
  private def fs = timeline.fileSystem

  def withLock[T](f: => T): T = {
    acquire()
    try f finally release()
  }

  private def acquire(): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      try {
        val out = fs.create(lockPath, false) // atomic create-if-absent
        out.close()
        return
      } catch {
        case _: java.io.IOException =>
          // held by someone else; break stale locks, else wait
          try {
            val st = fs.getFileStatus(lockPath)
            if (st.getModificationTime < System.currentTimeMillis() - staleMs)
              fs.delete(lockPath, false)
          } catch { case _: java.io.FileNotFoundException => () }
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"timed out after ${timeoutMs}ms waiting for timeline lock $lockPath")
          Thread.sleep(50)
      }
    }
  }

  private def release(): Unit = fs.delete(lockPath, false)
}

object TimelineLock {
  val LockFile = ".lock"
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
