package graft.core

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}

import org.apache.hadoop.fs.Path

/** Writer liveness for failed-write cleanup (reference analog:
  * client/heartbeat/HoodieHeartbeatClient.java:50 — heartbeat files under
  * `.hoodie/.heartbeat/<instant>`, refreshed on a timer; expiry =
  * hoodie.client.heartbeat.interval_in_ms × tolerable misses,
  * HoodieWriteConfig.java:368,373).
  *
  * Every write that mints an inflight instant registers here; a shared
  * daemon timer re-touches each registered heartbeat file, so the file's
  * modification time says "a JVM is still driving this instant". When the
  * writer publishes or aborts, [[Timeline.complete]] /
  * [[Timeline.deletePending]] delete the file and deregister. A writer
  * that CRASHES stops refreshing — the stale mtime is what the LAZY
  * failed-write cleanup policy keys on (AbstractHoodieWriteClient.java:963).
  *
  * A heartbeat file that is MISSING for a pending instant counts as
  * expired: a live writer (re-)creates its file on every refresh tick, so
  * absence means no JVM owns the instant (matches the reference, where
  * getLastHeartbeatTime of a missing file yields an expired heartbeat —
  * HoodieHeartbeatClient.java:208-236).
  */
object Heartbeat {

  /** Refresh cadence of the shared timer (reference default interval is
    * 60 s with 2 tolerable misses; we refresh at ttl/4 of the DEFAULT ttl
    * so even two missed ticks stay well inside the expiry window). */
  val RefreshMs: Long = 30000L

  private case class Entry(timeline: Timeline, time: String)

  private val active = new ConcurrentHashMap[String, Entry]()
  @volatile private var ticker: ScheduledFuture[_] = null
  private lazy val pool = {
    val p = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-heartbeat")
      t.setDaemon(true)
      t
    })
    p
  }

  private def keyOf(timeline: Timeline, time: String): String =
    s"${timeline.basePath}#$time"

  def path(timeline: Timeline, time: String): Path =
    new Path(timeline.metaDir, s"${Timeline.HeartbeatDir}/$time")

  /** Touch (create or refresh) the heartbeat file for `time`. */
  def touch(timeline: Timeline, time: String): Unit = {
    val fs = timeline.fileSystem
    val p = path(timeline, time)
    fs.mkdirs(p.getParent)
    // create(overwrite = true) bumps the modification time atomically;
    // content is irrelevant, only the mtime carries information
    fs.create(p, true).close()
  }

  /** Register `time` for periodic refresh until completed/aborted. */
  def start(timeline: Timeline, time: String): Unit = {
    touch(timeline, time)
    active.put(keyOf(timeline, time), Entry(timeline, time))
    synchronized {
      if (ticker == null)
        ticker = pool.scheduleWithFixedDelay(
          () => tick(), RefreshMs, RefreshMs, TimeUnit.MILLISECONDS)
    }
  }

  /** Deregister (no file deletion — the caller owns that). */
  def stopTracking(timeline: Timeline, time: String): Unit = {
    active.remove(keyOf(timeline, time))
    ()
  }

  /** Is `time` still being refreshed by this JVM? (test observability) */
  private[graft] def isTracked(timeline: Timeline, time: String): Boolean =
    active.containsKey(keyOf(timeline, time))

  /** Delete the heartbeat file and deregister. Safe to call for instants
    * that never had one (services). */
  def delete(timeline: Timeline, time: String): Unit = {
    stopTracking(timeline, time)
    try timeline.fileSystem.delete(path(timeline, time), false)
    catch { case _: java.io.IOException => () }
    ()
  }

  /** Milliseconds since the heartbeat file was last touched; None when
    * the file does not exist (= expired, see class doc). */
  def ageMs(timeline: Timeline, time: String): Option[Long] =
    try Some(System.currentTimeMillis() -
      timeline.fileSystem.getFileStatus(path(timeline, time)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** Expired = no heartbeat file, or one older than `ttlMs`. */
  def isExpired(timeline: Timeline, time: String, ttlMs: Long): Boolean =
    ageMs(timeline, time).forall(_ > ttlMs)

  private def tick(): Unit = {
    import scala.jdk.CollectionConverters._
    active.values().asScala.foreach { e =>
      try {
        // a write that leaked past its abort path (e.g. the JVM caught a
        // fatal error mid-write) must not be kept alive forever: once the
        // inflight marker is gone, stop refreshing
        val stillPending = e.timeline.instants()
          .exists(i => i.time == e.time && !i.isCompleted)
        if (stillPending) touch(e.timeline, e.time)
        else stopTracking(e.timeline, e.time)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
