package graft.core

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.{HiveMetaStoreClient, IMetaStoreClient}
import org.apache.hadoop.hive.metastore.api.{
  DataOperationType, LockComponent, LockLevel, LockRequest, LockState,
  LockType}

/** Hive-metastore timeline lock over the metastore's ACID lock manager
  * (reference analog:
  * hudi-sync/hudi-hive-sync/src/main/java/org/apache/hudi/hive/
  * HiveMetastoreBasedLockProvider.java:71, which drives the same
  * IMetaStoreClient.lock/checkLock/unlock API): one EXCLUSIVE
  * table-level LockComponent on a metastore table name derived from
  * the table base path, so writers from any host that reach the
  * metastore exclude each other — the lock family a Hive-centric
  * deployment already operates, no extra service.
  *
  * Selected with `lockProvider = "hms:<connect>"` where connect is
  *  - `thrift://host:port[,...]` — a remote metastore (production), or
  *  - `jdbc:derby:;databaseName=<dir>;create=true` — an EMBEDDED
  *    Derby-backed metastore in-process (the sandbox/test posture; the
  *    same Derby stack the catalog-sync tests already run). Embedded
  *    mode pins `hive.in.test` so the metastore's TxnHandler preps the
  *    Derby transaction tables (TXNS/HIVE_LOCKS/NEXT_LOCK_ID) on first
  *    touch — the schematool step a real deployment runs once.
  *
  * Fencing: the metastore mints lock ids from one global NEXT_LOCK_ID
  * sequence, so the id IS a monotonic fence token (a later holder's id
  * is strictly newer). [[verifyFence]] heartbeats the lock id at the
  * commit point: a hold the metastore no longer carries (reaped by the
  * lock timeout, or released by an operator) answers
  * NoSuchLockException and the writer aborts instead of publishing
  * blind — the same contract as the tcp provider's VERIFY and the zk
  * provider's czxid marker.
  *
  * The metastore CLIENT is long-lived (one per connect string per JVM,
  * the ZkLockProvider.cached shape); HiveMetaStoreClient is not
  * thread-safe, so every call synchronizes on the client — lock
  * traffic is a handful of tiny RPCs per commit, never data-plane. */
class HmsLockProvider(connect: String, key: String) extends LockProvider {

  private val tableName = HmsLockProvider.lockTableName(key)
  private var lockId: Option[Long] = None

  override def tryLock(): Boolean = HmsLockProvider.withClient(connect) { c =>
    val comp = new LockComponent(LockType.EXCLUSIVE, LockLevel.TABLE,
      HmsLockProvider.LockDb)
    comp.setTablename(tableName)
    comp.setOperationType(DataOperationType.NO_TXN)
    val req = new LockRequest(
      java.util.Collections.singletonList(comp),
      System.getProperty("user.name", "graft"),
      java.net.InetAddress.getLocalHost.getHostName)
    val resp = c.lock(req)
    if (resp.getState == LockState.ACQUIRED) {
      lockId = Some(resp.getLockid)
      true
    } else {
      // single-attempt contract (retry policy lives in TimelineLock):
      // drop the enqueued WAITING entry or it blocks the real holder's
      // successor forever
      try c.unlock(resp.getLockid) catch { case _: Exception => () }
      false
    }
  }

  override def unlock(): Unit = {
    lockId.foreach { id =>
      try HmsLockProvider.withClient(connect)(_.unlock(id))
      catch { case _: Exception => () } // already reaped = already free
    }
    lockId = None
  }

  override def fenceToken: Option[Long] = lockId

  /** Still the holder iff the metastore still carries the lock id — a
    * heartbeat doubles as the existence check (NoSuchLockException =
    * the hold was reaped or released) and refreshes the lock's ACID
    * timeout while the commit completes. */
  override def verifyFence(): Boolean = lockId.exists { id =>
    try { HmsLockProvider.withClient(connect)(_.heartbeat(0L, id)); true }
    catch { case _: Exception => false }
  }

  /** The client is shared per connect string; nothing per-commit to
    * release beyond the lock itself. */
  override def close(): Unit = ()

  override def describe: String = s"hms:$connect/$tableName"
}

object HmsLockProvider {
  /** All graft lock rows live under one metastore db name; the lock
    * manager keys rows by (db, table) strings — no catalog object has
    * to exist. */
  val LockDb = "default"

  private val clients =
    new java.util.concurrent.ConcurrentHashMap[String, IMetaStoreClient]()

  /** Metastore table name for a table's lock: readable sanitized tail
    * plus an md5 suffix so distinct base paths never collide after
    * sanitization (the ZkLockProvider.lockPath shape; lowercase because
    * the metastore lowercases identifiers). */
  private[graft] def lockTableName(key: String): String = {
    val safe = key.toLowerCase.replaceAll("[^a-z0-9_]", "_")
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)
    s"graft_lock_${safe.takeRight(64)}_$h"
  }

  private def newClient(connect: String): IMetaStoreClient = {
    val conf = new HiveConf()
    if (connect.startsWith("thrift://")) {
      conf.set("hive.metastore.uris", connect)
    } else {
      // embedded metastore over a local JDBC store (Derby in-sandbox)
      conf.set("hive.metastore.uris", "")
      conf.set("javax.jdo.option.ConnectionURL", connect)
      // keep the handler's default-db bootstrap off any shared path
      conf.set("hive.metastore.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-hms-wh").toString)
      conf.set("datanucleus.schema.autoCreateAll", "true")
      conf.set("hive.metastore.schema.verification", "false")
      // TxnHandler's Derby path: prep the ACID transaction tables
      // (TXNS/HIVE_LOCKS/NEXT_LOCK_ID) on first touch — idempotent
      // ("already exists" is swallowed), standing in for schematool
      conf.set("hive.in.test", "true")
      // TxnHandler's default pool is BoneCP, which isn't on this
      // classpath (Spark ships HikariCP/DBCP); direct connections are
      // right for a lock path's tiny RPC volume anyway
      conf.set("datanucleus.connectionPoolingType", "NONE")
    }
    new HiveMetaStoreClient(conf)
  }

  /** One long-lived client per connect string per JVM, every call
    * serialized on it (HiveMetaStoreClient is not thread-safe). An
    * unreachable metastore throws WITHOUT caching so a later attempt
    * retries the connect. */
  private[graft] def withClient[T](connect: String)(f: IMetaStoreClient => T): T = {
    val c = clients.computeIfAbsent(connect, newClient(_))
    c.synchronized(f(c))
  }
}

/** In-process THRIFT metastore for tests and correctness gates — the
  * real server (HiveMetaStore.startMetaStore from the hive-metastore
  * jar) over a Derby store, so cross-PROCESS writers exercise the exact
  * production wire path (`hms:thrift://...`) that embedded Derby alone
  * cannot (an embedded Derby database is single-JVM by design). The
  * server loop never returns and ships no shutdown API; it runs on a
  * daemon thread and dies with the JVM. */
object EmbeddedHms {
  /** Starts a thrift metastore on a free port; returns its
    * `thrift://127.0.0.1:<port>` URI once it is actually serving. */
  def start(): String = {
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val dbDir = java.nio.file.Files.createTempDirectory("graft-hms-srv").toString
    val conf = new HiveConf()
    conf.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$dbDir/hms_db;create=true")
    conf.set("datanucleus.schema.autoCreateAll", "true")
    conf.set("hive.metastore.schema.verification", "false")
    conf.set("hive.in.test", "true") // preps Derby ACID tables on first lock
    conf.set("datanucleus.connectionPoolingType", "NONE")
    conf.set("hive.metastore.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-hms-srv-wh").toString)
    val startLock = new java.util.concurrent.locks.ReentrantLock()
    val serving = startLock.newCondition()
    val started = new java.util.concurrent.atomic.AtomicBoolean(false)
    val boot = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => {
      try org.apache.hadoop.hive.metastore.HiveMetaStore.startMetaStore(
        port,
        org.apache.hadoop.hive.shims.ShimLoader.getHadoopThriftAuthBridge,
        conf, startLock, serving, started)
      catch { case e: Throwable =>
        boot.set(e)
        startLock.lock()
        try serving.signalAll() finally startLock.unlock()
      }
    }, s"graft-embedded-hms-$port")
    t.setDaemon(true)
    t.start()
    startLock.lock()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!started.get() && boot.get() == null && System.nanoTime() < deadline)
        serving.awaitNanos(deadline - System.nanoTime())
    } finally startLock.unlock()
    if (boot.get() != null)
      throw new IllegalStateException("embedded thrift metastore failed to boot",
        boot.get())
    if (!started.get())
      throw new IllegalStateException("embedded thrift metastore boot timed out")
    s"thrift://127.0.0.1:$port"
  }
}
