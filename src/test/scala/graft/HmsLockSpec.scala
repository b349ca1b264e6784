package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** The Hive-metastore lock binding against a REAL embedded Derby-backed
  * metastore (the same in-sandbox HMS stack the catalog-sync tests
  * run): exclusion through the ACID lock manager, monotonic lock-id
  * fence tokens, loss detection via heartbeat, and the full commit
  * path aborting at the fence after the hold is reaped — over BOTH
  * commit stores. */
class HmsLockSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  // one Derby metastore db for the whole suite (engine boot is the
  // expensive part; the lock manager itself is per-key)
  private lazy val connect: String = {
    val dbDir = Files.createTempDirectory("graft-hms-spec").toString
    s"jdbc:derby:;databaseName=$dbDir/hms_db;create=true"
  }

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-hms-tbl").toString

  test("mutual exclusion per table path; lock-id fence is monotonic") {
    val a = new HmsLockProvider(connect, "/data/tbl1")
    val b = new HmsLockProvider(connect, "/data/tbl1")
    val c = new HmsLockProvider(connect, "/data/tbl2")
    assert(a.tryLock(), "first holder must acquire")
    assert(a.fenceToken.isDefined && a.verifyFence())
    val tokenA = a.fenceToken.get
    assert(!b.tryLock(), "second holder on the same path must not acquire")
    assert(c.tryLock(), "a different table path is a different lock")
    a.unlock()
    assert(!a.verifyFence(), "after release there is nothing to verify")
    assert(b.tryLock(), "released lock must be acquirable")
    // NEXT_LOCK_ID is one global sequence: a later hold's id is newer
    assert(b.fenceToken.get > tokenA,
      "the metastore lock id must be a monotonic fence")
    b.unlock(); c.unlock()
  }

  test("a reaped hold fails its fence check; unlock afterwards is a no-op") {
    val a = new HmsLockProvider(connect, "/data/reap")
    assert(a.tryLock())
    val id = a.fenceToken.get
    assert(a.verifyFence(), "live holder verifies OK")
    // the fault: the metastore no longer carries the hold (ACID lock
    // timeout reaping, or an operator's unlock) — injected directly
    HmsLockProvider.withClient(connect)(_.unlock(id))
    assert(!a.verifyFence(),
      "a hold the metastore dropped must verify STALE, never OK")
    a.unlock() // idempotent abort path
    val b = new HmsLockProvider(connect, "/data/reap")
    assert(b.tryLock(), "the reaped lock must be acquirable by a peer")
    assert(b.fenceToken.get > id)
    b.unlock()
  }

  test("thrift wire path: exclusion + fencing against a real in-process thrift metastore") {
    val uri = EmbeddedHms.start()
    val a = new HmsLockProvider(uri, "/data/thrift1")
    val b = new HmsLockProvider(uri, "/data/thrift1")
    assert(a.tryLock(), "first holder must acquire over thrift")
    assert(a.fenceToken.isDefined && a.verifyFence())
    assert(!b.tryLock(), "second holder must be excluded over thrift")
    a.unlock()
    assert(b.tryLock())
    assert(b.fenceToken.get > 0 && b.verifyFence())
    b.unlock()
  }

  test("keepalive outlives the ACID lock timeout; an un-beaten hold is reaped") {
    // fresh Derby store with a 2 s ACID lock timeout: the system
    // property flows into the provider's HiveConf (keepalive beat =
    // timeout/4 = 500 ms) and into the reaper TxnStore below
    val dbDir = Files.createTempDirectory("graft-hms-keepalive").toString
    val conn = s"jdbc:derby:;databaseName=$dbDir/hms_db;create=true"
    System.setProperty("hive.txn.timeout", "2s")
    try {
      val conf = new org.apache.hadoop.hive.conf.HiveConf()
      conf.set("javax.jdo.option.ConnectionURL", conn)
      conf.set("hive.metastore.uris", "")
      conf.set("datanucleus.schema.autoCreateAll", "true")
      conf.set("hive.metastore.schema.verification", "false")
      conf.set("hive.in.test", "true")
      conf.set("datanucleus.connectionPoolingType", "NONE")
      conf.set("hive.txn.timeout", "2s")
      val reaper = org.apache.hadoop.hive.metastore.txn.TxnUtils.getTxnStore(conf)

      val a = new HmsLockProvider(conn, "/data/keepalive")
      assert(a.tryLock())
      // 2.5× the lock timeout with reap cycles every 500 ms: without the
      // keepalive the hold dies at ~2 s (proven below); with it the
      // beats keep HL_LAST_HEARTBEAT fresh and the hold survives
      val deadline = System.currentTimeMillis() + 5000
      while (System.currentTimeMillis() < deadline) {
        reaper.performTimeOuts(); Thread.sleep(500)
      }
      assert(a.verifyFence(),
        "a held lock under keepalive must outlive 2× the ACID lock timeout")
      val b = new HmsLockProvider(conn, "/data/keepalive")
      assert(!b.tryLock(), "exclusion must still hold after the reap cycles")
      a.unlock()

      // control: the same cycle DOES reap a hold whose keepalive stopped
      // (a stalled writer) — proving the reaper above was real
      assert(b.tryLock())
      b.close() // stops the keepalive; the hold itself stays
      Thread.sleep(2500)
      reaper.performTimeOuts()
      assert(!b.verifyFence(),
        "an un-beaten hold must be reaped by the ACID timeout")
      val c = new HmsLockProvider(conn, "/data/keepalive")
      assert(c.tryLock(), "the reaped lock must be acquirable by a peer")
      c.unlock(); b.unlock()
    } finally System.clearProperty("hive.txn.timeout")
  }

  test("keepalive interval caches the HiveConf-resolved timeout per " +
      "connect string; a system-property override still takes effect") {
    val probe = "jdbc:derby:memory:interval_cache_probe"
    val i1 = HmsLockProvider.keepaliveIntervalMs(probe)
    val builds = HmsLockProvider.hiveConfBuilds.get
    (1 to 20).foreach(_ =>
      assert(HmsLockProvider.keepaliveIntervalMs(probe) == i1))
    assert(HmsLockProvider.hiveConfBuilds.get == builds,
      "repeated acquires must not rebuild HiveConf (classloader-heavy, " +
        "per-commit lock path)")
    // an override is a NEW cache key, so it applies on the next acquire
    System.setProperty("hive.txn.timeout", "8s")
    try assert(HmsLockProvider.keepaliveIntervalMs(probe) == 2000L,
      "8 s timeout must beat at timeout/4 = 2 s")
    finally System.clearProperty("hive.txn.timeout")
  }

  test("unlock failure classification: reaped holds are silent, " +
      "connectivity loss is not") {
    // NoSuchLock/NoSuchTxn = the hold is already gone (expected abort
    // path, no trace); anything else = the hold is still alive behind a
    // dead wire and peers stall on it until the ACID timeout — logged
    assert(HmsLockProvider.isAlreadyReleased(
      new org.apache.hadoop.hive.metastore.api.NoSuchLockException()))
    assert(HmsLockProvider.isAlreadyReleased(
      new org.apache.hadoop.hive.metastore.api.NoSuchTxnException()))
    assert(!HmsLockProvider.isAlreadyReleased(
      new org.apache.thrift.transport.TTransportException("reset")))
    assert(!HmsLockProvider.isAlreadyReleased(
      new org.apache.hadoop.hive.metastore.api.MetaException("boom")))
  }

  test("malformed hms config is rejected") {
    val dir = tmp()
    val tl = new Timeline(dir, spark.sessionState.newHadoopConf())
    tl.initTable(TableConfig(name = "ht", tableType = TableType.COW,
      keyFields = Seq("id"), lockProvider = "hms:  "))
    val e = intercept[IllegalArgumentException] {
      TimelineLock.providerFor(tl)
    }
    assert(e.getMessage.contains("hms:"))
  }

  for (store <- Seq(CommitStore.Rename, CommitStore.Put)) {
    test(s"[$store] commit path under hms lock: OCC race, then a reaped " +
        "hold aborts at the fence") {
      import spark.implicits._
      def rows(ids: Long*) =
        ids.map(i => (i, "a", 1L, "p")).toDF("id", "v", "ts", "p")
      val tbl = GraftTable.create(spark, tmp(), TableConfig(
        name = "hocc", tableType = TableType.COW, keyFields = Seq("id"),
        partitionFields = Seq("p"), orderingField = "ts", occ = true,
        commitStore = store, lockProvider = s"hms:$connect"))
      tbl.bulkInsert(rows(1L, 2L, 3L))

      // two racing conflicting writers: exactly one wins, the loser
      // aborts with the conflict exception, the timeline stays clean
      val batch = rows(1L).withColumn("v", lit("race"))
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      (1 to 2).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            barrier.await()
            try { tbl.upsert(batch); wins.incrementAndGet(); () }
            catch {
              case _: ConcurrentWriteConflictException => ()
              case t: Throwable => errs.add(t); ()
            }
          }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"losers abort cleanly: ${errs.toArray.mkString(",")}")
      assert(wins.get() >= 1)
      assert(tbl.timeline.instants().forall(_.isCompleted))

      // loss at the worst instant: conflict check passed, completing
      // write not yet issued — reap the hold behind the writer's back;
      // the fence check must abort the publish
      tbl.onBeforeComplete = () => {
        // reap exactly the writer's hold: list the metastore's locks on
        // this table's lock key and unlock them — the ACID-timeout /
        // operator-unlock fault, injected deterministically
        import scala.jdk.CollectionConverters._
        val keyTable = HmsLockProvider.lockTableName(tbl.basePath)
        HmsLockProvider.withClient(connect) { c =>
          val req = new org.apache.hadoop.hive.metastore.api.ShowLocksRequest()
          c.showLocks(req).getLocks.asScala
            .filter(_.getTablename == keyTable)
            .foreach(e => try c.unlock(e.getLockid)
              catch { case _: Exception => () })
        }
      }
      val staleAborted =
        try { tbl.upsert(rows(1L).withColumn("v", lit("stale"))); false }
        catch { case _: LockSessionLostException => true }
      tbl.onBeforeComplete = () => ()
      assert(staleAborted,
        "a writer whose hms hold was reaped mid-commit must abort at " +
          "the fence check, not complete")
      assert(tbl.timeline.instants().forall(_.isCompleted),
        "the fenced abort must roll back its pending instant")
      val r = GraftReader(tbl)
      assert(r.dataOnly(r.snapshot()).filter(col("v") === "stale").count() == 0)

      // with the lock free again the retry lands, recording its fence
      tbl.upsert(rows(4L))
      val last = tbl.timeline.completed().last
      val fence = tbl.timeline.metadataOf(last).extra.get("fenceToken")
      assert(fence.exists(_.forall(_.isDigit)),
        "completed instant must record the hms lock id it committed under")
    }
  }
}
