package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.services.TableServices
import graft.write.GraftTable

class ArchiveOccSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  // shared out-of-process lock service for the tcp-provider profiles
  // (the ZK-analog: exclusion state lives outside every writer JVM)
  lazy val lockServer: LockServer = { val s = new LockServer(); s.start(); s }

  override def afterAll(): Unit = {
    spark.stop()
    lockServer.stop()
  }

  def tmp(): String = Files.createTempDirectory("graft-arch").toString

  def cfg(occ: Boolean = false): TableConfig = TableConfig(
    name = "t", tableType = TableType.COW, keyFields = Seq("id"),
    orderingField = "ts", targetFileRows = 1000, occ = occ)

  def rows(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"v$i", 1L)).toDF("id", "v", "ts")
  }

  def state(tbl: GraftTable): Seq[Long] = {
    import spark.implicits._
    val r = GraftReader(tbl)
    r.dataOnly(r.snapshot()).select("id").as[Long].collect().sorted.toSeq
  }

  test("archive folds old instants into a checkpoint; snapshot unchanged") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    tbl.bulkInsert(rows(1L, 2L))
    (3L to 9L).foreach(i => tbl.upsert(rows(i)))
    val before = state(tbl)
    val svc = TableServices(tbl)

    assert(svc.archive(keepMin = 3, keepMax = 5).isDefined)
    val active = tbl.timeline.completed()
    assert(active.size == 3)
    assert(tbl.timeline.archivedTimes().size == 5) // 8 total, keepMin=3
    assert(Checkpoint.times(tbl.timeline).size == 1)
    // snapshot resolution via checkpoint + active replay = identical state
    assert(state(tbl) == before)
    // incremental over the active range still works
    val r = GraftReader(tbl)
    assert(r.incremental(active.head.time).count() == 2)
    // below-threshold second archive is a no-op
    assert(svc.archive(keepMin = 3, keepMax = 5).isEmpty)
  }

  test("incremental read spans the archive boundary (begin archived)") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    tbl.bulkInsert(rows(1L, 2L)) // c1
    val times = (3L to 9L).map(i => tbl.upsert(rows(i))) // c2..c8
    TableServices(tbl).archive(keepMin = 3, keepMax = 5) // c1..c5 archived
    val begin = times.head // c2 — now only in the archive
    assert(tbl.timeline.archivedTimes().contains(begin))
    val r = GraftReader(tbl)
    // change set of (c2, c8]: touched groups come from BOTH archived commit
    // metadata (c3..c5) and the active tail (c6..c8); per-row commit-time
    // filter drops records last written at or before `begin`
    val got = r.incremental(begin).select("id").as[Long].collect().sorted.toSeq
    assert(got == (4L to 9L))
    // begin = "" reads from the table's origin through the archive
    val all = r.incremental("").select("id").as[Long].collect().sorted.toSeq
    assert(all == (1L to 9L))
  }

  test("time travel beyond the archived boundary fails loudly") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    val t1 = tbl.bulkInsert(rows(1L))
    (2L to 8L).foreach(i => tbl.upsert(rows(i)))
    TableServices(tbl).archive(keepMin = 2, keepMax = 4)
    val ex = intercept[IllegalStateException] {
      GraftReader(tbl).snapshot(asOf = Some(t1)).count()
    }
    assert(ex.getMessage.contains("archived"))
  }

  test("schema survives archiving every schema-bearing instant") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    tbl.bulkInsert(rows(1L, 2L))
    (1 to 6).foreach(_ => tbl.delete(rows(99L))) // schema-less no-op commits... use deletes of absent keys
    TableServices(tbl).archive(keepMin = 2, keepMax = 4)
    // the only schemaJson-bearing commit (bulk_insert) is archived; the
    // checkpoint carries the schema
    val r = GraftReader(tbl)
    assert(r.snapshot().columns.contains("v"))
    assert(state(tbl) == Seq(1L, 2L))
  }

  test("savepointed instants never archive") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    val t1 = tbl.bulkInsert(rows(1L))
    (2L to 9L).foreach(i => tbl.upsert(rows(i)))
    val svc = TableServices(tbl)
    svc.savepoint(t1)
    assert(svc.archive(keepMin = 2, keepMax = 4).isEmpty) // everything >= t1 protected
    assert(tbl.timeline.completed().exists(_.time == t1))
  }

  test("OCC: conflicting concurrent upserts -> second one aborts cleanly") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(occ = true))
    tbl.bulkInsert(rows(1L, 2L, 3L))

    // two writers plan against the same snapshot, then race the commit:
    // writer B completes first; writer A must detect the overlap.
    // We simulate A's stale planning by running B's full upsert while A
    // is "computing": A's upsert resolves its snapshot lazily at call
    // time, so interleave via threads with a handshake inside a listener
    // — simplest deterministic equivalent: run B fully, then run A from
    // a pre-raced table handle whose planned snapshot we control by
    // doing the plan-then-publish steps through the public API on a
    // COPY of the timeline state. Here we instead verify the guard
    // end-to-end with a true race: many concurrent writers on the SAME
    // key — exactly one must win per round, none may corrupt state.
    val threads = 4
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    (1 to threads).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try results.add(tbl.upsert(rows(1L)))
          catch {
            case _: ConcurrentWriteConflictException => () // expected loser
            case t: Throwable => errors.add(t)
          }
      })
    }
    pool.shutdown()
    pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
    assert(errors.isEmpty, s"unexpected errors: ${errors.toArray.mkString(", ")}")
    assert(results.size >= 1, "at least one writer must win")
    // table state is consistent: the winning commits are serialized
    assert(state(tbl) == Seq(1L, 2L, 3L))
    // timeline has exactly bulk_insert + winners, no leftover inflight
    val pending = tbl.timeline.instants().filterNot(_.isCompleted)
    assert(pending.isEmpty, s"leftover pending: $pending")
  }

  test("OCC: disjoint-partition writers both succeed") {
    import spark.implicits._
    val dir = tmp()
    val c = cfg(occ = true).copy(partitionFields = Seq("p"))
    val tbl = GraftTable.create(spark, dir, c)
    tbl.bulkInsert(Seq((1L, "a", 1L, "p1"), (2L, "b", 1L, "p2")).toDF("id", "v", "ts", "p"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val fa = pool.submit(new Runnable {
      override def run(): Unit =
        try tbl.upsert(Seq((1L, "a2", 2L, "p1")).toDF("id", "v", "ts", "p"))
        catch { case t: Throwable => errors.add(t) }
    })
    val fb = pool.submit(new Runnable {
      override def run(): Unit =
        try tbl.upsert(Seq((2L, "b2", 2L, "p2")).toDF("id", "v", "ts", "p"))
        catch { case t: Throwable => errors.add(t) }
    })
    fa.get(); fb.get(); pool.shutdown()
    // disjoint file groups -> no conflict possible; both must land
    assert(errors.isEmpty, s"unexpected: ${errors.toArray.mkString(", ")}")
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b2")))
  }

  test("publishing the same instant twice fails loudly (cross-process guard)") {
    val dir = tmp()
    val conf = spark.sessionState.newHadoopConf()
    val tl = new Timeline(dir, conf)
    tl.initTable(TableConfig(name = "dup", tableType = TableType.COW,
      keyFields = Seq("id")))
    tl.complete("20260101000000000", "commit", CommitMetadata("upsert"))
    // a second writer process minting the same instant must NOT silently
    // replace the first commit
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      tl.complete("20260101000000000", "commit", CommitMetadata("upsert"))
    }
    assert(tl.completed().map(_.time) == Seq("20260101000000000"))
  }

  // ---- CommitStore / LockProvider profiles ---------------------------------
  // the SAME lifecycle + conflict suite must hold under every storage
  // profile: rename (HDFS-like, the default), and the simulated
  // object-store profile (conditional-put instants, data moved by copy)
  // with either lock provider

  for ((store, lock) <- Seq(
      (CommitStore.Rename, TimelineLock.File),
      (CommitStore.Put, TimelineLock.File),
      (CommitStore.Put, TimelineLock.InProcess),
      // "tcp" resolves to the live server's port inside pcfg (the port
      // is only known once the shared LockServer binds)
      (CommitStore.Rename, "tcp"),
      (CommitStore.Put, "tcp"))) {

    def pcfg(occ: Boolean = false): TableConfig =
      cfg(occ).copy(commitStore = store,
        lockProvider =
          if (lock == "tcp") s"tcp:127.0.0.1:${lockServer.port}" else lock)

    test(s"[$store/$lock] MOR lifecycle + archive round-trips") {
      val tbl = GraftTable.create(spark, tmp(),
        pcfg().copy(tableType = TableType.MOR))
      tbl.bulkInsert(rows(1L to 20L: _*))
      (21L to 26L).foreach(i => tbl.upsert(rows(i)))
      tbl.delete(rows(5L, 6L))
      TableServices(tbl).compact()
      assert(TableServices(tbl).archive(keepMin = 3, keepMax = 5).isDefined)
      assert(state(tbl) == ((1L to 26L).filterNot(Set(5L, 6L))))
      // incremental across the archive boundary still exact
      val r = GraftReader(tbl)
      assert(r.incremental("").filter(!col(graft.write.Meta.Deleted))
        .count() == 24)
    }

    test(s"[$store/$lock] OCC: conflicting writers, exactly-once state") {
      val tbl = GraftTable.create(spark, tmp(), pcfg(occ = true))
      tbl.bulkInsert(rows(1L, 2L, 3L))
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      (1 to 4).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try { tbl.upsert(rows(1L)); wins.incrementAndGet(); () }
            catch {
              case _: ConcurrentWriteConflictException => ()
              case t: Throwable => errors.add(t); ()
            }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(errors.isEmpty, s"unexpected: ${errors.toArray.mkString(", ")}")
      assert(wins.get() >= 1)
      assert(state(tbl) == Seq(1L, 2L, 3L))
      assert(tbl.timeline.instants().forall(_.isCompleted))
    }
  }

  test("tcp lock provider: session semantics match the ZK contract") {
    val srv = new LockServer()
    val port = srv.start()
    try {
      val a = new TcpLockProvider("127.0.0.1", port, "/t1")
      val b = new TcpLockProvider("127.0.0.1", port, "/t1")
      val other = new TcpLockProvider("127.0.0.1", port, "/t2")
      // mutual exclusion across sessions; independence across keys
      assert(a.tryLock())
      assert(!b.tryLock())
      assert(other.tryLock())
      // re-acquire of a held key by its OWN session is idempotent
      assert(a.tryLock())
      // only the owner can release
      b.unlock()
      assert(!b.tryLock(), "a non-owner RELEASE must not free the lock")
      a.unlock()
      assert(b.tryLock())
      b.unlock(); other.unlock()

      // ephemeral release: a crashed writer (dropped session) frees its
      // locks without any unlock call
      val crasher = new TcpLockProvider("127.0.0.1", port, "/t3")
      assert(crasher.tryLock())
      assert(srv.heldKeys.contains("/t3"))
      // simulate the crash: kill the socket behind the provider's back
      val f = classOf[TcpLockProvider].getDeclaredField("sock")
      f.setAccessible(true)
      f.get(crasher).asInstanceOf[java.net.Socket].close()
      val deadline = System.currentTimeMillis() + 10000
      while (srv.heldKeys.contains("/t3") && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(!srv.heldKeys.contains("/t3"),
        "server must release a dead session's locks (ephemeral semantics)")
    } finally srv.stop()

    // an unreachable server fails LOUDLY — never a silent "held"
    val dead = new TcpLockProvider("127.0.0.1", port, "/t1")
    intercept[IllegalStateException] { dead.tryLock() }
  }

  test("tcp lock provider excludes a writer in a DIFFERENT JVM; its crash releases") {
    // a real second process (no Spark on its classpath — LockProbe is
    // pure JVM) acquires the table lock through the shared server; this
    // JVM must see HELD until the foreign process is killed, after which
    // the lock evaporates (the ephemeral/crash contract ZK gives the
    // reference, ZookeeperBasedLockProvider.java:55)
    val key = "/crossjvm"
    val classes = new java.io.File(
      classOf[LockServer].getProtectionDomain.getCodeSource.getLocation.toURI)
    val scalaLib = new java.io.File(
      classOf[scala.Option[_]].getProtectionDomain.getCodeSource.getLocation.toURI)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val child = new ProcessBuilder(javaBin,
      "-cp", s"${classes.getPath}:${scalaLib.getPath}",
      "graft.core.LockProbe", "127.0.0.1", lockServer.port.toString, key)
      .redirectErrorStream(true).start()
    try {
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(child.getInputStream))
      val verdict = out.readLine()
      assert(verdict == "ACQUIRED", s"probe JVM could not acquire: $verdict")
      // exclusion across process boundaries
      val mine = new TcpLockProvider("127.0.0.1", lockServer.port, key)
      assert(!mine.tryLock(), "lock held by another JVM must read HELD here")
      // crash the foreign writer -> its session's locks evaporate
      child.destroyForcibly()
      child.waitFor()
      val deadline = System.currentTimeMillis() + 10000
      var got = false
      while (!got && System.currentTimeMillis() < deadline) {
        got = mine.tryLock()
        if (!got) Thread.sleep(50)
      }
      assert(got, "a crashed JVM's lock must release without any unlock call")
      mine.unlock()
    } finally if (child.isAlive) { child.destroyForcibly(); child.waitFor() }
  }

  test("moveFile is idempotent under task retry: completed move re-runs as a no-op") {
    import org.apache.hadoop.fs.Path
    val dir = tmp()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    for (store <- Seq(CommitStore.Rename, CommitStore.Put)) {
      val src = new Path(dir, s"src-$store")
      val dest = new Path(dir, s"dest-$store")
      val out = fs.create(src, true); out.write("payload".getBytes); out.close()
      val cs = CommitStore.forName(store)
      cs.moveFile(fs, src, dest)
      assert(!fs.exists(src) && fs.exists(dest))
      // the retry re-executes the identical call after the move landed —
      // a distributed-publish task that died before REPORTING does this
      cs.moveFile(fs, src, dest)
      assert(fs.exists(dest) && fs.getFileStatus(dest).getLen == 7L)
      // but a move where NOTHING landed must still fail loudly (the
      // exception type is filesystem-dependent: LocalFS throws
      // FileNotFound from rename itself, the guard throws IllegalState)
      val e = intercept[Exception] {
        cs.moveFile(fs, new Path(dir, "absent"), new Path(dir, s"never-$store"))
      }
      assert(e.isInstanceOf[IllegalStateException] ||
        e.isInstanceOf[java.io.FileNotFoundException], s"unexpected: $e")
    }
  }

  test("tcp provider close() ends the session and releases its locks") {
    val a = new TcpLockProvider("127.0.0.1", lockServer.port, "/closeme")
    assert(a.tryLock())
    assert(lockServer.heldKeys.contains("/closeme"))
    a.close()
    a.close() // idempotent
    val deadline = System.currentTimeMillis() + 10000
    while (lockServer.heldKeys.contains("/closeme") &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(!lockServer.heldKeys.contains("/closeme"),
      "close() must end the session so held keys ephemeral-release")
  }

  test("put-store publish: many file groups land by copy, none renamed") {
    import spark.implicits._
    // mini version of the q57 publish-tail probe through the object-store
    // profile: 64 file groups in one commit, every data file COPIED into
    // place; content must match the rename-profile table bit-for-bit
    val mk = (store: String) => {
      val t = GraftTable.create(spark, tmp(), TableConfig(
        name = s"many_$store", tableType = TableType.COW,
        keyFields = Seq("id"), partitionFields = Seq("p"),
        orderingField = "ts", targetFileRows = 4, commitStore = store))
      t.bulkInsert((1L to 256L).map(i => (i, s"v$i", 1L, s"p${i % 16}"))
        .toDF("id", "v", "ts", "p"))
      t
    }
    val a = mk(CommitStore.Rename); val b = mk(CommitStore.Put)
    assert(Snapshot.resolve(b.timeline).slices.size >= 64,
      "probe needs a many-group commit")
    val ra = GraftReader(a); val rb = GraftReader(b)
    val da = ra.dataOnly(ra.snapshot()).select("id", "v", "ts", "p")
    val db = rb.dataOnly(rb.snapshot()).select("id", "v", "ts", "p")
    assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty)
    // nothing left behind in staging
    val fs = b.timeline.fileSystem
    val staging = new org.apache.hadoop.fs.Path(b.basePath, ".graft/.tmp")
    assert(!fs.exists(staging) || fs.listStatus(staging).isEmpty)
  }
}
