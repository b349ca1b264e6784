package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.read.GraftReader
import graft.streaming._
import graft.write.GraftTable

/** Ingest-source seams: partitioned-log (Kafka-shaped) offset handling
  * and the incremental JDBC source's pushed predicate. */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-src").toString

  /** In-memory partitioned log; offset = index into the partition buffer. */
  class FakeLog extends PartitionedLogClient {
    val buf: mutable.Map[Int, mutable.ArrayBuffer[(Long, String)]] =
      mutable.Map(0 -> mutable.ArrayBuffer.empty, 1 -> mutable.ArrayBuffer.empty)
    def append(p: Int, rows: (Long, String)*): Unit = buf(p) ++= rows
    override def latestOffsets(): Map[Int, Long] =
      buf.map { case (p, b) => p -> b.length.toLong }.toMap
    override def earliestOffsets(): Map[Int, Long] = buf.keys.map(_ -> 0L).toMap
    override def read(ranges: Seq[LogOffsetRange]): DataFrame = {
      import spark.implicits._
      val rows = ranges.flatMap(r =>
        buf(r.partition).slice(r.from.toInt, r.until.toInt))
      rows.toDF("id", "v").withColumn("ts", expr("id"))
    }
  }

  test("LogOffsets.allocate fair-shares the budget across lagging partitions") {
    val ranges = LogOffsets.allocate(
      committed = Map.empty,
      earliest = Map(0 -> 0L, 1 -> 5L),
      latest = Map(0 -> 10L, 1 -> 15L),
      maxEvents = 10L)
    assert(ranges.sortBy(_.partition) ==
      Seq(LogOffsetRange(0, 0L, 5L), LogOffsetRange(1, 5L, 10L)))
    // spare budget flows to whoever still has lag
    val skewed = LogOffsets.allocate(
      committed = Map(0 -> 10L, 1 -> 5L),
      earliest = Map(0 -> 0L, 1 -> 0L),
      latest = Map(0 -> 11L, 1 -> 105L),
      maxEvents = 100L)
    assert(skewed.map(_.count).sum == 100L)
    assert(skewed.find(_.partition == 0).get.count == 1L)
    assert(skewed.find(_.partition == 1).get.count == 99L)
  }

  test("checkpoint codec round-trips") {
    val enc = LogOffsets.encode("topicA", Map(1 -> 7L, 0 -> 3L))
    assert(enc == "topicA,0:3,1:7")
    assert(LogOffsets.decode(enc) == (("topicA", Map(0 -> 3L, 1 -> 7L))))
  }

  test("LATEST reset pins its start; between-poll data is not skipped") {
    import spark.implicits._
    val log = new FakeLog
    log.append(0, (1L, "old-a"), (2L, "old-b"))
    log.append(1, (3L, "old-c"))

    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "latest", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    val ingest = new ContinuousIngest(tbl,
      new PartitionedLogSource(log, "t", startFromEarliest = false))

    // first poll: nothing new past LATEST — but the position must be
    // COMMITTED (empty instant carrying the checkpoint), not dropped
    assert(ingest.syncOnce().isDefined, "first LATEST poll must pin a checkpoint")
    assert(ingest.checkpoint.contains(LogOffsets.encode("t", Map(0 -> 2L, 1 -> 1L))))

    // data arriving between polls is consumed from the pinned position
    log.append(0, (10L, "new-a"))
    log.append(1, (11L, "new-b"), (12L, "new-c"))
    assert(ingest.syncOnce().isDefined)
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((10L, "new-a"), (11L, "new-b"), (12L, "new-c")),
      "exactly the between-poll records must land; old records skipped")

    // caught up again -> no further commits
    assert(ingest.syncOnce().isEmpty)
  }

  test("EARLIEST start ingests the backlog with a bounded batch budget") {
    import spark.implicits._
    val log = new FakeLog
    log.append(0, (1L, "a"), (2L, "b"), (3L, "c"))
    log.append(1, (4L, "d"), (5L, "e"))

    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "earliest", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    val ingest = new ContinuousIngest(tbl,
      new PartitionedLogSource(log, "t", maxEvents = 2L))
    // 5 records at 2/batch -> 3 commits, then caught up
    assert(ingest.runContinuous(maxRounds = 1).size == 3)
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 5L)
  }

  test("JDBC incremental: numeric checkpoints push unquoted; strings escape quotes") {
    import spark.implicits._
    var lastPred: Option[String] = None
    val base = Seq((1L, "o'brien"), (2L, "smith"), (3L, "o'hara"))
      .toDF("id", "name")
    def loader(q: JdbcQuery): DataFrame = {
      lastPred = q.predicate
      q.predicate.fold(base)(pred => base.where(expr(pred)))
    }

    val numSrc = new JdbcIncrementalSource(loader, "id")
    val Some((b1, ck1)) = numSrc.fetch(None): @unchecked
    assert(b1.count() == 3 && ck1 == "3")
    assert(numSrc.fetch(Some(ck1)).isEmpty) // caught up
    assert(lastPred.contains("id > 3"), s"numeric literal must be unquoted: $lastPred")

    val strSrc = new JdbcIncrementalSource(loader, "name")
    val Some((_, ckA)) = strSrc.fetch(None): @unchecked
    assert(ckA == "smith")
    // a checkpoint containing a quote must not break the pushed predicate
    val afterQuote = strSrc.fetch(Some("o'brien"))
    assert(lastPred.contains("name > 'o''brien'"), s"quote must be doubled: $lastPred")
    assert(afterQuote.map(_._1.count()).contains(2L)) // o'hara + smith
  }

  test("JDBC incremental: broken incremental query degrades to a full scan") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    def loader(q: JdbcQuery): DataFrame =
      q.predicate.fold(base)(_ => throw new RuntimeException("column dropped upstream"))
    val src = new JdbcIncrementalSource(loader, "id")
    val Some((batch, ck)) = src.fetch(Some("1")): @unchecked
    assert(batch.count() == 2 && ck == "2", "fallback must return the full scan")
  }

  test("JDBC incremental: one source execution per sync; no dups under insert") {
    import spark.implicits._
    // rows flowing OUT of the simulated database are counted by an
    // accumulator attached below the source seam: if a sync executed the
    // source query twice (once for the checkpoint, once for the write),
    // the count would double
    val rowsServed = spark.sparkContext.longAccumulator("jdbc-rows-served")
    val upstream = new java.util.concurrent.atomic.AtomicLong(3L)
    def loader(q: JdbcQuery): DataFrame = {
      val hi = upstream.get()
      val base = spark.range(1, hi + 1).toDF("id")
        .withColumn("v", expr("concat('r', id)"))
      // the predicate applies BELOW the counter, like a real database
      // would: the counter sees exactly the rows the query returns
      q.predicate.fold(base)(pred => base.where(expr(pred)))
        .filter { _ => rowsServed.add(1); true }
    }

    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "jdbc", tableType = TableType.COW, keyFields = Seq("id"),
      targetFileRows = 1000))
    val ingest = new ContinuousIngest(tbl,
      new JdbcIncrementalSource(loader, "id"), operation = "insert")

    assert(ingest.syncOnce().isDefined)
    assert(rowsServed.value == 3L,
      s"sync must execute the source exactly once (3 rows), saw ${rowsServed.value}")
    assert(ingest.checkpoint.contains("3"))

    // upstream grows; the next sync under `insert` must ingest ONLY the
    // new rows — and only read them from the source once
    upstream.set(5L)
    rowsServed.reset()
    assert(ingest.syncOnce().isDefined)
    assert(rowsServed.value == 2L,
      s"incremental sync must serve only the 2 new rows once, saw ${rowsServed.value}")
    assert(ingest.syncOnce().isEmpty, "caught up")

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L, 5L), "no duplicates under insert")
  }

  test("HTTP bindings: commit callback posts per instant; registry provider parses envelopes") {
    import spark.implicits._
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val keys = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/callback", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.add(new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        keys.add(Option(ex.getRequestHeaders.getFirst("X-Graft-Callback-Key")).getOrElse(""))
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.createContext("/schema/envelope", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = """{"subject":"t","version":3,"schema":"id BIGINT, v STRING"}"""
        val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.createContext("/schema/json", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val bytes = org.apache.spark.sql.types.StructType
          .fromDDL("id BIGINT, v STRING").json
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val dir = tmp()
      val tbl = GraftTable.create(spark, dir, TableConfig(
        name = "cbk", tableType = TableType.COW, keyFields = Seq("id"),
        orderingField = "ts", targetFileRows = 1000))
      tbl.timeline.register(new graft.sync.HttpCommitCallback(
        s"http://127.0.0.1:$port/callback", "cbk", dir, apiKey = "s3cret"))
      tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
      tbl.upsert(Seq((2L, "b2", 2L)).toDF("id", "v", "ts"))
      assert(received.size == 2, s"one POST per commit, got ${received.size}")
      val msgs = received.toArray(Array.empty[String])
      assert(msgs.head.contains("\"operation\":\"bulk_insert\"") &&
        msgs.head.contains("\"totalRows\":2"), msgs.head)
      assert(msgs(1).contains("\"operation\":\"upsert\""), msgs(1))
      assert(keys.toArray(Array.empty[String]).forall(_ == "s3cret"))

      val want = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
      assert(new HttpSchemaProvider(
        s"http://127.0.0.1:$port/schema/envelope").sourceSchema == want,
        "Confluent-style envelope unwraps to the payload schema")
      assert(new HttpSchemaProvider(
        s"http://127.0.0.1:$port/schema/json").sourceSchema == want,
        "raw StructType JSON parses directly")
      intercept[IllegalStateException] {
        new HttpSchemaProvider(s"http://127.0.0.1:$port/nope").sourceSchema
      }
    } finally server.stop(0)
  }

  test("continuous-ingest soak: async compaction runs concurrently; a crash resumes the checkpoint") {
    import spark.implicits._
    import graft.services.TableServices
    val log = new FakeLog
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "soak", tableType = TableType.MOR, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 40))
    val ingest = new ContinuousIngest(tbl, new PartitionedLogSource(log, "t", maxEvents = 50))
    val svc = TableServices(tbl)

    // background compactor: schedule → run in a loop, like the
    // reference's AsyncCompactService riding DeltaStreamer --continuous.
    // "kept racing" aborts are a legitimate contended outcome (the plan
    // or instant is retried later); anything else is a failure.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    var compactions = 0
    val compactor = new Thread(() => {
      while (!stop.get()) {
        try svc.scheduleCompaction().flatMap(svc.runScheduledCompaction)
          .foreach(_ => compactions += 1)
        catch {
          case e: IllegalStateException
            if e.getMessage.contains("could not schedule") ||
              e.getMessage.contains("kept losing") ||
              e.getMessage.contains("still pending") => () // benign contention
          case t: Throwable => errors.add(t)
        }
        Thread.sleep(10)
      }
    })
    compactor.start()

    var nextId = 0L
    (1 to 8).foreach { round =>
      log.append(round % 2,
        (nextId until nextId + 30L).map(i => (i, s"v$round")): _*)
      nextId += 30
      ingest.runContinuous(maxRounds = 1)
    }
    stop.set(true); compactor.join()
    assert(errors.isEmpty, s"compactor errors: ${errors.toArray.mkString(", ")}")

    // crash mid-round: data is FETCHED but never written — the
    // checkpoint-in-commit contract means nothing advanced
    log.append(0, (nextId, "late"))
    new PartitionedLogSource(log, "t", maxEvents = 50).fetch(ingest.checkpoint)
    val ckBefore = ingest.checkpoint

    // fresh process: reload the table; the new ingest resumes exactly
    // where the table state is and re-ingests the unwritten batch
    val tbl2 = GraftTable.load(spark, dir)
    val ingest2 = new ContinuousIngest(tbl2,
      new PartitionedLogSource(log, "t", maxEvents = 50))
    assert(ingest2.checkpoint == ckBefore, "checkpoint recovers from commits")
    ingest2.runContinuous(maxRounds = 1)

    val r = GraftReader(tbl2)
    val ids = r.dataOnly(r.snapshot()).select("id").as[Long].collect()
    assert(ids.length == nextId + 1, s"exactly-once: ${ids.length} vs ${nextId + 1}")
    assert(ids.distinct.length == ids.length, "no duplicate ids after resume")
  }

  test("JDBC loader pushes ORDER BY/LIMIT into the dbtable subquery") {
    val q = JdbcQuery(Some("id > 7"), Some(("id", 100L)))
    assert(JdbcIncrementalSource.dbtable("events", q) ==
      "(SELECT * FROM events WHERE id > 7 ORDER BY id LIMIT 100) graft_incr_src")
    assert(JdbcIncrementalSource.dbtable("events", JdbcQuery(Some("id > 7"), None)) ==
      "(SELECT * FROM events WHERE id > 7) graft_incr_src")
    assert(JdbcIncrementalSource.dbtable("events", JdbcQuery(None, Some(("id", 5L)))) ==
      "(SELECT * FROM events ORDER BY id LIMIT 5) graft_incr_src")
    assert(JdbcIncrementalSource.dbtable("events", JdbcQuery()) == "events")

    // the limit flows from the source into the loader's query
    var seen: Option[(String, Long)] = None
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    def loader(jq: JdbcQuery): org.apache.spark.sql.DataFrame = {
      seen = jq.orderLimit
      val f = jq.predicate.fold(base)(p => base.where(expr(p)))
      jq.orderLimit.fold(f) { case (c, n) =>
        f.orderBy(org.apache.spark.sql.functions.col(c)).limit(n.toInt) }
    }
    val src = new JdbcIncrementalSource(loader, "id", limit = 2L)
    val Some((b, ck)) = src.fetch(None): @unchecked
    assert(seen.contains(("id", 2L)), s"orderLimit must reach the loader: $seen")
    assert(b.count() == 2 && ck == "2", "backlog drains in bounded batches")
    val Some((b2, ck2)) = src.fetch(Some(ck)): @unchecked
    assert(b2.count() == 1 && ck2 == "3")
  }

  test("object-events source: a keyless (delete-only) tail advances the checkpoint once") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val dataDir = tmp(); val eventsDir = tmp()
    val fs = new Path(eventsDir).getFileSystem(spark.sessionState.newHadoopConf())
    def notify(name: String, keys: Seq[String]): Unit = {
      val out = fs.create(new Path(eventsDir, s"$name.json"), true)
      out.write(keys.map(k => s"""{\"key\": \"$k\"}""").mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    // one keyed object, then a LONG delete-only tail
    import spark.implicits._
    val obj = s"$dataDir/obj-0.parquet"
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$dataDir/stage")
    val part = fs.globStatus(new Path(s"$dataDir/stage", "part-*.parquet")).head.getPath
    fs.rename(part, new Path(obj))
    notify("000-data", Seq(obj))
    (1 to 30).foreach(i => notify(f"$i%03d-delete", Nil))

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, ts BIGINT")
    val tbl = GraftTable.create(spark, tmp(), TableConfig(
      name = "oes", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    val ingest = new ContinuousIngest(tbl,
      new ObjectEventsSource(spark, eventsDir, schema = Some(schema),
        maxEventFilesPerBatch = 1),
      operation = "insert")
    assert(ingest.syncOnce().isDefined, "round 1: the keyed object lands")
    // round 2: the 30-file keyless tail is consumed in ONE sync as a
    // checkpoint-only commit (no recursion depth, one listing)
    assert(ingest.syncOnce().isDefined, "round 2: checkpoint-only advance")
    assert(ingest.checkpoint.exists(_.endsWith("030-delete.json")),
      s"checkpoint must land on the tail: ${ingest.checkpoint}")
    // round 3: genuinely caught up — and stays that way
    assert(ingest.syncOnce().isEmpty)
    assert(ingest.syncOnce().isEmpty)
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 2)
  }

  test("object-events source: a malformed event file fails the sync instead of losing objects") {
    import org.apache.hadoop.fs.Path
    val dataDir = tmp(); val eventsDir = tmp()
    val fs = new Path(eventsDir).getFileSystem(spark.sessionState.newHadoopConf())
    def write(name: String, body: String): Unit = {
      val out = fs.create(new Path(eventsDir, s"$name.json"), true)
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    import spark.implicits._
    val obj = s"$dataDir/obj-0.parquet"
    Seq((1L, "a", 1L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$dataDir/stage")
    val part = fs.globStatus(new Path(s"$dataDir/stage", "part-*.parquet")).head.getPath
    fs.rename(part, new Path(obj))
    // a producer crashed mid-write: truncated JSON naming a real object
    write("000-data", s"""{"key": "$obj""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, ts BIGINT")
    val source = new ObjectEventsSource(spark, eventsDir, schema = Some(schema))
    val e = intercept[IllegalStateException] { source.fetch(None) }
    assert(e.getMessage.contains("malformed"), e.getMessage)
    // the producer finishes the file -> the SAME batch ingests cleanly
    write("000-data", s"""{"key": "$obj"}""")
    val Some((df, ck)) = source.fetch(None): @unchecked
    assert(df.count() == 1 && ck.endsWith("000-data.json"))
  }
}
