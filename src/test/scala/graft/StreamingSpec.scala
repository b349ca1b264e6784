package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.streaming._
import graft.write.GraftTable
import org.apache.spark.sql.graft.streaming.GraftStreamProvider

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-stream").toString

  def cfg(name: String): TableConfig = TableConfig(
    name = name, tableType = TableType.COW, keyFields = Seq("id"),
    orderingField = "ts", targetFileRows = 1000)

  test("foreachBatch sink writes micro-batches with batchId idempotency") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("sink"))

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("id", "v", "ts")
      .writeStream
      .foreachBatch(GraftStreamSink(tbl, queryId = "q1"))
      .option("checkpointLocation", tmp())
      .start()
    mem.addData((1L, "a", 1L), (2L, "b", 1L))
    q.processAllAvailable()
    mem.addData((2L, "b2", 2L), (3L, "c", 2L))
    q.processAllAvailable()
    q.stop()

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L)))
    assert(GraftStreamSink.lastCommittedBatch(tbl, "q1").contains(1L))

    // replaying an already-committed batch is a no-op
    val commitsBefore = tbl.timeline.completed().size
    GraftStreamSink.writeBatch(tbl, "q1", "upsert",
      Seq((9L, "dup", 9L)).toDF("id", "v", "ts"), batchId = 1L)
    assert(tbl.timeline.completed().size == commitsBefore)
    // a NEW batch id goes through
    GraftStreamSink.writeBatch(tbl, "q1", "upsert",
      Seq((9L, "new", 9L)).toDF("id", "v", "ts"), batchId = 2L)
    assert(r.dataOnly(r.snapshot()).count() == 4)
  }

  test("stream source: offsets = instants, batches = incremental pulls") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("src"))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))

    val stream = spark.readStream
      .format(classOf[GraftStreamProvider].getName)
      .option("path", dir)
      .load()
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("graft_src")
      .outputMode("append")
      .option("checkpointLocation", tmp())
      .start()
    q.processAllAvailable()
    val after1 = spark.table("graft_src").select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(after1.toSeq == Seq((1L, "a"), (2L, "b")))

    // a new commit becomes the next micro-batch (only the delta rows)
    tbl.upsert(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ts"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("graft_src").select("id", "v").as[(Long, String)]
      .collect().sorted
    // append-mode memory sink accumulates the change stream
    assert(all.toSeq == Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")))
  }

  test("stream source throttle: per-instant batches, checkpoint restart resumes") {
    import spark.implicits._
    val dir = tmp()
    val ckpt = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("thr"))
    // a 5-commit backlog before the stream ever starts
    tbl.bulkInsert(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    (2 to 5).foreach { i =>
      tbl.upsert(Seq((i.toLong, s"v$i", i.toLong)).toDF("id", "v", "ts"))
    }
    // file sink: the memory sink refuses checkpoint recovery, and the
    // restart leg is the point of this test
    val outDir = tmp()
    def start() = spark.readStream
      .format(classOf[GraftStreamProvider].getName)
      .option("path", dir)
      .option("maxInstantsPerTrigger", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches == 3, // ceil(5 / 2)
      s"a 2-instant throttle over a 5-commit backlog must take 3 batches: $batches")
    assert(spark.read.parquet(outDir).count() == 5)

    // restart against the same checkpoint: only NEW commits flow — the
    // throttle's advertised watermark must recover from the checkpoint,
    // not re-serve the origin (a re-serve would land duplicate ids below)
    tbl.upsert(Seq((6L, "v6", 6L)).toDF("id", "v", "ts"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val all = spark.read.parquet(outDir).select("id").as[Long]
      .collect().sorted.toSeq
    assert(all == (1L to 6L),
      s"restart must resume past the checkpoint exactly once, got $all")

    // a bad throttle value fails loudly at source construction
    val e = intercept[Exception] {
      spark.readStream.format(classOf[GraftStreamProvider].getName)
        .option("path", dir).option("maxInstantsPerTrigger", "0").load()
        .writeStream.format("memory").queryName("thr_c")
        .outputMode("append").option("checkpointLocation", tmp()).start()
        .processAllAvailable()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("maxInstantsPerTrigger"), chain(e))
  }

  test("stream source CDC mode: micro-batches carry I/U/D operations") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("cdcsrc"))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))

    val stream = spark.readStream
      .format(classOf[GraftStreamProvider].getName)
      .option("path", dir)
      .option("query.type", "cdc")
      .load()
    assert(stream.columns.contains("_g_operation"), stream.columns.mkString(","))
    val q = stream.writeStream.format("memory").queryName("graft_cdc")
      .outputMode("append")
      .option("checkpointLocation", tmp())
      .start()
    q.processAllAvailable()
    // the opening batch (from table origin) tags everything as inserts
    val ops1 = spark.table("graft_cdc").select("id", "_g_operation")
      .as[(Long, String)].collect().sorted
    assert(ops1.toSeq == Seq((1L, "I"), (2L, "I")), ops1.mkString(","))

    tbl.upsert(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ts"))
    tbl.delete(Seq(Tuple1(1L)).toDF("id"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("graft_cdc").select("id", "_g_operation")
      .as[(Long, String)].collect().sorted
    assert(all.toSeq == Seq((1L, "D"), (1L, "I"), (2L, "I"), (2L, "U"), (3L, "I")),
      all.mkString(","))
  }

  test("stream source rejects an unknown query.type instead of silently ignoring it") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("qtcheck"))
    tbl.bulkInsert(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    val e = intercept[Exception] {
      spark.readStream.format(classOf[GraftStreamProvider].getName)
        .option("path", dir).option("query.type", "CDC").load()
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage + Option(t.getCause).map(rootMsg).getOrElse(""))
    assert(rootMsg(e).contains("unknown streaming query.type"), rootMsg(e))
  }

  test("continuous ingest: checkpoint-in-commit recovery, parquet dir source") {
    import spark.implicits._
    val dir = tmp()
    val srcDir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("ingest"))
    val ingest = new ContinuousIngest(tbl, new ParquetDirSource(spark, srcDir),
      transform = df => df.withColumn("v", upper(col("v"))))

    // round 1: two files land
    Seq((1L, "a", 1L)).toDF("id", "v", "ts")
      .write.parquet(s"$srcDir/f1.parquet.dir") // dir won't match *.parquet filter
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/stage")
    val fs = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val staged = fs.globStatus(new org.apache.hadoop.fs.Path(s"$srcDir/stage/part-*")).head.getPath
    fs.rename(staged, new org.apache.hadoop.fs.Path(s"$srcDir/000001.parquet"))

    assert(ingest.syncOnce().isDefined)
    assert(ingest.checkpoint.contains(s"file:$srcDir/000001.parquet")
      || ingest.checkpoint.contains(s"$srcDir/000001.parquet"))
    assert(ingest.syncOnce().isEmpty) // caught up

    // round 2: another file; transform applied; checkpoint advances
    Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/stage")
    val staged2 = fs.globStatus(new org.apache.hadoop.fs.Path(s"$srcDir/stage/part-*")).head.getPath
    fs.rename(staged2, new org.apache.hadoop.fs.Path(s"$srcDir/000002.parquet"))
    assert(ingest.syncOnce().isDefined)

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "A", 1L), (2L, "B2", 2L), (3L, "C", 2L)))
  }

  test("writeStream.format(graft): first batch creates the table; restart replays idempotently") {
    import spark.implicits._
    val dir = tmp()
    val ckpt = tmp() + "/ckpt"
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    def start() = mem.toDF().toDF("id", "v", "ts")
      .writeStream.format("graft")
      .option("path", dir)
      .option("key.fields", "id")
      .option("ordering.field", "ts")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    mem.addData((1L, "a", 1L), (2L, "a", 1L))
    q1.processAllAvailable()
    mem.addData((2L, "b", 2L), (3L, "b", 2L))
    q1.processAllAvailable()
    q1.stop()

    val tbl = GraftTable.load(spark, dir)
    val r = GraftReader(tbl)
    def state(): Seq[(Long, String)] =
      r.dataOnly(r.snapshot()).select("id", "v").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
    assert(state() == Seq((1L, "a"), (2L, "b"), (3L, "b")))
    val commitsBefore = tbl.timeline.completed().size

    // restart from the same checkpoint: the unacknowledged tail may be
    // replayed; table state and commit count must not change for
    // already-committed batches, and new data still lands
    val q2 = start()
    mem.addData((4L, "c", 3L))
    q2.processAllAvailable()
    q2.stop()
    assert(state() == Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c")))
    assert(tbl.timeline.completed().size == commitsBefore + 1,
      "exactly one new commit for the new batch; replays skipped")
  }

  test("watermarked windowed aggregation over the graft stream source") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg("wm"))
    def batch(rows: (Long, String, Long)*) =
      rows.toDF("id", "v", "ts")
        .withColumn("event_time", timestamp_seconds(col("ts")))

    tbl.bulkInsert(batch((1L, "a", 100L), (2L, "a", 130L), (3L, "a", 200L)))
    val sinkName = s"wm_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // standard Structured Streaming late-data handling composes directly
    // on the source: watermark on an event-time column, tumbling window,
    // append mode emits a window only once the watermark passes it
    val q = spark.readStream
      .format(classOf[GraftStreamProvider].getName)
      .option("path", dir)
      .load()
      .withWatermark("event_time", "30 seconds")
      .groupBy(window(col("event_time"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("n"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmp() + "/ckpt")
      .start()
    q.processAllAvailable()
    // watermark = 200 - 30 = 170: append mode emits a window once the
    // watermark passes its END — [60,120) closes; [120,180) (end 180)
    // and [180,240) stay open
    val after1 = spark.table(sinkName).as[(Long, Long)].collect().sortBy(_._1)
    assert(after1.toSeq == Seq((60L, 1L)),
      s"only fully-passed windows emit: ${after1.toSeq}")

    // a LATE row whose whole window is below the watermark (ts=70 →
    // [60,120), end 120 ≤ 170) must be DROPPED — its window already
    // emitted; ts=290 advances the watermark to 260, closing
    // [120,180) and [180,240)
    tbl.upsert(batch((4L, "late", 70L), (5L, "b", 290L)))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.table(sinkName).as[(Long, Long)].collect().sortBy(_._1)
    assert(after2.toSeq == Seq((60L, 1L), (120L, 1L), (180L, 1L)),
      s"late row dropped, closed windows emitted without it: ${after2.toSeq}")
  }

  test("graft-to-graft incremental chaining (table as ingest source)") {
    import spark.implicits._
    val upstream = tmp(); val downstream = tmp()
    val up = GraftTable.create(spark, upstream, cfg("up"))
    val down = GraftTable.create(spark, downstream, cfg("down"))
    up.bulkInsert(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))

    val ingest = new ContinuousIngest(down,
      new GraftIncrSource(spark, upstream),
      transform = df => df.drop(graft.write.Meta.all: _*))
    assert(ingest.syncOnce().isDefined)
    assert(ingest.syncOnce().isEmpty)

    up.upsert(Seq((1L, "a2", 2L), (2L, "b", 2L)).toDF("id", "v", "ts"))
    assert(ingest.syncOnce().isDefined)

    val r = GraftReader(down)
    val got = r.dataOnly(r.snapshot()).as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a2", 2L), (2L, "b", 2L)))
  }

  test("incr-source pacing: maxInstantsPerFetch catches up one commit per round") {
    import spark.implicits._
    val upstream = tmp(); val downstream = tmp()
    val up = GraftTable.create(spark, upstream, cfg("upp"))
    val down = GraftTable.create(spark, downstream, cfg("downp"))
    // a 4-commit backlog on the source before the first sync
    up.bulkInsert(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    (2 to 4).foreach { i =>
      up.upsert(Seq((i.toLong, s"v$i", i.toLong)).toDF("id", "v", "ts"))
    }
    val ingest = new ContinuousIngest(down,
      new GraftIncrSource(spark, upstream, maxInstantsPerFetch = Some(1)),
      transform = df => df.drop(graft.write.Meta.all: _*))
    // one source commit per round: exactly 4 syncs land data, the 5th
    // reports caught-up; every row arrives exactly once
    val landed = (1 to 5).map(_ => ingest.syncOnce().isDefined)
    assert(landed == Seq(true, true, true, true, false),
      s"1-instant pacing over a 4-commit backlog must take 4 rounds: $landed")
    val r = GraftReader(down)
    val got = r.dataOnly(r.snapshot()).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException] {
      new GraftIncrSource(spark, upstream, maxInstantsPerFetch = Some(0))
    }
  }

  test("streaming sink refuses to start without an explicit idempotency scope") {
    // session-conf checkpoint defaults never reach sink options, so two
    // queries on one table would share a per-path fallback scope and the
    // second query's early batches would be "replays" — the sink must
    // demand an explicit checkpointLocation/query.id instead
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val err = intercept[IllegalArgumentException] {
      mem.toDF().toDF("id", "v", "ts")
        .writeStream.format("graft")
        .option("path", tmp())
        .option("key.fields", "id")
        .option("ordering.field", "ts")
        .outputMode("append")
        .start()
    }
    assert(err.getMessage.contains("idempotency"), err.getMessage)
  }
}
