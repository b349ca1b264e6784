package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.services.TableServices
import graft.sql.GraftSql
import graft.write.GraftTable

class AdminSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-admin").toString

  def cfg(tt: String = TableType.COW): TableConfig = TableConfig(
    name = "t", tableType = tt, keyFields = Seq("id"),
    orderingField = "ts", targetFileRows = 1000)

  def rows(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"v$i", 1L)).toDF("id", "v", "ts")
  }

  test("SHOW COMMITS / FSVIEW account for writes and deltas") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.MOR))
    tbl.bulkInsert(rows(1L to 100L: _*))
    tbl.upsert(rows(1L, 2L, 3L))
    val commits = GraftSql.sql(spark, s"SHOW COMMITS '$dir'")
      .select("action", "rows").as[(String, Long)].collect().toSeq
    assert(commits == Seq(("commit", 100L), ("deltacommit", 3L)))
    val fsview = GraftSql.sql(spark, s"SHOW FSVIEW '$dir'")
    assert(fsview.agg(org.apache.spark.sql.functions.sum("base_rows"))
      .head().getLong(0) == 100L)
    assert(fsview.agg(org.apache.spark.sql.functions.sum("delta_rows"))
      .head().getLong(0) == 3L)
  }

  test("SHOW WRITE AMPLIFICATION: exact factor for upserts, null for loads") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    tbl.bulkInsert(rows(1L to 100L: _*))
    // COW upsert of 5 keys rewrites the single 100-row group → WA = 20
    tbl.upsert(rows(1L, 2L, 3L, 4L, 5L))
    val wa = GraftSql.sql(spark, s"SHOW WRITE AMPLIFICATION '$dir'")
      .select("operation", "rows_written", "incoming_rows", "wa")
      .collect()
    val byOp = wa.map(r => (r.getString(0),
      (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(byOp("bulk_insert") == ((100L, -1L, -1.0)),
      "bulk load has no incoming accounting — wa must be null, not guessed")
    assert(byOp("upsert") == ((100L, 5L, 20.0)), s"got ${byOp("upsert")}")
    assert(byOp("") == ((100L, 5L, 20.0)), "total row aggregates known commits")
    // intra-batch duplicate keys: incoming_rows is the RAW batch size
    // (reference denominator, StatsCommand.java:58 "records upserted"),
    // not the post-precombine count
    tbl.upsert(rows(7L, 7L, 7L, 8L))
    val last = GraftSql.sql(spark, s"SHOW WRITE AMPLIFICATION '$dir'")
      .select("instant", "operation", "incoming_rows")
      .collect().filter(r => r.getString(1) == "upsert")
      .maxBy(_.getString(0))
    assert(last.getLong(2) == 4L,
      s"incoming_rows must count pre-dedup rows: got ${last.getLong(2)}")
  }

  test("REPAIR DEDUPLICATE rewrites only duplicate-bearing groups") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 1000))
    def part(p: String, ids: Seq[Long], ts: Long): DataFrame =
      ids.map(i => (i, p, s"v$i@$ts", ts)).toDF("id", "p", "v", "ts")
    tbl.bulkInsert(part("a", 1L to 50L, 1L).unionByName(part("b", 1L to 50L, 1L)))
    // bulk_insert skips the tag join → re-ingesting keys 1..10 of 'a'
    // plants duplicates; partition 'b' stays clean
    tbl.bulkInsert(part("a", 1L to 10L, 2L))
    val r = graft.read.GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 110, "precondition: dups visible")
    val cleanGroups = Snapshot.resolve(tbl.timeline).slices
      .filter(_.partition == "b").map(_.fileId).toSet

    // dry run: counts, no commit
    val dry = GraftSql.sql(spark,
      s"REPAIR DEDUPLICATE '$dir' DRY RUN").collect().head
    assert(dry.getLong(0) == 10 && dry.getString(2).isEmpty)
    assert(r.dataOnly(r.snapshot()).count() == 110)

    val res = GraftSql.sql(spark, s"REPAIR DEDUPLICATE '$dir'").collect().head
    assert(res.getLong(0) == 10, s"surplus: ${res.getLong(0)}")
    val after = r.dataOnly(r.snapshot())
    assert(after.count() == 100)
    // merge semantics: the later-ordered (ts=2) row won for repaired keys
    assert(after.filter($"p" === "a" && $"id" === 3).select("v")
      .head().getString(0) == "v3@2")
    // untouched partition keeps its original file groups (no blind rewrite)
    val bAfter = Snapshot.resolve(tbl.timeline).slices
      .filter(_.partition == "b").map(_.fileId).toSet
    assert(bAfter == cleanGroups, "clean groups were rewritten")
    // idempotent: second repair finds nothing
    val again = GraftSql.sql(spark, s"REPAIR DEDUPLICATE '$dir'").collect().head
    assert(again.getLong(0) == 0 && again.getString(2).isEmpty)
  }

  test("REPAIR DEDUPLICATE preserves durable delete markers (CDC history)") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 1000))
    def part(ids: Seq[Long], ts: Long): DataFrame =
      ids.map(i => (i, "a", s"v$i@$ts", ts)).toDF("id", "p", "v", "ts")
    val t0 = tbl.bulkInsert(part(1L to 20L, 1L))
    // durable tombstone for key 5 lands in the group's rewrite
    tbl.delete(Seq((5L, "a")).toDF("id", "p"))
    // duplicate keys 1..3 via a second bulk load, then repair
    tbl.bulkInsert(part(1L to 3L, 2L))
    val res = GraftSql.sql(spark, s"REPAIR DEDUPLICATE '$dir'").collect().head
    assert(res.getLong(0) == 3)
    val r = graft.read.GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 19, "key 5 stays deleted")
    // the rewritten group still carries key 5's delete marker: a CDC
    // window over the whole history must emit its D operation
    val ops = r.incrementalCdc(begin = "")
      .select("id", "_g_operation").as[(Long, String)]
      .collect().toMap
    assert(ops.get(5L).contains("D"),
      s"delete marker lost by repair — CDC ops for key 5: ${ops.get(5L)}")
  }

  test("SHOW SAVEPOINTS / ROLLBACKS / CLEANS reflect service history") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    val t1 = tbl.bulkInsert(rows(1L, 2L))
    tbl.upsert(rows(3L))
    val t3 = tbl.upsert(rows(4L))
    val svc = TableServices(tbl)
    svc.savepoint(t1)
    svc.rollback(t3)
    tbl.upsert(rows(5L))
    svc.clean(retainCommits = 1)
    assert(GraftSql.sql(spark, s"SHOW SAVEPOINTS '$dir'")
      .select("pinned_instant").as[String].collect().toSeq == Seq(t1))
    assert(GraftSql.sql(spark, s"SHOW ROLLBACKS '$dir'")
      .select("target_instant").as[String].collect().toSeq == Seq(t3))
    val cleans = GraftSql.sql(spark, s"SHOW CLEANS '$dir'")
      .select("files_deleted").as[Long].collect().toSeq
    assert(cleans.nonEmpty && cleans.forall(_ >= 0))
  }

  test("SHOW ARCHIVED COMMITS reads the cold timeline") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    (1L to 8L).foreach(i => tbl.upsert(rows(i)))
    TableServices(tbl).archive(keepMin = 2, keepMax = 3)
    import spark.implicits._
    val archived = GraftSql.sql(spark, s"SHOW ARCHIVED COMMITS '$dir'")
      .select("action").as[String].collect()
    assert(archived.nonEmpty && archived.forall(_ == "commit"))
    // active + archived = all 8 writes
    val active = GraftSql.sql(spark, s"SHOW COMMITS '$dir'").count()
    assert(active + archived.length == 8)
  }

  test("EXPORT TABLE writes plain files readable outside the engine") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 1000))
    spark.range(0).toDF() // touch implicits
    val df = Seq((1L, "x", 1L, "a"), (2L, "y", 1L, "b"), (3L, "z", 1L, "a"))
      .toDF("id", "v", "ts", "p")
    tbl.bulkInsert(df)
    tbl.delete(Seq((2L, "b")).toDF("id", "p"))
    val out = tmp() + "/export"
    val n = GraftSql.sql(spark,
      s"EXPORT TABLE '$dir' TO '$out' FORMAT json")
      .select("rows_exported").as[String].head().toLong
    assert(n == 2)
    val back = spark.read.json(out)
    assert(back.count() == 2)
    // partition layout preserved, meta columns stripped
    assert(back.columns.toSet.contains("p"))
    assert(!back.columns.exists(_.startsWith("_g_")))
    assert(new java.io.File(s"$out/p=a").exists())
  }

  test("COPY TABLE backs up a snapshot as a fully functional graft table") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.MOR).copy(bloomIndex = true))
    tbl.bulkInsert(rows(1L to 50L: _*))
    tbl.upsert(rows(1L, 2L))            // MOR deltas in the live slice
    val tCut = tbl.timeline.completed().last.time
    tbl.upsert(rows(60L))               // after the cut: must NOT be copied
    val dest = tmp() + "/backup"
    GraftSql.sql(spark, s"COPY TABLE '$dir' TO '$dest' AS OF '$tCut'")
    val copy = GraftTable.load(spark, dest)
    val r = graft.read.GraftReader(copy)
    assert(r.dataOnly(r.snapshot()).select("id").as[Long].collect().sorted.toSeq ==
      (1L to 50L))
    // the copy is independently writable with full merge semantics
    copy.upsert(rows(51L))
    copy.delete(Seq(Tuple1(1L)).toDF("id"))
    assert(r.dataOnly(r.snapshot()).select("id").as[Long].collect().sorted.toSeq ==
      (2L to 51L))
    // the source is untouched
    val rs = graft.read.GraftReader(tbl)
    assert(rs.dataOnly(rs.snapshot()).count() == 51) // 50 + key 60
  }
}
