package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core._
import graft.read.GraftReader
import graft.write.{GraftTable, Meta}

class TableSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  def tmp(): String = Files.createTempDirectory("graft-test").toString

  def orders: DataFrame = spark.read.parquet(s"$sf/orders.parquet")

  /** batch1: keys with k%4 in {0,1,2}; batch2: k%4 in {2,3}, price+1000 */
  def batch1: DataFrame = orders.filter(col("o_orderkey") % 4 < 3)
  def batch2: DataFrame = orders.filter(col("o_orderkey") % 4 >= 2)
    .withColumn("o_totalprice", col("o_totalprice") + 1000)

  /** expected state after bulkInsert(batch1) + upsert(batch2) */
  def expectedMerged: DataFrame = orders.withColumn("o_totalprice",
    when(col("o_orderkey") % 4 >= 2, col("o_totalprice") + 1000)
      .otherwise(col("o_totalprice")))

  def assertSameRows(got: DataFrame, want: DataFrame, hint: String): Unit = {
    val g = got.select(want.columns.map(col): _*)
    val extra = g.exceptAll(want).count()
    val missing = want.exceptAll(g).count()
    assert(extra == 0 && missing == 0,
      s"$hint: extra=$extra missing=$missing (got=${g.count()}, want=${want.count()})")
  }

  def cfg(tt: String): TableConfig = TableConfig(
    name = "orders", tableType = tt, keyFields = Seq("o_orderkey"),
    partitionFields = Seq("o_orderpriority"), orderingField = "o_orderdate",
    targetFileRows = 500)

  test("COW: bulk_insert + upsert + snapshot") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.COW))
    val t1 = tbl.bulkInsert(batch1)
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()), batch1, "after bulk_insert")
    val t2 = tbl.upsert(batch2)
    assert(t2 > t1)
    assertSameRows(r.dataOnly(r.snapshot()), expectedMerged, "after upsert")
    // time travel back to t1
    assertSameRows(r.dataOnly(r.snapshot(asOf = Some(t1))), batch1, "time travel t1")
    // incremental (t1, t2] = exactly the upserted records
    val inc = r.incremental(t1)
    assertSameRows(r.dataOnly(inc), batch2, "incremental t1->t2")
    // meta columns: updated rows carry t2, untouched carry t1
    val byCommit = r.snapshot().groupBy(Meta.CommitTime).count()
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(byCommit(t2) == batch2.count())
    assert(byCommit(t1) == expectedMerged.count() - batch2.count())
  }

  test("COW: delete + point lookup") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.COW))
    tbl.bulkInsert(batch1)
    val delKeys = batch1.filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_orderpriority")
    tbl.delete(delKeys)
    val r = GraftReader(tbl)
    val want = batch1.filter(col("o_orderkey") % 10 =!= 0)
    assertSameRows(r.dataOnly(r.snapshot()), want, "after delete")
    // point lookup
    val someKeys = want.limit(3).collect().map(_.getLong(0).toString).toSeq
    val found = r.pointLookup(someKeys)
    assert(found.count() == someKeys.size)
    val missing = r.pointLookup(Seq("99999999"))
    assert(missing.count() == 0)
  }

  test("COW: insert_overwrite partition + delete_partition") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.COW))
    tbl.bulkInsert(orders)
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    tbl.insertOverwrite(urgent)
    val r = GraftReader(tbl)
    val want = orders.filter(col("o_orderpriority") =!= "1-URGENT").unionByName(urgent)
    assertSameRows(r.dataOnly(r.snapshot()), want, "after insert_overwrite")
    tbl.deletePartitions(Seq("5-LOW"))
    val want2 = want.filter(col("o_orderpriority") =!= "5-LOW")
    assertSameRows(r.dataOnly(r.snapshot()), want2, "after delete_partition")
  }

  test("MOR: upsert writes deltas, snapshot merges, RO view skips them") {
    val dir = tmp()
    // smallFileRows=0: pin inserts to fresh base groups so the RO-view
    // contract below is deterministic (fill-as-delta is covered by
    // PackingPruningSpec)
    val tbl = GraftTable.create(spark, dir, cfg(TableType.MOR).copy(smallFileRows = 0))
    val t1 = tbl.bulkInsert(batch1)
    val t2 = tbl.upsert(batch2)
    val snap = Snapshot.resolve(tbl.timeline)
    assert(snap.slices.exists(_.deltas.nonEmpty), "expected delta files")
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()), expectedMerged, "MOR snapshot")
    // read-optimized = base files only: updated rows (k%4==2) show OLD
    // values, rows inserted by the upsert (k%4==3) DO appear with new
    // values (they went to new base files)
    val ro = r.dataOnly(r.readOptimized())
    val wantRo = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 4 === 3, col("o_totalprice") + 1000)
        .otherwise(col("o_totalprice")))
    assertSameRows(ro, wantRo, "MOR read-optimized")
    // incremental
    assertSameRows(r.dataOnly(r.incremental(t1)), batch2, "MOR incremental")
  }

  test("MOR: delete via tombstone delta") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.MOR))
    tbl.bulkInsert(batch1)
    tbl.delete(batch1.filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_orderpriority"))
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()),
      batch1.filter(col("o_orderkey") % 10 =!= 0), "MOR delete")
  }

  test("event_time merge: stale update does not overwrite") {
    val dir = tmp()
    val conf = cfg(TableType.COW).copy(mergeStrategy = "event_time")
    val tbl = GraftTable.create(spark, dir, conf)
    tbl.bulkInsert(batch1)
    // replay the SAME rows but with an OLDER ordering value and changed price
    val stale = batch1
      .withColumn("o_orderdate", col("o_orderdate") - expr("INTERVAL 1000 DAYS"))
      .withColumn("o_totalprice", lit(-1.0))
    tbl.upsert(stale)
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()), batch1, "stale upsert ignored")
    // equal ordering value also keeps the stored row (the >= nuance,
    // DefaultHoodieRecordPayload.java:110)
    val tie = batch1.withColumn("o_totalprice", lit(-2.0))
    tbl.upsert(tie)
    assertSameRows(r.dataOnly(r.snapshot()), batch1, "tie keeps stored")
  }

  test("non-partitioned + global-ish behavior") {
    val dir = tmp()
    val conf = TableConfig(name = "o", tableType = TableType.COW,
      keyFields = Seq("o_orderkey"), orderingField = "o_orderdate",
      targetFileRows = 500)
    val tbl = GraftTable.create(spark, dir, conf)
    tbl.bulkInsert(batch1)
    tbl.upsert(batch2)
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()), expectedMerged, "non-partitioned")
  }

  test("MOR: pure-insert and pure-update upserts (empty-branch staging)") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.MOR))
    tbl.bulkInsert(batch1)
    val r = GraftReader(tbl)
    // pure update: every key already exists -> inserts branch is empty
    val bump = batch1.withColumn("o_totalprice", col("o_totalprice") + 5)
    tbl.upsert(bump)
    assertSameRows(r.dataOnly(r.snapshot()), bump, "pure-update upsert")
    // pure insert: no key exists -> updates branch is empty
    val fresh = orders.filter(col("o_orderkey") % 4 === 3)
    tbl.upsert(fresh)
    assertSameRows(r.dataOnly(r.snapshot()), bump.unionByName(fresh), "pure-insert upsert")
  }

  test("delete with no matching keys is a no-op (COW and MOR)") {
    for (tt <- Seq(TableType.COW, TableType.MOR)) {
      val dir = tmp()
      val tbl = GraftTable.create(spark, dir, cfg(tt))
      tbl.bulkInsert(batch1)
      val ghost = spark.range(1).select(
        lit(987654321L).as("o_orderkey"), lit("1-URGENT").as("o_orderpriority"))
      tbl.delete(ghost)
      val r = GraftReader(tbl)
      assertSameRows(r.dataOnly(r.snapshot()), batch1, s"$tt no-match delete")
    }
  }

  test("numeric partition values round-trip exactly (no type inference)") {
    val dir = tmp()
    val conf = TableConfig(name = "o", tableType = TableType.COW,
      keyFields = Seq("o_orderkey"), partitionFields = Seq("o_bucket"),
      orderingField = "o_orderdate", targetFileRows = 500)
    val tbl = GraftTable.create(spark, dir, conf)
    def bucketed(df: DataFrame): DataFrame =
      df.withColumn("o_bucket", (col("o_custkey") % 5).cast("int"))
    tbl.bulkInsert(bucketed(batch1))
    tbl.upsert(bucketed(batch2))
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()), bucketed(expectedMerged), "int-partitioned table")
  }

  test("upsert row with null event time loses to stored row (event_time)") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir,
      cfg(TableType.COW).copy(mergeStrategy = "event_time"))
    tbl.bulkInsert(batch1)
    val nullTs = batch1
      .withColumn("o_orderdate", lit(null).cast("timestamp_ntz"))
      .withColumn("o_totalprice", lit(-3.0))
    tbl.upsert(nullTs)
    val r = GraftReader(tbl)
    assertSameRows(r.dataOnly(r.snapshot()), batch1, "null event time ignored")
  }

  test("re-insert after delete wins (MOR tombstone does not stick)") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.MOR))
    tbl.bulkInsert(batch1)
    val victims = batch1.filter(col("o_orderkey") % 10 === 0)
    tbl.delete(victims.select("o_orderkey", "o_orderpriority"))
    val revived = victims.withColumn("o_totalprice", col("o_totalprice") + 7)
    tbl.upsert(revived)
    val r = GraftReader(tbl)
    val want = batch1.filter(col("o_orderkey") % 10 =!= 0).unionByName(revived)
    assertSameRows(r.dataOnly(r.snapshot()), want, "re-insert after delete")
  }

  test("COW upsert with evolved schema (added column)") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.COW))
    tbl.bulkInsert(batch1)
    val widened = batch2.withColumn("o_note", concat(lit("n"), col("o_orderkey")))
    tbl.upsert(widened)
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot())
    assert(got.columns.contains("o_note"), "evolved column visible")
    val want = expectedMerged.join(
      widened.select(col("o_orderkey").as("k"), col("o_note")),
      col("o_orderkey") === col("k"), "left").drop("k")
    assertSameRows(got, want, "schema evolution upsert")
  }

  test("incremental CDC: I/U/D operations on both table types") {
    for (tt <- Seq(TableType.COW, TableType.MOR)) {
      val dir = tmp()
      val tbl = GraftTable.create(spark, dir, cfg(tt))
      val t1 = tbl.bulkInsert(batch1) // k%4 in {0,1,2}
      tbl.upsert(batch2)              // k%4 in {2,3}: 2=update, 3=insert
      val victims = orders.filter(col("o_orderkey") % 4 === 1)
      tbl.delete(victims.select("o_orderkey", "o_orderpriority"))
      val r = GraftReader(tbl)
      val cdc = r.incrementalCdc(t1)
        .select(col("o_orderkey"), col("_g_operation"))
        .collect().map(x => (x.getLong(0), x.getString(1)))
      val byOp = cdc.groupBy(_._2).view.mapValues(_.length).toMap
      val nUpd = orders.filter(col("o_orderkey") % 4 === 2).count()
      val nIns = orders.filter(col("o_orderkey") % 4 === 3).count()
      val nDel = victims.count()
      assert(byOp.getOrElse("U", 0) == nUpd, s"$tt U: $byOp")
      assert(byOp.getOrElse("I", 0) == nIns, s"$tt I: $byOp")
      assert(byOp.getOrElse("D", 0) == nDel, s"$tt D: $byOp")
      cdc.foreach { case (k, op) =>
        val expected = (k % 4) match {
          case 1 => "D"; case 2 => "U"; case 3 => "I"
          case other => fail(s"unexpected key class $other in CDC")
        }
        assert(op == expected, s"$tt key $k: got $op want $expected")
      }
    }
  }

  test("partial_update merge: null fields inherit stored values") {
    import spark.implicits._
    for (tt <- Seq(TableType.COW, TableType.MOR)) {
      val dir = tmp()
      val tbl = GraftTable.create(spark, dir, TableConfig(
        name = "pu", tableType = tt, keyFields = Seq("id"),
        orderingField = "ts", mergeStrategy = "partial_update",
        targetFileRows = 1000))
      tbl.bulkInsert(Seq((1L, Some("a"), Some(10.0), 1L), (2L, Some("b"), Some(20.0), 1L))
        .toDF("id", "v", "amount", "ts"))
      // update with null v: v must survive from storage; amount updates
      tbl.upsert(Seq((1L, Option.empty[String], Some(99.0), 2L))
        .toDF("id", "v", "amount", "ts"))
      val r = GraftReader(tbl)
      val got = r.dataOnly(r.snapshot()).as[(Long, Option[String], Option[Double], Long)]
        .collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, Some("a"), Some(99.0), 2L), (2L, Some("b"), Some(20.0), 1L)),
        s"$tt partial update")
      // delete then re-insert with nulls: dead values must NOT resurrect
      tbl.delete(Seq(Tuple1(1L)).toDF("id"))
      tbl.upsert(Seq((1L, Option.empty[String], Some(5.0), 3L)).toDF("id", "v", "amount", "ts"))
      val after = r.dataOnly(r.snapshot()).as[(Long, Option[String], Option[Double], Long)]
        .collect().sortBy(_._1)
      assert(after.toSeq == Seq((1L, None, Some(5.0), 3L), (2L, Some("b"), Some(20.0), 1L)),
        s"$tt no resurrection through tombstone")
      // compaction (MOR) keeps the merged result
      if (tt == TableType.MOR) {
        graft.services.TableServices(tbl).compact()
        val c = r.dataOnly(r.snapshot()).as[(Long, Option[String], Option[Double], Long)]
          .collect().sortBy(_._1)
        assert(c.toSeq == after.toSeq, "post-compaction stable")
      }
    }
  }

  test("filterExists keeps only new keys; deleted keys count as absent") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg(TableType.COW))
    tbl.bulkInsert(batch1) // keys with k%4 in {0,1,2}
    val r = GraftReader(tbl)
    val fresh = r.filterExists(orders)
    // only k%4==3 keys are new
    assert(fresh.filter(col("o_orderkey") % 4 =!= 3).count() == 0)
    assert(fresh.count() == orders.filter(col("o_orderkey") % 4 === 3).count())
    // deleting a key makes it "not exist" again
    val victim = orders.filter(col("o_orderkey") % 4 === 0).limit(1)
    tbl.delete(victim.select("o_orderkey", "o_orderpriority"))
    val after = r.filterExists(victim)
    assert(after.count() == 1, "deleted key should pass filterExists")
  }

  override def afterAll(): Unit = spark.stop()
}
