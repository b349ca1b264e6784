package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** virtualKeys (reference analog: hoodie.populate.meta.fields=false,
  * HoodieTableConfig.java:159): data files store ZERO engine meta
  * columns. Key, partition path, commit time, and file id are derived at
  * read from the key-generator expressions and commit metadata. Contract
  * is the reference's: append-only/immutable COW; upsert, delete, and
  * incremental/CDC refuse loudly. */
class VirtualKeysSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-vk").toString

  def cfg(extra: TableConfig => TableConfig = identity): TableConfig =
    extra(TableConfig(
      name = "vk", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "",
      targetFileRows = 1000, virtualKeys = true))

  def rows(lo: Int, n: Int): DataFrame = {
    import spark.implicits._
    (lo until lo + n).map(i => (i.toLong, if (i % 2 == 0) "x" else "y", i * 3L))
      .toDF("id", "p", "v")
  }

  def allFiles(tbl: GraftTable): Seq[String] =
    Snapshot.resolve(tbl.timeline).slices.flatMap(_.allFiles).map(tbl.absPath)

  test("files store only data columns; reads derive every meta column") {
    val tbl = GraftTable.create(spark, tmp(), cfg())
    tbl.bulkInsert(rows(0, 40))
    tbl.insert(rows(40, 10))
    for (f <- allFiles(tbl)) {
      val stored = spark.read.parquet(f).schema.fieldNames.toSet
      assert(stored == Set("id", "p", "v"),
        s"expected pure data columns in $f, got $stored")
    }
    val r = GraftReader(tbl)
    val snap = r.snapshot()
    // meta columns exist in the logical view with correct derivations
    import graft.write.Meta
    val one = snap.filter(col("id") === 6)
      .select(Meta.Key, Meta.Partition, "v").collect().head
    assert(one.getString(0) == "6" && one.getString(1) == "x" && one.getLong(2) == 18)
    assert(r.dataOnly(snap).count() == 50)
    // commit time stamps per file: every stamped value is a real
    // timeline instant (the insert's small-file fill rewrote the bulk
    // groups, so all rows legitimately carry the fill commit)
    val instants = tbl.timeline.completed().map(_.time).toSet
    val stamped = snap.select(Meta.CommitTime).distinct()
      .collect().map(_.getString(0)).toSet
    assert(stamped.nonEmpty && stamped.subsetOf(instants),
      s"stamped $stamped not within timeline $instants")
    // point lookup and filterExists ride the derived key
    assert(r.pointLookup(Seq("41")).count() == 1)
    assert(r.filterExists(rows(45, 10)).count() == 5)
  }

  test("time travel and snapshot stay exact across appends") {
    val tbl = GraftTable.create(spark, tmp(), cfg())
    val t1 = tbl.bulkInsert(rows(0, 20))
    tbl.bulkInsert(rows(20, 20))
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot(asOf = Some(t1))).count() == 20)
    assert(r.dataOnly(r.snapshot()).count() == 40)
  }

  test("composes with dropPartitionColumns: files shed partition fields too") {
    val tbl = GraftTable.create(spark, tmp(),
      cfg(_.copy(dropPartitionColumns = true, hiveStylePartitioning = true)))
    tbl.bulkInsert(rows(0, 40))
    for (f <- allFiles(tbl)) {
      val stored = spark.read.parquet(f).schema.fieldNames.toSet
      assert(stored == Set("id", "v"), s"expected id,v only in $f, got $stored")
    }
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).groupBy("p").count()
      .orderBy("p").collect().map(x => (x.getString(0), x.getLong(1)))
    assert(got.toSeq == Seq(("x", 20L), ("y", 20L)))
    // partition predicate prunes through the declared partition schema
    assert(r.dataOnly(r.snapshot()).filter(col("p") === "x").count() == 20)
  }

  test("mutation and lineage APIs refuse loudly; config combos validated") {
    val tbl = GraftTable.create(spark, tmp(), cfg())
    val t1 = tbl.bulkInsert(rows(0, 10))
    val r = GraftReader(tbl)
    assert(intercept[IllegalArgumentException](
      tbl.upsert(rows(0, 5))).getMessage.contains("append-only"))
    assert(intercept[IllegalArgumentException](
      tbl.delete(rows(0, 2).select("id", "p"))).getMessage.contains("append-only"))
    assert(intercept[IllegalArgumentException](
      r.incremental(t1)).getMessage.contains("not functional"))
    assert(intercept[IllegalArgumentException](
      r.incrementalCdc(t1)).getMessage.contains("not functional"))
    intercept[IllegalArgumentException](GraftTable.create(spark, tmp(),
      cfg(_.copy(tableType = TableType.MOR))))
    intercept[IllegalArgumentException](GraftTable.create(spark, tmp(),
      cfg(_.copy(bloomIndex = true))))
    // append-style maintenance still works: insert_overwrite of a partition
    tbl.insertOverwrite(rows(0, 10).filter(col("p") === "x")
      .withColumn("v", col("v") + 100))
    assert(r.dataOnly(r.snapshot()).filter(col("p") === "x")
      .agg(min("v")).head().getLong(0) >= 100)
  }
}
