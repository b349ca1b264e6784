package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Write-side schema reconciliation (reference analog:
  * hoodie.datasource.write.reconcile.schema, DataSourceOptions.scala:366,
  * and the Avro compatibility gate TableSchemaResolver.isSchemaCompatible
  * :337-345). The bug class this pins: the commit record used to carry
  * the BATCH's schema verbatim, so one narrow upsert silently dropped a
  * column from the read view of every untouched file. */
class SchemaReconcileSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-schema").toString

  private def full(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"p${i % 2}", s"a$i", s"b$i", i)).toDF("id", "p", "a", "b", "ts")
  }
  /** same rows WITHOUT column b */
  private def narrow(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"p${i % 2}", s"A$i", i + 100)).toDF("id", "p", "a", "ts")
  }

  private def cfg(tt: String, strict: Boolean = false): TableConfig = TableConfig(
    name = "sch", tableType = tt, keyFields = Seq("id"),
    partitionFields = Seq("p"), orderingField = "ts",
    strictSchema = strict)

  for (tt <- Seq(TableType.COW, TableType.MOR)) {
    test(s"[$tt] a batch missing a column must not narrow the read view") {
      val tbl = GraftTable.create(spark, tmp(), cfg(tt))
      tbl.bulkInsert(full(1, 2, 3, 4))
      tbl.upsert(narrow(3, 4, 5)) // updates 3,4; inserts 5 — all without b
      val r = GraftReader(tbl)
      val snap = r.dataOnly(r.snapshot())
      assert(snap.columns.contains("b"),
        s"column b narrowed out of the read view: ${snap.columns.mkString(",")}")
      val rows = snap.select("id", "a", "b").collect()
        .map(x => x.getLong(0) -> ((x.getString(1), if (x.isNullAt(2)) null else x.getString(2))))
        .toMap
      // untouched rows keep b; updated/inserted rows (latest-wins merge,
      // incoming record replaces the whole row) read b as null — the
      // reference's reconcile semantics, not a partial update
      assert(rows(1L) == (("a1", "b1")) && rows(2L) == (("a2", "b2")))
      assert(rows(3L) == (("A3", null)) && rows(4L) == (("A4", null)))
      assert(rows(5L) == (("A5", null)))
    }
  }

  test("MOR: reconciled view survives compaction") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.MOR))
    tbl.bulkInsert(full(1, 2, 3))
    tbl.upsert(narrow(3))
    graft.services.TableServices(tbl).compact()
    val r = GraftReader(tbl)
    val snap = r.dataOnly(r.snapshot())
    assert(snap.columns.contains("b"))
    val m = snap.select("id", "b").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(m == Map(1L -> "b1", 2L -> "b2", 3L -> null))
  }

  test("a batch with a NEW column widens the view; old rows read null") {
    import spark.implicits._
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW))
    tbl.bulkInsert(narrow(1, 2))
    // adds column b, ts newer than narrow's i+100 so the update wins
    tbl.upsert(Seq(2L, 3L).map(i => (i, s"p${i % 2}", s"a$i", s"b$i", i + 200))
      .toDF("id", "p", "a", "b", "ts"))
    val r = GraftReader(tbl)
    val snap = r.dataOnly(r.snapshot())
    val m = snap.select("id", "b").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1))).toMap
    assert(m == Map(1L -> null, 2L -> "b2", 3L -> "b3"))
  }

  test("insert small-file fill with a narrow batch keeps the column too") {
    val tbl = GraftTable.create(spark, tmp(),
      cfg(TableType.COW).copy(targetFileRows = 100))
    tbl.bulkInsert(full(1, 2))
    tbl.insert(narrow(7, 8)) // fills the existing small groups
    val r = GraftReader(tbl)
    val snap = r.dataOnly(r.snapshot())
    assert(snap.columns.contains("b"))
    assert(snap.filter(col("id") === 1 && col("b") === "b1").count() == 1)
  }

  test("strictSchema: the reference's default contract rejects the narrow write") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, strict = true))
    tbl.bulkInsert(full(1, 2))
    val e = intercept[IllegalArgumentException] { tbl.upsert(narrow(2)) }
    assert(e.getMessage.contains("missing table columns b"))
    // a full-schema write still proceeds
    tbl.upsert(full(3))
    assert(GraftReader(tbl).snapshot().count() == 3)
  }

  test("insert_overwrite_table may legitimately narrow; insert_overwrite must not") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW))
    tbl.bulkInsert(full(1, 2, 3, 4)) // partitions p0, p1
    // partition overwrite: p1 replaced with narrow rows; p0 untouched -> b stays
    tbl.insertOverwrite(narrow(5, 7)) // both p1 (odd ids)
    val r = GraftReader(tbl)
    assert(r.snapshot().columns.contains("b"))
    // whole-table overwrite: the view legitimately becomes the new shape
    tbl.insertOverwriteTable(narrow(9))
    assert(!GraftReader(tbl).snapshot().columns.contains("b"))
  }

  override def afterAll(): Unit = spark.stop()
}
