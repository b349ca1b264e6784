package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.services.TableServices
import graft.sync.CatalogSyncTool
import graft.write.GraftTable

/** Catalog sync tool: name registration, the MOR `_ro`/`_rt` pair, and
  * idempotent re-sync (reference analog: HiveSyncTool's table pair). */
class SyncSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-sync").toString

  test("MOR sync registers _ro/_rt; _ro lags deltas until compaction") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "mor_sync", tableType = TableType.MOR, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    tbl.upsert(Seq((2L, "b2", 2L)).toDF("id", "v", "ts"))

    val names = CatalogSyncTool(spark, dir).sync("synct")
    assert(names == Seq("default.synct_ro", "default.synct_rt"))

    def v2(table: String): String =
      spark.sql(s"SELECT v FROM $table WHERE id = 2").head().getString(0)
    assert(v2("synct_rt") == "b2", "_rt merges deltas")
    assert(v2("synct_ro") == "b", "_ro reads base files only")

    TableServices(tbl).compact()
    spark.catalog.refreshTable("synct_ro")
    spark.catalog.refreshTable("synct_rt")
    assert(v2("synct_ro") == "b2", "compaction folds the delta into _ro")

    // idempotent: second sync leaves the registrations alone
    assert(CatalogSyncTool(spark, dir).sync("synct") == names)
  }

  test("COW sync registers one name; re-sync repoints a moved table") {
    import spark.implicits._
    val dir1 = tmp()
    val t1 = GraftTable.create(spark, dir1, TableConfig(
      name = "cow_sync", tableType = TableType.COW, keyFields = Seq("id")))
    t1.bulkInsert(Seq((1L, "x")).toDF("id", "v"))
    assert(CatalogSyncTool(spark, dir1).sync("movet") == Seq("default.movet"))
    assert(spark.sql("SELECT count(*) FROM movet").head().getLong(0) == 1L)

    val dir2 = tmp()
    val t2 = GraftTable.create(spark, dir2, TableConfig(
      name = "cow_sync2", tableType = TableType.COW, keyFields = Seq("id")))
    t2.bulkInsert(Seq((1L, "y"), (2L, "z")).toDF("id", "v"))
    CatalogSyncTool(spark, dir2).sync("movet")
    assert(spark.sql("SELECT count(*) FROM movet").head().getLong(0) == 2L,
      "sync must repoint the name at the new path")
  }
}
