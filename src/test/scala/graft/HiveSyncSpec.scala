package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.sync.CatalogSyncTool
import graft.write.GraftTable

/** Cross-process catalog persistence (reference analog:
  * HiveSyncTool.java:114 syncing into a persistent Hive metastore): with
  * Hive support and an embedded Derby warehouse, a table registered by
  * CatalogSyncTool must be REDISCOVERED by a completely fresh
  * SparkSession — the deployment mode where engine-agnostic SQL clients
  * find graft tables without re-running sync. */
class HiveSyncSpec extends AnyFunSuite {

  private def derbyShutdown(): Unit = {
    try java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
    catch { case _: java.sql.SQLException => () } // XJ015 = normal shutdown
    // engine shutdown deregisters the embedded JDBC driver; reload it so
    // the next session's metastore client can boot the same database
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      .getDeclaredConstructor().newInstance()
  }

  private def freshStop(s: SparkSession): Unit = {
    s.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // unboot the embedded Derby engine so the NEXT session's metastore
    // client can boot the same database directory cleanly (one JVM)
    derbyShutdown()
  }

  test("synced tables are rediscovered by a fresh session via the Hive metastore") {
    // make sure no earlier suite's in-memory-catalog session lingers
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val base = Files.createTempDirectory("graft-hive").toString
    def newSession(): SparkSession = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .config("spark.ui.enabled", "false"))
      .enableHiveSupport()
      .getOrCreate()

    val dir = Files.createTempDirectory("graft-hsync").toString
    val sparkA = newSession()
    try {
      import sparkA.implicits._
      assert(sparkA.sparkContext.getConf
        .get("spark.sql.catalogImplementation", "in-memory") == "hive",
        "session A must use the Hive catalog")
      val tbl = GraftTable.create(sparkA, dir, TableConfig(
        name = "hsync", tableType = TableType.MOR, keyFields = Seq("id"),
        orderingField = "ts", targetFileRows = 1000))
      tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 1L))
        .toDF("id", "v", "ts"))
      tbl.upsert(Seq((2L, "b", 2L)).toDF("id", "v", "ts")) // delta: _rt ahead of _ro
      val names = CatalogSyncTool(sparkA, dir).sync("hsync")
      assert(names == Seq("default.hsync_ro", "default.hsync_rt"))
      assert(sparkA.sql("SELECT v FROM hsync_rt WHERE id = 2").head().getString(0) == "b")
    } finally freshStop(sparkA)

    val sparkB = newSession()
    try {
      assert(sparkB.sparkContext.getConf
        .get("spark.sql.catalogImplementation", "in-memory") == "hive",
        "session B must use the Hive catalog")
      // no sync ran in THIS session: discovery comes from the metastore
      assert(sparkB.catalog.tableExists("default.hsync_ro"), "_ro rediscovered")
      assert(sparkB.catalog.tableExists("default.hsync_rt"), "_rt rediscovered")
      assert(sparkB.sql("SELECT count(*) FROM hsync_rt").head().getLong(0) == 3L)
      assert(sparkB.sql("SELECT v FROM hsync_rt WHERE id = 2").head().getString(0) == "b",
        "_rt merges the delta in the fresh session")
      assert(sparkB.sql("SELECT v FROM hsync_ro WHERE id = 2").head().getString(0) == "a",
        "_ro reads base files only in the fresh session")
      // idempotent re-sync in the fresh session leaves the entries alone
      assert(CatalogSyncTool(sparkB, dir).sync("hsync") ==
        Seq("default.hsync_ro", "default.hsync_rt"))
    } finally freshStop(sparkB)
  }
}
