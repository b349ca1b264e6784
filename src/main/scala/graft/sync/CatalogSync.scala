package graft.sync

import org.apache.spark.sql.SparkSession

import graft.core.TableType
import graft.write.GraftTable

/** Catalog synchronization tool (reference analog:
  * hudi-sync/hudi-hive-sync/.../HiveSyncTool.java:65-280): registers a
  * graft table under a name in the Spark catalog so engine-agnostic SQL
  * finds it, and for MOR tables registers the `_ro` / `_rt` pair —
  * read-optimized and real-time views — exactly as the reference
  * registers two hive tables per MOR table.
  *
  * Schema staleness, the reference sync tool's main job, is a non-issue
  * here by construction: the registered relation resolves the LIVE table
  * schema on every access (GraftDataSource ignores the stored schema
  * unless the table has no commits), so `sync` only has to converge the
  * registration itself. With a persistent metastore (Hive support) the
  * registration survives the session and a FRESH session discovers the
  * table; with the default in-memory catalog it lives for the session —
  * the same split as the reference's HMS-vs-embedded deployment modes. */
class CatalogSyncTool(
    spark: SparkSession,
    basePath: String,
    database: String = "default") {

  /** Ensure the catalog entries for the table exist and point at
    * `basePath`; returns the registered (qualified) table names.
    * Idempotent; re-registers when the path moved. */
  def sync(tableName: String): Seq[String] = {
    val table = GraftTable.load(spark, basePath)
    val views: Seq[(String, String)] =
      if (table.config.tableType == TableType.MOR)
        Seq(s"${tableName}_ro" -> "read_optimized", s"${tableName}_rt" -> "snapshot")
      else Seq(tableName -> "snapshot")
    if (database != "default")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    views.map { case (name, queryType) =>
      val qualified = s"$database.$name"
      if (needsRegistration(qualified)) {
        spark.sql(s"DROP TABLE IF EXISTS `$database`.`$name`")
        spark.catalog.createTable(qualified, "graft",
          Map("path" -> basePath, "query.type" -> queryType))
      }
      qualified
    }
  }

  /** Missing, or present but pointing somewhere else (table moved). */
  private def needsRegistration(qualified: String): Boolean = {
    if (!spark.catalog.tableExists(qualified)) return true
    val parts = qualified.split('.')
    val ti = org.apache.spark.sql.catalyst.TableIdentifier(parts(1), Some(parts(0)))
    val meta = spark.sessionState.catalog.getTableMetadata(ti)
    !meta.provider.exists(_.equalsIgnoreCase("graft")) ||
      !meta.storage.properties.get("path").contains(basePath)
  }
}

object CatalogSyncTool {
  def apply(spark: SparkSession, basePath: String,
      database: String = "default"): CatalogSyncTool =
    new CatalogSyncTool(spark, basePath, database)
}
