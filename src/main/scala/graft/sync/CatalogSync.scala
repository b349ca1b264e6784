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
      existingMeta(name) match {
        case None =>
          spark.catalog.createTable(qualified, "graft",
            Map("path" -> basePath, "query.type" -> queryType))
        case Some(meta) if !meta.provider.exists(_.equalsIgnoreCase("graft")) =>
          // dropping a foreign MANAGED table would delete its data —
          // never steal a name from a non-graft table
          throw new IllegalStateException(
            s"$qualified already exists with provider " +
              s"${meta.provider.getOrElse("<none>")}; refusing to replace " +
              "a non-graft table — drop it or pick another name")
        case Some(meta)
          if pathOf(meta).contains(basePath) &&
            meta.storage.properties.get("query.type").contains(queryType) =>
          () // converged — idempotent re-sync is a no-op
        case Some(meta) =>
          // graft table that moved (or changed view type): repoint the
          // existing entry IN PLACE — no drop/create gap for readers
          spark.sessionState.catalog.alterTable(meta.copy(storage =
            meta.storage.copy(
              locationUri = Some(new org.apache.hadoop.fs.Path(basePath).toUri),
              properties = meta.storage.properties ++
                Map("path" -> basePath, "query.type" -> queryType))))
          spark.catalog.refreshTable(qualified) // drop cached plans/relations
      }
      qualified
    }
  }

  private def existingMeta(
      name: String): Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] = {
    val ti = org.apache.spark.sql.catalyst.TableIdentifier(name, Some(database))
    if (!spark.sessionState.catalog.tableExists(ti)) None
    else Some(spark.sessionState.catalog.getTableMetadata(ti))
  }

  /** Where a catalog entry points: Spark stores the `path` option either
    * in storage.properties or (once resolved) as the locationUri — check
    * both, like the DML path resolution does. */
  private def pathOf(
      meta: org.apache.spark.sql.catalyst.catalog.CatalogTable): Option[String] =
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(u =>
        new org.apache.hadoop.fs.Path(u).toString))
}

object CatalogSyncTool {
  def apply(spark: SparkSession, basePath: String,
      database: String = "default"): CatalogSyncTool =
    new CatalogSyncTool(spark, basePath, database)
}
