package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Catalog-shaped DDL over graft tables (reference analog: the command
  * layer — CreateHoodieTableAsSelectCommand.scala:38,
  * AlterHoodieTableAddColumnsCommand.scala:42,
  * ShowHoodieTablePartitionsCommand.scala:37,
  * TruncateHoodieTableCommand.scala:33).
  */
object GraftDdl {

  /** CTAS: create the table and load the query result in one step. */
  def createTableAs(
      spark: SparkSession, path: String, config: TableConfig,
      query: DataFrame, sortMode: String = "partition"): GraftTable = {
    val table = GraftTable.create(spark, path, config)
    table.bulkInsert(query, sortMode)
    table
  }

  /** ALTER TABLE ADD COLUMNS: a schema-evolution commit — no data moves;
    * the new schema (old + appended fields) is recorded in a data-less
    * commit and read-side projection fills the new columns with null for
    * pre-evolution files. */
  def addColumns(table: GraftTable, newCols: Seq[StructField]): String = {
    val snap = Snapshot.resolve(table.timeline)
    val current = table.readSchema(snap)
    require(current.nonEmpty, "cannot evolve an empty table (no schema yet)")
    val clash = newCols.map(_.name).toSet.intersect(current.fieldNames.toSet)
    require(clash.isEmpty, s"columns already exist: ${clash.mkString(",")}")
    val evolved = StructType(current.fields ++ newCols)
    val t = table.timeline.start(Action.Commit)
    table.timeline.complete(t, Action.Commit,
      CommitMetadata("alter_add_columns", evolved.json, Nil))
    t
  }

  /** SHOW PARTITIONS: distinct live partition paths from the snapshot —
    * pure commit-metadata, no listing. */
  def showPartitions(table: GraftTable): DataFrame = {
    import table.spark.implicits._
    Snapshot.resolve(table.timeline).slices.map(_.partition)
      .distinct.sorted.toDF("partition")
  }

  /** TRUNCATE TABLE: one replacecommit replacing every live file group
    * (files removed later by clean — same logical-delete contract as
    * delete_partition). */
  def truncate(table: GraftTable): String = {
    val snap = Snapshot.resolve(table.timeline)
    val replaced = snap.slices.groupBy(_.partition)
      .map { case (p, ss) => p -> ss.map(_.fileId).toSeq }
    val t = table.timeline.start(Action.ReplaceCommit)
    table.timeline.complete(t, Action.ReplaceCommit,
      CommitMetadata("truncate", "", Nil, replaced))
    t
  }
}
