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

  /** Zero-copy bootstrap: onboard an existing parquet directory WITHOUT
    * rewriting it (reference analog: bootstrap,
    * SparkBootstrapCommitActionExecutor.java:84). Source files become
    * external file groups — meta columns are stamped at read time, and
    * the first upsert touching a group rewrites it as a native file.
    * One stats job over the source computes per-file row counts and key
    * ranges; no data is copied.
    *
    * v1 constraint: the table must be non-partitioned (partition values
    * remain queryable as data columns) and source file basenames must
    * be unique. */
  def bootstrap(
      spark: SparkSession, path: String, config: TableConfig,
      sourceDir: String): GraftTable = {
    require(config.partitionFields.isEmpty,
      "bootstrap v1 supports non-partitioned tables (partition columns stay data columns)")
    val table = GraftTable.create(spark, path, config)
    val src = spark.read.parquet(sourceDir)
    import org.apache.spark.sql.functions._
    val keyExpr =
      if (config.keyFields.size == 1) col(config.keyFields.head).cast("string")
      else concat_ws(":", config.keyFields.map(f => col(f).cast("string")): _*)
    // one distributed stats pass, grouped by physical file
    val stats = src
      .select(input_file_name().as("_f"), keyExpr.as("_k"))
      .groupBy(col("_f"))
      .agg(count(lit(1)).as("rows"), min(col("_k")).as("minKey"), max(col("_k")).as("maxKey"))
      .collect()
    val fs = new org.apache.hadoop.fs.Path(sourceDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val basenames = stats.map(r => r.getString(0).split('/').last)
    require(basenames.distinct.length == basenames.length,
      "bootstrap requires unique source file basenames")
    val writeStats = stats.zipWithIndex.map { case (r, i) =>
      val uri = r.getString(0)
      val p = new org.apache.hadoop.fs.Path(java.net.URI.create(uri))
      graft.core.WriteStat(
        partition = "", fileId = f"boot-$i%05d", path = p.toString,
        rows = r.getLong(1), bytes = fs.getFileStatus(p).getLen,
        minKey = Option(r.getString(2)).getOrElse(""),
        maxKey = Option(r.getString(3)).getOrElse(""),
        external = true)
    }.toSeq
    val metaFields = Seq(
      StructField(graft.write.Meta.CommitTime, org.apache.spark.sql.types.StringType),
      StructField(graft.write.Meta.Seqno, org.apache.spark.sql.types.StringType),
      StructField(graft.write.Meta.Key, org.apache.spark.sql.types.StringType),
      StructField(graft.write.Meta.Partition, org.apache.spark.sql.types.StringType),
      StructField(graft.write.Meta.File, org.apache.spark.sql.types.StringType),
      StructField(graft.write.Meta.Deleted, org.apache.spark.sql.types.BooleanType))
    val schema = StructType(metaFields ++ src.schema.fields.map(_.copy(nullable = true)))
    val t = table.timeline.start(Action.Commit)
    table.timeline.complete(t, Action.Commit,
      CommitMetadata("bootstrap", schema.json, writeStats))
    table
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
