package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Action
import graft.services.TableServices
import graft.write.GraftTable

/** Thin SQL statement surface over graft tables (reference analog:
  * HoodieCommonSqlParser.scala:33 — the reference's own grammar adds
  * ONLY the compaction statements; UPDATE/DELETE/MERGE reuse Spark's
  * grammar and resolve to commands. Here the compaction DDL plus
  * path-addressed UPDATE/DELETE are parsed directly; MERGE uses the
  * builder API ([[GraftDml.merge]]), the idiomatic programmatic surface).
  *
  * Grammar (case-insensitive keywords, `'<path>'` = table base path):
  *   RUN COMPACTION ON '<path>'
  *   SCHEDULE COMPACTION ON '<path>'
  *   SHOW COMPACTION ON '<path>'
  *   RUN CLUSTERING ON '<path>' [SORT BY (col [, ...])] [LAYOUT zorder|hilbert|linear]
  *     (no SORT BY = execute scheduled plans; with SORT BY = inline run)
  *   SCHEDULE CLUSTERING ON '<path>' SORT BY (col [, ...]) [LAYOUT ...]
  *   SHOW CLUSTERING ON '<path>'
  *   UPDATE '<path>' SET col = expr [, ...] [WHERE expr]
  *   DELETE FROM '<path>' [WHERE expr]
  *   SHOW PARTITIONS '<path>'
  *   SHOW COMMITS / FSVIEW / CLEANS / SAVEPOINTS / ROLLBACKS '<path>'
  *   SHOW ARCHIVED COMMITS '<path>'
  *   SHOW CHECKPOINTS '<path>'        (snapshot-checkpoint spine: format + entries)
  *   SHOW WRITE AMPLIFICATION '<path>'
  *   SHOW COLUMN STATS '<path>'   (the data-skipping index, per file x column)
  *   CREATE SAVEPOINT ON '<path>' [AT '<instant>']   (default: latest data instant)
  *   DELETE SAVEPOINT ON '<path>' AT '<instant>'
  *   ROLLBACK COMMIT ON '<path>' AT '<instant>'       (latest completed, or a pending one)
  *   RESTORE TABLE '<path>' TO '<instant>'            (drop every later data instant)
  *   RUN CLEAN ON '<path>' [RETAIN <n>]
  *   RUN ARCHIVE ON '<path>' [KEEP <min> <max>]
  *   RUN CHECKPOINT ON '<path>'       (snapshot checkpoint now; nothing archived)
  *   RUN TTL ON '<path>' EXPIRE BELOW '<value>' [DRY RUN]  (drop partitions < value)
  *   RUN TTL ON '<path>' EXPIRE OLDER THAN <n> DAYS [DRY RUN]  (date-formatted partitions)
  *   REPAIR DEDUPLICATE '<path>' [PARTITION 'p'] [DRY RUN]
  *   EXPORT TABLE '<path>' TO '<dir>' [FORMAT fmt] [AS OF '<instant>']
  *   COPY TABLE '<path>' TO '<dir>' [AS OF '<instant>']  (backup AS a graft table)
  *   TRUNCATE TABLE '<path>'
  *   ALTER TABLE '<path>' ADD COLUMNS (name type [, ...])
  * Expressions are full Spark SQL (parsed with functions.expr).
  */
object GraftSql {

  private val RunCompaction = """(?is)\s*RUN\s+COMPACTION\s+ON\s+'([^']+)'\s*""".r
  private val ScheduleCompaction = """(?is)\s*SCHEDULE\s+COMPACTION\s+ON\s+'([^']+)'\s*""".r
  private val ShowCompaction = """(?is)\s*SHOW\s+COMPACTION\s+ON\s+'([^']+)'\s*""".r
  private val RunClustering =
    """(?is)\s*RUN\s+CLUSTERING\s+ON\s+'([^']+)'(?:\s+SORT\s+BY\s*\(([^)]+)\))?(?:\s+LAYOUT\s+(\w+))?\s*""".r
  private val ScheduleClustering =
    """(?is)\s*SCHEDULE\s+CLUSTERING\s+ON\s+'([^']+)'\s+SORT\s+BY\s*\(([^)]+)\)(?:\s+LAYOUT\s+(\w+))?\s*""".r
  private val ShowClustering = """(?is)\s*SHOW\s+CLUSTERING\s+ON\s+'([^']+)'\s*""".r
  private val Update = """(?is)\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?\s*""".r
  private val Delete = """(?is)\s*DELETE\s+FROM\s+'([^']+)'(?:\s+WHERE\s+(.+))?\s*""".r
  private val ShowPartitions = """(?is)\s*SHOW\s+PARTITIONS\s+'([^']+)'\s*""".r
  private val ShowCommits = """(?is)\s*SHOW\s+COMMITS\s+'([^']+)'\s*""".r
  private val ShowFsView = """(?is)\s*SHOW\s+FSVIEW\s+'([^']+)'\s*""".r
  private val ShowCleans = """(?is)\s*SHOW\s+CLEANS\s+'([^']+)'\s*""".r
  private val ShowSavepoints = """(?is)\s*SHOW\s+SAVEPOINTS\s+'([^']+)'\s*""".r
  private val ShowRollbacks = """(?is)\s*SHOW\s+ROLLBACKS\s+'([^']+)'\s*""".r
  private val ShowArchived = """(?is)\s*SHOW\s+ARCHIVED\s+COMMITS\s+'([^']+)'\s*""".r
  private val ShowCheckpoints = """(?is)\s*SHOW\s+CHECKPOINTS\s+'([^']+)'\s*""".r
  private val ShowWa = """(?is)\s*SHOW\s+WRITE\s+AMPLIFICATION\s+'([^']+)'\s*""".r
  private val ShowColStats =
    """(?is)\s*SHOW\s+COLUMN\s+STATS\s+'([^']+)'\s*""".r
  private val RepairDedup =
    """(?is)\s*REPAIR\s+DEDUPLICATE\s+'([^']+)'(?:\s+PARTITION\s+'([^']*)')?(\s+DRY\s+RUN)?\s*""".r
  private val ExportTable =
    """(?is)\s*EXPORT\s+TABLE\s+'([^']+)'\s+TO\s+'([^']+)'(?:\s+FORMAT\s+(\w+))?(?:\s+AS\s+OF\s+'([^']+)')?\s*""".r
  private val CopyTable =
    """(?is)\s*COPY\s+TABLE\s+'([^']+)'\s+TO\s+'([^']+)'(?:\s+AS\s+OF\s+'([^']+)')?\s*""".r
  private val Truncate = """(?is)\s*TRUNCATE\s+TABLE\s+'([^']+)'\s*""".r
  private val AlterAdd =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+COLUMNS\s*\((.+)\)\s*""".r
  private val AlterRename =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+RENAME\s+TO\s+([\w.]+)\s*""".r
  private val AlterColType =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*""".r
  private val AlterDropPartition =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+PARTITION\s*\((.+)\)\s*""".r
  private val CreateSavepoint =
    """(?is)\s*CREATE\s+SAVEPOINT\s+ON\s+'([^']+)'(?:\s+AT\s+'([^']+)')?\s*""".r
  private val DropSavepoint =
    """(?is)\s*DELETE\s+SAVEPOINT\s+ON\s+'([^']+)'\s+AT\s+'([^']+)'\s*""".r
  private val RollbackCommit =
    """(?is)\s*ROLLBACK\s+COMMIT\s+ON\s+'([^']+)'\s+AT\s+'([^']+)'\s*""".r
  private val RestoreTable =
    """(?is)\s*RESTORE\s+TABLE\s+'([^']+)'\s+TO\s+'([^']+)'\s*""".r
  private val RunClean =
    """(?is)\s*RUN\s+CLEAN\s+ON\s+'([^']+)'(?:\s+RETAIN\s+(\d+))?\s*""".r
  private val RunArchive =
    """(?is)\s*RUN\s+ARCHIVE\s+ON\s+'([^']+)'(?:\s+KEEP\s+(\d+)\s+(\d+))?\s*""".r
  private val RunTtl =
    """(?is)\s*RUN\s+TTL\s+ON\s+'([^']+)'\s+EXPIRE\s+BELOW\s+'([^']+)'(\s+DRY\s+RUN)?\s*""".r
  private val RunCheckpoint =
    """(?is)\s*RUN\s+CHECKPOINT\s+ON\s+'([^']+)'\s*""".r
  private val RunTtlDays =
    """(?is)\s*RUN\s+TTL\s+ON\s+'([^']+)'\s+EXPIRE\s+OLDER\s+THAN\s+(\d+)\s+DAYS?(\s+DRY\s+RUN)?\s*""".r

  /** True when `statement` is in the graft grammar (used by the injected
    * session-extension parser to decide interception). */
  def handles(statement: String): Boolean = statement match {
    case RunCompaction(_) | ScheduleCompaction(_) | ShowCompaction(_) |
         RunClustering(_, _, _) | ScheduleClustering(_, _, _) |
         ShowClustering(_) |
         Update(_, _, _) | Delete(_, _) | ShowPartitions(_) |
         Truncate(_) | AlterAdd(_, _) | AlterRename(_, _) |
         AlterColType(_, _, _) | AlterDropPartition(_, _) |
         ShowCommits(_) | ShowFsView(_) | ShowCleans(_) |
         ShowSavepoints(_) | ShowRollbacks(_) | ShowArchived(_) |
         ShowCheckpoints(_) |
         ShowWa(_) | ShowColStats(_) | RepairDedup(_, _, _) |
         CreateSavepoint(_, _) | DropSavepoint(_, _) |
         RollbackCommit(_, _) | RestoreTable(_, _) |
         RunClean(_, _) | RunArchive(_, _, _) | RunTtl(_, _, _) |
         RunTtlDays(_, _, _) | RunCheckpoint(_) |
         ExportTable(_, _, _, _) | CopyTable(_, _, _) => true
    case _ => false
  }

  def sql(spark: SparkSession, statement: String): DataFrame = statement match {
    case RunCompaction(path) =>
      // execute anything scheduled first; otherwise plan-and-run inline
      val svc = TableServices(GraftTable.load(spark, path))
      val pending = svc.pendingCompactions()
      val instants =
        if (pending.nonEmpty) pending.flatMap(svc.runScheduledCompaction)
        else svc.compact().toSeq
      result(spark, "instant", instants)
    case ScheduleCompaction(path) =>
      // persists a `compaction.requested` instant; rows list the plan it
      // actually PINNED (read back from the requested payload — a display
      // re-plan could diverge if the timeline moved in between)
      val tbl = GraftTable.load(spark, path)
      val pinned = TableServices(tbl).scheduleCompaction() match {
        case Some(t) =>
          val inst = graft.core.Instant(t, Action.Compaction, graft.core.State.Requested)
          tbl.timeline.metadataOf(inst).stats
            .map(s => s"${s.partition}/${s.fileId}").distinct
        case None => Nil
      }
      result(spark, "file_group", pinned)
    case ShowCompaction(path) =>
      val tl = GraftTable.load(spark, path).timeline
      val svc = TableServices(GraftTable.load(spark, path))
      result(spark, "compaction_instant",
        tl.completed().filter(_.action == Action.Compaction).map(_.time) ++
          svc.pendingCompactions().map(t => s"$t (requested)"))
    case RunClustering(path, cols, layout) =>
      // no SORT BY -> execute scheduled plans; with SORT BY -> inline
      // clustering with exactly that spec. A pending plan never silently
      // substitutes for an explicit user spec (the user would believe
      // their layout applied when the stale plan's did).
      val svc = TableServices(GraftTable.load(spark, path))
      val pending = svc.pendingClusterings()
      val instants = Option(cols) match {
        case None =>
          if (pending.isEmpty) throw new IllegalArgumentException(
            "RUN CLUSTERING without SORT BY executes scheduled plans, " +
              "but none are pending — SCHEDULE CLUSTERING first or give " +
              "SORT BY (...) to cluster inline")
          pending.flatMap(svc.runScheduledClustering)
        case Some(c) =>
          if (pending.nonEmpty) throw new IllegalStateException(
            s"scheduled clustering plan(s) pending (${pending.mkString(", ")}): " +
              "RUN CLUSTERING without SORT BY executes them; refusing to run " +
              "a different inline spec over pinned file groups")
          svc.cluster(
            sortCols = c.split(",").map(_.trim).toSeq,
            layout = Option(layout).map(_.toLowerCase).getOrElse("linear")).toSeq
      }
      result(spark, "instant", instants)
    case ScheduleClustering(path, cols, layout) =>
      val tbl = GraftTable.load(spark, path)
      val pinned = TableServices(tbl).scheduleClustering(
        sortCols = cols.split(",").map(_.trim).toSeq,
        layout = Option(layout).map(_.toLowerCase).getOrElse("linear")) match {
        case Some(t) =>
          val inst = graft.core.Instant(
            t, Action.ReplaceCommit, graft.core.State.Requested)
          tbl.timeline.metadataOf(inst).stats
            .map(s => s"${s.partition}/${s.fileId}").distinct
        case None => Nil
      }
      result(spark, "file_group", pinned)
    case ShowClustering(path) =>
      val tbl = GraftTable.load(spark, path)
      val svc = TableServices(tbl)
      val completedClusterings = tbl.timeline.completed()
        .filter(i => i.action == Action.ReplaceCommit)
        .filter(i => tbl.timeline.metadataOf(i).operation == "cluster")
        .map(_.time)
      result(spark, "clustering_instant",
        completedClusterings ++ svc.pendingClusterings().map(t => s"$t (requested)"))
    case Update(path, setClause, whereClause) =>
      val dml = GraftDml(GraftTable.load(spark, path))
      val assignments = splitTopLevel(setClause, ',').map { kv =>
        val (k, v) = splitAssignment(kv)
        k -> expr(v)
      }.toMap
      val cond = Option(whereClause).map(expr).getOrElse(lit(true))
      result(spark, "instant", dml.update(cond, assignments).toSeq)
    case Delete(path, whereClause) =>
      val dml = GraftDml(GraftTable.load(spark, path))
      val cond = Option(whereClause).map(expr).getOrElse(lit(true))
      result(spark, "instant", dml.deleteWhere(cond).toSeq)
    case ShowPartitions(path) =>
      GraftDdl.showPartitions(GraftTable.load(spark, path))
    // admin/inspection statements (hudi-cli analog; see GraftAdmin)
    case ShowCommits(path) =>
      GraftAdmin.showCommits(spark, GraftTable.load(spark, path))
    case ShowFsView(path) =>
      GraftAdmin.showFsView(spark, GraftTable.load(spark, path))
    case ShowCleans(path) =>
      GraftAdmin.showCleans(spark, GraftTable.load(spark, path))
    case ShowSavepoints(path) =>
      GraftAdmin.showSavepoints(spark, GraftTable.load(spark, path))
    case ShowRollbacks(path) =>
      GraftAdmin.showRollbacks(spark, GraftTable.load(spark, path))
    case ShowArchived(path) =>
      GraftAdmin.showArchivedCommits(spark, GraftTable.load(spark, path))
    case ShowCheckpoints(path) =>
      GraftAdmin.showCheckpoints(spark, GraftTable.load(spark, path))
    case ShowWa(path) =>
      GraftAdmin.showWriteAmplification(spark, GraftTable.load(spark, path))
    case ShowColStats(path) =>
      GraftAdmin.showColumnStats(spark, GraftTable.load(spark, path))
    case RepairDedup(path, part, dry) =>
      val (surplus, groups, instant) = GraftTable.load(spark, path)
        .repairDeduplicate(
          partitions = Option(part).map(p => Set(p)),
          dryRun = dry != null)
      import spark.implicits._
      Seq((surplus, groups, instant.getOrElse("")))
        .toDF("surplus_rows", "groups_rewritten", "instant")
    // lifecycle verbs (hudi-cli savepoint/rollback/clean analogs)
    case CreateSavepoint(path, at) =>
      val tbl = GraftTable.load(spark, path)
      val target = Option(at).getOrElse(
        tbl.timeline.completed().filter(i => Action.dataActions(i.action))
          .lastOption.map(_.time).getOrElse(throw new IllegalArgumentException(
            "CREATE SAVEPOINT: table has no completed data instant")))
      result(spark, "savepoint", Seq(TableServices(tbl).savepoint(target)))
    case DropSavepoint(path, at) =>
      val n = TableServices(GraftTable.load(spark, path)).deleteSavepoint(at)
      if (n == 0) throw new IllegalArgumentException(
        s"no savepoint at instant $at — nothing deleted")
      result(spark, "deleted_savepoint_at", Seq(at))
    case RollbackCommit(path, at) =>
      result(spark, "instant",
        Seq(TableServices(GraftTable.load(spark, path)).rollback(at)))
    case RestoreTable(path, to) =>
      result(spark, "instant",
        Seq(TableServices(GraftTable.load(spark, path)).restoreTo(to)))
    case RunClean(path, retain) =>
      val svc = TableServices(GraftTable.load(spark, path))
      val t = Option(retain).map(r => svc.clean(r.toInt)).getOrElse(svc.clean())
      result(spark, "instant", t.toSeq)
    case RunArchive(path, keepMin, keepMax) =>
      val svc = TableServices(GraftTable.load(spark, path))
      val t = (Option(keepMin), Option(keepMax)) match {
        case (Some(lo), Some(hi)) => svc.archive(lo.toInt, hi.toInt)
        case _                    => svc.archive()
      }
      result(spark, "instant", t.toSeq)
    case RunTtl(path, expireBelow, dry) =>
      val svc = TableServices(GraftTable.load(spark, path))
      val dropped =
        if (dry != null) svc.partitionTtlCandidates(expireBelow)
        else svc.partitionTtl(expireBelow).map(_._2).getOrElse(Nil)
      result(spark, "partition", dropped)
    case RunCheckpoint(path) =>
      val svc = TableServices(GraftTable.load(spark, path))
      result(spark, "instant", svc.checkpoint().toSeq)
    case RunTtlDays(path, days, dry) =>
      val svc = TableServices(GraftTable.load(spark, path))
      val dropped =
        if (dry != null) svc.partitionTtlOlderThanDaysCandidates(days.toInt)
        else svc.partitionTtlOlderThanDays(days.toInt).map(_._2).getOrElse(Nil)
      result(spark, "partition", dropped)
    case ExportTable(path, outDir, fmt, asOf) =>
      val n = GraftExporter.export(GraftTable.load(spark, path), outDir,
        format = Option(fmt).map(_.toLowerCase).getOrElse("parquet"),
        asOf = Option(asOf))
      result(spark, "rows_exported", Seq(n.toString))
    case CopyTable(path, destDir, asOf) =>
      val t = GraftExporter.copyTable(GraftTable.load(spark, path), destDir,
        asOf = Option(asOf))
      result(spark, "instant", Seq(t))
    case Truncate(path) =>
      result(spark, "instant",
        Seq(GraftDdl.truncate(GraftTable.load(spark, path))))
    case AlterAdd(path, colsDdl) =>
      val fields = org.apache.spark.sql.types.StructType.fromDDL(colsDdl).fields.toSeq
      result(spark, "instant",
        Seq(GraftDdl.addColumns(GraftTable.load(spark, path), fields)))
    case AlterRename(path, newName) =>
      result(spark, "name",
        Seq(GraftDdl.renameTable(GraftTable.load(spark, path), newName)))
    case AlterColType(path, colName, typeDdl) =>
      val dt = org.apache.spark.sql.types.StructType.fromDDL(s"x $typeDdl").fields(0).dataType
      result(spark, "instant",
        Seq(GraftDdl.changeColumnType(GraftTable.load(spark, path), colName, dt)))
    case AlterDropPartition(path, specDdl) =>
      val spec = splitTopLevel(specDdl, ',').map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"bad partition spec: $kv")
        kv.take(i).trim -> kv.drop(i + 1).trim.stripPrefix("'").stripSuffix("'")
      }.toMap
      result(spark, "instant",
        Seq(GraftDdl.dropPartition(GraftTable.load(spark, path), spec)))
    case other =>
      throw new IllegalArgumentException(s"unsupported graft statement: $other")
  }

  /** Split on `sep` outside parens/quotes (assignments may contain
    * function calls with commas). */
  private[sql] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case c if c == sep && depth == 0 && !inStr =>
        out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  private def splitAssignment(kv: String): (String, String) = {
    val i = kv.indexOf('=')
    require(i > 0, s"bad assignment: $kv")
    (kv.take(i).trim, kv.drop(i + 1).trim)
  }

  private def result(spark: SparkSession, colName: String, values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.toDF(colName)
  }
}
