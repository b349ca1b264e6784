package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, UnresolvedCatalogRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StringType

import graft.sql.GraftDml
import graft.write.GraftTable

/** Resolution rule routing Spark's OWN row-level-DML logical plans —
  * `UPDATE` / `DELETE FROM` / `MERGE INTO` parsed by Spark's grammar
  * against a catalog table `USING graft` — into [[GraftDml]] (reference
  * analog: HoodieAnalysis.scala:64-68 converting `MergeIntoTable` →
  * `MergeIntoHoodieTableCommand`). Non-graft targets pass through to
  * Spark's v2 handling untouched.
  *
  * The conversion happens during analysis, before Spark's "v2 tables
  * only" checks would reject the v1 relation. All conditions and
  * assignments are captured as [[Column]]s (name-qualified against the
  * statement's own aliases), never as live expression trees, so the
  * produced command analyzes cleanly as a leaf. */
case class GraftDmlResolution(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition) =>
      graftTarget(target) match {
        case Some((path, alias)) =>
          val tOut = outputsOf(target)
          val assigns = assignments.map(a =>
            assignName(a.key) -> rebind(a.value, tOut, alias, AttributeSet.empty, alias)).toMap
          val cond = condition
            .map(rebind(_, tOut, alias, AttributeSet.empty, alias))
            .getOrElse(org.apache.spark.sql.functions.lit(true))
          GraftUpdateCommand(path, alias, cond, assigns)
        case None => u
      }

    case d @ DeleteFromTable(target, condition) =>
      graftTarget(target) match {
        case Some((path, alias)) =>
          val tOut = outputsOf(target)
          GraftDeleteCommand(path, alias,
            rebind(condition, tOut, alias, AttributeSet.empty, alias))
        case None => d
      }

    case m @ MergeIntoTable(target, source, cond, matched, notMatched, notMatchedBySource, _) =>
      graftTarget(target) match {
        case Some((path, tAlias)) =>
          val sAlias = GraftDmlResolution.aliasOfPlan(source).getOrElse("__src")
          val wrapSource = GraftDmlResolution.aliasOfPlan(source).isEmpty
          val tOut = outputsOf(target)
          val sOut = outputsOf(source)
          def rb(e: Expression): Column = rebind(e, tOut, tAlias, sOut, sAlias)
          def rbo(e: Option[Expression]): Option[Column] = e.map(rb)
          def toAssigns(as: Seq[Assignment]): Map[String, Column] =
            as.map(a => assignName(a.key) -> rb(a.value)).toMap
          val mActs = matched.map {
            case UpdateAction(c, as, fromStar) =>
              if (fromStar || as.isEmpty) SqlMergeUpdate(rbo(c), Map.empty)
              else SqlMergeUpdate(rbo(c), toAssigns(as))
            case u: UpdateStarAction => SqlMergeUpdate(rbo(u.condition), Map.empty)
            case DeleteAction(c) => SqlMergeDelete(rbo(c))
            case other => throw new IllegalArgumentException(
              s"unsupported WHEN MATCHED action on graft table: $other")
          }
          val nActs = notMatched.map {
            case InsertAction(c, as) =>
              if (as.isEmpty) SqlMergeInsert(rbo(c), Map.empty)
              else SqlMergeInsert(rbo(c), toAssigns(as))
            case i: InsertStarAction => SqlMergeInsert(rbo(i.condition), Map.empty)
            case other => throw new IllegalArgumentException(
              s"unsupported WHEN NOT MATCHED action on graft table: $other")
          }
          // SQL semantics: NMBS clauses see no source row — a source
          // reference would otherwise surface as an opaque unresolved-
          // column error from deep inside the anti-join plan
          def checkNbsRefs(exprs: Seq[Expression]): Unit = exprs.foreach { e =>
            // source refs arrive either resolved (in sOut) or — since the
            // analyzer resolves NMBS clauses against the target only —
            // as still-unresolved source-qualified attributes
            val srcRefs = e.collect {
              case a: AttributeReference if sOut.contains(a) => a.name
              case u: UnresolvedAttribute
                if u.nameParts.length > 1 && u.nameParts.head == sAlias =>
                u.nameParts.mkString(".")
            }
            require(srcRefs.isEmpty,
              "WHEN NOT MATCHED BY SOURCE clauses may reference the target " +
                s"only; found source column(s): ${srcRefs.mkString(", ")}")
          }
          val nbActs = notMatchedBySource.map {
            case UpdateAction(c, as, fromStar) =>
              require(!fromStar && as.nonEmpty,
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE needs explicit SET " +
                  "assignments (there is no source row to star from)")
              checkNbsRefs(c.toSeq ++ as.map(_.value))
              SqlMergeNbsUpdate(rbo(c), toAssigns(as))
            case DeleteAction(c) =>
              checkNbsRefs(c.toSeq)
              SqlMergeNbsDelete(rbo(c))
            case other => throw new IllegalArgumentException(
              s"unsupported WHEN NOT MATCHED BY SOURCE action on graft table: $other")
          }
          GraftMergeCommand(path, tAlias, sAlias, wrapSource, source, rb(cond),
            mActs, nActs, nbActs)
        case None => m
      }

    case i @ InsertIntoStatement(target, partitionSpec, userCols, query, overwrite, _, _) =>
      graftTarget(target) match {
        case Some((path, _)) =>
          GraftInsertCommand(path, query, userCols,
            partitionSpec.collect { case (k, Some(v)) => k -> v }, overwrite,
            GraftDmlResolution.catalogSchema(session, target))
        case None => i
      }

    // ALTER TABLE <name> ADD COLUMNS on a graft catalog table must evolve
    // the TABLE's schema (a timeline schema commit), not just the catalog
    // entry — Spark's own command would leave the two diverged (and in
    // fact refuses unknown datasources). Matched in both shapes: the v2
    // logical plan and the v1 command ResolveSessionCatalog may already
    // have produced.
    case a @ AddColumns(
        t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, cols) =>
      GraftDmlResolution.pathOfIdent(session, t.multipartIdentifier) match {
        case Some(path) =>
          val fields = cols.map { c =>
            require(c.name.size == 1,
              "nested ADD COLUMNS is not supported on graft tables")
            org.apache.spark.sql.types.StructField(c.name.head, c.dataType, c.nullable)
          }
          GraftAddColumnsCommand(path, t.multipartIdentifier, fields)
        case None => a
      }
    case c: org.apache.spark.sql.execution.command.AlterTableAddColumnsCommand =>
      val parts = c.table.database.toSeq :+ c.table.table
      GraftDmlResolution.pathOfIdent(session, parts) match {
        case Some(path) => GraftAddColumnsCommand(path, parts, c.colsToAdd)
        case None       => c
      }

    // ALTER TABLE <name> ALTER COLUMN <c> TYPE <t>: a widening type
    // change is a timeline schema commit on graft tables (Spark's v1
    // command refuses dataType changes outright)
    case c: org.apache.spark.sql.execution.command.AlterTableChangeColumnCommand =>
      val parts = c.tableName.database.toSeq :+ c.tableName.table
      GraftDmlResolution.pathOfIdent(session, parts) match {
        case Some(path) =>
          GraftAlterColumnTypeCommand(path, parts, c.columnName, c.newColumn.dataType)
        case None => c
      }

    // ALTER TABLE <name> DROP PARTITION (...): a replacecommit on graft
    // tables (the v1 command would fail — the catalog entry declares no
    // partition columns; partitioning lives in the table format)
    case c: org.apache.spark.sql.execution.command.AlterTableDropPartitionCommand =>
      val parts = c.tableName.database.toSeq :+ c.tableName.table
      GraftDmlResolution.pathOfIdent(session, parts) match {
        case Some(path) => GraftDropPartitionCommand(path, c.specs)
        case None       => c
      }

    case p => p
  }

  private def graftTarget(plan: LogicalPlan): Option[(String, String)] =
    GraftDmlResolution.graftTarget(session, plan)

  private def outputsOf(plan: LogicalPlan): AttributeSet =
    if (plan.resolved) plan.outputSet else AttributeSet.empty

  /** Re-express a condition/assignment as a Column resolvable against
    * our aliased source⋈target frames: resolved attribute references are
    * re-qualified by which side they came from; unresolved attributes
    * keep the statement's own qualifiers (which match the same aliases). */
  private def rebind(e: Expression, tOut: AttributeSet, tAlias: String,
      sOut: AttributeSet, sAlias: String): Column =
    ExpressionUtils.column(e.transform {
      case a: AttributeReference if tOut.contains(a) =>
        UnresolvedAttribute(Seq(tAlias, a.name))
      case a: AttributeReference if sOut.contains(a) =>
        UnresolvedAttribute(Seq(sAlias, a.name))
    })

  /** Target column name of an assignment key (resolved or not). */
  private def assignName(key: Expression): String = key match {
    case a: Attribute           => a.name
    case u: UnresolvedAttribute => u.nameParts.last
    case other                  => other.sql
  }
}

private[graft] sealed trait SqlMergeAction
private[graft] case class SqlMergeUpdate(cond: Option[Column], assigns: Map[String, Column])
  extends SqlMergeAction
private[graft] case class SqlMergeDelete(cond: Option[Column]) extends SqlMergeAction
private[graft] case class SqlMergeInsert(cond: Option[Column], assigns: Map[String, Column])
  extends SqlMergeAction
private[graft] case class SqlMergeNbsUpdate(cond: Option[Column], assigns: Map[String, Column])
  extends SqlMergeAction
private[graft] case class SqlMergeNbsDelete(cond: Option[Column]) extends SqlMergeAction

/** Spark-grammar `ALTER TABLE <name> ADD COLUMNS` on a graft catalog
  * table: records the schema-evolution commit on the timeline AND keeps
  * the catalog's declared schema in step (DESCRIBE, and INSERT alignment
  * on zero-commit tables, read it). */
case class GraftAddColumnsCommand(
    path: String, ident: Seq[String],
    fields: Seq[org.apache.spark.sql.types.StructField]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput
  override def run(session: SparkSession): Seq[Row] = {
    val t = graft.sql.GraftDdl.addColumns(GraftTable.load(session, path), fields)
    val catalog = session.sessionState.catalog
    val ti = ident match {
      case Seq(tn)     => Some(org.apache.spark.sql.catalyst.TableIdentifier(tn))
      case Seq(db, tn) => Some(org.apache.spark.sql.catalyst.TableIdentifier(tn, Some(db)))
      case _           => None
    }
    ti.filter(catalog.tableExists).foreach { id =>
      val meta = catalog.getTableMetadata(id)
      val existing = meta.dataSchema.fieldNames.toSet
      val fresh = fields.filterNot(f => existing.contains(f.name))
      if (fresh.nonEmpty) catalog.alterTableDataSchema(id,
        org.apache.spark.sql.types.StructType(meta.dataSchema.fields ++ fresh))
      // drop the cached relation: its schema was fixed pre-evolution
      session.catalog.refreshTable(id.unquotedString)
    }
    Seq(Row(t))
  }
}

/** Spark-grammar `ALTER TABLE <name> ALTER COLUMN <c> TYPE <t>`:
  * records the widening-change commit and keeps the catalog schema and
  * cached relation in step. */
case class GraftAlterColumnTypeCommand(
    path: String, ident: Seq[String], column: String,
    newType: org.apache.spark.sql.types.DataType) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput
  override def run(session: SparkSession): Seq[Row] = {
    val t = graft.sql.GraftDdl.changeColumnType(
      GraftTable.load(session, path), column, newType)
    GraftDmlResolution.tableIdent(ident)
      .filter(session.sessionState.catalog.tableExists).foreach { id =>
        val catalog = session.sessionState.catalog
        val meta = catalog.getTableMetadata(id)
        catalog.alterTableDataSchema(id, org.apache.spark.sql.types.StructType(
          meta.dataSchema.fields.map(f =>
            if (f.name == column) f.copy(dataType = newType) else f)))
        session.catalog.refreshTable(id.unquotedString)
      }
    Seq(Row(t))
  }
}

/** Spark-grammar `ALTER TABLE <name> DROP PARTITION (spec)[, (spec)]`:
  * one replacecommit per spec through the table format's partition
  * model (the catalog entry declares no partition columns). */
case class GraftDropPartitionCommand(
    path: String, specs: Seq[Map[String, String]]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput
  override def run(session: SparkSession): Seq[Row] = {
    val table = GraftTable.load(session, path)
    specs.map(spec => Row(graft.sql.GraftDdl.dropPartition(table, spec))).toSeq
  }
}

case class GraftUpdateCommand(
    path: String, alias: String, cond: Column,
    assigns: Map[String, Column]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput
  override def run(session: SparkSession): Seq[Row] = {
    val dml = GraftDml(GraftTable.load(session, path))
    dml.update(cond, assigns, alias = Some(alias)).map(Row(_)).toSeq
  }
}

case class GraftDeleteCommand(
    path: String, alias: String, cond: Column) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput
  override def run(session: SparkSession): Seq[Row] = {
    val dml = GraftDml(GraftTable.load(session, path))
    dml.deleteWhere(cond, alias = Some(alias)).map(Row(_)).toSeq
  }
}

case class GraftMergeCommand(
    path: String, targetAlias: String, sourceAlias: String,
    wrapSource: Boolean, source: LogicalPlan, on: Column,
    matched: Seq[SqlMergeAction], notMatched: Seq[SqlMergeAction],
    notMatchedBySource: Seq[SqlMergeAction] = Nil)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput

  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val sourceDf0 = org.apache.spark.sql.classic.Dataset.ofRows(classic, source)
    val sourceDf = if (wrapSource) sourceDf0.alias(sourceAlias) else sourceDf0
    val table = GraftTable.load(session, path)
    val builder = GraftDml(table).mergeAliased(sourceDf, on, sourceAlias, targetAlias)
    (matched ++ notMatched ++ notMatchedBySource).foreach {
      case SqlMergeUpdate(c, as) if as.isEmpty => builder.whenMatchedUpdateAll(c)
      case SqlMergeUpdate(c, as)               => builder.whenMatchedUpdate(as, c)
      case SqlMergeDelete(c)                   => builder.whenMatchedDelete(c)
      case SqlMergeInsert(c, as) if as.isEmpty => builder.whenNotMatchedInsertAll(c)
      case SqlMergeInsert(c, as)               => builder.whenNotMatchedInsert(as, c)
      case SqlMergeNbsUpdate(c, as)            => builder.whenNotMatchedBySourceUpdate(as, c)
      case SqlMergeNbsDelete(c)                => builder.whenNotMatchedBySourceDelete(c)
    }
    builder.execute().map(Row(_)).toSeq
  }
}

/** INSERT INTO / INSERT OVERWRITE on a graft catalog table (reference
  * analog: InsertIntoHoodieTableCommand.scala:45 — positional column
  * alignment against the table's DATA columns; meta columns are stamped
  * by the write path, never supplied by the statement; static partition
  * values become constant columns). OVERWRITE replaces the partitions
  * touched by the incoming rows (insert_overwrite). */
case class GraftInsertCommand(
    path: String, query: LogicalPlan, userCols: Seq[String],
    staticPartitions: Map[String, String], overwrite: Boolean,
    declaredSchema: Option[org.apache.spark.sql.types.StructType] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDmlResolution.instantOutput

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val df0 = org.apache.spark.sql.classic.Dataset.ofRows(classic, query)
    val table = GraftTable.load(session, path)
    val reader = graft.read.GraftReader(table)
    // a freshly created (zero-commit) table has no data-derived schema
    // yet; fall back to the catalog's declared schema so the FIRST
    // INSERT INTO an empty table aligns columns instead of failing
    val snapSchema = reader.snapshot().schema
    val schema =
      if (snapSchema.nonEmpty) snapSchema
      else declaredSchema.filter(_.nonEmpty).getOrElse(snapSchema)
    val dataFields = schema.fields
      .filterNot(f => graft.write.Meta.all.contains(f.name))
      .filterNot(f => staticPartitions.contains(f.name))
    val targetNames: Seq[String] =
      if (userCols.nonEmpty) userCols else dataFields.map(_.name).toSeq
    require(df0.columns.length == targetNames.size,
      s"INSERT column arity ${df0.columns.length} != expected ${targetNames.size} " +
        s"(${targetNames.mkString(",")})")
    val typeOf = schema.fields.map(f => f.name -> f.dataType).toMap
    val positioned = df0.toDF(targetNames: _*)
      .select(targetNames.map(n => col(n).cast(typeOf(n)).as(n)): _*)
    // absent columns (shorter user list) and static partitions
    val full = dataFields.map(_.name).foldLeft(positioned) { (acc, n) =>
      if (acc.columns.contains(n)) acc else acc.withColumn(n, lit(null).cast(typeOf(n)))
    }
    val withStatic = staticPartitions.foldLeft(full) { case (acc, (k, v)) =>
      acc.withColumn(k, lit(v).cast(typeOf(k)))
    }
    // project back into the table's declared column order — the commit
    // records the written frame's schema, so a static-partition column
    // appended last must not redefine the table's positional order
    val declared = schema.fields
      .filterNot(f => graft.write.Meta.all.contains(f.name)).map(f => col(f.name))
    val ordered = withStatic.select(declared.toSeq: _*)
    val instant =
      if (overwrite) table.insertOverwrite(ordered)
      else table.insert(ordered)
    Seq(Row(instant))
  }
}

object GraftDmlResolution {

  /** (table base path, statement-visible alias) when `plan` is a graft
    * catalog relation — in any resolution state: raw
    * `UnresolvedRelation`, `UnresolvedCatalogRelation`, or the resolved
    * v1 `LogicalRelation`. */
  private[graft] def graftTarget(
      session: SparkSession, plan: LogicalPlan): Option[(String, String)] = plan match {
    case SubqueryAlias(ident, child) =>
      graftTarget(session, child).map { case (p, _) => (p, ident.name) }
    case UnresolvedRelation(parts, _, _) =>
      val catalog = session.sessionState.catalog
      val ti = parts match {
        case Seq(t)    => org.apache.spark.sql.catalyst.TableIdentifier(t)
        case Seq(d, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(d))
        case _         => return None
      }
      if (!catalog.tableExists(ti)) None
      else pathOf(catalog.getTableMetadata(ti)).map((_, parts.last))
    case UnresolvedCatalogRelation(ct, _, _) =>
      pathOf(ct).map((_, ct.identifier.table))
    case lr: LogicalRelation =>
      lr.catalogTable.flatMap(ct => pathOf(ct).map((_, ct.identifier.table)))
    case _ => None
  }

  /** Name parts → a (possibly db-qualified) v1 table identifier. */
  private[graft] def tableIdent(
      parts: Seq[String]): Option[org.apache.spark.sql.catalyst.TableIdentifier] =
    parts match {
      case Seq(t)    => Some(org.apache.spark.sql.catalyst.TableIdentifier(t))
      case Seq(d, t) => Some(org.apache.spark.sql.catalyst.TableIdentifier(t, Some(d)))
      case _         => None
    }

  /** Base path of a graft catalog table addressed by name parts. */
  private[graft] def pathOfIdent(
      session: SparkSession, parts: Seq[String]): Option[String] = {
    val catalog = session.sessionState.catalog
    tableIdent(parts)
      .filter(catalog.tableExists)
      .flatMap(ti => pathOf(catalog.getTableMetadata(ti)))
  }

  private def pathOf(ct: CatalogTable): Option[String] =
    if (!ct.provider.exists(_.equalsIgnoreCase("graft"))) None
    else ct.storage.properties.get("path")
      .orElse(ct.storage.locationUri.map(u => new org.apache.hadoop.fs.Path(u).toString))

  /** The catalog's DECLARED schema for a graft relation, in any
    * resolution state — the fallback for writes against a table with no
    * data commits yet (where the data-derived snapshot schema is empty). */
  private[graft] def catalogSchema(
      session: SparkSession, plan: LogicalPlan): Option[org.apache.spark.sql.types.StructType] =
    plan match {
      case SubqueryAlias(_, child) => catalogSchema(session, child)
      case UnresolvedRelation(parts, _, _) =>
        val catalog = session.sessionState.catalog
        val ti = parts match {
          case Seq(t)    => org.apache.spark.sql.catalyst.TableIdentifier(t)
          case Seq(d, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(d))
          case _         => return None
        }
        if (!catalog.tableExists(ti)) None else Some(catalog.getTableMetadata(ti).schema)
      case UnresolvedCatalogRelation(ct, _, _) => Some(ct.schema)
      case lr: LogicalRelation => lr.catalogTable.map(_.schema)
      case _ => None
    }

  /** Pinned-snapshot plan for `VERSION AS OF '<instant>'` /
    * `TIMESTAMP AS OF <literal>` on a graft table (reference analog:
    * the as.of.instant read option, DataSourceOptions.scala:112).
    * Invoked at PARSE time (the injected parser rewrites the travel
    * node) because Spark's own relation resolution rejects time travel
    * on v1 session-catalog tables before resolution rules run. */
  private[graft] def timeTravelPlan(
      session: SparkSession, path: String,
      ts: Option[Expression], version: Option[String]): Option[LogicalPlan] = {
    def fmt(micros: Long): String = {
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS"))
    }
    val asOf: Option[String] = version.orElse(ts.flatMap { e =>
      // parse-time literal evaluation; anything not a plain foldable
      // timestamp stays un-rewritten (Spark then reports unsupported)
      scala.util.Try {
        if (!e.foldable) None
        else e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
          case l: java.lang.Long => Some(fmt(l))
          case _                 => None
        }
      }.toOption.flatten
    })
    asOf.map { t =>
      val table = GraftTable.load(session, path)
      graft.read.GraftReader(table).snapshot(asOf = Some(t)).queryExecution.analyzed
    }
  }

  private[graft] def aliasOfPlan(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _)        => Some(ident.name)
    case UnresolvedRelation(parts, _, _) => Some(parts.last)
    case _                               => None
  }

  val instantOutput: Seq[Attribute] =
    Seq(AttributeReference("instant", StringType, nullable = true)())
}
