package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import graft.read.GraftReader
import graft.write.{GraftTable, Meta}

/** SQL-DML semantics over a graft table, Catalyst-native (reference
  * analog: the command layer under hudi-spark —
  * UpdateHoodieTableCommand.scala:39, DeleteHoodieTableCommand.scala:33,
  * MergeIntoHoodieTableCommand.scala:63 + ExpressionPayload.scala:56).
  *
  * Where the reference serializes Catalyst expressions into write config
  * and re-evaluates them per record over joined Avro payloads, here the
  * WHEN-clause logic IS the DataFrame plan: one action-resolution
  * projection over a source⋈target join, then the normal upsert path.
  * Whole-stage codegen covers everything; no per-record interpreter.
  */
class GraftDml(table: GraftTable) {

  private def reader = GraftReader(table)
  private def dataColumns: Seq[String] =
    reader.snapshot().columns.filterNot(Meta.all.contains).toSeq

  /** UPDATE t SET assignments WHERE condition. Only matching rows are
    * routed into the upsert (their file groups get rewritten/appended;
    * untouched groups are not read). Assignments may not target key
    * fields (reference rule: HoodieAnalysis.scala:240). */
  /** `alias` (if given) names the target relation inside `condition` /
    * `assignments` — used by the SQL path where the statement qualifies
    * columns with the table name or its AS alias. */
  def update(condition: Column, assignments: Map[String, Column],
      alias: Option[String] = None): Option[String] = {
    val bad = assignments.keySet.intersect(table.config.keyFields.toSet)
    require(bad.isEmpty, s"UPDATE may not modify key fields: ${bad.mkString(",")}")
    val cols = dataColumns
    val unknown = assignments.keySet.diff(cols.toSet)
    require(unknown.isEmpty, s"unknown columns in SET: ${unknown.mkString(",")}")
    val snap0 = reader.snapshot()
    val snap = alias.fold(snap0)(snap0.alias)
    // persisted: the filtered snapshot scan feeds both the emptiness
    // probe and the upsert — without it the scan executes twice
    val affected = reader.dataOnly(snap.filter(condition)).persist()
    try {
      if (affected.isEmpty) None
      else {
        val updated = affected.select(cols.map(c =>
          assignments.get(c).map(_.as(c)).getOrElse(col(c))): _*)
        Some(table.upsert(updated))
      }
    } finally affected.unpersist()
  }

  /** DELETE FROM t WHERE condition. */
  def deleteWhere(condition: Column, alias: Option[String] = None): Option[String] = {
    val snap0 = reader.snapshot()
    val snap = alias.fold(snap0)(snap0.alias)
    // persisted for the same double-execution reason as update()
    val affected = reader.dataOnly(snap.filter(condition)).persist()
    try {
      if (affected.isEmpty) None
      else Some(table.delete(affected))
    } finally affected.unpersist()
  }

  /** MERGE INTO t USING source ON cond — builder, Delta-style (the
    * idiomatic Spark surface for programmatic merge). Inside conditions
    * and assignments, reference the source as `s.col` and the target as
    * `t.col`. */
  def merge(source: DataFrame, on: Column): GraftMergeBuilder =
    new GraftMergeBuilder(table, reader, source.alias("s"), on)

  /** [[merge]] variant for the SQL path: `source` arrives with its own
    * qualifiers (subquery alias / view name); `sourceAlias` /
    * `targetAlias` are the names the statement's expressions use. */
  def mergeAliased(source: DataFrame, on: Column,
      sourceAlias: String, targetAlias: String): GraftMergeBuilder =
    new GraftMergeBuilder(table, reader, source, on, sourceAlias, targetAlias)
}

private[sql] sealed trait MergeAction {
  def condition: Option[Column]
}
private[sql] case class MatchedUpdate(condition: Option[Column],
    assignments: Map[String, Column]) extends MergeAction
private[sql] case class MatchedDelete(condition: Option[Column]) extends MergeAction
private[sql] case class NotMatchedInsert(condition: Option[Column],
    assignments: Map[String, Column]) extends MergeAction
private[sql] case class NotMatchedBySourceUpdate(condition: Option[Column],
    assignments: Map[String, Column]) extends MergeAction
private[sql] case class NotMatchedBySourceDelete(condition: Option[Column])
  extends MergeAction

/** WHEN-clause collection + single-commit execution.
  *
  * Semantics mirror the reference (ExpressionPayload.scala:94-205):
  * clauses are evaluated in declaration order, the FIRST matching WHEN
  * wins, rows matching no clause are untouched (matched) or dropped
  * (not matched). Updates and deletes land in ONE commit: deletes ride
  * the same upsert as tombstone rows (`_g_deleted`), exactly like the
  * reference's EmptyHoodieRecordPayload path. */
class GraftMergeBuilder(
    table: GraftTable,
    reader: => GraftReader,
    /** already carries its qualifier (the builder API pre-aliases "s") */
    source: DataFrame,
    on: Column,
    sourceAlias: String = "s",
    targetAlias: String = "t") {

  private var matchedActions: Vector[MergeAction] = Vector.empty
  private var notMatchedActions: Vector[NotMatchedInsert] = Vector.empty
  private var notMatchedBySourceActions: Vector[MergeAction] = Vector.empty

  def whenMatchedUpdate(set: Map[String, Column], condition: Option[Column] = None): this.type = {
    val bad = set.keySet.intersect(table.config.keyFields.toSet)
    require(bad.isEmpty, s"MERGE update may not modify key fields: ${bad.mkString(",")}")
    matchedActions :+= MatchedUpdate(condition, set); this
  }

  /** UPDATE SET * — every target column from the same-named source column. */
  def whenMatchedUpdateAll(condition: Option[Column] = None): this.type = {
    matchedActions :+= MatchedUpdate(condition, Map.empty); this
  }

  def whenMatchedDelete(condition: Option[Column] = None): this.type = {
    matchedActions :+= MatchedDelete(condition); this
  }

  /** Target rows with NO source match (the "sync target to snapshot"
    * half of a modern MERGE — beyond the reference's 0.10 surface, in
    * Spark's own grammar since 3.4). Conditions and assignments may
    * reference the TARGET side only, per the SQL semantics. */
  def whenNotMatchedBySourceUpdate(
      set: Map[String, Column], condition: Option[Column] = None): this.type = {
    val bad = set.keySet.intersect(table.config.keyFields.toSet)
    require(bad.isEmpty, s"MERGE update may not modify key fields: ${bad.mkString(",")}")
    require(set.nonEmpty,
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE needs explicit SET " +
        "assignments (there is no source row to star from)")
    notMatchedBySourceActions :+= NotMatchedBySourceUpdate(condition, set); this
  }

  def whenNotMatchedBySourceDelete(condition: Option[Column] = None): this.type = {
    notMatchedBySourceActions :+= NotMatchedBySourceDelete(condition); this
  }

  def whenNotMatchedInsert(values: Map[String, Column], condition: Option[Column] = None): this.type = {
    notMatchedActions :+= NotMatchedInsert(condition, values); this
  }

  /** INSERT * — every target column from the same-named source column. */
  def whenNotMatchedInsertAll(condition: Option[Column] = None): this.type = {
    notMatchedActions :+= NotMatchedInsert(condition, Map.empty); this
  }

  /** Run the merge; returns the commit time, or None when no row
    * matched any clause. */
  def execute(): Option[String] = {
    require(matchedActions.nonEmpty || notMatchedActions.nonEmpty ||
        notMatchedBySourceActions.nonEmpty,
      "MERGE needs at least one WHEN clause")
    val snapshot = reader.snapshot()
    val targetFields: Seq[StructField] =
      snapshot.schema.fields.filterNot(f => Meta.all.contains(f.name)).toSeq
    val targetCols = targetFields.map(_.name)
    // a typo'd SET/INSERT column would silently no-op (the per-field
    // getOrElse never finds it) — reject by name like GraftDml.update
    (matchedActions ++ notMatchedActions ++ notMatchedBySourceActions).foreach {
      case MatchedUpdate(_, as) =>
        val unknown = as.keySet.diff(targetCols.toSet)
        require(unknown.isEmpty,
          s"unknown columns in MERGE SET: ${unknown.mkString(",")}")
      case NotMatchedBySourceUpdate(_, as) =>
        val unknown = as.keySet.diff(targetCols.toSet)
        require(unknown.isEmpty,
          s"unknown columns in MERGE SET: ${unknown.mkString(",")}")
      case NotMatchedInsert(_, as) =>
        val unknown = as.keySet.diff(targetCols.toSet)
        require(unknown.isEmpty,
          s"unknown columns in MERGE INSERT: ${unknown.mkString(",")}")
      case _ => ()
    }

    // Schema-evolving MERGE: when a STAR action (`UPDATE SET *` /
    // `INSERT *`) pulls whole source rows and the source carries
    // genuinely new columns, reconcile-by-union exactly like the raw
    // write path (GraftTable.reconciledSchemaJson appends them after
    // the stable existing order) — or reject loudly under strictSchema,
    // the reference's schema-compatibility gate. Extra source columns
    // under purely EXPLICIT assignments stay unused context, standard
    // SQL semantics (reference analog: TestMergeIntoTable2's
    // evolved-schema cases).
    val sourceNew = source.schema.fields.toSeq
      .filterNot(f => Meta.all.contains(f.name))
      .filterNot(f => targetCols.contains(f.name))
    val hasStar =
      matchedActions.exists {
        case MatchedUpdate(_, as) => as.isEmpty
        case _ => false
      } || notMatchedActions.exists(_.assignments.isEmpty)
    val addedFields: Seq[StructField] =
      if (sourceNew.isEmpty || !hasStar) Nil
      else {
        require(!table.config.strictSchema,
          s"MERGE source carries new columns " +
            s"${sourceNew.map(_.name).mkString(", ")} under a star " +
            "action — strictSchema rejects schema evolution; drop the " +
            "columns or unset strictSchema to reconcile by union")
        sourceNew
      }
    val outFields = targetFields ++ addedFields
    val addedNames = addedFields.map(_.name).toSet

    // source LEFT JOIN target: matched rows see both sides; target rows
    // never touched by the source stay out of the plan entirely (their
    // file groups are not rewritten).
    val joined = source
      .join(reader.dataOnly(snapshot).alias(targetAlias), on, "left")
    val matched = table.config.keyFields
      .map(k => col(s"$targetAlias.$k").isNotNull).reduce(_ && _)

    // action id: first matching WHEN wins (clause order = priority)
    val mStart = 0
    val nStart = matchedActions.size
    val actionExpr: Column = {
      val matchedCases = matchedActions.zipWithIndex.map { case (a, i) =>
        (matched && a.condition.getOrElse(lit(true)), lit(mStart + i))
      }
      val notMatchedCases = notMatchedActions.zipWithIndex.map { case (a, i) =>
        (!matched && a.condition.getOrElse(lit(true)), lit(nStart + i))
      }
      (matchedCases ++ notMatchedCases)
        .foldLeft(when(lit(false), lit(-1))) { case (acc, (cond, id)) => acc.when(cond, id) }
        .otherwise(lit(-1))
    }

    // an ADDED column has no target side to fall back on: a non-star
    // clause leaves it null on its rows
    def targetOrNull(name: String): Column =
      if (addedNames.contains(name)) lit(null) else col(s"$targetAlias.$name")
    def updateValue(a: MatchedUpdate, c: StructField): Column =
      a.assignments.getOrElse(c.name, // UPDATE SET *: same-named source col, else keep target
        if (a.assignments.isEmpty && source.columns.contains(c.name))
          col(s"$sourceAlias.${c.name}")
        else targetOrNull(c.name))
    def insertValue(a: NotMatchedInsert, c: StructField): Column =
      a.assignments.getOrElse(c.name,
        if (a.assignments.isEmpty && source.columns.contains(c.name))
          col(s"$sourceAlias.${c.name}")
        else lit(null))

    val outCols = outFields.map { f =>
      val matchedCases = matchedActions.zipWithIndex.map {
        case (a: MatchedUpdate, i)  => (lit(mStart + i), updateValue(a, f))
        case (_: MatchedDelete, i)  => (lit(mStart + i), targetOrNull(f.name))
        case (a, _) => throw new IllegalStateException(s"unexpected matched action $a")
      }
      val notMatchedCases = notMatchedActions.zipWithIndex.map { case (a, i) =>
        (lit(nStart + i), insertValue(a, f))
      }
      (matchedCases ++ notMatchedCases)
        .foldLeft(when(lit(false), lit(null))) { case (acc, (id, v)) =>
          acc.when(col("_g_action") === id, v)
        }
        .otherwise(lit(null)).cast(f.dataType).as(f.name)
    }
    val deleteIds = matchedActions.zipWithIndex.collect {
      case (_: MatchedDelete, i) => mStart + i
    }
    val tombstone = deleteIds.foldLeft(lit(false)) { case (acc, id) =>
      acc || col("_g_action") === id
    }

    val matchedResolved = joined
      .withColumn("_g_action", actionExpr)
      .filter(col("_g_action") >= 0)
      .select(outCols :+ tombstone.as(Meta.Deleted): _*)

    // NOT MATCHED BY SOURCE rows come from a SEPARATE target anti-join
    // against the source — exact presence semantics without turning the
    // main join full-outer (whose null-extension can't distinguish an
    // all-null source row from absence), and the main plan is untouched
    // when the clause family is absent. Conditions/assignments reference
    // the target only (SQL contract), so they resolve on the anti rows.
    val nbStart = nStart + notMatchedActions.size
    val resolved0 =
      if (notMatchedBySourceActions.isEmpty) matchedResolved
      else {
        val anti = reader.dataOnly(snapshot).alias(targetAlias)
          .join(source, on, "left_anti")
        val actionN = notMatchedBySourceActions.zipWithIndex
          .map { case (a, i) => (a.condition.getOrElse(lit(true)), lit(nbStart + i)) }
          .foldLeft(when(lit(false), lit(-1))) {
            case (acc, (c, id)) => acc.when(c, id)
          }
          .otherwise(lit(-1))
        val outColsN = outFields.map { f =>
          notMatchedBySourceActions.zipWithIndex.map {
            case (a: NotMatchedBySourceUpdate, i) => (lit(nbStart + i),
              a.assignments.getOrElse(f.name, targetOrNull(f.name)))
            case (_: NotMatchedBySourceDelete, i) =>
              (lit(nbStart + i), targetOrNull(f.name))
            case (a, _) => throw new IllegalStateException(
              s"unexpected not-matched-by-source action $a")
          }.foldLeft(when(lit(false), lit(null))) { case (acc, (id, v)) =>
            acc.when(col("_g_action") === id, v)
          }.otherwise(lit(null)).cast(f.dataType).as(f.name)
        }
        val tombN = notMatchedBySourceActions.zipWithIndex.collect {
          case (_: NotMatchedBySourceDelete, i) => nbStart + i
        }.foldLeft(lit(false)) { case (acc, id) =>
          acc || col("_g_action") === id
        }
        matchedResolved.unionByName(anti
          .withColumn("_g_action", actionN)
          .filter(col("_g_action") >= 0)
          .select(outColsN :+ tombN.as(Meta.Deleted): _*))
      }

    // persisted: the source⋈target join feeds both the emptiness probe
    // and the upsert — without it the join executes twice
    val resolved = resolved0.persist()
    try {
      if (resolved.isEmpty) None
      else Some(table.upsert(resolved))
    } finally resolved.unpersist()
  }
}

object GraftDml {
  def apply(table: GraftTable): GraftDml = new GraftDml(table)
}
