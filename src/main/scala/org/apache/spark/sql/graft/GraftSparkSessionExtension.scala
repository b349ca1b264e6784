package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StringType, StructType}

import graft.sql.GraftSql

/** Session extension (reference analog:
  * HoodieSparkSessionExtension.scala:28): injects a parser that
  * intercepts the graft statement grammar — compaction DDL,
  * path-addressed UPDATE/DELETE, SHOW PARTITIONS / TRUNCATE / ALTER —
  * and delegates everything else to Spark's parser, so
  * `spark.sql("RUN COMPACTION ON '<path>'")` works natively.
  *
  * Enable with:
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkSessionExtension")`
  */
class GraftSparkSessionExtension extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectParser { (session, delegate) =>
      new GraftSqlParser(delegate, Some(session))
    }
    // Spark-grammar MERGE / UPDATE / DELETE on catalog tables USING
    // graft resolve into GraftDml commands (reference analog:
    // HoodieAnalysis.scala:64-68)
    extensions.injectResolutionRule { session => GraftDmlResolution(session) }
    // the custom codegen kernels (vector math, LSH banding, minhash/
    // simhash, space-filling curves) as SQL functions
    graft.functions.GraftFunctions.all.foreach(extensions.injectFunction)
  }
}

/** Delegating parser: graft statements become [[GraftStatementCommand]]
  * plans; everything else is Spark's grammar (reference analog:
  * HoodieCommonSqlParser.scala:33). */
class GraftSqlParser(
    delegate: ParserInterface,
    session: Option[SparkSession] = None) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    if (GraftSql.handles(sqlText)) GraftStatementCommand(sqlText)
    else rewriteTimeTravel(delegate.parsePlan(sqlText))

  /** `VERSION AS OF '<instant>'` / `TIMESTAMP AS OF <literal>` over a
    * graft catalog table becomes the pinned-snapshot plan right here at
    * parse time — Spark's own relation resolution rejects time travel
    * on v1 session-catalog tables before any resolution rule could. */
  private def rewriteTimeTravel(plan: LogicalPlan): LogicalPlan = session match {
    case None => plan
    case Some(s) =>
      plan.transformUp {
        case tt @ org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(rel, ts, version) =>
          GraftDmlResolution.graftTarget(s, rel) match {
            case Some((path, _)) =>
              GraftDmlResolution.timeTravelPlan(s, path, ts, version).getOrElse(tt)
            case None => tt
          }
      }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Runnable plan for one graft statement; the statement's result column
  * (instant / partition / file_group) is surfaced as a single string
  * column. */
case class GraftStatementCommand(statement: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = true)())

  override def run(session: SparkSession): Seq[Row] =
    GraftSql.sql(session, statement).collect()
      .map(r => Row(if (r.isNullAt(0)) null else r.get(0).toString)).toSeq
}
