package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Between-source-and-write transforms for the ingest loop (reference
  * analog: hudi-utilities/transform — SqlQueryBasedTransformer.java:37,
  * FlatteningTransformer.java:37, ChainedTransformer.java:36). A
  * transformer is just `DataFrame => DataFrame`; these are the stock
  * ones. */
object Transformers {

  type Transformer = DataFrame => DataFrame

  /** SQL transform over the incoming batch; reference it as `<SRC>`
    * (same placeholder contract as the reference). */
  def sqlQuery(sql: String): Transformer = { df =>
    val view = s"graft_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.createOrReplaceTempView(view)
    try df.sparkSession.sql(sql.replace("<SRC>", view))
    finally () // keep the view until session end; replaced on next batch
  }

  /** Recursively flatten struct columns into `parent_child` top-level
    * columns (reference analog: FlatteningTransformer's recursive
    * flatten). Arrays/maps stay opaque. */
  def flatten: Transformer = { df =>
    def cols(schema: StructType, prefix: String, path: String): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val fieldPath = if (path.isEmpty) s"`${f.name}`" else s"$path.`${f.name}`"
        val outName = if (prefix.isEmpty) f.name else s"${prefix}_${f.name}"
        f.dataType match {
          case s: StructType => cols(s, outName, fieldPath)
          case _             => Seq(col(fieldPath).as(outName))
        }
      }
    df.select(cols(df.schema, "", ""): _*)
  }

  /** Apply transformers left to right. */
  def chained(ts: Transformer*): Transformer = df => ts.foldLeft(df)((d, t) => t(d))

  /** Debezium CDC envelope → graft upsert rows (reference analog:
    * model/debezium/AbstractDebeziumAvroPayload.java + the Debezium
    * sources). Input rows carry `op` (c/r/u = upsert, d = delete), an
    * `after` struct (the row image; null for deletes), a `before`
    * struct (used for delete keys), and a monotonically increasing
    * `ordCol` (MySQL file+pos or Postgres LSN) that should also be the
    * table's orderingField so out-of-order events resolve correctly.
    * Deletes become `_g_deleted` tombstone rows riding the SAME upsert
    * batch (graft's write path honors a pre-existing tombstone column).
    * Caveat: tombstones take commit-time precedence — a late event whose
    * ord predates an already-applied delete but lands in a LATER commit
    * is not suppressed (EmptyHoodieRecordPayload-style contract). */
  def debezium(opCol: String = "op", afterCol: String = "after",
      beforeCol: String = "before", ordCol: String = "ord"): Transformer = { df =>
    val afterFields = df.schema(afterCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    val image = org.apache.spark.sql.functions.when(
      col(opCol) === "d", col(beforeCol)).otherwise(col(afterCol))
    df.select(
      afterFields.map(f => image.getField(f).as(f)) ++ Seq(
        col(ordCol),
        (col(opCol) === "d").as(graft.write.Meta.Deleted)): _*)
  }
}
