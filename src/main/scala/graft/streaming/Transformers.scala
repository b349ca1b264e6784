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

  /** AWS DMS change-record → graft upsert rows (reference analog:
    * hudi-spark/src/main/java/org/apache/hudi/payload/AWSDmsAvroPayload.java:44).
    * DMS emits FULL row images inline (no before/after envelope): full-load
    * rows with a null/absent `Op`, inserts `Op=I`, updates `Op=U`, deletes
    * `Op=D` (before image). `Op` is matched case-insensitively like the
    * reference. Divergence from the reference, on purpose: Hudi stores the
    * `Op` marker in the table because its payload can't reshape the Avro
    * record; here the operation is transport metadata, so it maps to the
    * tombstone flag and is dropped from the stored schema. */
  def dms(opCol: String = "Op"): Transformer = { df =>
    import org.apache.spark.sql.functions.{coalesce, lit, upper}
    // full-load batches carry no Op column at all — pass them through
    // as plain inserts (same effect as the reference's null check)
    if (!df.columns.contains(opCol)) df
    else df.withColumn(graft.write.Meta.Deleted,
        upper(coalesce(col(opCol).cast("string"), lit(""))) === "D")
      .drop(opCol)
  }
}
