package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge for DSv1 streaming sinks: the DataFrame handed to
  * `Sink.addBatch` carries a STREAMING logical plan, which refuses any
  * further batch analysis ("streaming sources must be executed with
  * writeStream.start()"). Re-wrap the already-planned physical rows as
  * a plain batch DataFrame so the full table write path can run on it —
  * the same `internalCreateDataFrame(toRdd, schema)` move the built-in
  * DSv1 sinks use (needs `private[sql]` access, hence this package).
  * Micro-batch offsets are deterministic, so re-executions of the
  * wrapped plan within one commit read identical data. */
object StreamingBatch {
  def rebatch(data: DataFrame): DataFrame = {
    val session = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
