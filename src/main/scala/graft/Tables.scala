package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Standard session config every graft session needs. The events table
    * carries parquet TIMESTAMP(NANOS) which Spark 4 only reads as long
    * (nanos since epoch) behind this legacy flag.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.compression.codec", "snappy")
    .config("spark.sql.adaptive.enabled", "true")
}
