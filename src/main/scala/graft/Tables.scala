package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Standard session config every graft session needs. Current testdata
    * stores events.ts as parquet timestamp[us] (read as timestamp_ntz);
    * the nanosAsLong flag is kept so older TIMESTAMP(NANOS) drops of the
    * same table still load (as long nanos) instead of crashing the scan.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.compression.codec", "snappy")
    .config("spark.sql.adaptive.enabled", "true")
    // fork-free local FS: without libhadoop, stock RawLocalFileSystem
    // forks a `chmod` process per created file (sampled at ~75% of a
    // many-group commit's staged-write wall time) — see
    // graft.core.NioLocalFileSystem. Identical semantics, no forks.
    .config("spark.hadoop.fs.file.impl",
      classOf[graft.core.NioLocalFileSystem].getName)
}
