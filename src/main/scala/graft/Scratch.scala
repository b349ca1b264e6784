package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 staged-write experiment harness (not part of the driver
  * contract). Kept so the numbers in OPTIMIZATION_r12.md are
  * reproducible: variants A-G time the same 150k rows into ~2,000
  * dynamic-partition files under different writers/committers/codecs;
  * H-I time the direct GroupedFileWriter; J phase-splits per-file
  * open/write/close with a stack sampler (which located the
  * fork-per-create chmod tax — see graft.core.NioLocalFileSystem). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val orders = Tables.t(spark, sfDir, "orders")
    // mimic the q57 staged shape: 2002 groups of ~75 rows
    val df = orders
      .withColumn("_gp", col("o_orderpriority"))
      .withColumn("_gf", concat(lit("g"), (xxhash64(col("o_orderkey")) % 400).cast("string")))
    df.count() // warm scan
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def freshDir(): String =
      java.nio.file.Files.createTempDirectory("graft-scratch").toString

    (1 to 1).foreach { round =>
      println(s"--- round $round ---")
      time("A baseline partitionBy(gp,gf) 32 parts") {
        df.repartition(32, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
          .write.mode("overwrite").partitionBy("_gp", "_gf")
          .format("parquet").save(freshDir())
      }
      time("B 128 parts") {
        df.repartition(128, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
          .write.mode("overwrite").partitionBy("_gp", "_gf")
          .format("parquet").save(freshDir())
      }
      time("C 256 parts") {
        df.repartition(256, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
          .write.mode("overwrite").partitionBy("_gp", "_gf")
          .format("parquet").save(freshDir())
      }
      time("D uncompressed 32 parts") {
        df.repartition(32, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
          .write.mode("overwrite").partitionBy("_gp", "_gf")
          .option("compression", "none")
          .format("parquet").save(freshDir())
      }
      time("E single dir no partitionBy 32 parts") {
        df.drop("_gp", "_gf")
          .repartition(32)
          .write.mode("overwrite")
          .format("parquet").save(freshDir())
      }
      time("F concat key partitionBy(one col) 128 parts") {
        df.withColumn("_gk", concat_ws("/", col("_gp"), col("_gf")))
          .drop("_gp", "_gf")
          .repartition(128, col("_gk"))
          .sortWithinPartitions(col("_gk"), col("o_orderkey"))
          .write.mode("overwrite").partitionBy("_gk")
          .format("parquet").save(freshDir())
      }
      time("G algo v2 committer 32 parts") {
        spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        try df.repartition(32, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
          .write.mode("overwrite").partitionBy("_gp", "_gf")
          .format("parquet").save(freshDir())
        finally spark.conf.unset("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version")
      }
      time("H direct ParquetOutputWriter per group 32 parts") {
        val dest = freshDir()
        val data = df.repartition(32, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
        org.apache.spark.sql.graft.GroupedFileWriter.write(
          spark, data, Seq("_gp", "_gf"), dest, "parquet")
      }
      time("I direct writer 128 parts") {
        val dest = freshDir()
        val data = df.repartition(128, col("_gp"), col("_gf"))
          .sortWithinPartitions(col("_gp"), col("_gf"), col("o_orderkey"))
        org.apache.spark.sql.graft.GroupedFileWriter.write(
          spark, data, Seq("_gp", "_gf"), dest, "parquet")
      }
      time("J driver-loop 63 files phase split") {
        org.apache.spark.sql.graft.GroupedFileWriter.microbench(
          spark, df.drop("_gp", "_gf").limit(75), freshDir(), 400)
      }
    }
    spark.stop()
  }
}
