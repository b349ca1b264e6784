package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (codegen, shuffle machinery, parquet reader AND
    // writer classes) on tiny data so timed numbers reflect engine
    // throughput, not first-query/first-commit JIT
    spark.range(100000).selectExpr("sum(id)").collect()
    try {
      val region = Tables.t(spark, sfDir, "region")
      val nation = Tables.t(spark, sfDir, "nation")
      region.join(nation,
        region("r_regionkey") === nation("n_regionkey"), "left").count()
    } catch { case _: Throwable => () }
    try {
      // kernel warmup: compile the codegen'd fingerprint/vector kernels
      // on tiny data so their first timed use measures throughput, not JIT
      import org.apache.spark.sql.functions._
      val docs = spark.range(64).select(col("id"),
        concat_ws(" ", (0 until 24).map(i => concat(lit(s"w$i"), col("id") % 7)): _*).as("text"),
        array((0 until 8).map(i => (col("id") * (i + 1)).cast("float")): _*).as("vec"))
      graft.llm.Dedup.minhashLsh(docs, "id", "text").count()
      graft.llm.Dedup.simhashPairsBanded(docs, "id", "text", 3).count()
      docs.select(graft.llm.Similarity.dotD(col("vec"), col("vec")),
        graft.llm.Similarity.normD(col("vec"))).count()
    } catch { case _: Throwable => () }
    try {
      // write-path warmup: a full tiny MOR lifecycle (bulk + upsert +
      // delete + compact + read) through a throwaway table
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft-bench-warm").toString
      val tbl = graft.write.GraftTable.create(spark, dir, graft.core.TableConfig(
        name = "warm", tableType = graft.core.TableType.MOR,
        keyFields = Seq("id"), partitionFields = Seq("p"), targetFileRows = 1000))
      val df = spark.range(2000).select(col("id"), (col("id") % 4).cast("string").as("p"))
      tbl.bulkInsert(df)
      tbl.upsert(df.filter(col("id") % 2 === 0).withColumn("id", col("id") + 10000))
      tbl.delete(df.filter(col("id") % 7 === 0).select("id", "p"))
      graft.services.TableServices(tbl).compact()
      val r = graft.read.GraftReader(tbl)
      r.dataOnly(r.snapshot()).count()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_BENCH_ONLY=q28_embed_topk[,q30_...] isolates queries
    // for regression hunting without touching the measured contract
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(SparkEntry.queries.contains))
      .getOrElse(SparkEntry.benchQueries)
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, Throwable)]
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      // level the playing field between queries: drop cached plans and
      // nudge the ContextCleaner (broadcast/shuffle state from earlier
      // heavy queries otherwise taxes whoever runs next)
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      // failures are LOUD: a broken bench query must never masquerade as
      // a fast one — record it, print it, and exit nonzero at the end
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable =>
          failures += name -> t
          System.err.println(s"BENCH FAILURE $name: ${t.getClass.getName}: ${t.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val (writeQs, readQs) = results.partition(r => SparkEntry.writePathQueries(r._1))
    val writeTotal = writeQs.map(_._2).sum
    val readTotal = readQs.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""read_total":$readTotal,"write_total":$writeTotal,""" +
      s""""failed":${failures.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) {
      failures.foreach { case (n, t) => System.err.println(s"FAILED: $n — $t") }
      sys.exit(1)
    }
  }
}
