package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed synthetic probe (~1-2 s) measuring what the CONTAINER is
    * worth right now: a deterministic integer-mix kernel saturating the
    * requested cores, and a tmpfs write/rename/delete loop. Emitted as
    * `"calibration"` in the bench JSON so cross-round comparisons can be
    * drift-normalized (container throughput has measured 2× overnight
    * swings; see README "Reading the bench numbers"): divide per-query
    * times by (cpu_sec ratio) before calling anything a regression. */
  private def calibration(nThreads: Int): (Double, Double) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val cpuT0 = System.nanoTime()
    val tasks = (0 until nThreads).map { t =>
      pool.submit(new java.util.concurrent.Callable[java.lang.Long] {
        override def call(): java.lang.Long = {
          var x = 0x9E3779B97F4A7C15L + t
          var i = 0
          while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
          x
        }
      })
    }
    val sink = tasks.map(_.get().longValue()).sum
    pool.shutdown()
    val cpuSec = (System.nanoTime() - cpuT0) / 1e9
    require(sink != 42L) // keep the kernel un-eliminable
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-cal")
    val buf = new Array[Byte](256 * 1024)
    java.util.Arrays.fill(buf, 7.toByte)
    val ioT0 = System.nanoTime()
    (0 until 256).foreach { i =>
      val p = dir.resolve(s"f$i")
      java.nio.file.Files.write(p, buf)
      java.nio.file.Files.move(p, dir.resolve(s"g$i"))
    }
    (0 until 256).foreach(i => java.nio.file.Files.delete(dir.resolve(s"g$i")))
    val ioSec = (System.nanoTime() - ioT0) / 1e9
    java.nio.file.Files.delete(dir)
    (cpuSec, ioSec)
  }

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
    // machine-state anchor, measured AFTER the queries so their JIT/page
    // cache state can't skew it (and vice versa at the front)
    val (calCpu, calIo) = calibration(cpus.toInt)
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""read_total":$readTotal,"write_total":$writeTotal,""" +
      s""""calibration":{"cpu_sec":$calCpu,"io_sec":$calIo,"threads":$cpus},""" +
      s""""failed":${failures.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) {
      failures.foreach { case (n, t) => System.err.println(s"FAILED: $n — $t") }
      sys.exit(1)
    }
  }
}
