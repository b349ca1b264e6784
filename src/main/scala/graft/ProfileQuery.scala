package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: run one bench query with a listener that
  * records every Spark job's wall time + call site, so the expensive
  * phases inside a multi-job write query (tag join, staged write,
  * publish, footer stats, read-back) are attributable. Usage:
  *   sbt "runMain graft.ProfileQuery q57_publish_many_groups [repeat]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q57_publish_many_groups")
    val repeat = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmups as Bench so first-run JIT doesn't pollute attribution
    spark.range(100000).selectExpr("sum(id)").collect()
    try {
      val region = Tables.t(spark, sfDir, "region")
      val nation = Tables.t(spark, sfDir, "nation")
      region.join(nation,
        region("r_regionkey") === nation("n_regionkey"), "left").count()
    } catch { case _: Throwable => () }
    try {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft-prof-warm").toString
      val tbl = graft.write.GraftTable.create(spark, dir, graft.core.TableConfig(
        name = "warm", tableType = graft.core.TableType.MOR,
        keyFields = Seq("id"), partitionFields = Seq("p"), targetFileRows = 1000))
      val df = spark.range(2000).select(col("id"), (col("id") % 4).cast("string").as("p"))
      tbl.bulkInsert(df)
      tbl.upsert(df.filter(col("id") % 2 === 0).withColumn("id", col("id") + 10000))
      graft.services.TableServices(tbl).compact()
      val r = graft.read.GraftReader(tbl)
      r.dataOnly(r.snapshot()).count()
    } catch { case _: Throwable => () }

    case class JobRec(id: Int, desc: String, site: String, start: Long,
      var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, site, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val sid = e.stageInfo.stageId
          jobs.values.lastOption.foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
          val _ = sid
        }
    }
    val fn = SparkEntry.queries(name)
    (1 to repeat).foreach { i =>
      jobs.synchronized(jobs.clear())
      spark.catalog.clearCache()
      System.gc()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let listener events drain
      println(f"%n=== $name run $i: wall=$wall%.2fs rows=$n ===")
      val recs = jobs.synchronized(jobs.values.toSeq)
      val totalJobMs = recs.map(r => math.max(0L, r.end - r.start)).sum
      println(f"jobs=${recs.size} sum_job_wall=${totalJobMs / 1e3}%.2fs " +
        f"(gap=driver-side ${wall - totalJobMs / 1e3}%.2fs)")
      recs.sortBy(r => -(r.end - r.start)).take(25).foreach { r =>
        println(f"  job ${r.id}%4d ${(r.end - r.start) / 1e3}%6.2fs stages=${r.stages}%3d " +
          f"tasks=${r.tasks}%5d  ${r.site.take(60)}%-60s ${r.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
