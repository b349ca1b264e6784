package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.services.TableServices
import graft.sql.GraftDdl
import graft.write.GraftTable

class BootstrapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-boot").toString

  def cfg: TableConfig = TableConfig(
    name = "boot", tableType = TableType.COW, keyFields = Seq("id"),
    orderingField = "ts", targetFileRows = 1000)

  def sourceFiles(dir: String): Seq[java.io.File] = {
    import spark.implicits._
    (1L to 50L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ts")
      .repartition(3).write.parquet(dir)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
  }

  test("zero-copy bootstrap: no rewrite, reads stamp meta, lookups prune") {
    import spark.implicits._
    val srcDir = s"${tmp()}/src"
    val files = sourceFiles(srcDir)
    val dir = tmp()
    val tbl = GraftDdl.bootstrap(spark, dir, cfg, srcDir)

    // zero copy: no data files inside the table dir
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".parquet")))
    val snap = Snapshot.resolve(tbl.timeline)
    assert(snap.slices.forall(_.baseFile.exists(_.external)))
    assert(snap.slices.size == files.size)

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == (1L to 50L).map(i => (i, s"v$i", 1L)))
    // meta columns stamped at read time
    val metaRow = r.snapshot().select(graft.write.Meta.Key, graft.write.Meta.File)
      .filter(col("id") === 7L).head()
    assert(metaRow.getString(0) == "7")
    assert(metaRow.getString(1).startsWith("boot-"))
    // key-range pruned point lookup works over external stats
    assert(r.pointLookup(Seq("13")).count() == 1)
  }

  test("partitioned bootstrap: partition values from data, prune + upsert + drop work") {
    import spark.implicits._
    // partition-laid-out source with the partition column IN the files:
    // one file per partition value
    val flat = s"${tmp()}/flat"
    (0 to 2).foreach { m =>
      (1L to 60L).filter(_ % 3 == m).map(i => (i, s"v$i", 1L, s"p$m"))
        .toDF("id", "v", "ts", "p").coalesce(1).write.mode("append").parquet(flat)
    }
    val pcfg = cfg.copy(partitionFields = Seq("p"))
    val dir = tmp()
    val tbl = GraftDdl.bootstrap(spark, dir, pcfg, flat)
    val snap = Snapshot.resolve(tbl.timeline)
    assert(snap.slices.map(_.partition).toSet == Set("p0", "p1", "p2"))
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 60)
    // partition-pruned read touches one partition's slices only
    assert(r.snapshot(partitions = Some(Set("p1"))).count() == 20)
    // upsert into one partition upgrades only that group
    tbl.upsert(Seq((4L, "v4b", 2L, "p1")).toDF("id", "v", "ts", "p"))
    val snap2 = Snapshot.resolve(tbl.timeline)
    val (ext, native) = snap2.slices.partition(_.baseFile.exists(_.external))
    assert(ext.map(_.partition).toSet == Set("p0", "p2"))
    assert(native.map(_.partition).toSet == Set("p1"))
    val got = r.dataOnly(r.snapshot()).filter(col("id") === 4L)
      .select("v").as[String].head()
    assert(got == "v4b")
    // drop a partition logically; external files stay on disk (user data)
    tbl.deletePartitions(Seq("p0"))
    assert(r.dataOnly(r.snapshot()).count() == 40)
  }

  test("first upsert upgrades the touched group to native; others stay external") {
    import spark.implicits._
    val srcDir = s"${tmp()}/src"
    sourceFiles(srcDir)
    val dir = tmp()
    val tbl = GraftDdl.bootstrap(spark, dir, cfg, srcDir)
    val r = GraftReader(tbl)

    tbl.upsert(Seq((7L, "v7b", 2L), (999L, "new", 2L)).toDF("id", "v", "ts"))
    val got = r.dataOnly(r.snapshot()).as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.length == 51)
    assert(got.find(_._1 == 7L).get._2 == "v7b")
    assert(got.find(_._1 == 999L).get._2 == "new")
    val snap = Snapshot.resolve(tbl.timeline)
    val (ext, native) = snap.slices.partition(_.baseFile.exists(_.external))
    assert(native.size == 2, "touched group rewritten native + one new insert group")
    assert(ext.size == 2, "untouched groups remain zero-copy")
    // delete on a bootstrapped group
    tbl.delete(Seq(Tuple1(1L)).toDF("id"))
    assert(r.dataOnly(r.snapshot()).count() == 50)
  }

  test("rollback, restore and clean never touch external source files") {
    import spark.implicits._
    val srcDir = s"${tmp()}/src"
    val files = sourceFiles(srcDir)
    val dir = tmp()
    val tbl = GraftDdl.bootstrap(spark, dir, cfg, srcDir)
    val t1 = tbl.timeline.completed().last.time
    tbl.upsert(Seq((7L, "v7b", 2L)).toDF("id", "v", "ts"))
    val svc = TableServices(tbl)
    svc.restoreTo(t1) // undoes the upsert
    assert(files.forall(_.exists()), "source files intact after restore")
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 50)
    // clean after many rewrites never deletes the external originals
    (1 to 3).foreach(i => tbl.upsert(Seq((7L, s"v7_$i", 2L + i)).toDF("id", "v", "ts")))
    svc.clean(retainCommits = 1)
    assert(files.forall(_.exists()), "source files intact after clean")
    assert(r.dataOnly(r.snapshot()).count() == 50)
  }
}
