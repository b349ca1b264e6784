package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Focused tests for the round-12 staged-write internals: the direct
  * per-group writer (org.apache.spark.sql.graft.GroupedFileWriter —
  * replaced DataFrameWriter.partitionBy on the publish path) and the
  * fork-free local filesystem (graft.core.NioLocalFileSystem). Both
  * must be drop-in: same staged directory layout, same escaping, same
  * on-disk permissions, same data. */
class GroupedWriterSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-gw").toString

  test("direct writer reproduces partitionBy's directory layout, escaping and data") {
    import spark.implicits._
    // group values exercise the escaping corners partitionBy handles:
    // spaces, '=', ':', '%'. (Non-ASCII values are excluded: under this
    // JVM's POSIX sun.jnu.encoding, Spark's OWN partitionBy write throws
    // InvalidPathException for them too — an environment limit, not a
    // writer difference.)
    val parts = Seq("plain", "has space", "a=b", "x:y", "p%25c")
    val df = (1 to 500).map { i =>
      (i.toLong, parts(i % parts.size), s"g${i % 7}", s"v$i")
    }.toDF("id", "gp", "gf", "v")
      .repartition(4, col("gp"), col("gf"))
      .sortWithinPartitions(col("gp"), col("gf"), col("id"))

    val viaSpark = tmp()
    df.write.mode("overwrite").partitionBy("gp", "gf")
      .format("parquet").save(viaSpark)
    val viaDirect = tmp()
    org.apache.spark.sql.graft.GroupedFileWriter.write(
      spark, df, Seq("gp", "gf"), viaDirect, "parquet")

    val fs = new Path(viaDirect).getFileSystem(
      spark.sessionState.newHadoopConf())
    def groupDirs(base: String): Set[String] =
      fs.globStatus(new Path(base, "gp=*/gf=*")).map { st =>
        val p = st.getPath
        s"${p.getParent.getName}/${p.getName}"
      }.toSet
    assert(groupDirs(viaDirect) == groupDirs(viaSpark),
      "staged group-directory layout must match partitionBy exactly")
    // exactly one part file per group dir (the publish glob contract)
    fs.globStatus(new Path(viaDirect, "gp=*/gf=*")).foreach { d =>
      val parts = fs.listStatus(d.getPath)
        .filter(_.getPath.getName.startsWith("part-"))
      assert(parts.length == 1, s"expected 1 part file in ${d.getPath}")
      assert(!fs.listStatus(d.getPath).exists(_.getPath.getName.startsWith(".tmp-")),
        "no temp file may survive a successful write")
    }
    // identical rows, group columns re-derived from the directory names
    val back = spark.read.parquet(s"$viaDirect/gp=*/gf=*")
    val expect = spark.read.parquet(s"$viaSpark/gp=*/gf=*")
    assert(back.schema.fieldNames.sorted.sameElements(
      expect.schema.fieldNames.sorted))
    assert(back.orderBy("id").collect().toSeq ==
      expect.orderBy("id").collect().toSeq)
  }

  test("empty input stages nothing and publish treats it as a no-op") {
    import spark.implicits._
    val dest = tmp()
    val df = Seq.empty[(Long, String, String)].toDF("id", "gp", "gf")
    org.apache.spark.sql.graft.GroupedFileWriter.write(
      spark, df, Seq("gp", "gf"), dest, "parquet")
    val fs = new Path(dest).getFileSystem(spark.sessionState.newHadoopConf())
    val found = Option(fs.globStatus(new Path(dest, "gp=*/gf=*/part-*")))
      .map(_.toSeq).getOrElse(Nil)
    assert(found.isEmpty)
  }

  test("NioLocalFileSystem sets the same permissions as the shell path, without forking") {
    val conf = spark.sessionState.newHadoopConf()
    assert(conf.get("fs.file.impl") == classOf[graft.core.NioLocalFileSystem].getName)
    val fs = new Path("/tmp").getFileSystem(conf)
    assert(fs.isInstanceOf[graft.core.NioLocalFileSystem])
    val dir = tmp()
    val p = new Path(dir, "permtest")
    val out = fs.create(p)
    out.write(42); out.close()
    import org.apache.hadoop.fs.permission.FsPermission
    fs.setPermission(p, new FsPermission("640"))
    val posix = java.nio.file.Files.getPosixFilePermissions(
      java.nio.file.Paths.get(dir, "permtest"))
    import java.nio.file.attribute.PosixFilePermission._
    assert(posix.contains(OWNER_READ) && posix.contains(OWNER_WRITE) &&
      posix.contains(GROUP_READ) && !posix.contains(OTHERS_READ) &&
      !posix.contains(OWNER_EXECUTE))
  }

  test("MOR mixed staged write routes delta and base groups through one job (layout intact)") {
    import graft.core._
    import graft.read.GraftReader
    import graft.write.GraftTable
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "gwmor", tableType = TableType.MOR, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 50))
    import spark.implicits._
    val load = (1 to 200).map(i => (i.toLong, s"p${i % 3}", i.toLong, s"v$i"))
      .toDF("id", "p", "ts", "v")
    tbl.bulkInsert(load)
    // updates (deltas on existing groups) + inserts (fresh base groups) in one upsert
    tbl.upsert((1 to 60).map(i => (i.toLong, s"p${i % 3}", i + 1000L, s"u$i"))
      .toDF("id", "p", "ts", "v")
      .unionByName((301 to 340).map(i => (i.toLong, s"p${i % 3}", i.toLong, s"n$i"))
        .toDF("id", "p", "ts", "v")))
    val r = GraftReader(tbl)
    val out = r.dataOnly(r.snapshot())
    assert(out.count() == 240)
    assert(out.filter(col("v").startsWith("u")).count() == 60)
    // compaction folds the staged deltas — proves the delta suffix routing
    graft.services.TableServices(tbl).compact()
    val out2 = r.dataOnly(r.snapshot())
    assert(out2.filter(col("v").startsWith("u")).count() == 60)
    assert(out2.count() == 240)
  }
}
