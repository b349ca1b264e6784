package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write._

class ValidatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-val").toString

  def cfg(tableType: String = TableType.COW): TableConfig = TableConfig(
    name = "t", tableType = tableType, keyFields = Seq("id"),
    orderingField = "ts", targetFileRows = 1000)

  def rows(vals: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    vals.toDF("id", "v", "ts")
  }

  def ids(tbl: GraftTable): Seq[Long] = {
    import spark.implicits._
    val r = GraftReader(tbl)
    r.dataOnly(r.snapshot()).select("id").as[Long].collect().sorted.toSeq
  }

  test("passing validators leave the commit visible") {
    val tbl = GraftTable.create(spark, tmp(), cfg())
    tbl.bulkInsert(rows((1L, "a", 1L), (2L, "b", 1L)))
    tbl.withValidators(Seq(
      // invariant: never a negative id (equality across before/after)
      new SqlQueryEqualityValidator(Seq(
        "SELECT count(*) FROM <TABLE_NAME> WHERE id < 0")),
      // the write must change the table
      new SqlQueryInequalityValidator(Seq(
        "SELECT count(*) FROM <TABLE_NAME>")),
      // and land exactly 3 live rows
      new SqlQuerySingleResultValidator(Seq(
        "SELECT count(*) FROM <TABLE_NAME> WHERE NOT _g_deleted#3"))))
    tbl.upsert(rows((3L, "c", 2L)))
    assert(ids(tbl) == Seq(1L, 2L, 3L))
  }

  test("failing validator aborts the commit: timeline and files untouched") {
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, cfg())
    tbl.bulkInsert(rows((1L, "a", 1L)))
    val instantsBefore = tbl.timeline.completed().map(_.time)
    tbl.withValidators(Seq(new SqlQueryEqualityValidator(Seq(
      "SELECT count(*) FROM <TABLE_NAME>")))) // upsert of a new key must change the count
    intercept[PreCommitValidationException] {
      tbl.upsert(rows((2L, "b", 2L)))
    }
    assert(tbl.timeline.completed().map(_.time) == instantsBefore)
    assert(tbl.timeline.instants().forall(_.isCompleted), "no pending instant left behind")
    assert(ids(tbl) == Seq(1L))
    // the aborted write's staged files are gone: every file on disk is
    // accounted for by the surviving commit metadata
    val known = Snapshot.resolve(tbl.timeline).slices
      .flatMap(_.allFiles).map(_.path).toSet
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(onDisk == known)
  }

  test("single-result validator checks the post-commit view on MOR deltas") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.MOR))
    tbl.bulkInsert(rows((1L, "a", 1L), (2L, "b", 1L)))
    tbl.withValidators(Seq(new SqlQuerySingleResultValidator(Seq(
      "SELECT max(v) FROM <TABLE_NAME> WHERE id = 1#a2"))))
    tbl.upsert(rows((1L, "a2", 2L))) // delta lands only if the merged view shows a2
    import spark.implicits._
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).filter($"id" === 1).select("v").as[String].head() == "a2")
    // and a wrong expectation aborts the next delta
    tbl.withValidators(Seq(new SqlQuerySingleResultValidator(Seq(
      "SELECT max(v) FROM <TABLE_NAME> WHERE id = 1#WRONG"))))
    intercept[PreCommitValidationException] { tbl.upsert(rows((1L, "a3", 3L))) }
    assert(r.dataOnly(r.snapshot()).filter($"id" === 1).select("v").as[String].head() == "a2")
  }

  test("single-result spec splits at the LAST '#': query text may contain '#'") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW))
    tbl.bulkInsert(rows((1L, "#1", 1L), (2L, "b", 1L)))
    tbl.withValidators(Seq(new SqlQuerySingleResultValidator(Seq(
      "SELECT count(*) FROM <TABLE_NAME> WHERE v = '#1'#1"))))
    tbl.upsert(rows((3L, "c", 1L))) // must not trip the spec parser
    import spark.implicits._
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).count() == 3)
  }

  test("validators see replaced groups as gone on delete_partition") {
    val tbl = GraftTable.create(spark, tmp(), TableConfig(
      name = "t", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 1000))
    import spark.implicits._
    tbl.bulkInsert(Seq((1L, "x", 1L, "a"), (2L, "y", 1L, "b")).toDF("id", "v", "ts", "p"))
    tbl.withValidators(Seq(new SqlQuerySingleResultValidator(Seq(
      "SELECT count(*) FROM <TABLE_NAME> WHERE _g_partition = 'a'#0"))))
    tbl.deletePartitions(Seq("a"))
    assert(ids(tbl) == Seq(2L))
  }
}
