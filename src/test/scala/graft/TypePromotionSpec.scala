package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Common-column TYPE alignment between batches and the table schema
  * (reference analog: the Avro promotion rules inside
  * TableSchemaResolver.isSchemaCompatible :337-345). The bug class this
  * pins: a batch column narrower than the table's used to stage files
  * in the NARROW physical type and narrow the commit schema with it, so
  * reading the table's existing wide files threw
  * PARQUET_COLUMN_DATA_TYPE_MISMATCH. */
class TypePromotionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[2]").config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")).getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-typ").toString

  def cfg(tt: String = TableType.COW, fmt: String = "parquet"): TableConfig =
    TableConfig(name = "t", tableType = tt, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", baseFormat = fmt)

  private def longTable(fmt: String = "parquet", tt: String = TableType.COW): GraftTable = {
    import spark.implicits._
    val tbl = GraftTable.create(spark, tmp(), cfg(tt, fmt))
    tbl.bulkInsert(Seq((1L, "p0", 5L, 1L)).toDF("id", "p", "v", "ts"))
    tbl
  }
  private def intBatch: DataFrame = {
    import spark.implicits._
    Seq((2L, "p0", 6, 2L)).toDF("id", "p", "v", "ts") // v: IntegerType
  }

  for (fmt <- Seq("parquet", "orc")) {
    test(s"[$fmt] a NARROWER batch column is cast up to the table's type") {
      val tbl = longTable(fmt)
      tbl.upsert(intBatch)
      val snap = GraftReader(tbl).snapshot()
      assert(snap.schema("v").dataType == LongType,
        s"schema must keep the wide type, got ${snap.schema("v").dataType}")
      val m = snap.select("id", "v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m == Map(1L -> 5L, 2L -> 6L))
    }
  }

  test("MOR: narrow delta + wide base merge cleanly") {
    val tbl = longTable(tt = TableType.MOR)
    tbl.upsert(intBatch) // lands as a delta file
    val r = GraftReader(tbl)
    assert(r.snapshot().select("v").schema("v").dataType == LongType)
    assert(r.snapshot().count() == 2)
    graft.services.TableServices(tbl).compact()
    assert(r.snapshot().select(sum("v")).head().getLong(0) == 11L)
  }

  for (fmt <- Seq("parquet", "orc")) {
    test(s"[$fmt] a WIDER batch column is a valid promotion: schema evolves, old files read up") {
      import spark.implicits._
      val tbl = GraftTable.create(spark, tmp(), cfg(fmt = fmt))
      tbl.bulkInsert(Seq((1L, "p0", 5, 1L)).toDF("id", "p", "v", "ts")) // v: Int
      tbl.upsert(Seq((2L, "p0", 6L, 2L)).toDF("id", "p", "v", "ts"))    // v: Long
      val snap = GraftReader(tbl).snapshot()
      assert(snap.schema("v").dataType == LongType)
      assert(snap.select(sum("v")).head().getLong(0) == 11L)
    }
  }

  test("an incompatible type change is rejected loudly") {
    import spark.implicits._
    val tbl = longTable()
    val e = intercept[IllegalArgumentException] {
      tbl.upsert(Seq((2L, "p0", "six", 2L)).toDF("id", "p", "v", "ts"))
    }
    assert(e.getMessage.contains("incompatible type change for column 'v'"))
  }

  test("int into a double column casts up (a double holds every int exactly)") {
    import spark.implicits._
    val tbl = GraftTable.create(spark, tmp(), cfg())
    tbl.bulkInsert(Seq((1L, "p0", 1.5d, 1L)).toDF("id", "p", "v", "ts"))
    tbl.upsert(Seq((2L, "p0", 7, 2L)).toDF("id", "p", "v", "ts")) // v: Int
    val snap = GraftReader(tbl).snapshot()
    assert(snap.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    assert(snap.select(sum("v")).head().getDouble(0) == 8.5d)
    // but LONG into double stays rejected: longs above 2^53 are not
    // double-exact, matching the ALTER COLUMN lattice exactly
    val e = intercept[IllegalArgumentException] {
      tbl.upsert(Seq((3L, "p0", 9L, 3L)).toDF("id", "p", "v", "ts"))
    }
    assert(e.getMessage.contains("incompatible type change for column 'v'"))
  }

  test("integral<->fractional is NOT a promotion in either direction") {
    import spark.implicits._
    // Spark's coercion precedence ranks Float above Long, but long->float
    // loses precision above 2^24 and a float commit schema cannot read
    // existing int64 files — both directions must reject, not 'widen'
    val tbl = longTable()
    val e1 = intercept[IllegalArgumentException] {
      tbl.upsert(Seq((2L, "p0", 6.5f, 2L)).toDF("id", "p", "v", "ts"))
    }
    assert(e1.getMessage.contains("incompatible type change for column 'v'"))

    val tblF = GraftTable.create(spark, tmp(), cfg())
    tblF.bulkInsert(Seq((1L, "p0", 5.5f, 1L)).toDF("id", "p", "v", "ts"))
    val e2 = intercept[IllegalArgumentException] {
      tblF.upsert(Seq((2L, "p0", 6L, 2L)).toDF("id", "p", "v", "ts"))
    }
    assert(e2.getMessage.contains("incompatible type change for column 'v'"))
  }

  for (fmt <- Seq("parquet", "orc")) {
    test(s"[$fmt] float->double is a valid promotion both ways (cast-up / widen)") {
      import spark.implicits._
      // narrower batch: float into a double column casts up
      val tblD = GraftTable.create(spark, tmp(), cfg(fmt = fmt))
      tblD.bulkInsert(Seq((1L, "p0", 1.5d, 1L)).toDF("id", "p", "v", "ts"))
      tblD.upsert(Seq((2L, "p0", 2.5f, 2L)).toDF("id", "p", "v", "ts"))
      val snapD = GraftReader(tblD).snapshot()
      assert(snapD.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
      assert(snapD.select(sum("v")).head().getDouble(0) == 4.0d)

      // wider batch: double batch widens a float column; old float files
      // read up through the double schema
      val tblF = GraftTable.create(spark, tmp(), cfg(fmt = fmt))
      tblF.bulkInsert(Seq((1L, "p0", 1.5f, 1L)).toDF("id", "p", "v", "ts"))
      tblF.upsert(Seq((2L, "p0", 2.5d, 2L)).toDF("id", "p", "v", "ts"))
      val snapF = GraftReader(tblF).snapshot()
      assert(snapF.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
      assert(snapF.select(sum("v")).head().getDouble(0) == 4.0d)
    }
  }

  override def afterAll(): Unit = spark.stop()
}
