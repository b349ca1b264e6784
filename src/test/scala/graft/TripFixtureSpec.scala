package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.read.GraftReader
import graft.services.TableServices
import graft.write.GraftTable

/** The reference's canonical test fixture end-to-end: FIXTURES.md §1
  * reproduces `HoodieTestDataGenerator`'s trip schema (reference:
  * hudi-common/src/test/java/org/apache/hudi/common/testutils/
  * HoodieTestDataGenerator.java:93-133) — nested struct, array of
  * struct, map, decimal(10,6), date, binary, float — and the
  * reference's whole test pyramid writes it. This spec drives the same
  * shape through the graft lifecycle: bulk insert, merging upsert,
  * soft delete via the honored `_g_deleted` flag, MOR deltas +
  * compaction, and exact snapshot equality. */
class TripFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("trip-fixture-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-trip").toFile
    d.deleteOnExit()
    d.toString
  }

  private def cfg(name: String, tt: String) = TableConfig(
    name = name, tableType = tt, keyFields = Seq("_row_key"),
    partitionFields = Seq("partition_path"), orderingField = "timestamp",
    targetFileRows = 100)

  /** Deterministic trip batch: every column type of the reference
    * fixture, pure functions of the id so expected states are
    * re-derivable. */
  private def trips(n: Int, tsBase: Long): DataFrame = {
    val parts = array(lit("2016-03-15"), lit("2015-03-16"), lit("2015-03-17"))
    spark.range(n).select(
      (lit(tsBase) + (col("id") % 50)).as("timestamp"),
      format_string("key-%05d", col("id")).as("_row_key"),
      element_at(parts, (col("id") % 3 + 1).cast("int")).as("partition_path"),
      concat(lit("rider-"), col("id") % 7).as("rider"),
      concat(lit("driver-"), col("id") % 11).as("driver"),
      (col("id") * 0.001).as("begin_lat"),
      (col("id") * 0.002).as("begin_lon"),
      (col("id") * 0.003).as("end_lat"),
      (col("id") * 0.004).as("end_lon"),
      (col("id") % 5000).cast("int").as("distance_in_meters"),
      (col("id") + 1500000000L).as("seconds_since_epoch"),
      (col("id") % 100).cast("float").as("weight"),
      encode(concat(lit("nat-"), col("id") % 25), "UTF-8").as("nation"),
      date_add(lit(java.sql.Date.valueOf("2015-01-01")),
        (col("id") % 365).cast("int")).as("current_date"),
      (col("id") * 1000L).as("current_ts"),
      (col("id").cast("decimal(10,6)") / lit(7)).cast("decimal(10,6)")
        .as("height"),
      map(lit("sf"), concat(lit("ca-"), col("id") % 3),
        lit("nyc"), lit("ny")).as("city_to_state"),
      struct((col("id") * 1.5).as("amount"), lit("USD").as("currency"))
        .as("fare"),
      array(
        struct((col("id") * 0.1).as("amount"), lit("USD").as("currency")),
        struct((col("id") * 0.2).as("amount"), lit("EUR").as("currency")))
        .as("tip_history"))
  }

  /** Map columns can't go through exceptAll; compare on a canonical
    * projection (map -> sorted entries). */
  private def canon(df: DataFrame): DataFrame =
    df.withColumn("city_to_state",
      array_sort(map_entries(col("city_to_state"))))

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val g = canon(got); val w = canon(want)
    assert(g.count() == w.count(), "row counts differ")
    assert(g.exceptAll(w).isEmpty && w.exceptAll(g).isEmpty,
      "snapshot != expected state")
  }

  private def lifecycle(tt: String): Unit = {
    val tbl = GraftTable.create(spark, freshDir(), cfg(s"trip_$tt", tt))
    val base = trips(120, tsBase = 1000L)
    tbl.bulkInsert(base)

    // update a third of the keys: later event time, new fare/map values
    val updates = trips(120, tsBase = 2000L)
      .filter(col("distance_in_meters") % 3 === 0)
      .withColumn("fare", struct(
        (col("fare.amount") + 100.0).as("amount"), lit("GBP").as("currency")))
      .withColumn("city_to_state",
        map(lit("sf"), lit("moved"), lit("nyc"), lit("ny")))
    tbl.upsert(updates)

    // soft delete: rows flagged through the honored _g_deleted column
    // inside an ordinary upsert batch (reference analog: the
    // _hoodie_is_deleted field, HoodieTestDataGenerator.java:99)
    val dels = trips(120, tsBase = 3000L)
      .filter(col("distance_in_meters") % 10 === 4)
      .withColumn("_g_deleted", lit(true))
    tbl.upsert(dels)

    if (tt == TableType.MOR) {
      val before = TableServices(tbl)
      before.compact()
    }

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot())

    val expected = {
      val upd = trips(120, tsBase = 2000L)
        .filter(col("distance_in_meters") % 3 === 0)
        .withColumn("fare", struct(
          (col("fare.amount") + 100.0).as("amount"), lit("GBP").as("currency")))
        .withColumn("city_to_state",
          map(lit("sf"), lit("moved"), lit("nyc"), lit("ny")))
      trips(120, tsBase = 1000L)
        .join(upd.select(col("_row_key")), Seq("_row_key"), "left_anti")
        .unionByName(upd)
        .filter(!(col("distance_in_meters") % 10 === 4))
    }
    assertSame(got.select(expected.columns.map(col): _*), expected)
  }

  test("COW lifecycle over the full trip schema (nested/map/decimal/binary)") {
    lifecycle(TableType.COW)
  }

  test("MOR lifecycle + compaction over the full trip schema") {
    lifecycle(TableType.MOR)
  }

  test("stats columns on decimal/date/timestamp never drop rows (skip-safety)") {
    val c = cfg("trip_stats", TableType.COW).copy(
      statsColumns = Seq("height", "current_date", "timestamp"))
    val tbl = GraftTable.create(spark, freshDir(), c)
    tbl.bulkInsert(trips(200, tsBase = 1000L))
    val r = GraftReader(tbl)
    val snap = r.dataOnly(r.snapshot())
    // filters on the stats columns: every row the full scan finds must
    // survive the pruned scan
    assert(snap.filter(col("height") > 10.0).count() ==
      trips(200, 1000L).filter(col("height") > 10.0).count())
    assert(snap.filter(col("current_date") === "2015-02-15").count() ==
      trips(200, 1000L).filter(col("current_date") === "2015-02-15").count())
    assert(snap.filter(col("timestamp") >= 1025L).count() ==
      trips(200, 1000L).filter(col("timestamp") >= 1025L).count())
  }

  test("schema evolution on the map-bearing schema: add column, evolved upsert") {
    val tbl = GraftTable.create(spark, freshDir(), cfg("trip_evo", TableType.COW))
    tbl.bulkInsert(trips(60, tsBase = 1000L))
    // evolved batch carries a NEW column; old files lack it
    val evolved = trips(60, tsBase = 2000L)
      .filter(col("distance_in_meters") % 4 === 0)
      .withColumn("surge", (col("distance_in_meters") % 3).cast("double"))
    tbl.upsert(evolved)
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot())
    assert(got.columns.contains("surge"), "new column visible after evolution")
    assert(got.count() == 60)
    // untouched rows read the new column as null; updated rows carry it
    assert(got.filter(col("surge").isNotNull).count() == evolved.count())
    val updKeys = evolved.select("_row_key")
    assert(got.join(updKeys, Seq("_row_key"), "left_semi")
      .filter(col("timestamp") < 2000L).count() == 0,
      "every updated key shows the evolved row")
  }

  test("nested schema pruning reaches the scan through the graft reader") {
    val tbl = GraftTable.create(spark, freshDir(), cfg("trip_prune", TableType.COW))
    tbl.bulkInsert(trips(60, tsBase = 1000L))
    val r = GraftReader(tbl)
    val q = r.dataOnly(r.snapshot()).select(col("fare.amount"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet scan")
    val read = scans.head.requiredSchema.catalogString
    // the scan must read fare.amount only — not currency, not the map,
    // not tip_history (at 100 TB an unpruned struct scan reads the table)
    assert(read.contains("amount"), s"fare.amount missing from ReadSchema: $read")
    assert(!read.contains("currency") && !read.contains("city_to_state") &&
      !read.contains("tip_history"),
      s"nested pruning lost through the graft reader; ReadSchema: $read")
  }

  test("MERGE INTO drives update+delete+insert over the map-bearing schema") {
    val tbl = GraftTable.create(spark, freshDir(), cfg("trip_merge", TableType.COW))
    tbl.bulkInsert(trips(60, tsBase = 1000L))
    val source = trips(80, tsBase = 2000L) // ids 60-79 are fresh inserts
    graft.sql.GraftDml(tbl)
      .merge(source, col("s._row_key") === col("t._row_key"))
      .whenMatchedDelete(Some(col("s.distance_in_meters") % 10 === 1))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot())
    val expected = trips(80, tsBase = 2000L)
      .filter(!(col("distance_in_meters") % 10 === 1) ||
        col("distance_in_meters") >= 60) // deletes hit only matched (id<60) rows
    assertSame(got.select(expected.columns.map(col): _*), expected)
  }

  test("incremental read surfaces exactly the upsert's changed trip rows") {
    val tbl = GraftTable.create(spark, freshDir(), cfg("trip_inc", TableType.COW))
    val t1 = tbl.bulkInsert(trips(90, tsBase = 1000L))
    val upd = trips(90, tsBase = 2000L).filter(col("distance_in_meters") % 9 === 0)
    tbl.upsert(upd)
    val r = GraftReader(tbl)
    val inc = r.dataOnly(r.incremental(t1))
    assertSame(inc.select(upd.columns.map(col): _*), upd)
  }
}
