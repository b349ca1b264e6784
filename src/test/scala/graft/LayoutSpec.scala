package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core._
import graft.read.{GraftFileIndex, GraftReader}
import graft.services.TableServices
import graft.write.GraftTable

/** Space-filling-curve layout + data skipping, mirroring the reference's
  * SpaceCurveOptimizeBenchMark.scala:45-50 workload: 1M rows, 2 int
  * columns, 200 files, filter `c1 = med OR c2 = med`; reference skip
  * fractions: Z-map 0.80, Z-sample 0.77, Hilbert-map 0.855. */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-layout").toString

  val rows = 1000000L
  val filesTarget = 200

  def synth: DataFrame = spark.range(rows).select(
    col("id"),
    (rand(7) * 1000000).cast("int").as("c1"),
    (rand(11) * 1000000).cast("int").as("c2"))

  def mkTable(): (GraftTable, TableServices) = {
    val dir = tmp()
    val conf = TableConfig(name = "pts", tableType = TableType.COW,
      keyFields = Seq("id"), partitionFields = Nil, orderingField = "",
      targetFileRows = rows / filesTarget, statsColumns = Seq("c1", "c2"))
    val tbl = GraftTable.create(spark, dir, conf)
    tbl.bulkInsert(synth)
    (tbl, TableServices(tbl))
  }

  /** fraction of files pruned for `c1 = med OR c2 = med` via the FileIndex */
  def skipFraction(tbl: GraftTable): Double = {
    val snap = Snapshot.resolve(tbl.timeline)
    val stats = snap.slices.flatMap(_.baseFile)
    val schema = tbl.readSchema(snap)
    val idx = new GraftFileIndex(tbl.basePath, stats, schema)
    val pred = spark.sessionState.sqlParser.parseExpression("c1 = 500000 OR c2 = 500000")
    val kept = idx.listFiles(Nil, Seq(pred)).head.files.size
    1.0 - kept.toDouble / stats.size
  }

  test("timestamp stats columns keep footer min/max (INT96 would lose them)") {
    val dir = tmp()
    val conf = TableConfig(name = "tstats", tableType = TableType.COW,
      keyFields = Seq("id"), partitionFields = Nil, orderingField = "",
      targetFileRows = 500, statsColumns = Seq("ts", "d"))
    val tbl = GraftTable.create(spark, dir, conf)
    tbl.bulkInsert(spark.range(2000).select(
      col("id"),
      expr("timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)").as("ts"),
      expr("date_add(date'2026-01-01', CAST(id % 40 AS INT))").as("d")))
    // cluster linearly on ts so per-file time ranges are tight
    TableServices(tbl).cluster(sortCols = Seq("ts"), targetFileRows = 500)
    val stats = Snapshot.resolve(tbl.timeline).slices.flatMap(_.baseFile)
    assert(stats.size >= 3)
    stats.foreach { st =>
      val ts = st.columnStats.get("ts")
      assert(ts.exists(s => s.min != null && s.max != null),
        s"timestamp footer stats must be present, got $ts in ${st.path}")
      assert(ts.exists(s => s.min.startsWith("2026-01-01T")),
        s"timestamp stat must re-parse as a wall time: ${ts.map(_.min)}")
      val d = st.columnStats.get("d")
      assert(d.exists(s => s.min != null && s.min.startsWith("2026-")),
        s"date footer stats must be present: $d")
    }
    // and the FileIndex actually prunes on them: a narrow time window
    // should keep a small fraction of the files
    val snap = Snapshot.resolve(tbl.timeline)
    val idx = new GraftFileIndex(tbl.basePath, stats, tbl.readSchema(snap))
    val pred = spark.sessionState.sqlParser
      .parseExpression("ts < TIMESTAMP '2026-01-01 00:01:00'")
    val kept = idx.listFiles(Nil, Seq(pred)).head.files.size
    assert(kept < stats.size,
      s"timestamp window must prune files: kept $kept of ${stats.size}")
  }

  test("z-order map-ranked layout reaches reference skip fraction") {
    val (tbl, svc) = mkTable()
    assert(skipFraction(tbl) < 0.2, "pre-clustering files barely skippable")
    val before = GraftReader(tbl).snapshot().count()
    svc.cluster(Seq("c1", "c2"), layout = "zorder", rankMode = "map").get
    val frac = skipFraction(tbl)
    info(f"z-order/map skip fraction: $frac%.3f (reference 0.80)")
    assert(frac >= 0.78, s"z-order map skip $frac < 0.78")
    assert(GraftReader(tbl).snapshot().count() == before, "row count stable")
  }

  test("hilbert layout beats z-order; sample ranking holds too") {
    val (tbl, svc) = mkTable()
    svc.cluster(Seq("c1", "c2"), layout = "hilbert", rankMode = "map").get
    val frac = skipFraction(tbl)
    info(f"hilbert/map skip fraction: $frac%.3f (reference 0.855)")
    assert(frac >= 0.82, s"hilbert map skip $frac < 0.82")

    val (tbl2, svc2) = mkTable()
    svc2.cluster(Seq("c1", "c2"), layout = "zorder", rankMode = "sample").get
    val frac2 = skipFraction(tbl2)
    info(f"z-order/sample skip fraction: $frac2%.3f (reference 0.77)")
    assert(frac2 >= 0.72, s"z-order sample skip $frac2 < 0.72")
  }

  test("stats pruning is end-to-end correct through the reader") {
    val (tbl, svc) = mkTable()
    svc.cluster(Seq("c1", "c2"), layout = "zorder", rankMode = "map")
    val r = GraftReader(tbl)
    val med = 500000
    val expected = synth.filter(col("c1") === med || col("c2") === med).count()
    val got = r.snapshot().filter(col("c1") === med || col("c2") === med).count()
    assert(got == expected, s"pruned read returned $got, want $expected")
    // range predicate across the key stats path too
    val k = r.snapshot().filter(col("id") < 1000).count()
    assert(k == 1000)
  }

  test("stats skipping handles NOT shapes soundly") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import graft.core.{ColStat, WriteStat}
    import graft.read.StatsSkipping.mayMatch
    val schema = StructType(Seq(StructField("c", IntegerType)))
    def stat(min: String, max: String): WriteStat =
      WriteStat("", "f", "f.parquet", rows = 10,
        columnStats = Map("c" -> ColStat(min, max, 0L)))
    val a = AttributeReference("c", IntegerType)()
    def lit(i: Int) = Literal(i, IntegerType)

    val wide = stat("1", "9")
    val single = stat("5", "5")
    // NOT(=): only a single-valued file with that exact value skips
    assert(mayMatch(Not(EqualTo(a, lit(5))), wide, schema))
    assert(!mayMatch(Not(EqualTo(a, lit(5))), single, schema))
    assert(mayMatch(Not(EqualTo(a, lit(4))), single, schema))
    // NOT(<) == >=, NOT(>) == <=
    assert(!mayMatch(Not(LessThan(a, lit(100))), wide, schema))
    assert(mayMatch(Not(LessThan(a, lit(5))), wide, schema))
    assert(!mayMatch(Not(GreaterThan(a, lit(0))), wide, schema))
    // De Morgan: NOT(c < 100 AND c > 0) == c >= 100 OR c <= 0 -> skip [1,9]
    assert(!mayMatch(Not(And(LessThan(a, lit(100)), GreaterThan(a, lit(0)))), wide, schema))
    // NOT IN: single-valued file inside the set skips; wide file kept
    assert(!mayMatch(Not(In(a, Seq(lit(5), lit(7)))), single, schema))
    assert(mayMatch(Not(In(a, Seq(lit(4), lit(7)))), single, schema))
    assert(mayMatch(Not(In(a, Seq(lit(5), lit(7)))), wide, schema))
    // double negation
    assert(!mayMatch(Not(Not(EqualTo(a, lit(42)))), wide, schema))
  }

  override def afterAll(): Unit = spark.stop()
}
