package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("interval-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def points: DataFrame = {
    import spark.implicits._
    Seq(("A", 5L, 1L), ("A", 10L, 2L), ("A", 99L, 3L), ("B", 5L, 4L))
      .toDF("key", "pt", "pid")
  }

  private def intervals: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 0L, 6L, 10L), // covers pt=5 (and pt=... not 10)
      ("A", 4L, 12L, 11L), // covers 5 and 10 — overlapping intervals
      ("A", 10L, 10L, 12L), // degenerate single-tick interval at 10
      ("B", 90L, 120L, 13L)) // other key: must not see A's points
      .toDF("key", "iv_start", "iv_end", "ivid")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "ivid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containment pairs are exact, per key, with no duplicates") {
    // bucket far smaller than the spans: intervals fan over many buckets
    val out = IntervalJoin.pointInInterval(points, intervals,
      on = Seq("key"), pointCol = "pt", startCol = "iv_start",
      endCol = "iv_end", bucket = 3L)
    assert(pairs(out) == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)))
    // exactly one row per pair even though interval 11 spans 4 buckets
    assert(out.count() == 4)
    assert(out.columns.toSeq ==
      Seq("key", "pt", "pid", "iv_start", "iv_end", "ivid"))
  }

  test("bucket granularity never changes the answer") {
    val expected = Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L))
    Seq(1L, 2L, 7L, 100L).foreach { b =>
      val out = IntervalJoin.pointInInterval(points, intervals,
        on = Seq("key"), pointCol = "pt", startCol = "iv_start",
        endCol = "iv_end", bucket = b)
      assert(pairs(out) == expected, s"bucket=$b")
    }
  }

  test("exclusive end drops the boundary match") {
    val out = IntervalJoin.pointInInterval(points, intervals,
      on = Seq("key"), pointCol = "pt", startCol = "iv_start",
      endCol = "iv_end", bucket = 3L, inclusiveEnd = false)
    // the degenerate [10,10] interval has pt == end: excluded now
    assert(pairs(out) == Set((1L, 10L), (1L, 11L), (2L, 11L)))
    // make the boundary explicit: a point exactly at an interval end
    import spark.implicits._
    val p = Seq(("A", 6L, 9L)).toDF("key", "pt", "pid")
    val incl = IntervalJoin.pointInInterval(p, intervals, Seq("key"),
      "pt", "iv_start", "iv_end", bucket = 3L)
    val excl = IntervalJoin.pointInInterval(p, intervals, Seq("key"),
      "pt", "iv_start", "iv_end", bucket = 3L, inclusiveEnd = false)
    assert(pairs(incl).contains((9L, 10L)) && !pairs(excl).contains((9L, 10L)))
  }

  test("negative time axis: floor division keeps pre-epoch pairs exact") {
    import spark.implicits._
    val p = Seq(("A", -5L, 1L), ("A", -1L, 2L)).toDF("key", "pt", "pid")
    val iv = Seq(("A", -7L, -3L, 10L)).toDF("key", "iv_start", "iv_end", "ivid")
    val out = IntervalJoin.pointInInterval(p, iv, Seq("key"),
      "pt", "iv_start", "iv_end", bucket = 4L)
    assert(pairs(out) == Set((1L, 10L)))
  }

  test("plan shape: a single equi-join, no nested loop / cartesian") {
    val out = IntervalJoin.pointInInterval(points, intervals,
      on = Seq("key"), pointCol = "pt", startCol = "iv_start",
      endCol = "iv_end", bucket = 3L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
