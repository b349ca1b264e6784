package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Tables.configure(
    SparkSession.builder()
      .master("local[4]")
      .appName("asof-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 1L, 1L, 10.0), ("A", 5L, 2L, 11.0), ("A", 5L, 3L, 12.0),
      ("A", 9L, 4L, 13.0), ("B", 4L, 5L, 20.0))
      .toDF("key", "qt", "qid", "px")
  }

  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 0L, 100L), ("A", 5L, 101L), ("A", 7L, 102L),
      ("A", 100L, 103L), ("B", 3L, 104L), ("C", 1L, 105L))
      .toDF("key", "tt", "tid")
  }

  private def matches(df: DataFrame): Map[Long, Option[Long]] =
    df.select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("backward inclusive: latest quote at-or-before, greatest-qid tie-break") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", tiebreak = Seq("qid"))
    assert(out.columns.toSeq == Seq("key", "tt", "tid", "qt", "qid", "px"))
    assert(out.count() == 6, "left-join semantics: every trade kept")
    assert(matches(out) == Map(
      100L -> None, // nothing at or before t=0
      101L -> Some(3L), // t=5 tie between qid 2 and 3 -> greatest wins
      102L -> Some(3L), // latest <= 7 is the t=5 pair
      103L -> Some(4L),
      104L -> None, // B's only quote is LATER than the trade
      105L -> None)) // no C quotes at all
    // matched values come through intact
    val px101 = out.filter(col("tid") === 101L).head().getAs[Double]("px")
    assert(px101 == 12.0)
  }

  test("strict backward excludes the same-tick quote") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", strict = true, tiebreak = Seq("qid"))
    assert(matches(out)(101L) == Some(1L)) // t=5 pair invisible, falls to t=1
    assert(matches(out)(102L) == Some(3L)) // strictness only bites equal ticks
  }

  test("forward: earliest quote at-or-after; strict skips the same tick") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", direction = "forward",
      tiebreak = Seq("qid"))
    assert(matches(out) == Map(
      100L -> Some(1L), 101L -> Some(3L), 102L -> Some(4L),
      103L -> None, 104L -> Some(5L), 105L -> None))
    val strictOut = AsofJoin.asof(trades, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", direction = "forward",
      strict = true, tiebreak = Seq("qid"))
    assert(matches(strictOut)(101L) == Some(4L))
  }

  test("tolerance nulls far matches but keeps the rows") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", tolerance = Some(2L),
      tiebreak = Seq("qid"))
    assert(out.count() == 6)
    assert(matches(out)(102L) == Some(3L)) // gap 2 == tolerance: kept
    assert(matches(out)(103L) == None) // gap 91: nulled
  }

  test("null left time matches nothing in either direction") {
    import spark.implicits._
    val l = Seq(("A", Some(5L), 1L), ("A", None, 2L))
      .toDF("key", "tt", "tid")
    val back = AsofJoin.asof(l, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", tiebreak = Seq("qid"))
    assert(matches(back) == Map(1L -> Some(3L), 2L -> None))
    val fwd = AsofJoin.asof(l, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", direction = "forward",
      tiebreak = Seq("qid"))
    assert(matches(fwd) == Map(1L -> Some(3L), 2L -> None))
  }

  test("null right times and null equi keys never provide matches") {
    import spark.implicits._
    // a null-time quote would sort FIRST under backward's ascending
    // order and leak its payload into otherwise-unmatched trades; a
    // null-key quote would meet null-key trades in the same window
    // partition — both are non-matches under SQL equality semantics
    val q = Seq(
      (Option("A"), Option.empty[Long], 1L, 10.0), // null time
      (Option.empty[String], Option(1L), 2L, 20.0) // null key
    ).toDF("key", "qt", "qid", "px")
    val t = Seq(
      (Option("A"), 0L, 100L),            // before any real quote
      (Option.empty[String], 5L, 101L)    // null key
    ).toDF("key", "tt", "tid")
    for (dir <- Seq("backward", "forward")) {
      val out = AsofJoin.asof(t, q, on = Seq("key"),
        leftTime = "tt", rightTime = "qt", direction = dir, tiebreak = Seq("qid"))
      assert(out.count() == 2, s"$dir lost left rows")
      assert(matches(out) == Map(100L -> None, 101L -> None),
        s"$dir produced a match from a null time/key: ${matches(out)}")
    }
  }

  test("colliding right columns are rejected loudly") {
    import spark.implicits._
    val bad = quotes.withColumnRenamed("px", "tid") // collides with left
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asof(trades, bad, on = Seq("key"),
        leftTime = "tt", rightTime = "qt")
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("plan shape: one key shuffle, no cartesian / nested-loop join") {
    val out = AsofJoin.asof(trades, quotes, on = Seq("key"),
      leftTime = "tt", rightTime = "qt", tiebreak = Seq("qid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // the as-of itself joins nothing: the only binary operator is the
    // union feeding the window
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }
}
