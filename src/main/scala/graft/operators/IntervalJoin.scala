package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: every (left point, right interval)
  * pair sharing the equi keys with `start <= point <= end` — the
  * second temporal-join shape Spark has no native operator for (its
  * planner turns the naive formulation into a per-key nested loop).
  *
  * Implementation bucketizes the time axis on a fixed granule B:
  * each interval explodes into one row per covered bucket
  * (`floorDiv(start,B) .. floorDiv(end,B)`), each point maps to its
  * own bucket, and the two sides meet in an ordinary equi-join on
  * `(keys..., bucket)` followed by the exact bounds filter. A pair
  * can only meet in the POINT's bucket, so the join emits no
  * duplicates and needs no distinct.
  *
  * Scale shape: ONE equi-join shuffle; interval blowup is
  * `len/B + 1` rows, so pick `bucket` near the typical interval
  * length (blowup ≈ 2×) — at 100 TB the cost is a bounded constant
  * factor on the small side, not an O(|L|·|R|) probe. Extremely long
  * outlier intervals fan out proportionally; cap or split them
  * upstream if the interval-length distribution is heavy-tailed.
  *
  * The right side's non-key columns are exposed under their own
  * names; overlapping names are rejected loudly. Output multiplicity
  * is the true 1:N containment relation (inner-join semantics).
  */
object IntervalJoin {

  /** Exact floor division on a long column (negative-safe — `div`
    * truncates toward zero, which is wrong left of the epoch). */
  private def floorDiv(c: Column, b: Long): Column =
    ((c - ((c % b + b) % b)) / b).cast("long")

  /** @param on           equi-join key column names (both sides)
    * @param pointCol     left time-point column (long, any fixed unit)
    * @param startCol     right interval start column (same unit)
    * @param endCol       right interval end column (same unit)
    * @param bucket       bucketization granule in the same unit; pick
    *                     ≈ the typical interval length
    * @param inclusiveEnd whether `point == end` matches
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucket: Long,
      inclusiveEnd: Boolean = true): DataFrame = {
    require(on.nonEmpty, "interval join needs at least one equi key")
    require(bucket > 0, "bucket granule must be positive")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(on.contains)
    val overlap = rightPayload.filter(leftCols.contains)
    require(overlap.isEmpty,
      s"right-side columns collide with left: ${overlap.mkString(", ")} — rename them first")

    val b = "_g_iv_bucket"
    val l = left.withColumn(b, floorDiv(col(pointCol), bucket))
    val r = right.withColumn(b,
      explode(sequence(floorDiv(col(startCol), bucket),
        floorDiv(col(endCol), bucket))))
    val endBound =
      if (inclusiveEnd) col(pointCol) <= col(endCol)
      else col(pointCol) < col(endCol)
    l.join(r, on :+ b)
      .filter(col(pointCol) >= col(startCol) && endBound)
      .drop(b)
  }
}
