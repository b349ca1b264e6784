package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single right row with
  * the greatest `rightTime <= leftTime` (direction = backward) or the
  * least `rightTime >= leftTime` (forward) among rows sharing the equi
  * keys — the pandas `merge_asof` / Flink temporal-join shape, which
  * Spark has no native operator for.
  *
  * Implementation is the union + per-key window carry-forward pattern,
  * NOT an inequality join: tag each side, union by name, sort within
  * each key by time (rights ahead of lefts at equal time so inclusive
  * bounds see them; flipped when `strict`), and carry the last non-null
  * right payload forward with `last(ignoreNulls)` over an
  * unbounded-preceding frame. Every left row then holds its as-of match
  * and unmatched rows keep nulls (left-join semantics).
  *
  * Scale shape: ONE shuffle (the window's hash partitioning on the equi
  * keys) and one per-partition sort — no range join, no cartesian, no
  * per-row probe. An inequality join here is O(|L|·|R|) per key; this
  * is O((|L|+|R|)·log) and survives 100 TB under the same contract as
  * any window aggregation (a single key's rows fit a task).
  *
  * Determinism: ties on `rightTime` are broken by `tiebreak` columns
  * (the greatest combination wins). Pass the right side's unique id
  * there to make the pick exact — required for oracle-hash
  * reproducibility.
  *
  * The right side's non-key columns (including `rightTime`) are exposed
  * under their own names; overlapping names are rejected loudly —
  * rename before joining.
  */
object AsofJoin {

  /** @param on        equi-join key column names (present on both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name; keep BOTH times in
    *                  one comparable granularity (e.g. micros) — the
    *                  operator compares them verbatim
    * @param direction "backward" (latest right at-or-before left) or
    *                  "forward" (earliest right at-or-after left)
    * @param strict    true = exclusive bound (`<` / `>`): a right row at
    *                  exactly leftTime no longer matches
    * @param tolerance max allowed |leftTime - rightTime| in the time
    *                  columns' own units; farther matches become nulls
    *                  (the row is kept — left-join semantics)
    * @param tiebreak  right-side columns breaking equal-time ties; the
    *                  greatest combination wins
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: String = "backward",
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one equi key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(!on.contains(rightTime) && !on.contains(leftTime),
      "time columns cannot also be equi keys")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(on.contains)
    val overlap = rightPayload.filter(leftCols.contains)
    require(overlap.isEmpty,
      s"right-side columns collide with left: ${overlap.mkString(", ")} — rename them first")
    require(tiebreak.forall(rightPayload.contains),
      "tiebreak columns must be right-side non-key columns")

    val t = "_g_asof_t" // unified time axis
    val side = "_g_asof_side" // sort order within a time tick
    val pay = "_g_asof_pay"
    // inclusive: rights sort before lefts at equal time (visible);
    // strict: lefts first (a right row at the same tick is NOT a match)
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    // SQL join null semantics: a right row with a null equi key or a
    // null time can never be anyone's match — dropped up front. (Without
    // this, backward's ascending sort puts null times FIRST and their
    // payload would carry into every otherwise-unmatched left; and
    // window partitioning would group null keys together, matching
    // null-keyed lefts to null-keyed rights, which an equality join
    // never does.)
    val rMatchable = (on :+ rightTime)
      .map(col(_).isNotNull).reduce(_ && _)
    val r = right.filter(rMatchable).select(
      on.map(col) ++ Seq(
        col(rightTime).as(t),
        lit(rightSide).as(side),
        struct(rightPayload.map(col): _*).as(pay)) ++
        tiebreak.map(col): _*)
    val l0 = left.select(
      col("*"),
      col(leftTime).as(t),
      lit(leftSide).as(side),
      lit(null).cast(r.schema(pay).dataType).as(pay))
    // lefts don't carry the right-side tiebreak columns; align as nulls
    // (harmless for ordering — every left at a tick sees the same state)
    val l = tiebreak.foldLeft(l0)((d, c) =>
      d.withColumn(c, lit(null).cast(r.schema(c).dataType)))

    val timeAsc = direction == "backward"
    val ord: Seq[Column] =
      (if (timeAsc) col(t).asc else col(t).desc) +:
        col(side).asc +: tiebreak.map(col(_).asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rAligned = r.select(l.columns.map { c =>
      if (on.contains(c) || c == t || c == side || c == pay || tiebreak.contains(c)) col(c)
      else lit(null).cast(l.schema(c).dataType).as(c)
    }: _*)

    val joined = l.unionByName(rAligned)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      // a null left time matches nothing in either direction
      .withColumn(pay, when(col(t).isNotNull, col(pay)))
      .filter(col(side) === leftSide)

    val withTol = tolerance match {
      case None => joined
      case Some(tol) =>
        val gap =
          if (timeAsc) col(t) - col(pay)(rightTime)
          else col(pay)(rightTime) - col(t)
        joined.withColumn(pay, when(gap <= tol, col(pay)))
    }
    withTol.select(
      leftCols.map(col) ++ rightPayload.map(c => col(pay)(c).as(c)): _*)
  }
}
