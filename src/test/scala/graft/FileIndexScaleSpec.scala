package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColStat, WriteStat}
import graft.read.GraftFileIndex

/** Planning-cost probe for [[GraftFileIndex.listFiles]] at large slice
  * counts (the per-QUERY driver cost once the snapshot spine itself is
  * checkpoint-fast): a selective partition predicate over 100k and 1M
  * file entries must prune at BUCKET granularity — O(#partitions +
  * matching files) — never walk a million per-file stats entries. No
  * SparkSession needed: listFiles takes Catalyst expressions directly. */
class FileIndexScaleSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("part", StringType),
    StructField("x", LongType)))

  /** nParts × filesPer synthetic entries with partition + data stats. */
  private def mk(nParts: Int, filesPer: Int): Seq[WriteStat] =
    (0 until nParts).flatMap { p =>
      val pv = f"p$p%06d"
      (0 until filesPer).map { f =>
        WriteStat(partition = pv, fileId = s"$pv-$f",
          path = s"$pv/f$f.parquet", rows = 100, bytes = 1000,
          minKey = f"k$f%04d", maxKey = f"k$f%04d~",
          columnStats = Map(
            "part" -> ColStat(pv, pv, 0),
            "x" -> ColStat((f * 10).toString, (f * 10 + 9).toString, 0)))
      }
    }

  private def partEq(v: String): Expression =
    EqualTo(AttributeReference("part", StringType)(), Literal.create(v, StringType))
  private def xEq(v: Long): Expression =
    EqualTo(AttributeReference("x", LongType)(), Literal.create(v, LongType))

  /** Stats evaluations performed by `body` (installs the probe). */
  private def countingEvals(body: => Unit): Long = {
    val c = new java.util.concurrent.atomic.AtomicLong(0L)
    graft.read.StatsSkipping.evalProbe = c
    try { body; c.get } finally graft.read.StatsSkipping.evalProbe = null
  }

  for ((nParts, filesPer, label) <- Seq((1000, 100, "100k"), (1000, 1000, "1M")))
  test(s"selective partition planning at $label entries prunes at bucket " +
      "granularity") {
    val files = mk(nParts, filesPer)
    val t0 = System.nanoTime()
    val idx = new GraftFileIndex("/chaos/base", files, schema,
      partitionFields = Seq("part"))
    info(f"[$label] index construction ${(System.nanoTime() - t0) / 1e6}%.1f ms " +
      "(per relation; FileStatus/Path materialize lazily for KEPT files only)")
    val target = f"p${123}%06d"

    // exactness first; this FIRST call pays the one-time-per-relation
    // bucket build, i.e. the real cold planning cost of a fresh query
    val tCold = System.nanoTime()
    val sel = idx.listFiles(Nil, Seq(partEq(target), xEq(45L)))
    info(f"[$label] cold listFiles (incl. bucket build) " +
      f"${(System.nanoTime() - tCold) / 1e6}%.1f ms")
    val got = sel.flatMap(_.files.map(_.getPath.toString)).toSet
    val want = files.filter(st => st.partition == target &&
        st.columnStats("x").min.toLong <= 45L &&
        st.columnStats("x").max.toLong >= 45L)
      .map(st => s"/chaos/base/${st.path}").toSet
    assert(got == want && got.nonEmpty,
      s"selective planning must return exactly the matching files (${got.size} vs ${want.size})")

    // The structural claim, asserted by COUNTING stats evaluations (a
    // wall-clock gate would flake on a loaded CI box and would pass a
    // regression that re-walks every entry on faster hardware):
    //  - selective = one bucket-representative evaluation per partition
    //    for the partition term, plus the surviving bucket's files for
    //    the data term — O(#partitions + matching files)
    //  - a data-only predicate has no partition term to bucket on: the
    //    O(N) per-file floor it must NOT share
    val full = countingEvals(idx.listFiles(Nil, Seq(xEq(45L))))
    val selEvals = countingEvals(idx.listFiles(Nil, Seq(partEq(target), xEq(45L))))
    info(s"[$label] stats evaluations: selective=$selEvals, full-walk=$full")
    assert(selEvals <= nParts + filesPer,
      s"selective planning must evaluate at most #partitions ($nParts) + " +
        s"one bucket ($filesPer) stats entries, saw $selEvals")
    assert(full >= nParts.toLong * filesPer,
      s"the data-only control must walk every entry (${nParts * filesPer}), saw $full")

    // timing stays informational (the record, not the gate)
    val tFull = { val t = System.nanoTime(); idx.listFiles(Nil, Seq(xEq(45L)))
      (System.nanoTime() - t) / 1e6 }
    val tSel = { val t = System.nanoTime()
      idx.listFiles(Nil, Seq(partEq(target), xEq(45L)))
      (System.nanoTime() - t) / 1e6 }
    info(f"[$label] selective=$tSel%.2f ms, full-walk=$tFull%.2f ms (info-only)")
  }

  test("bucket pruning is exactly as selective as the per-file walk (fuzz)") {
    val files = mk(50, 20)
    val withPf = new GraftFileIndex("/b", files, schema, partitionFields = Seq("part"))
    val noPf = new GraftFileIndex("/b", files, schema) // legacy per-file path
    // UNSORTED input exercises the bucket build's hash-grouping fallback
    // (the run-scan fast path assumes partition-sorted snapshot slices)
    val shuffledPf = new GraftFileIndex("/b",
      new scala.util.Random(3L).shuffle(files), schema,
      partitionFields = Seq("part"))
    val rng = new scala.util.Random(7L)
    for (_ <- 1 to 40) {
      val preds = Seq(
        Option.when(rng.nextBoolean())(partEq(f"p${rng.nextInt(60)}%06d")),
        Option.when(rng.nextBoolean())(
          GreaterThan(AttributeReference("part", StringType)(),
            Literal.create(f"p${rng.nextInt(60)}%06d", StringType))),
        Option.when(rng.nextBoolean())(xEq(rng.nextInt(220).toLong))
      ).flatten
      val a = withPf.listFiles(Nil, preds).flatMap(_.files.map(_.getPath.toString)).toSet
      val b = noPf.listFiles(Nil, preds).flatMap(_.files.map(_.getPath.toString)).toSet
      val c = shuffledPf.listFiles(Nil, preds).flatMap(_.files.map(_.getPath.toString)).toSet
      assert(a == b, s"bucketed vs per-file divergence under $preds")
      assert(c == b, s"hash-fallback bucket path diverged under $preds")
    }
  }
}
