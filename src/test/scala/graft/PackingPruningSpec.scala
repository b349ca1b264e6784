package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Small-file bin packing (reference analog:
  * UpsertPartitioner.assignInserts small-file fill,
  * UpsertPartitioner.java:157-230) and key-range pruning of the upsert
  * tag join (reference analog: HoodieBloomIndex.loadInvolvedFiles :136
  * + KeyRangeLookupTree interval pruning). */
class PackingPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-pack").toString

  /** fixed-width string keys so lexicographic ranges mirror numeric ones */
  def batch(lo: Int, n: Int, mult: Long = 2L): DataFrame =
    spark.range(lo, lo + n)
      .select(format_string("k%05d", col("id")).as("k"), (col("id") * mult).as("v"))

  def cfg(tt: String, target: Long, small: Long = -1L): TableConfig = TableConfig(
    name = "pack", tableType = tt, keyFields = Seq("k"),
    partitionFields = Nil, targetFileRows = target, smallFileRows = small)

  test("COW trickle inserts converge into target-sized groups without clustering") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, target = 1000))
    (0 until 10).foreach(i => tbl.insert(batch(i * 200, 200)))
    val snap = Snapshot.resolve(tbl.timeline)
    // 2000 rows at target 1000 (fill limit 750): groups fill to ~800
    // before falling off the small-file list — NOT one group per commit
    assert(snap.slices.size <= 4,
      s"expected trickle inserts to converge, got ${snap.slices.size} groups")
    assert(snap.slices.size >= 2, "groups should still split at target size")
    val r = GraftReader(tbl)
    assert(r.snapshot().count() == 2000)
    assert(r.dataOnly(r.snapshot()).select("k").distinct().count() == 2000)
  }

  test("smallFileRows=0 disables bin packing (one group per insert)") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, target = 1000, small = 0))
    (0 until 5).foreach(i => tbl.insert(batch(i * 200, 200)))
    val snap = Snapshot.resolve(tbl.timeline)
    assert(snap.slices.size == 5, s"got ${snap.slices.size}")
  }

  test("bulk_insert never fills existing groups") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, target = 1000))
    tbl.bulkInsert(batch(0, 300))
    tbl.bulkInsert(batch(1000, 300))
    val snap = Snapshot.resolve(tbl.timeline)
    assert(snap.slices.size == 2, s"got ${snap.slices.size}")
  }

  test("MOR upsert routes fill inserts as deltas onto the small group") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.MOR, target = 1000))
    tbl.bulkInsert(batch(0, 300))
    tbl.upsert(batch(1000, 200)) // all-new keys, fit the existing group
    val snap = Snapshot.resolve(tbl.timeline)
    assert(snap.slices.size == 1,
      s"fill inserts should ride the existing group, got ${snap.slices.size}")
    assert(snap.slices.head.deltas.nonEmpty, "fill must land as a delta file")
    val r = GraftReader(tbl)
    assert(r.snapshot().count() == 500)
    // compaction folds the fill rows in; answer unchanged
    graft.services.TableServices(tbl).compact()
    assert(GraftReader(tbl).snapshot().count() == 500)
  }

  test("targetFileBytes derives the file target from observed record size") {
    val c = TableConfig(name = "packb", tableType = TableType.COW,
      keyFields = Seq("k"), targetFileBytes = 50000L,
      targetFileRows = 1000000000L) // absurd row target: bytes must govern
    val tbl = GraftTable.create(spark, tmp(), c)
    // first write: no stats yet -> 1024 B/row seed (reference's estimate
    // seed) -> tiny groups
    tbl.insert(batch(0, 200))
    val afterSeed = Snapshot.resolve(tbl.timeline).slices.size
    assert(afterSeed >= 2, s"seeded estimate should split 200 rows, got $afterSeed groups")
    // second write: the observed average record size (tens of bytes) now
    // sizes groups at thousands of rows -> the 5000 rows converge into
    // few groups instead of ~100 seed-sized ones
    tbl.insert(batch(1000, 5000))
    val after = Snapshot.resolve(tbl.timeline)
    assert(after.slices.size < afterSeed + 12,
      s"observed-size target should bound group count, got ${after.slices.size}")
    val r = GraftReader(tbl)
    assert(r.snapshot().count() == 5200)
  }

  test("pruneByKeyRange keeps only files overlapping the batch range") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, target = 1000, small = 0))
    tbl.insert(batch(0, 100))
    tbl.insert(batch(10000, 100))
    tbl.insert(batch(20000, 100))
    val stats = Snapshot.resolve(tbl.timeline).slices.flatMap(_.allFiles)
    assert(stats.size == 3)
    val pruned = GraftTable.pruneByKeyRange(stats, _ => Some(("k10000", "k10099")))
    assert(pruned.size == 1, s"expected 1 overlapping file, got ${pruned.size}")
    assert(pruned.head.minKey == "k10000" && pruned.head.maxKey == "k10099")
    // no range -> no pruning
    assert(GraftTable.pruneByKeyRange(stats, _ => None).size == 3)
    // unknown stats are never pruned (soundness)
    val blind = stats.map(_.copy(minKey = "", maxKey = ""))
    assert(GraftTable.pruneByKeyRange(blind, _ => Some(("a", "b"))).size == 3)
  }

  test("upsert stays correct with key-range pruning active") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, target = 1000, small = 0))
    tbl.insert(batch(0, 100))
    tbl.insert(batch(10000, 100))
    tbl.insert(batch(20000, 100))
    // update ONLY the middle range: the tag join prunes ranges 1 and 3
    tbl.upsert(batch(10000, 100, mult = 5L))
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot())
    assert(got.count() == 300)
    assert(got.filter(col("k") >= "k10000" && col("k") <= "k10099")
      .filter(col("v") =!= expr("CAST(substring(k, 2, 5) AS LONG) * 5")).count() == 0)
    assert(got.filter(col("k") < "k10000")
      .filter(col("v") =!= expr("CAST(substring(k, 2, 5) AS LONG) * 2")).count() == 0)
  }
}
