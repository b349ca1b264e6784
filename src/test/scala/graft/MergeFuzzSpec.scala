package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Model-based fuzz of the merge semantics (reference analog: the
  * randomized HoodieTestDataGenerator-driven functional suites): random
  * upsert/delete batch sequences applied both to a graft table and to a
  * sequential in-memory model, compared at every commit via snapshot,
  * at the end via time travel, and over the whole history via an
  * incremental read. Seeds are fixed — failures reproduce exactly.
  *
  * Model semantics (what the engine documents):
  *  - batch winner per key = max ordering (ords are unique per run, so
  *    no tie-breaks are exercised)
  *  - cross-version winner = max (ordering); a tombstone kills every
  *    version committed at or before it; later commits survive
  */
class MergeFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-fuzz").toString

  case class Version(ord: Long, v: String)

  /** In-memory reference: key -> live version. */
  final class Model {
    var live: Map[Long, Version] = Map.empty
    def upsert(batch: Seq[(Long, Long, String)]): Unit = {
      // intra-batch precombine: max ord per key
      val winners = batch.groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      winners.foreach { case (k, (_, ord, v)) =>
        live.get(k) match {
          case Some(cur) if cur.ord > ord => () // stale update loses
          case _                          => live += k -> Version(ord, v)
        }
      }
    }
    def delete(keys: Seq[Long]): Unit = live --= keys
  }

  def runFuzz(tableType: String, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = s"fuzz$seed", tableType = tableType, keyFields = Seq("id"),
      orderingField = "ord", targetFileRows = 7)) // tiny files: many groups
    val r = GraftReader(tbl)
    val model = new Model
    var nextOrd = 0L
    def freshOrd(): Long = { nextOrd += 1; nextOrd }

    val keySpace = 40L
    var commits = Vector.empty[String]

    (1 to 8).foreach { _ =>
      if (model.live.nonEmpty && rnd.nextInt(4) == 0) {
        // delete a random subset of existing keys (plus one absent key)
        val keys = rnd.shuffle(model.live.keys.toSeq).take(1 + rnd.nextInt(5)) :+ 999L
        commits :+= tbl.delete(keys.map(k => Tuple1(k)).toDF("id"))
        model.delete(keys)
      } else {
        // upsert: mix of updates and inserts, with intra-batch dup keys
        val n = 3 + rnd.nextInt(12)
        val batch = (1 to n).map { _ =>
          val k = rnd.nextInt(keySpace.toInt).toLong
          val ord = freshOrd()
          (k, ord, s"v$ord")
        } // some keys repeat within the batch -> precombine exercised
        // a binary payload rides every row (pay = utf8(v)): merges,
        // deltas, and folds must carry it byte-exact alongside v
        commits :+= tbl.upsert(batch.toDF("id", "ord", "v").withColumn("pay",
          org.apache.spark.sql.functions.encode(
            org.apache.spark.sql.functions.col("v"), "UTF-8")))
        model.upsert(batch)
      }
      // state check after every commit
      val got = snapshotWithPayload(r)
      assert(got == model.live,
        s"[$tableType seed=$seed commit=${commits.size}] " +
          s"missing=${(model.live.keySet -- got.keySet).toSeq.sorted} " +
          s"extra=${(got.keySet -- model.live.keySet).toSeq.sorted} " +
          s"diff=${model.live.collect { case (k, v) if got.get(k).exists(_ != v) => k }}")
    }

    // incremental over the whole history == final state (overwrite wins)
    val inc = r.dataOnly(r.incremental("")).select("id", "ord", "v")
      .as[(Long, Long, String)].collect().map(t => t._1 -> Version(t._2, t._3)).toMap
    assert(inc == model.live, s"[$tableType seed=$seed] incremental mismatch")

    // compaction / clustering must not change visible state (payload
    // survives the fold byte-exact too)
    if (tableType == TableType.MOR) graft.services.TableServices(tbl).compact()
    else graft.services.TableServices(tbl).cluster(Seq("id"), purgeTombstones = true)
    val after = snapshotWithPayload(r)
    assert(after == model.live, s"[$tableType seed=$seed] post-maintenance mismatch")
  }

  /** Snapshot as key->Version, asserting each row's binary payload still
    * decodes to its v. */
  private def snapshotWithPayload(r: GraftReader): Map[Long, Version] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, decode}
    val rows = r.dataOnly(r.snapshot())
      .select(col("id"), col("ord"), col("v"), decode(col("pay"), "UTF-8").as("pv"))
      .as[(Long, Long, String, String)].collect()
    rows.foreach(t =>
      assert(t._4 == t._3, s"binary payload diverged for key ${t._1}: ${t._4} vs ${t._3}"))
    rows.map(t => t._1 -> Version(t._2, t._3)).toMap
  }

  for (tt <- Seq(TableType.COW, TableType.MOR); seed <- Seq(7, 21))
    test(s"fuzz: random upsert/delete sequences match the model ($tt seed=$seed)") {
      runFuzz(tt, seed)
    }

  // ---------------------------------------------------------------------
  // tie-semantics fuzz: ordering values from a SMALL domain so
  // cross-commit ties are common. Contract under ties:
  //  - overwrite_latest: equal ordering -> the NEWER commit wins
  //  - event_time: equal ordering -> the STORED (older commit) row wins
  //    (DefaultHoodieRecordPayload's >= comparison)
  // Batches carry one row per key (intra-batch ties would race on a
  // hash tiebreaker the model cannot predict).
  // ---------------------------------------------------------------------

  final class TieModel(eventTime: Boolean) {
    var live: Map[Long, Version] = Map.empty
    def upsert(batch: Seq[(Long, Long, String)]): Unit =
      batch.foreach { case (k, ord, v) =>
        live.get(k) match {
          case Some(cur) if ord > cur.ord               => live += k -> Version(ord, v)
          case Some(cur) if ord == cur.ord && !eventTime => live += k -> Version(ord, v)
          case None                                      => live += k -> Version(ord, v)
          case _                                         => () // stale or event-time tie: stored wins
        }
      }
    def delete(keys: Seq[Long]): Unit = live --= keys
  }

  def runTieFuzz(tableType: String, strategy: String, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = s"tie$seed", tableType = tableType, keyFields = Seq("id"),
      orderingField = "ord", mergeStrategy = strategy, targetFileRows = 7))
    val r = GraftReader(tbl)
    val model = new TieModel(eventTime = strategy == "event_time")
    val keySpace = 25
    var step = 0

    (1 to 8).foreach { _ =>
      step += 1
      if (model.live.nonEmpty && rnd.nextInt(4) == 0) {
        val keys = rnd.shuffle(model.live.keys.toSeq).take(1 + rnd.nextInt(4))
        tbl.delete(keys.map(Tuple1(_)).toDF("id"))
        model.delete(keys)
      } else {
        // one row per key; ord from {1..4} -> ties across commits abound
        val keys = rnd.shuffle((0 until keySpace).toList).take(3 + rnd.nextInt(8))
        val batch = keys.map(k => (k.toLong, 1L + rnd.nextInt(4), s"s$step-k$k"))
        tbl.upsert(batch.toDF("id", "ord", "v"))
        model.upsert(batch)
      }
      val got = r.dataOnly(r.snapshot()).select("id", "ord", "v")
        .as[(Long, Long, String)].collect().map(t => t._1 -> Version(t._2, t._3)).toMap
      assert(got == model.live,
        s"[$tableType/$strategy seed=$seed step=$step] " +
          s"diff=${(model.live.toSet diff got.toSet).take(4)} " +
          s"extra=${(got.toSet diff model.live.toSet).take(4)}")
    }
    // folding deltas / rewriting layout must preserve tie decisions
    if (tableType == TableType.MOR) graft.services.TableServices(tbl).compact()
    else graft.services.TableServices(tbl).cluster(Seq("id"), purgeTombstones = true)
    val after = r.dataOnly(r.snapshot()).select("id", "ord", "v")
      .as[(Long, Long, String)].collect().map(t => t._1 -> Version(t._2, t._3)).toMap
    assert(after == model.live, s"[$tableType/$strategy seed=$seed] post-maintenance")
  }

  for (
    tt <- Seq(TableType.COW, TableType.MOR);
    strat <- Seq("overwrite_latest", "event_time")
  ) test(s"tie fuzz: $strat resolves equal orderings per contract ($tt)") {
    runTieFuzz(tt, strat, seed = 13)
  }
}
