package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Differential fuzz for dropPartitionColumns: the SAME random
  * upsert/delete/compaction sequence runs against a plain table and a
  * twin that stores partition fields only in the (hive-style) path. At
  * every commit the two snapshots must be row-identical — any divergence
  * in the drop/restore plumbing (write-side shedding, path decode, merge
  * paths, compaction rewrite) shows up as a diff with a fixed seed. */
class DropPartitionFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-dpcfuzz").toString

  def runFuzz(tableType: String, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def cfg(name: String, drop: Boolean): TableConfig = TableConfig(
      name = name, tableType = tableType, keyFields = Seq("id"),
      partitionFields = Seq("p", "b"), orderingField = "ord",
      targetFileRows = 7, dropPartitionColumns = drop,
      hiveStylePartitioning = drop)
    val plain = GraftTable.create(spark, tmp(), cfg(s"plain$seed", drop = false))
    val dpc = GraftTable.create(spark, tmp(), cfg(s"dpc$seed", drop = true))

    val keySpace = 40L
    // every 5th key has a NULL first partition field: the path must keep a
    // sentinel segment there (not silently drop it and shift `b`'s
    // segment into `p`'s position) and reads must reconstitute null
    def partOf(k: Long): (String, Long) =
      (if (k % 5 == 0) null else if (k % 2 == 0) "ev" else "od", k % 3)
    var nextOrd = 0L
    def freshOrd(): Long = { nextOrd += 1; nextOrd }

    def assertSame(step: String): Unit = {
      val a = GraftReader(plain); val b = GraftReader(dpc)
      val pa = a.dataOnly(a.snapshot()).select("id", "p", "b", "v", "ord")
      val pb = b.dataOnly(b.snapshot()).select("id", "p", "b", "v", "ord")
      val onlyA = pa.exceptAll(pb).count()
      val onlyB = pb.exceptAll(pa).count()
      assert(onlyA == 0 && onlyB == 0,
        s"seed=$seed $tableType diverged at $step: plain-only=$onlyA dpc-only=$onlyB")
    }

    (1 to 6).foreach { step =>
      val roll = rnd.nextInt(6)
      if (roll == 0 && step > 1) {
        val keys = (1 to 1 + rnd.nextInt(6))
          .map(_ => rnd.nextLong(keySpace)).distinct
        val df = keys.map { k => val (p, b) = partOf(k); (k, p, b) }
          .toDF("id", "p", "b")
        plain.delete(df); dpc.delete(df)
      } else if (roll == 1 && tableType == TableType.MOR && step > 2) {
        graft.services.TableServices(plain).compact()
        graft.services.TableServices(dpc).compact()
      } else {
        val n = 3 + rnd.nextInt(10)
        val batch = (1 to n).map { _ =>
          val k = rnd.nextLong(keySpace)
          val (p, b) = partOf(k)
          (k, p, b, s"v$k@$nextOrd", freshOrd())
        }.toDF("id", "p", "b", "v", "ord")
        plain.upsert(batch); dpc.upsert(batch)
      }
      assertSame(s"step $step (roll $roll)")
    }
    // the point of the option: identical logical content, strictly less
    // physical storage (two fewer column chunks per file)
    def liveBytes(t: GraftTable): Long =
      Snapshot.resolve(t.timeline).slices.flatMap(_.allFiles).map(_.bytes).sum
    assert(liveBytes(dpc) < liveBytes(plain),
      s"dropped-columns table is not smaller: ${liveBytes(dpc)} vs ${liveBytes(plain)}")
  }

  test("COW differential fuzz (2 seeds)") {
    runFuzz(TableType.COW, seed = 11)
    runFuzz(TableType.COW, seed = 12)
  }

  test("MOR differential fuzz (2 seeds)") {
    runFuzz(TableType.MOR, seed = 21)
    runFuzz(TableType.MOR, seed = 22)
  }
}
