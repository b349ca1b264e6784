package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** Model-based fuzz of write-side schema reconciliation: random upsert
  * sequences where every batch carries a RANDOM SUBSET of the value
  * columns, applied both to a graft table (COW and MOR) and to a
  * sequential in-memory model. Invariants after every run:
  *
  *  - the read view's columns are the UNION of every batch's columns
  *    (no batch may narrow a column away — the q185 bug class);
  *  - per key, the surviving row is the latest write (unique ords), and
  *    its value for a column the winning batch DIDN'T carry is null —
  *    latest-wins replaces whole rows, exactly the documented
  *    reconcile semantics (never a partial update).
  *
  * Seeds are fixed — failures reproduce exactly. */
class SchemaFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-schfuzz").toString

  private val ValueCols = Seq("a", "b", "c", "d")

  private def cfg(tt: String): TableConfig = TableConfig(
    name = "fz", tableType = tt, keyFields = Seq("id"),
    partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 7)

  /** One batch: ids + the value columns this batch carries. */
  private def batchDf(ids: Seq[Long], cols: Seq[String], ord: Long): DataFrame = {
    val fields = StructType(
      StructField("id", LongType) +: StructField("p", StringType) +:
        StructField("ts", LongType) +:
        cols.map(c => StructField(c, StringType)))
    val rows = ids.map { i =>
      Row.fromSeq(i +: s"p${i % 3}" +: ord +: cols.map(c => s"$c$i@$ord"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), fields)
  }

  for (tt <- Seq(TableType.COW, TableType.MOR); seed <- Seq(7L, 23L)) {
    test(s"[$tt seed=$seed] random column subsets never narrow; latest row wins whole") {
      val rnd = new scala.util.Random(seed)
      val tbl = GraftTable.create(spark, tmp(), cfg(tt))
      // model: id -> (ord, cols the winning batch carried)
      var model = Map.empty[Long, (Long, Seq[String])]
      var seenCols = Set.empty[String]
      for (round <- 1 to 8) {
        val cols = rnd.shuffle(ValueCols).take(1 + rnd.nextInt(ValueCols.size))
        val ids = (1 to (3 + rnd.nextInt(8))).map(_ => 1L + rnd.nextInt(20)).distinct
        val ord = round.toLong
        if (round == 1) tbl.bulkInsert(batchDf(ids, cols, ord))
        else tbl.upsert(batchDf(ids, cols, ord))
        seenCols ++= cols
        ids.foreach(i => model += i -> ((ord, cols)))

        val r = GraftReader(tbl)
        val snap = r.dataOnly(r.snapshot())
        assert(seenCols.subsetOf(snap.columns.toSet),
          s"round $round narrowed columns: have ${snap.columns.mkString(",")}, " +
            s"need $seenCols")
        val got = snap.collect().map { row =>
          row.getLong(row.fieldIndex("id")) ->
            ValueCols.filter(snap.columns.contains).map(c =>
              c -> (if (row.isNullAt(row.fieldIndex(c))) null
                else row.getString(row.fieldIndex(c)))).toMap
        }.toMap
        assert(got.keySet == model.keySet, s"round $round key sets differ")
        model.foreach { case (id, (ord, winCols)) =>
          val want = ValueCols.filter(seenCols.contains).map(c =>
            c -> (if (winCols.contains(c)) s"$c$id@$ord" else null)).toMap
          assert(got(id) == want,
            s"round $round id=$id: got ${got(id)}, want $want (winner ord=$ord cols=$winCols)")
        }
      }
      // MOR: compaction must not change the reconciled answer
      if (tt == TableType.MOR) {
        val before = GraftReader(tbl).dataOnly(GraftReader(tbl).snapshot())
          .collect().map(_.toString).sorted.toSeq
        graft.services.TableServices(tbl).compact()
        val after = GraftReader(tbl).dataOnly(GraftReader(tbl).snapshot())
          .collect().map(_.toString).sorted.toSeq
        assert(before == after, "compaction changed the reconciled state")
      }
    }
  }
}
