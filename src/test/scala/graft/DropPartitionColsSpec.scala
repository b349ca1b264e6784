package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.write.GraftTable

/** dropPartitionColumns (reference analog:
  * hoodie.datasource.write.drop.partition.columns): partition-field
  * columns leave the stored files entirely — values are reconstituted
  * from the partition path on every read path, and partition-field
  * predicates prune file groups with zero IO through the declared
  * partition schema. */
class DropPartitionColsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-dpc").toString

  def cfg(tt: String, hive: Boolean = false, url: Boolean = false): TableConfig =
    TableConfig(
      name = "dpc", tableType = tt, keyFields = Seq("id"),
      partitionFields = Seq("region", "bucket"), orderingField = "v",
      targetFileRows = 1000, dropPartitionColumns = true,
      hiveStylePartitioning = hive, urlEncodePartitioning = url)

  def rows(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, if (i % 2 == 0) "eu" else "us", (i % 3).toLong, i * 10L))
      .toDF("id", "region", "bucket", "v")
  }

  /** every base/delta parquet file under the table root, read RAW. */
  def physicalFiles(tbl: GraftTable): Seq[String] = {
    val snap = Snapshot.resolve(tbl.timeline)
    snap.slices.flatMap(_.allFiles).map(st => tbl.absPath(st))
  }

  test("partition columns are absent from storage but read back typed") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, hive = true))
    tbl.bulkInsert(rows(30))
    // physical: no region/bucket column inside any data file
    for (f <- physicalFiles(tbl)) {
      val stored = spark.read.parquet(f).schema.fieldNames.toSet
      assert(!stored.contains("region") && !stored.contains("bucket"),
        s"partition columns leaked into $f: $stored")
      assert(stored.contains("v"), s"data column missing from $f")
    }
    // logical: values and types come back
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot())
    assert(got.schema("region").dataType.typeName == "string")
    assert(got.schema("bucket").dataType.typeName == "long")
    val sums = got.groupBy("region").agg(sum("bucket").as("b"), count(lit(1)).as("n"))
      .orderBy("region").collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(sums.toSeq == Seq(("eu", 15L, 15L), ("us", 15L, 15L)))
  }

  test("upsert, delete, and MOR compaction keep the invariant") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.MOR))
    tbl.bulkInsert(rows(30))
    // update: v doubles for bucket 0 rows (delta files, no partition cols)
    tbl.upsert(rows(30).filter(col("bucket") === 0)
      .withColumn("v", col("v") * 2 + 1))
    // delete two keys (tombstone deltas)
    tbl.delete(rows(2).select("id", "region", "bucket"))
    val r = GraftReader(tbl)
    def total(): Long = r.dataOnly(r.snapshot())
      .agg(sum("v")).collect().head.getLong(0)
    val before = total()
    for (f <- physicalFiles(tbl))
      assert(!spark.read.parquet(f).schema.fieldNames.contains("region"))
    // compaction rewrites merged bases — columns must stay dropped
    graft.services.TableServices(tbl).compact()
    for (f <- physicalFiles(tbl))
      assert(!spark.read.parquet(f).schema.fieldNames.contains("region"),
        "compaction resurrected a dropped partition column")
    assert(total() == before, "compaction changed the merged state")
    // spot-check merged values: updated rows won (ordering v)
    val v0 = r.dataOnly(r.snapshot()).filter(col("id") === 6)
      .select("v", "region").collect().head
    assert(v0.getLong(0) == 121 && v0.getString(1) == "eu")
  }

  test("partition-field predicates prune file groups before any IO") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW))
    tbl.bulkInsert(rows(60))
    val r = GraftReader(tbl)
    val q = r.dataOnly(r.snapshot()).filter(col("region") === "eu")
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet scan")
    val scanned = scans.map(_.inputRDD.partitions.length).sum
    val euFiles = Snapshot.resolve(tbl.timeline).slices
      .filter(_.partition.startsWith("eu")).size
    val allFiles = Snapshot.resolve(tbl.timeline).slices.size
    assert(allFiles > euFiles, "test needs multiple partitions")
    // exact count check via the index's own listing
    assert(q.count() == 30)
    val listed = scans.head.inputRDDs().head.partitions.length
    assert(listed <= euFiles + 1,
      s"partition filter did not prune: $listed splits for $euFiles eu files of $allFiles")
  }

  test("url-encoded partition values roundtrip through the path") {
    val tbl = GraftTable.create(spark, tmp(), TableConfig(
      name = "dpcu", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("region"), orderingField = "v",
      targetFileRows = 1000, dropPartitionColumns = true,
      urlEncodePartitioning = true))
    import spark.implicits._
    val odd = Seq((1L, "eu/west a", 10L), (2L, "us:east+b", 20L))
      .toDF("id", "region", "v")
    tbl.bulkInsert(odd)
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "region")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "eu/west a"), (2L, "us:east+b")),
      s"url-encoded values did not roundtrip: ${got.toSeq}")
  }

  test("timestamp partition fields require url-encoding (sanitize is lossy)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-06-01 10:30:00")
    val df = Seq((1L, ts, 5L)).toDF("id", "t", "v")
    // without url-encode: ':' would sanitize to '_' and read back null —
    // the write must refuse instead of silently nulling the column
    val plain = GraftTable.create(spark, tmp(), TableConfig(
      name = "dpct", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("t"), targetFileRows = 100,
      dropPartitionColumns = true))
    val e = intercept[IllegalArgumentException](plain.bulkInsert(df))
    assert(e.getMessage.contains("urlEncodePartitioning"))
    // with url-encode: exact roundtrip
    val enc = GraftTable.create(spark, tmp(), TableConfig(
      name = "dpcte", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("t"), targetFileRows = 100,
      dropPartitionColumns = true, urlEncodePartitioning = true))
    enc.bulkInsert(df)
    val r = GraftReader(enc)
    val got = r.dataOnly(r.snapshot()).select("t").collect().head.getTimestamp(0)
    assert(got == ts, s"timestamp did not roundtrip: $got vs $ts")
  }

  test("null partition values keep a sentinel segment; alignment and filters hold") {
    import spark.implicits._
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW, hive = true))
    // ids 0/2: region null — the path must carry a sentinel segment so
    // `bucket` does not shift into `region`'s position on decode
    val df = Seq(
      (0L, null.asInstanceOf[String], 7L, 10L),
      (1L, "eu", 1L, 20L),
      (2L, null.asInstanceOf[String], 8L, 30L),
      (3L, "us", 2L, 40L))
      .toDF("id", "region", "bucket", "v")
    tbl.bulkInsert(df)
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "region", "bucket")
      .collect().map(x => (x.getLong(0), Option(x.getString(1)), x.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, None, 7L), (1L, Some("eu"), 1L), (2L, None, 8L), (3L, Some("us"), 2L)),
      s"null-partition reconstitution wrong: ${got.toSeq}")
    // predicates over the reconstituted column, incl. null semantics
    val snap = r.snapshot()
    assert(r.dataOnly(snap).filter(col("region").isNull).count() == 2)
    assert(r.dataOnly(snap).filter(col("region") === "eu")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // upsert into the null partition still tags by path equality
    tbl.upsert(Seq((0L, null.asInstanceOf[String], 7L, 99L))
      .toDF("id", "region", "bucket", "v"))
    val r2 = GraftReader(tbl)
    assert(r2.dataOnly(r2.snapshot()).filter(col("id") === 0L)
      .select("v").as[Long].collect().toSeq == Seq(99L))
  }

  test("a malformed partition segment degrades one group's value, not the read") {
    val tbl = GraftTable.create(spark, tmp(), cfg(TableType.COW))
    tbl.bulkInsert(rows(6))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType)))
    // a hand-damaged path ("garbage" where a long should be) must decode
    // to null for that group only — under ANSI mode a strict Cast here
    // would throw and fail EVERY read of the table
    val (_, pschema, rows2) =
      tbl.partitionedReadLayout(schema, Seq("eu/garbage", "eu/3"))
    assert(pschema.fieldNames.toSeq == Seq("bucket"))
    assert(rows2("eu/garbage").isNullAt(0), "malformed segment should decode to null")
    assert(rows2("eu/3").getLong(0) == 3L)
  }

  test("incompatible with formatted timestamp partitioning (loud refusal)") {
    val e = intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmp(), TableConfig(
        name = "bad", tableType = TableType.COW, keyFields = Seq("id"),
        partitionFields = Seq("ts"), dropPartitionColumns = true,
        partitionTimestampFormat = Map("ts" -> "yyyy-MM-dd")))
    }
    assert(e.getMessage.contains("not invertible"))
  }
}
