package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.streaming._
import graft.write.GraftTable

class TransformersSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-tf").toString

  test("continuous ingest schedules compactions inline, executes them async") {
    import spark.implicits._
    val dir = tmp(); val srcDir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.MOR, keyFields = Seq("id"),
      orderingField = "", targetFileRows = 1000))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id bigint, v string")
    // batch 1 opens groups; batches 2-5 are pure updates -> delta commits
    (1 to 5).foreach { b =>
      Files.writeString(Paths.get(f"$srcDir/$b%06d.json"),
        (1L to 20L).map(id => s"""{"id": $id, "v": "b$b"}""").mkString("", "\n", "\n"))
    }
    // 1-byte batch budget -> one landing file per sync round
    val ingest = new ContinuousIngest(
      tbl, new DfsDirSource(spark, srcDir, "json", ".json",
        schema = Some(schema), maxBytesPerBatch = 1L),
      asyncCompactDeltaCommits = 2)
    val commits = ingest.runContinuous(maxRounds = 1)
    assert(commits.size == 5, s"five sync rounds committed, got $commits")
    // shutdown() drained the queue: every scheduled plan has executed
    val tl = tbl.timeline
    val compactions = tl.completed().count(_.action == Action.Compaction)
    assert(compactions >= 1, "async compactor folded at least one plan")
    assert(graft.services.TableServices(tbl).pendingCompactions().isEmpty,
      "no plan left behind after shutdown drain")
    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).as[(Long, String)].collect()
    assert(got.length == 20 && got.forall(_._2 == "b5"),
      "final state = last batch wins for every key")
  }

  test("sqlQuery transformer uses the <SRC> placeholder") {
    import spark.implicits._
    val out = Transformers.sqlQuery(
      "SELECT id, v, id * 2 AS dbl FROM <SRC> WHERE id > 1")(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(out.as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
      Seq((2L, "b", 4L), (3L, "c", 6L)))
  }

  test("flatten transformer recursively lifts struct fields") {
    import spark.implicits._
    val df = Seq((1L, ("x", (2.5, "y")))).toDF("id", "s")
      .select(col("id"), col("s._1").as("a"),
        struct(col("s._1").as("inner"), col("s._2._1").as("num")).as("nested"))
    val out = Transformers.flatten(df)
    assert(out.columns.toSeq == Seq("id", "a", "nested_inner", "nested_num"))
    assert(out.count() == 1)
  }

  test("chained transformers compose left to right") {
    import spark.implicits._
    val t = Transformers.chained(
      Transformers.sqlQuery("SELECT id + 1 AS id FROM <SRC>"),
      Transformers.sqlQuery("SELECT id * 10 AS id FROM <SRC>"))
    assert(t(Seq(1L).toDF("id")).head().getLong(0) == 20L)
  }

  test("debezium envelope transformer: upserts, out-of-order events, deletes") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "cdc", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ord", targetFileRows = 1000))

    import TransformersSpec.Img
    val batch1 = Seq(
      ("c", Some(Img(1L, "a")), Option.empty[Img], 10L),
      ("c", Some(Img(2L, "b")), Option.empty[Img], 11L),
      ("u", Some(Img(1L, "a2")), Some(Img(1L, "a")), 12L)
    ).toDF("op", "after", "before", "ord")
    tbl.upsert(Transformers.debezium()(batch1))

    // batch 2: delete id=2, out-of-order stale update for id=1 (ord 5 < 12)
    val batch2 = Seq(
      ("d", Option.empty[Img], Some(Img(2L, "b")), 13L),
      ("u", Some(Img(1L, "stale")), Some(Img(1L, "a2")), 5L)
    ).toDF("op", "after", "before", "ord")
    tbl.upsert(Transformers.debezium()(batch2))

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "v", "ord")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // id=1 keeps a2 (ord 12 beats the stale 5); id=2 is deleted
    assert(got.toSeq == Seq((1L, "a2", 12L)))
  }

  test("dms transformer: full-load passthrough, I/U upserts, case-insensitive D deletes") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "dms", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "", targetFileRows = 1000))

    // full-load batch has NO Op column at all
    val full = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    tbl.bulkInsert(Transformers.dms()(full))

    // CDC batch: insert, update, delete (lowercase d must match)
    val cdc = Seq(
      (4L, "d-row", "I"),
      (1L, "a2", "U"),
      (2L, "b", "d")
    ).toDF("id", "v", "Op")
    tbl.upsert(Transformers.dms()(cdc))

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a2"), (3L, "c"), (4L, "d-row")))
    // the Op marker is transport metadata: it must NOT be stored
    assert(!r.dataOnly(r.snapshot()).columns.contains("Op"))
  }

  test("json and csv dir sources feed the ingest loop") {
    import spark.implicits._
    val dir = tmp(); val srcDir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "", targetFileRows = 1000))

    Files.writeString(Paths.get(s"$srcDir/000001.json"),
      """{"id": 1, "v": "a"}""" + "\n" + """{"id": 2, "v": "b"}""" + "\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id bigint, v string")
    val ingest = new ContinuousIngest(tbl, new JsonDirSource(spark, srcDir, Some(schema)))
    assert(ingest.syncOnce().isDefined)
    assert(ingest.syncOnce().isEmpty)
    Files.writeString(Paths.get(s"$srcDir/000002.json"), """{"id": 3, "v": "c"}""" + "\n")
    assert(ingest.syncOnce().isDefined)
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // csv source with a file-based schema provider (DDL form)
    val dir2 = tmp(); val csvDir = tmp()
    val tbl2 = GraftTable.create(spark, dir2, TableConfig(
      name = "t2", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "", targetFileRows = 1000))
    Files.writeString(Paths.get(s"$csvDir/000001.csv"), "id,v\n10,x\n11,y\n")
    Files.writeString(Paths.get(s"$csvDir/schema.ddl"), "id bigint, v string")
    val provided = new FileBasedSchemaProvider(spark, s"$csvDir/schema.ddl").sourceSchema
    assert(provided == schema)
    val csvIngest = new ContinuousIngest(tbl2,
      new CsvDirSource(spark, csvDir, schema = Some(provided)))
    assert(csvIngest.syncOnce().isDefined)
    val r2 = GraftReader(tbl2)
    assert(r2.dataOnly(r2.snapshot()).count() == 2)

    // JSON form of the provider round-trips the same schema
    Files.writeString(Paths.get(s"$csvDir/schema.json"), schema.json)
    assert(new FileBasedSchemaProvider(spark, s"$csvDir/schema.json").sourceSchema == schema)

    // orc source: same loop over Spark's built-in ORC reader
    val dir3 = tmp(); val orcDir = tmp()
    val tbl3 = GraftTable.create(spark, dir3, TableConfig(
      name = "t3", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "", targetFileRows = 1000))
    val stage = tmp()
    Seq((20L, "p"), (21L, "q")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").orc(stage)
    val fsys = new org.apache.hadoop.fs.Path(orcDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val part = fsys.globStatus(new org.apache.hadoop.fs.Path(stage, "part-*.orc")).head.getPath
    fsys.rename(part, new org.apache.hadoop.fs.Path(orcDir, "000001.orc"))
    val orcIngest = new ContinuousIngest(tbl3, new OrcDirSource(spark, orcDir))
    assert(orcIngest.syncOnce().isDefined)
    assert(orcIngest.syncOnce().isEmpty)
    val r3 = GraftReader(tbl3)
    assert(r3.dataOnly(r3.snapshot()).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((20L, "p"), (21L, "q")))
  }

  test("sql source backfills once; multi-table round advances each table") {
    import spark.implicits._
    Seq((100L, "s1"), (101L, "s2")).toDF("id", "v").createOrReplaceTempView("backfill_src")
    def mk(name: String): (GraftTable, ContinuousIngest) = {
      val t = GraftTable.create(spark, tmp(), TableConfig(
        name = name, tableType = TableType.COW, keyFields = Seq("id"),
        orderingField = "", targetFileRows = 1000))
      (t, new ContinuousIngest(t, new SqlSource(spark, "SELECT * FROM backfill_src")))
    }
    val (t1, i1) = mk("m1")
    val (t2, i2) = mk("m2")
    val multi = new MultiTableIngest(Seq(i1, i2))
    val round1 = multi.syncOnce()
    assert(round1.forall(_.isDefined), "both tables ingest the backfill")
    // one-shot: second round is caught up everywhere
    assert(multi.syncOnce().forall(_.isEmpty))
    Seq(t1, t2).foreach { t =>
      val r = GraftReader(t)
      assert(r.dataOnly(r.snapshot()).count() == 2)
    }
  }

  test("filter-dupes ingest drops already-present keys under insert") {
    import spark.implicits._
    val dir = tmp(); val srcDir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "", targetFileRows = 1000))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id bigint, v string")
    Files.writeString(Paths.get(s"$srcDir/000001.json"),
      """{"id": 1, "v": "a"}""" + "\n" + """{"id": 2, "v": "b"}""" + "\n")
    val ingest = new ContinuousIngest(tbl,
      new JsonDirSource(spark, srcDir, Some(schema)),
      operation = "insert", filterDupes = true)
    assert(ingest.syncOnce().isDefined)
    // a re-delivery of key 1 with new payload must be DROPPED, not merged
    Files.writeString(Paths.get(s"$srcDir/000002.json"),
      """{"id": 1, "v": "CHANGED"}""" + "\n" + """{"id": 3, "v": "c"}""" + "\n")
    assert(ingest.syncOnce().isDefined)
    val r = GraftReader(tbl)
    assert(r.dataOnly(r.snapshot()).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the checkpoint still advanced past the dropped batch
    assert(ingest.syncOnce().isEmpty)
    // upsert + filter-dupes is rejected, as in the reference
    intercept[IllegalArgumentException] {
      new ContinuousIngest(tbl, new JsonDirSource(spark, srcDir, Some(schema)),
        filterDupes = true)
    }
  }
}

object TransformersSpec {
  case class Img(id: Long, v: String)
}
