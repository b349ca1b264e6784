package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.read.GraftReader
import graft.write.GraftTable

/** The session-extension path: graft statements flow through
  * spark.sql(...) via the injected parser; regular SQL still works. */
class ExtensionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkSessionExtension")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-ext").toString

  test("graft statements run through spark.sql; normal SQL unaffected") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "t", tableType = TableType.MOR, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "v", "ts"))
    tbl.upsert(Seq((2L, "b2", 2L)).toDF("id", "v", "ts"))

    // normal SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)

    // graft UPDATE through spark.sql
    spark.sql(s"UPDATE '$dir' SET v = upper(v) WHERE id = 1")
    // compaction DDL through spark.sql
    assert(spark.sql(s"SCHEDULE COMPACTION ON '$dir'").count() > 0)
    assert(spark.sql(s"RUN COMPACTION ON '$dir'").count() == 1)
    assert(spark.sql(s"SHOW COMPACTION ON '$dir'").head().getString(0).nonEmpty)

    val r = GraftReader(tbl)
    val got = r.dataOnly(r.snapshot()).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "A"), (2L, "b2"), (3L, "c")))

    // catalog-registered graft table queryable with plain SELECT
    spark.catalog.createTable("ext_gt", "graft", Map("path" -> dir))
    assert(spark.sql("SELECT count(*) FROM ext_gt").head().getLong(0) == 3)
    assert(spark.sql("SELECT v FROM ext_gt WHERE id = 2").head().getString(0) == "b2")

    // SQL time travel pins the snapshot at an instant
    val t1 = tbl.timeline.completed()
      .filter(i => graft.core.Action.dataActions(i.action)).head.time
    val old = spark.sql(s"SELECT id, v FROM ext_gt VERSION AS OF '$t1'")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(old.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"VERSION AS OF '$t1' should see the initial load, got ${old.toSeq}")
  }

  test("lifecycle + admin verbs intercept through spark.sql (handles() covers them)") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "lc", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    val t1 = tbl.timeline.completed().last.time

    // SHOW WRITE AMPLIFICATION previously parsed but was NOT in
    // handles() — spark.sql would hand it to the delegate and fail.
    // (The interception surface flattens to the single 'result' column;
    // full-schema access stays on GraftSql.sql / GraftAdmin.)
    assert(spark.sql(s"SHOW WRITE AMPLIFICATION '$dir'").count() >= 1)
    assert(spark.sql(s"REPAIR DEDUPLICATE '$dir' DRY RUN").count() == 1)

    val sp = spark.sql(s"CREATE SAVEPOINT ON '$dir'").head().getString(0)
    assert(sp.nonEmpty)
    assert(spark.sql(s"SHOW SAVEPOINTS '$dir'").count() == 1)

    tbl.upsert(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "ts"))
    spark.sql(s"RUN CLEAN ON '$dir' RETAIN 1")
    spark.sql(s"RESTORE TABLE '$dir' TO '$t1'")
    val r = GraftReader(tbl)
    val vs = r.dataOnly(r.snapshot()).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(vs.toSeq == Seq((1L, "a"), (2L, "b")),
      s"restore must return the savepointed state: ${vs.mkString(",")}")

    spark.sql(s"DELETE SAVEPOINT ON '$dir' AT '$t1'")
    assert(spark.sql(s"SHOW SAVEPOINTS '$dir'").count() == 0)

    // rollback of the latest instant through SQL
    tbl.upsert(Seq((9L, "z", 3L)).toDF("id", "v", "ts"))
    val latest = tbl.timeline.completed()
      .filter(i => graft.core.Action.dataActions(i.action)).last.time
    spark.sql(s"ROLLBACK COMMIT ON '$dir' AT '$latest'")
    assert(r.dataOnly(r.snapshot()).count() == 2)
    assert(spark.sql(s"SHOW ROLLBACKS '$dir'").count() >= 1)

    spark.sql(s"RUN ARCHIVE ON '$dir'") // below thresholds: a no-op, but must parse

    // validation: phantom targets error instead of silently wrecking state
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE SAVEPOINT ON '$dir' AT '2025-08-14'")
    }
    intercept[IllegalArgumentException] {
      // a low-sorting garbage instant would otherwise doom EVERY commit
      spark.sql(s"RESTORE TABLE '$dir' TO '2025-08-14'")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"DELETE SAVEPOINT ON '$dir' AT 'nope'")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"RUN CLEAN ON '$dir' RETAIN 0")
    }
  }

  test("MERGE NMBS clauses referencing the source fail with a clause-level error") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "nbs_refs", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts"))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    Seq((2L, "b2", 2L)).toDF("id", "v", "ts")
      .createOrReplaceTempView("nbs_src")
    spark.catalog.createTable("nbs_tbl", "graft", Map("path" -> dir))
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO nbs_tbl t USING nbs_src s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE AND s.v = 'x' THEN DELETE""")
    }
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("may reference the target only"), msg(e))
    // the valid form still runs end-to-end through the grammar
    spark.sql("""
      MERGE INTO nbs_tbl t USING nbs_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val rows = spark.sql("SELECT id, v FROM nbs_tbl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "b2")))
  }

  test("Spark-grammar ALTER TABLE ADD COLUMNS evolves the TABLE, not just the catalog") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "alt", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    tbl.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    spark.catalog.createTable("ext_alter", "graft", Map("path" -> dir))

    spark.sql("ALTER TABLE ext_alter ADD COLUMNS (bonus double)")

    // the TABLE carries the evolution: a schema commit landed, old rows
    // read back null-padded, and a write with the new column round-trips
    val snap = graft.core.Snapshot.resolve(tbl.timeline)
    assert(tbl.readSchema(snap).fieldNames.contains("bonus"),
      "timeline schema commit must include the new column")
    tbl.upsert(Seq((2L, "b2", 2L, 9.5)).toDF("id", "v", "ts", "bonus"))
    val got = spark.sql("SELECT id, v, bonus FROM ext_alter ORDER BY id")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "b2", Some(9.5))), s"got $got")
    // the catalog's declared schema followed along
    assert(spark.table("ext_alter").schema.fieldNames.contains("bonus"))
  }

  test("Spark-grammar ALTER COLUMN TYPE and DROP PARTITION route to the table") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "alt2", tableType = TableType.COW, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 1000))
    tbl.bulkInsert(Seq((1L, 10, "p1", 1L), (2L, 20, "p1", 1L), (3L, 30, "p2", 1L))
      .toDF("id", "amt", "p", "ts"))
    spark.catalog.createTable("ext_alter2", "graft", Map("path" -> dir))

    // widening type change via Spark's own grammar
    spark.sql("ALTER TABLE ext_alter2 ALTER COLUMN amt TYPE bigint")
    val snap = graft.core.Snapshot.resolve(tbl.timeline)
    assert(tbl.readSchema(snap).apply("amt").dataType ==
      org.apache.spark.sql.types.LongType, "timeline schema widened")
    assert(spark.table("ext_alter2").schema("amt").dataType ==
      org.apache.spark.sql.types.LongType, "catalog schema widened")

    // drop a partition via Spark's own grammar; reads reflect it at once
    spark.sql("ALTER TABLE ext_alter2 DROP PARTITION (p = 'p1')")
    val got = spark.sql("SELECT id FROM ext_alter2 ORDER BY id")
      .as[Long].collect().toSeq
    assert(got == Seq(3L), s"p1 rows gone after DROP PARTITION: $got")
  }

  test("catalog reads always see the latest commit (no stale cached relation)") {
    import spark.implicits._
    val dir = tmp()
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "fresh", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    tbl.bulkInsert(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    spark.catalog.createTable("ext_fresh", "graft", Map("path" -> dir))
    // first SELECT caches the resolved relation in the session catalog
    assert(spark.sql("SELECT v FROM ext_fresh WHERE id = 1").head().getString(0) == "a")
    // a write AFTER the cache fill must be visible WITHOUT refreshTable
    tbl.upsert(Seq((1L, "a2", 2L), (2L, "b", 2L)).toDF("id", "v", "ts"))
    assert(spark.sql("SELECT v FROM ext_fresh WHERE id = 1").head().getString(0) == "a2",
      "cached relation must re-plan per scan, not serve the old snapshot")
    assert(spark.sql("SELECT count(*) FROM ext_fresh").head().getLong(0) == 2L)
  }

  test("custom kernels are callable from pure SQL and match the API forms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._

    assert(spark.sql(
      "SELECT dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT sum_squares(array(3.0F, 4.0F))")
      .head().getDouble(0) == 25.0)

    // LSH banding via SQL == the DataFrame kernel column
    val emb = Seq((1L, Array.tabulate(8)(i => (i - 3) * 0.5f)))
      .toDF("id", "vec")
    emb.createOrReplaceTempView("ext_fn_emb")
    val viaSql = spark.sql(
      "SELECT lsh_band_buckets(vec, 8, 4, 8) AS kb FROM ext_fn_emb")
      .head().getSeq[String](0)
    val viaApi = emb.select(
      graft.llm.Similarity.bandBuckets(col("vec"), 8, 4, 8).as("kb"))
      .head().getSeq[String](0)
    assert(viaSql == viaApi)

    // minhash/simhash via SQL == the Dedup signature paths
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_fn_docs")
    val sigSql = spark.sql(
      "SELECT minhash_sig(split(text, ' '), 3, 8) AS sig FROM ext_fn_docs")
      .head().getSeq[Long](0)
    val sigApi = graft.llm.Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 8)
      .head().getSeq[Long](1)
    assert(sigSql == sigApi)
    val shSql = spark.sql(
      "SELECT simhash48(split(text, ' ')) AS f FROM ext_fn_docs")
      .head().getLong(0)
    val shApi = graft.llm.Dedup.simhash(docs, "doc_id", "text")
      .head().getLong(1)
    assert(shSql == shApi)

    // lang_id via SQL == the Column form (the one text registration the
    // q103 oracle query does not exercise)
    val langSql = spark.sql(
      "SELECT lang_id(split(text, ' ')) AS l FROM ext_fn_docs")
      .head().getString(0)
    val langApi = docs.select(
      graft.llm.TextFunctions.langId(split(col("text"), " ")).as("l"))
      .head().getString(0)
    assert(langSql == langApi && langSql == "en")

    // curve kernels: z_value/hilbert_value agree with the expression API
    val ranks = Seq((3L, 5L)).toDF("rx", "ry")
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    ranks.createOrReplaceTempView("ext_fn_ranks")
    assert(spark.sql("SELECT z_value(rx, ry) FROM ext_fn_ranks").head().getLong(0) ==
      ranks.select(bridge.toColumn(graft.functions.ZValue(
        Seq(bridge.toExpr(col("rx")), bridge.toExpr(col("ry")))))).head().getLong(0))
    assert(spark.sql("SELECT hilbert_value(rx, ry) FROM ext_fn_ranks").head().getLong(0) ==
      ranks.select(bridge.toColumn(graft.functions.HilbertValue(
        bridge.toExpr(col("rx")), bridge.toExpr(col("ry"))))).head().getLong(0))

    // shape args must be literals — a column there is a loud error
    val err = intercept[Exception] {
      spark.sql("SELECT lsh_band_buckets(vec, CAST(id AS INT), 4, 8) FROM ext_fn_emb")
        .collect()
    }
    assert(err.getMessage.contains("literal integer"),
      s"expected a literal-arg error, got: ${err.getMessage}")

    // tokenizer kernels via SQL == the Tokenizer API forms: the merge
    // table / vocabulary is a literal array (trained driver-side)
    val bpeSql = spark.sql(
      "SELECT bpe_apply(array('h', 'u', 'g', '</w>'), array('h u', 'hu g'))")
      .head().getSeq[String](0)
    assert(bpeSql == Seq("hug", "</w>"), s"got $bpeSql")
    val wpSql = spark.sql(
      "SELECT wp_encode('unaffable zzz', " +
        "array('un', '##aff', '##able', 'a', '##a', '##f'), 5)")
      .head().getSeq[String](0)
    assert(wpSql == Seq("un", "##aff", "##able", graft.llm.Tokenizer.UnkToken),
      s"got $wpSql")
    val wpApi = Seq("unaffable zzz").toDF("text")
      .select(graft.llm.Tokenizer.wpEncode(col("text"),
        typedlit(Seq("un", "##aff", "##able", "a", "##a", "##f")
          .zipWithIndex.toMap), 5))
      .head().getSeq[String](0)
    assert(wpSql == wpApi)
    // a non-literal vocab is a loud error, like the shape ints
    val verr = intercept[Exception] {
      spark.sql("SELECT wp_encode(text, split(text, ' '), 5) FROM ext_fn_docs")
        .collect()
    }
    assert(verr.getMessage.contains("literal array"),
      s"expected a literal-array error, got: ${verr.getMessage}")
  }
}
