package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReader
import graft.sql.{GraftDml, GraftSql}
import graft.write.GraftTable

class DmlSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def tmp(): String = Files.createTempDirectory("graft-dml").toString

  def cfg(tt: String = TableType.COW): TableConfig = TableConfig(
    name = "t", tableType = tt, keyFields = Seq("id"),
    orderingField = "ts", targetFileRows = 1000)

  def seed(dir: String, tt: String = TableType.COW): GraftTable = {
    import spark.implicits._
    val tbl = GraftTable.create(spark, dir, cfg(tt))
    tbl.bulkInsert(Seq(
      (1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L), (3L, "c", 30.0, 1L)
    ).toDF("id", "v", "amount", "ts"))
    tbl
  }

  def state(tbl: GraftTable): Seq[(Long, String, Double, Long)] = {
    import spark.implicits._
    val r = GraftReader(tbl)
    r.dataOnly(r.snapshot()).as[(Long, String, Double, Long)].collect().sortBy(_._1).toSeq
  }

  test("UPDATE applies assignments to matching rows only") {
    val tbl = seed(tmp())
    val t = GraftDml(tbl).update(col("amount") > 15,
      Map("v" -> upper(col("v")), "amount" -> (col("amount") * 2)))
    assert(t.isDefined)
    assert(state(tbl) == Seq(
      (1L, "a", 10.0, 1L), (2L, "B", 40.0, 1L), (3L, "C", 60.0, 1L)))
  }

  test("UPDATE rejects key-field assignment; no-match is a no-op") {
    val tbl = seed(tmp())
    intercept[IllegalArgumentException] {
      GraftDml(tbl).update(lit(true), Map("id" -> lit(99L)))
    }
    assert(GraftDml(tbl).update(col("id") > 100, Map("v" -> lit("x"))).isEmpty)
  }

  test("DELETE removes matching rows") {
    val tbl = seed(tmp())
    assert(GraftDml(tbl).deleteWhere(col("id") === 2L).isDefined)
    assert(state(tbl).map(_._1) == Seq(1L, 3L))
  }

  test("MERGE: update + delete + insert in ONE commit, first WHEN wins") {
    import spark.implicits._
    val tbl = seed(tmp())
    val source = Seq(
      (1L, "a9", 99.0, 2L),  // matched, amount>50 in source -> first clause: delete
      (2L, "b2", 25.0, 2L),  // matched -> second clause: update
      (4L, "d", 40.0, 2L)    // not matched -> insert
    ).toDF("id", "v", "amount", "ts")
    val before = tbl.timeline.completed().size
    val t = GraftDml(tbl).merge(source, expr("s.id = t.id"))
      .whenMatchedDelete(Some(expr("s.amount > 50")))
      .whenMatchedUpdate(Map(
        "v" -> expr("s.v"), "amount" -> expr("s.amount + t.amount"), "ts" -> expr("s.ts")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(t.isDefined)
    assert(tbl.timeline.completed().size == before + 1) // single commit
    assert(state(tbl) == Seq(
      (2L, "b2", 45.0, 2L), (3L, "c", 30.0, 1L), (4L, "d", 40.0, 2L)))
  }

  test("MERGE: unreferenced target rows keep their commit time (no rewrite churn)") {
    import spark.implicits._
    val tbl = seed(tmp())
    val t0 = tbl.timeline.completed().last.time
    val source = Seq((1L, "a2", 11.0, 2L)).toDF("id", "v", "amount", "ts")
    GraftDml(tbl).merge(source, expr("s.id = t.id"))
      .whenMatchedUpdateAll().execute()
    val r = GraftReader(tbl)
    val byKey = r.snapshot().select(col("id"), col(graft.write.Meta.CommitTime))
      .as[(Long, String)].collect().toMap
    assert(byKey(1L) != t0)   // updated row re-stamped
    assert(byKey(3L) == t0)   // untouched key keeps the original commit
  }

  test("MERGE on MOR lands as delta commit and merges at read") {
    import spark.implicits._
    val tbl = seed(tmp(), TableType.MOR)
    val source = Seq((2L, "b2", 21.0, 2L), (5L, "e", 50.0, 2L)).toDF("id", "v", "amount", "ts")
    GraftDml(tbl).merge(source, expr("s.id = t.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(tbl.timeline.completed().last.action == Action.DeltaCommit)
    assert(state(tbl) == Seq(
      (1L, "a", 10.0, 1L), (2L, "b2", 21.0, 2L), (3L, "c", 30.0, 1L), (5L, "e", 50.0, 2L)))
  }

  test("MERGE NOT MATCHED BY SOURCE: update/delete target-only rows, first WHEN wins") {
    import spark.implicits._
    val dir = tmp()
    val tbl = seed(dir)
    // source covers id 2 (update) and 4 (insert); ids 1 and 3 are
    // NOT matched by source: 1 deleted, 3 repriced by the later clause
    val src = Seq((2L, "b2", 21.0, 2L), (4L, "d", 40.0, 2L))
      .toDF("id", "v", "amount", "ts")
    val n = GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .whenNotMatchedBySourceDelete(Some(col("t.id") === 1L))
      .whenNotMatchedBySourceUpdate(Map("amount" -> (col("t.amount") + 100.0)))
      .execute()
    assert(n.nonEmpty)
    assert(state(tbl) == Seq(
      (2L, "b2", 21.0, 2L), (3L, "c", 130.0, 1L), (4L, "d", 40.0, 2L)))
    // all in ONE commit
    assert(tbl.timeline.completed().count(i =>
      graft.core.Action.dataActions(i.action)) == 2) // bulk load + merge
    // NMBS update may not touch key fields
    intercept[IllegalArgumentException] {
      GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
        .whenNotMatchedBySourceUpdate(Map("id" -> lit(9L)))
    }
    // star-less update set is required (no source row to star from)
    intercept[IllegalArgumentException] {
      GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
        .whenNotMatchedBySourceUpdate(Map.empty)
    }
    // a typo'd SET column must fail loudly, not silently no-op
    val e = intercept[IllegalArgumentException] {
      GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("amoutn" -> lit(1.0)))
        .execute()
    }
    assert(e.getMessage.contains("unknown columns in MERGE SET"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
        .whenNotMatchedBySourceUpdate(Map("amoutn" -> lit(1.0)))
        .execute()
    }
    assert(e2.getMessage.contains("unknown columns in MERGE SET"), e2.getMessage)
  }

  test("MERGE with ONLY not-matched-by-source clauses works standalone") {
    import spark.implicits._
    val dir = tmp()
    val tbl = seed(dir)
    val src = Seq((2L, "b", 20.0, 2L)).toDF("id", "v", "amount", "ts")
    GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
      .whenNotMatchedBySourceDelete()
      .execute()
    assert(state(tbl) == Seq((2L, "b", 20.0, 1L)))
  }

  test("MERGE clause conditions: unmatched-by-any-clause rows are ignored") {
    import spark.implicits._
    val tbl = seed(tmp())
    val source = Seq(
      (1L, "x", 5.0, 2L),   // matched but fails the update condition -> untouched
      (9L, "y", 5.0, 2L)    // not matched but fails insert condition -> dropped
    ).toDF("id", "v", "amount", "ts")
    val t = GraftDml(tbl).merge(source, expr("s.id = t.id"))
      .whenMatchedUpdate(Map("v" -> expr("s.v")), Some(expr("s.amount > 100")))
      .whenNotMatchedInsertAll(Some(expr("s.amount > 100")))
      .execute()
    assert(t.isEmpty)
    assert(state(tbl) == Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L), (3L, "c", 30.0, 1L)))
  }

  test("MERGE schema evolution: star actions append new source columns; " +
      "strictSchema refuses; explicit assignments ignore extras") {
    import spark.implicits._
    val tbl = seed(tmp())
    val src = Seq(
      (2L, "B", 22.0, 2L, "eu"),   // matched: update *
      (4L, "d", 40.0, 2L, "us"))   // not matched: insert *
      .toDF("id", "v", "amount", "ts", "region")
    assert(GraftDml(tbl).merge(src, col("t.id") === col("s.id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute().nonEmpty)
    val r = GraftReader(tbl)
    val after = r.dataOnly(r.snapshot())
    assert(after.columns.toSeq == Seq("id", "v", "amount", "ts", "region"),
      "new column must APPEND after the stable field order")
    val got = after.as[(Long, String, Double, Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", 10.0, 1L, None),            // untouched: null-padded
      (2L, "B", 22.0, 2L, Some("eu")),      // updated incl. new column
      (3L, "c", 30.0, 1L, None),
      (4L, "d", 40.0, 2L, Some("us"))))     // inserted with new column

    // strictSchema: the same star merge refuses loudly
    val strictDir = tmp()
    val strict = GraftTable.create(spark, strictDir,
      cfg().copy(strictSchema = true))
    strict.bulkInsert(Seq((1L, "a", 10.0, 1L)).toDF("id", "v", "amount", "ts"))
    val e = intercept[IllegalArgumentException] {
      GraftDml(strict).merge(src, col("t.id") === col("s.id"))
        .whenMatchedUpdateAll().execute()
    }
    assert(e.getMessage.contains("strictSchema"))

    // purely EXPLICIT assignments: extra source columns stay unused
    // context (standard SQL), no evolution happens
    val plainDir = tmp()
    val plain = seed(plainDir)
    GraftDml(plain).merge(src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("amount" -> (col("s.amount") + 1)))
      .execute()
    val rp = GraftReader(plain)
    assert(rp.dataOnly(rp.snapshot()).columns.toSeq ==
      Seq("id", "v", "amount", "ts"),
      "explicit assignments must not evolve the schema")
    assert(state(plain).find(_._1 == 2L).get._3 == 23.0)
  }

  test("SQL surface: UPDATE / DELETE / compaction statements") {
    import spark.implicits._
    val dir = tmp()
    val tbl = seed(dir, TableType.MOR)
    GraftSql.sql(spark, s"UPDATE '$dir' SET v = concat(v, '!'), amount = amount + 1 WHERE id <= 2")
    assert(state(tbl) == Seq(
      (1L, "a!", 11.0, 1L), (2L, "b!", 21.0, 1L), (3L, "c", 30.0, 1L)))
    GraftSql.sql(spark, s"DELETE FROM '$dir' WHERE id = 3")
    assert(state(tbl).map(_._1) == Seq(1L, 2L))
    // deltas exist -> schedule shows candidates, run compacts them
    val plan = GraftSql.sql(spark, s"SCHEDULE COMPACTION ON '$dir'")
    assert(plan.count() > 0)
    val ran = GraftSql.sql(spark, s"RUN COMPACTION ON '$dir'")
    assert(ran.count() == 1)
    assert(GraftSql.sql(spark, s"SHOW COMPACTION ON '$dir'").count() == 1)
    assert(state(tbl).map(_._1) == Seq(1L, 2L)) // state unchanged by compaction
  }

  test("SQL surface: clustering statements (schedule pins, run executes)") {
    val dir = tmp()
    val tbl = seed(dir, TableType.COW)
    val plan = GraftSql.sql(spark, s"SCHEDULE CLUSTERING ON '$dir' SORT BY (id)")
    assert(plan.count() > 0, "schedule lists the pinned file groups")
    assert(GraftSql.sql(spark, s"SHOW CLUSTERING ON '$dir'").collect()
      .exists(_.getString(0).endsWith("(requested)")))
    // an explicit spec must not silently substitute the pending plan
    val refused = intercept[IllegalStateException] {
      GraftSql.sql(spark, s"RUN CLUSTERING ON '$dir' SORT BY (v) LAYOUT hilbert")
    }
    assert(refused.getMessage.contains("pending"))
    // bare RUN CLUSTERING executes what was scheduled
    val ran = GraftSql.sql(spark, s"RUN CLUSTERING ON '$dir'")
    assert(ran.count() == 1)
    assert(state(tbl).map(_._1) == Seq(1L, 2L, 3L), "state unchanged by clustering")
    val shown = GraftSql.sql(spark, s"SHOW CLUSTERING ON '$dir'").collect().map(_.getString(0))
    assert(shown.length == 1 && !shown.head.contains("requested"),
      s"one completed clustering, no pending: ${shown.mkString(",")}")
  }
}
