package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TableConfig, TableType}
import graft.write.GraftTable

/** Golden statement corpus runner (reference analog:
  * functional/TestSqlStatement.scala:23 executing
  * resources/sql-statements.sql): replays every RUN statement through
  * spark.sql and checks the EXPECT result block. */
class SqlStatementsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkSessionExtension")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def render(df: org.apache.spark.sql.DataFrame): String =
    df.collect()
      .map(_.toSeq.map(v => if (v == null) "null" else v.toString).mkString(","))
      .sorted.mkString("|")

  // the full corpus runs against BOTH base formats: the SQL surface must
  // be format-blind (same DML/DDL/read semantics whether data files are
  // parquet or ORC)
  for (format <- Seq("parquet", "orc"))
  test(s"sql-statements.sql golden corpus [$format]") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-corpus").toString
    val tbl = GraftTable.create(spark, dir, TableConfig(
      name = "gtab", tableType = TableType.MOR, keyFields = Seq("id"),
      partitionFields = Seq("p"), orderingField = "ts", targetFileRows = 1000,
      baseFormat = format))
    tbl.bulkInsert(Seq(
      (1L, "a", 10.0, 1L, "p1"), (2L, "b", 20.0, 1L, "p1"), (3L, "c", 30.0, 1L, "p2")
    ).toDF("id", "v", "amount", "ts", "p"))
    spark.sql("DROP TABLE IF EXISTS gtab")
    spark.catalog.createTable("gtab", "graft", Map("path" -> dir))

    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/sql-statements.sql"), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()

    var i = 0
    var nRun = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.startsWith("RUN:")) {
        val stmt = line.stripPrefix("RUN:").trim.replace("$T", dir)
        val expectLine = lines.drop(i + 1).map(_.trim)
          .find(l => l.startsWith("EXPECT:") || l.startsWith("EXPECT_ROWS:") ||
            l.startsWith("EXPECT_ERROR:"))
          .getOrElse(fail(s"no EXPECT after: $stmt"))
        // mutations invalidate the cached catalog relation
        spark.catalog.refreshTable("gtab")
        nRun += 1
        if (expectLine.startsWith("EXPECT_ERROR:")) {
          // the statement must REFUSE, with the reason named anywhere in
          // its cause chain (guard rails are part of the SQL surface)
          val want = expectLine.stripPrefix("EXPECT_ERROR:").trim
          val e = intercept[Throwable] { spark.sql(stmt).collect() }
          val msgs = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
          assert(msgs.contains(want),
            s"[$stmt] refused for the wrong reason: '$msgs' (want '$want')")
        } else {
          val result = spark.sql(stmt)
          if (expectLine.startsWith("EXPECT_ROWS:")) {
            val want = expectLine.stripPrefix("EXPECT_ROWS:").trim.toLong
            val got = result.count()
            assert(got == want, s"[$stmt] rows: got $got want $want")
          } else {
            val want = expectLine.stripPrefix("EXPECT:").trim
            if (want != "-") {
              val got = render(result)
              assert(got == want, s"[$stmt] got '$got' want '$want'")
            } else {
              result.collect() // must succeed
            }
          }
        }
      }
      i += 1
    }
    assert(nRun >= 15, s"corpus should exercise the full surface, ran $nRun")
  }

  test("first INSERT INTO a freshly created empty catalog table") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-insempty").toString
    GraftTable.create(spark, dir, TableConfig(
      name = "ins_empty", tableType = TableType.COW, keyFields = Seq("id"),
      orderingField = "ts", targetFileRows = 1000))
    // zero data commits -> snapshot schema is empty; column alignment
    // must fall back to the catalog's DECLARED schema
    spark.catalog.createTable("ins_empty", "graft",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType),
        StructField("ts", LongType))),
      Map("path" -> dir))
    spark.sql("INSERT INTO ins_empty VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.catalog.refreshTable("ins_empty")
    val got = spark.sql("SELECT id, v FROM ins_empty ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }
}
