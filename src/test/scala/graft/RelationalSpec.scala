package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every relational query runs and returns rows at sf0.001") {
    for ((name, (fn, _)) <- graft.queries.Relational.all) {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle keeps identical column names sorted-compare-safe") {
    // oracle must exist for all relational entries
    for ((name, (_, sql)) <- graft.queries.Relational.all)
      assert(sql.nonEmpty, s"$name missing oracle")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
