package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** The codegen'd dot/norm kernels must be drop-in equal — including null
  * and mismatch edge cases — to the higher-order-function forms they
  * replaced (the DuckDB oracles hash that contract). */
class VectorMathSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("dot/norm match the lambda forms bit-for-bit on float vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.25f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.fill(64)(0.123f), Array.fill(64)(-0.456f))
    ).toDF("a", "b")
    val got = df.select(
      Similarity.dotD(col("a"), col("b")).as("dot"),
      hofDot(col("a"), col("b")).as("want"),
      Similarity.normD(col("a")).as("nrm"),
      sqrt(aggregate(transform(col("a"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as("wnrm"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot must be bit-identical")
      assert(r.getDouble(2) == r.getDouble(3), "norm must be bit-identical")
    }
  }

  test("mixed float×double inputs and null/mismatch edges") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0, 4.0))
    ).toDF("f", "d")
    // mixed element types promote like the lambda form: 1*3 + 2*4 = 11
    assert(df.select(Similarity.dotD(col("f"), col("d"))).head().getDouble(0) == 11.0)

    // length mismatch -> null (zip_with padding semantics)
    val mm = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(mm.select(Similarity.dotD(col("a"), col("b"))).head().isNullAt(0))

    // null array -> null; null element -> null
    val na = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(na.select(Similarity.dotD(col("a"), col("b"))).head().isNullAt(0))
    val ne = spark.sql(
      "SELECT CAST(array(1.0, NULL) AS ARRAY<DOUBLE>) a, CAST(array(2.0, 3.0) AS ARRAY<DOUBLE>) b")
    assert(ne.select(Similarity.dotD(col("a"), col("b"))).head().isNullAt(0))
    assert(ne.select(Similarity.normD(col("a"))).head().isNullAt(0))
  }

  test("kernels run inside whole-stage codegen") {
    // non-foldable input (derived from range) so the kernel is planned,
    // not constant-folded into a LocalTableScan
    val df = spark.range(3)
      .select(array(col("id").cast("float"), lit(2.0f)).as("a"),
        array(lit(3.0f), lit(4.0f)).as("b"))
      .select(Similarity.dotD(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotproductd("),
      s"expected the kernel fused into a codegen span:\n$plan")
    assert(df.orderBy(col("d")).collect().map(_.getDouble(0)).toSeq ==
      Seq(8.0, 11.0, 14.0))
  }

  test("one-pass LSH band buckets match the per-plane lambda signature") {
    import spark.implicits._
    val dims = 16
    val planes = 8
    val bands = 4
    // vectors spanning signs, magnitudes, and exact-zero dots
    val vecs = (0 until 12).map { s =>
      (s.toLong, Array.tabulate(dims)(i => ((s * 31 + i * 7) % 13 - 6) * 0.25f))
    } :+ (99L, Array.fill(dims)(0.0f))
    val df = vecs.toDF("id", "vec")

    val sig = Similarity.lshSignature(col("vec"), planes, dims)
    val bitsPerBand = planes / bands
    val wantBands = (0 until bands).map { b =>
      concat_ws("", (0 until bitsPerBand).map(r =>
        sig(b * bitsPerBand + r).cast("string")): _*)
    }
    val got = df.select(col("id"),
        Similarity.bandBuckets(col("vec"), planes, bands, dims).as("kb"),
        array(wantBands: _*).as("wb"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"kernel buckets diverge for id=${r.getLong(0)}")
    }

    // degenerate inputs produce ALL-ZERO buckets exactly like the
    // when(null > 0).otherwise(0) lambda form: null vec, null element,
    // wrong length
    val zero = Seq.fill(bands)("0" * bitsPerBand)
    val edge = spark.sql(
      """SELECT * FROM VALUES
           (CAST(NULL AS ARRAY<FLOAT>)),
           (CAST(array(1.0, NULL) AS ARRAY<FLOAT>)),
           (CAST(array(1.0) AS ARRAY<FLOAT>)) AS t(vec)""")
    edge.select(Similarity.bandBuckets(col("vec"), planes, bands, dims).as("kb"))
      .collect()
      .foreach(r => assert(r.getSeq[String](0) == zero))
  }

  test("LSH bucket kernel stays inside whole-stage codegen") {
    val df = spark.range(4)
      .select(array((0 until 8).map(i =>
        (col("id") * (i + 1)).cast("float") - 14.0f): _*).as("vec"))
      .select(Similarity.bandBuckets(col("vec"), 8, 4, 8).as("kb"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [lshbandbuckets("),
      s"expected the LSH kernel fused into a codegen span:\n$plan")
    assert(df.collect().forall(_.getSeq[String](0).length == 4))
  }

  test("quantization kernels: null/malformed input nulls the row; codegen stays fused") {
    import spark.implicits._
    val cb = Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(0.0, 0.0), Seq(2.0, 2.0)))
    val edge = spark.sql(
      """SELECT * FROM VALUES
           (CAST(NULL AS ARRAY<FLOAT>)),
           (CAST(array(1.0, NULL, 1.0, 1.0) AS ARRAY<FLOAT>)),
           (CAST(array(1.0) AS ARRAY<FLOAT>)),
           (CAST(array(1.0, 1.0, 2.0, 2.0) AS ARRAY<FLOAT>)) AS t(vec)""")
    val codes = edge.select(Similarity.pqCodes(col("vec"), cb).as("c")).collect()
    assert(codes.take(3).forall(_.isNullAt(0)), "null/short/null-element rows must null")
    assert(codes(3).getSeq[Int](0) == Seq(1, 1))
    val dec = edge.select(
      Similarity.pqDecode(Similarity.pqCodes(col("vec"), cb), cb).as("d")).collect()
    assert(dec(3).getSeq[Double](0) == Seq(1.0, 1.0, 2.0, 2.0))
    // sq8 roundtrip on a degenerate (constant) dimension
    val lo = Seq(0.0, 5.0); val hi = Seq(10.0, 5.0)
    val sq = Seq(Tuple1(Array(10.0f, 5.0f))).toDF("vec")
      .select(Similarity.sq8Decode(Similarity.sq8Codes(col("vec"), lo, hi), lo, hi))
      .head().getSeq[Double](0)
    assert(sq(1) == 5.0, "constant dim must decode to lo")
    assert(sq(0) > 9.9 && sq(0) <= 10.0, s"top-of-range decodes near hi: ${sq(0)}")
    // the kernels fuse into a whole-stage-codegen projection
    val plan = spark.range(2)
      .select(array((0 until 4).map(i => (col("id") + i).cast("float")): _*).as("vec"))
      .select(Similarity.pqCodes(col("vec"), cb).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [pqencodeexpr("),
      s"expected the PQ kernel fused into a codegen span:\n$plan")
  }
}
