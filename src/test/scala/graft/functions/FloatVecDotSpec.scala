package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class FloatVecDotSpec extends AnyFunSuite with SparkSpec {

  test("graft_vec_dot: SQL-registered, exact value") {
    GraftFunctions.ensureRegistered(spark)
    val v = spark.sql(
      """SELECT graft_vec_dot(
        |  array(cast(1.5 as float), cast(-2.0 as float), cast(0.5 as float)),
        |  array(cast(2.0 as float), cast(3.0 as float), cast(4.0 as float)))
        |""".stripMargin).head().getDouble(0)
    assert(v === 1.5 * 2.0 + (-2.0) * 3.0 + 0.5 * 4.0)
  }

  test("bit-identical to the HOF fold it replaced, on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val native = call_function(GraftFunctions.VecDotName,
      col("embedding"), col("embedding"))
    val mismatches = emb.select(hof.as("a"), native.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches === 0L)
  }

  test("null ELEMENTS propagate to null, matching the HOF composition") {
    GraftFunctions.ensureRegistered(spark)
    // constant-foldable form exercises nullSafeEval (interpreted)
    val folded = spark.sql(
      """SELECT graft_vec_dot(
        |  array(cast(1.0 as float), cast(null as float)),
        |  array(cast(2.0 as float), cast(3.0 as float))) AS d""".stripMargin)
    assert(folded.head().isNullAt(0))
    // non-foldable form exercises doGenCode: build rows, one with a
    // null slot — the null row yields null, the clean row a value
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](2.0f, 3.0f)),
        (2L, Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](2.0f, 3.0f)))
      .toDF("id", "a", "b")
      .select(col("id"), call_function(GraftFunctions.VecDotName,
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(df(1L) === None)
    assert(df(2L) === Some(1.0 * 2.0 + 2.0 * 3.0))
  }

  test("graft_vec_dist2: bit-identical to the HOF fold on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .withColumn("c", expr("transform(embedding, x -> cast(x as double) + 0.25)"))
    val hof = aggregate(
      zip_with(col("embedding"), col("c"),
        (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
      lit(0.0), (acc, x) => acc + x)
    val native = call_function(GraftFunctions.VecDist2Name,
      col("embedding"), col("c"))
    val mismatches = emb.select(hof.as("a"), native.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches === 0L)
    // null element -> null result (both eval paths)
    val nullCase = spark.sql(
      """SELECT graft_vec_dist2(
        |  array(cast(1.0 as float), cast(null as float)),
        |  array(cast(0.5 as double), cast(1.5 as double))) AS d""".stripMargin)
    assert(nullCase.head().isNullAt(0))
    // length mismatch -> null (zip_with semantics), NOT a partial sum
    val mismatch = spark.sql(
      """SELECT graft_vec_dist2(array(cast(1.0 as float)),
        |         array(cast(1.0 as double), cast(2.0 as double))) AS a,
        |       graft_vec_dot(array(cast(1.0 as float)),
        |         array(cast(1.0 as float), cast(2.0 as float))) AS b""".stripMargin)
      .head()
    assert(mismatch.isNullAt(0) && mismatch.isNullAt(1))
  }

  test("null-safe and codegen-compiled") {
    GraftFunctions.ensureRegistered(spark)
    // null input -> null out (and the analyzer constant-folds it via the
    // interpreted eval path, which exercises nullSafeEval)
    val nullDf = spark.sql(
      "SELECT graft_vec_dot(cast(null as array<float>), array(cast(1.0 as float))) AS d")
    assert(nullDf.head().isNullAt(0))
    // a non-foldable query stays inside whole-stage codegen (rendered as
    // the `*(n)` stage prefix in the executed plan)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(call_function(GraftFunctions.VecDotName,
        col("embedding"), col("embedding")).as("d"))
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.contains("graft_vec_dot"))
    assert(plan.contains("*(1)"), s"expected codegen stage marker in:\n$plan")
  }
}
