package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class TopKAggSpec extends AnyFunSuite with SparkSpec {

  test("graft_topk: order, smaller-id ties, short groups, partial merge") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    // repartition(4) forces map-side partial heaps + a merge phase
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 7L), (1L, 0.5, 3L), (1L, 1.0, 99L),
      (1L, 0.4, 1L),
      (2L, 0.1, 1L))
      .toDF("g", "sim", "vec_id").repartition(4)
    val out = df.groupBy(col("g"))
      .agg(expr("graft_topk(sim, vec_id, 3)").as("t"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1))))
      .toMap
    // best first; equal scores tie to the SMALLER id (the window
    // formulation's orderBy(desc(sim), vec_id))
    assert(out(1L) === Seq((1.0, 99L), (0.9, 7L), (0.9, 10L)))
    assert(out(2L) === Seq((0.1, 1L))) // fewer rows than k: short array
  }

  test("graft_topk: NaN scores rank FIRST, matching a DESC window sort") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    // a zero-norm cosine yields NaN; Spark's ORDER BY sim DESC puts
    // NaN first, so the heap must admit and top-rank it
    val df = Seq((1L, Double.NaN, 5L), (1L, 0.9, 1L), (1L, 0.8, 2L))
      .toDF("g", "sim", "vec_id").repartition(3)
    val out = df.groupBy(col("g"))
      .agg(expr("graft_topk(sim, vec_id, 2)").as("t"))
      .head().getSeq[Row](1).map(x => x.getLong(1))
    assert(out === Seq(5L, 1L))
  }

  test("graft_topk plans as ObjectHashAggregate (partial + merge), no window") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.5, 2L)).toDF("g", "sim", "vec_id")
    val plan = df.groupBy(col("g"))
      .agg(expr("graft_topk(sim, vec_id, 5)").as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("graft_topk: non-integral k is a clean analysis failure, not a CCE") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.5, 2L)).toDF("g", "sim", "vec_id")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("g")).agg(expr("graft_topk(sim, vec_id, 'x')").as("t"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral"), e.getMessage)
  }

  test("graft_topk equals the window formulation on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import org.apache.spark.sql.expressions.Window
    val scored = emb.as("a").crossJoin(broadcast(
        emb.limit(3).select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", call_function(GraftFunctions.VecDotName,
        col("qv"), col("embedding")))
    val viaWindow = scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 7)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = scored.groupBy(col("query_id"))
      .agg(expr("graft_topk(sim, vec_id, 7)").as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), (col("pos") + 1).cast("long"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }
}
