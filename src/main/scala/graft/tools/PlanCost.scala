// Scratch diagnostic (r21): per-query driver-side planning cost vs
// execution cost under the bench config. For each query: time (a) fn
// construction, (b) executedPlan force (analysis+optimization+physical
// planning), (c) the noop write (execution incl. codegen lookups).
// Run: sbt "runMain graft.tools.PlanCost q116_importance_select ..."
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keySet.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm twice
      (1 to 2).foreach { _ =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        graft.operators.Checkpoints.releaseLeaked(spark)
      }
      def t[T](f: => T): (Double, T) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (tc, df) = t(fn(spark, sfDir))
      val (tp, _) = t(df.queryExecution.executedPlan)
      val (te, _) = t(df.write.format("noop").mode("overwrite").save())
      graft.operators.Checkpoints.releaseLeaked(spark)
      println(f"[plancost] $name%-36s construct=$tc%6.3f plan=$tp%6.3f exec=$te%6.3f")
    }
    spark.stop()
  }
}
