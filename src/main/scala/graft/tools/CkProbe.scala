// Scratch diagnostic (r21): does a lazy localCheckpoint materialize on
// a toRdd.count() so that the following collect() reads blocks instead
// of re-running the pipeline? Run: sbt "runMain graft.tools.CkProbe"
package graft.tools

import org.apache.spark.sql.functions._

object CkProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ckprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 0).select(col("l_orderkey"))
    // warm
    base.write.format("noop").mode("overwrite").save()

    val ckE = time("eager localCheckpoint")(base.localCheckpoint())
    time("eager limit.collect")(ckE.limit(100001).collect())
    graft.operators.Checkpoints.release(ckE)

    val ckL = time("lazy localCheckpoint")(base.localCheckpoint(eager = false))
    time("lazy toRdd.count")(ckL.queryExecution.toRdd.count())
    time("lazy collect")(ckL.collect())
    time("lazy collect again")(ckL.collect())
    graft.operators.Checkpoints.release(ckL)
    spark.stop()
  }
}
