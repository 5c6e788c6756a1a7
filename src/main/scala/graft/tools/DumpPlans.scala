package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round plan snapshots: writes
  * `<outDir>/<query>_<suffix>.txt` with `explain("formatted")` for each
  * named query, under the SAME session knobs the bench uses (AQE off,
  * derived shuffle partitions, 64 KiB openCost) so the dumped plan is
  * the plan the bench times.
  *
  *   sbt "runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> q1,q2,..."
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args.take(4)
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dump-plans")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "4"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    unknown.foreach(n => System.err.println(s"WARNING: unknown query '$n'"))
    names.filter(graft.SparkEntry.queries.contains).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      graft.operators.Checkpoints.releaseLeaked(spark)
      println(s"[plans] $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
