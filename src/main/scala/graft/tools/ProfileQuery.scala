package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Dev-loop profiler (driver-side tooling, like Bench/Verify — not part
  * of the library surface): runs one SparkEntry query warm and prints
  * its job and stage wall times, so a slow query's cost can be
  * attributed to a specific exchange/stage instead of guessed at.
  * Run: sbt -batch "runMain graft.ProfileQuery q43_ann_ivf"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val starts = mutable.Map[Int, Long]()
    val jobs = mutable.ArrayBuffer[(Int, Long)]()
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach(t0 =>
          jobs += ((j.jobId, (System.nanoTime() - t0) / 1000000)))
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages += ((i.stageId, i.name.take(60), ms, i.numTasks))
      }
    })

    val name = args.headOption.getOrElse("q43_ann_ivf")
    // warm
    (1 to 2).foreach { _ =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    Thread.sleep(200)
    jobs.clear(); stages.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1000000
    Thread.sleep(300)
    println(s"PROFILE $name total=${total}ms jobs=${jobs.size}")
    jobs.foreach { case (id, ms) => println(s"  job $id: ${ms}ms") }
    stages.sortBy(_._1).foreach { case (id, nm, ms, nt) =>
      println(s"  stage $id [$nt tasks, ${ms}ms] $nm") }
    spark.stop()
  }
}
