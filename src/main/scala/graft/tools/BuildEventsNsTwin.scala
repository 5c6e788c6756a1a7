// Scratch fixture builder: a twin of an sf dir whose events `ts` is a
// LONG of epoch nanoseconds — the pre-r10 driver layout (VERDICT r12
// #8: EventsLayoutSpec pins both layouts at the unit level; running
// the BENCH smoke against this twin closes the exact r10 failure
// shape end-to-end). Other tables are copied unchanged.
// Run: sbt -batch "runMain graft.BuildEventsNsTwin /root/testdata/sf0.01 /tmp/sf001_ns"
//      SPARK_GRAFT_SF_DIR=/tmp/sf001_ns sbt -batch "runMain graft.Bench"
package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BuildEventsNsTwin {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    Files.createDirectories(Paths.get(outDir))
    new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "events.parquet")
      .foreach(f => Files.copy(f.toPath, Paths.get(outDir, f.getName),
        StandardCopyOption.REPLACE_EXISTING))
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val tsNanos = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * 1000L
    }
    ev.withColumn("ts", tsNanos).repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/events_tmp")
    val part = new java.io.File(s"$outDir/events_tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(outDir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$outDir/events_tmp"))
    println(s"EVENTSNS twin ready at $outDir")
    spark.stop()
  }
}
