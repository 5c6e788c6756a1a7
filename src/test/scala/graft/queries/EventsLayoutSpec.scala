package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins BOTH observed `events.parquet` layouts forever (r11 VERDICT
  * #7): between r9 and r10 the driver regenerated testdata and the
  * events `ts` column flipped from TIMESTAMP(NANOS)-read-as-long to
  * TIMESTAMP_NTZ (`timestamp[us]`, isAdjustedToUTC=false), which
  * broke all 13 time-series queries in the r10 bench gate. The
  * loader ([[QueryPack.events]]) now dispatches on the observed
  * schema; this spec runs every event-consuming query against the
  * CURRENT driver fixture AND a synthesized epoch-nanos-long twin of
  * it and asserts identical results — so the next layout flip costs
  * one red test with a clear name, not a 39-query bench failure.
  */
class EventsLayoutSpec extends AnyFunSuite with SparkSpec {

  /** Every SparkEntry query whose plan reads events.parquet. */
  private val eventQueries = Seq(
    "q22_range_join", "q23_sessionize", "q24_tumbling_window",
    "q25_json_extract", "q45_asof_join", "q46_sliding_window",
    "q47_session_window", "q65_stream_tumbling_twin",
    "q73_stream_sessionize_twin", "q74_stream_attribution_twin",
    "q95_funnel", "q96_retention_cohorts", "q102_funnel_windowed")

  private val srcDir = "/root/testdata/sf0.001"

  /** A twin of sf0.001 whose events `ts` is a LONG of epoch
    * nanoseconds — the pre-r10 layout as the loader sees it (Spark
    * reads parquet TIMESTAMP(NANOS) only via the nanosAsLong legacy
    * conf, which surfaces exactly this LongType column). All other
    * tables are the driver's files unchanged.
    */
  private lazy val nanosDir: String = {
    val dir = Files.createTempDirectory("graft_events_ns").toString
    new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "events.parquet")
      .foreach(f => Files.copy(f.toPath, Paths.get(dir, f.getName),
        StandardCopyOption.REPLACE_EXISTING))
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val tsNanos = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") // driver already ships the long layout: twin is a copy
      case _ =>
        // NTZ wall-clock micros under the UTC test session -> nanos
        unix_micros(col("ts").cast("timestamp")) * 1000L
    }
    ev.withColumn("ts", tsNanos)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events_tmp")
    // the harness expects a single file path readable as a table dir;
    // parquet() wrote a directory — point the table at it by renaming
    val part = new java.io.File(s"$dir/events_tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("events loader: every time-series query is layout-invariant (NTZ vs epoch-nanos long)") {
    // guard: the list above must stay in sync with the query registry
    val missing = eventQueries.filterNot(graft.SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown event queries: $missing")

    val nsSchema = spark.read.parquet(s"$nanosDir/events.parquet").schema("ts")
    assert(nsSchema.dataType === org.apache.spark.sql.types.LongType,
      "twin fixture must surface ts as LongType (the pre-r10 layout)")

    eventQueries.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val a = fn(spark, srcDir).collect().map(_.toString).toSeq
      val b = fn(spark, nanosDir).collect().map(_.toString).toSeq
      assert(a.nonEmpty, s"$name returned zero rows on the driver fixture")
      assert(a === b,
        s"$name differs between the NTZ fixture and the epoch-nanos twin")
    }
  }
}
