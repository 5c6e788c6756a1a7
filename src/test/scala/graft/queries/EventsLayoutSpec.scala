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

  /** Every SparkEntry query that reads the events table — derived, not
    * hand-listed, so a future query that starts reading events is
    * covered the day it is registered. Derivation reads the CHEAP side
    * first (r12 ADVICE): the oracle SQL mirrors each query's table
    * set, so a `\bevents\b` scan over `oracleSql` finds consumers with
    * zero plan builds; only oracle-LESS queries (none today) fall back
    * to analyzed-plan leaf inspection, which for construction-eager
    * queries would run their construction jobs.
    */
  private lazy val eventQueries: Seq[String] = {
    val eventsRef = "(?i)\\bevents\\b".r
    graft.SparkEntry.queries.keySet.toSeq.sorted.filter { name =>
      graft.SparkEntry.oracleSql.get(name) match {
        case Some(sql) => eventsRef.findFirstIn(sql).isDefined
        case None => scala.util.Try {
          graft.SparkEntry.queries(name)(spark, srcDir)
            .queryExecution.analyzed.collectLeaves().exists {
              case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                r.relation match {
                  case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                    h.location.rootPaths
                      .exists(_.toString.contains("events.parquet"))
                  case _ => false
                }
              case _ => false
            }
        }.getOrElse(false)
      }
    }
  }

  private val srcDir = "/root/testdata/sf0.001"

  /** A twin of sf0.001 whose events `ts` is a LONG of epoch
    * nanoseconds — the pre-r10 layout as the loader sees it (Spark
    * reads parquet TIMESTAMP(NANOS) only via the nanosAsLong legacy
    * conf, which surfaces exactly this LongType column). All other
    * tables are the driver's files unchanged.
    */
  private lazy val nanosDir: String = {
    // fixed, reusable path (r12 self-review): the twin is a pure
    // function of the driver fixture, so repeated suite runs share one
    // copy instead of leaking a fresh temp dir each run; stale copies
    // are rebuilt whenever the driver fixture is newer
    val fixed = Paths.get("/tmp/graft_events_ns_fixture")
    val srcM = new java.io.File(s"$srcDir/events.parquet").lastModified()
    val fresh = Files.exists(fixed.resolve("events.parquet")) &&
      fixed.resolve("events.parquet").toFile.lastModified() > srcM
    if (fresh) fixed.toString
    else buildTwin(fixed)
  }

  private def buildTwin(fixed: java.nio.file.Path): String = {
    org.apache.commons.io.FileUtils.deleteQuietly(fixed.toFile)
    Files.createDirectories(fixed)
    val dir = fixed.toString
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
    // the plan-derived consumer set must cover at least the 13 known
    // event queries — if derivation silently broke, this catches it
    assert(eventQueries.size >= 13,
      s"expected >= 13 event-reading queries, derived: $eventQueries")

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
