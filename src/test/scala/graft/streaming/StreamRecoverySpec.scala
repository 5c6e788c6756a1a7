package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Checkpoint-RECOVERY certification for the stateful window sketches
  * (r15 verdict What's-missing #4): StreamOpsSpec proves cross-batch
  * state within ONE query lifetime; the production failure mode is a
  * query that dies mid-stream and restarts from its file checkpoint.
  * Each case here runs the op twice over identical input — once
  * uninterrupted, once stopped cold between micro-batches and
  * restarted from the checkpoint — and asserts the FINALIZED windows
  * are equal bit-for-bit (binary sketch payloads compared as bytes):
  * the sketches' merge determinism makes recovery exact, not just
  * approximately consistent. The sink is `foreachBatch` into a driver
  * buffer (a fault-tolerant sink shape, unlike the memory sink, so
  * restart-from-checkpoint is supported), and the source is a
  * MemoryStream whose retained batches replay uncommitted offsets on
  * restart — the same harness Spark's own recovery tests use.
  */
class StreamRecoverySpec extends AnyFunSuite with SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000)

  /** Run `op` over `batches` (fed one micro-batch per element, with
    * `processAllAvailable` barriers) and return every emitted row.
    * With `restartAfter = Some(i)`, the query is STOPPED cold after
    * batch i commits and a fresh query resumes from the same file
    * checkpoint for the remaining batches.
    */
  private def runBatches[T <: Product : org.apache.spark.sql.Encoder](
      cols: Seq[String],
      batches: Seq[Seq[T]],
      restartAfter: Option[Int])(op: DataFrame => DataFrame): Seq[Row] = {
    val s = spark
    implicit val sq = s.sqlContext
    val in = MemoryStream[T]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_recovery_").toString
    val out = ArrayBuffer.empty[Row]
    def start() = op(in.toDF().toDF(cols: _*)).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        out.synchronized { out ++= rows }; ()
      }
      .start()
    var q = start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        in.addData(b)
        q.processAllAvailable()
        if (restartAfter.contains(i)) {
          q.stop(); q.awaitTermination()
          q = start() // resumes from the committed checkpoint offsets
        }
      }
    } finally q.stop()
    out.toSeq
  }

  /** Finalized-window rows keyed by win_start seconds, every other
    * field normalized to a comparable value (byte arrays -> hex).
    */
  private def byWindow(rows: Seq[Row]): Map[Long, Seq[Any]] =
    rows.map { r =>
      val key = r.getTimestamp(0).getTime / 1000
      val rest = (1 until r.length).map { i =>
        r.get(i) match {
          case b: Array[Byte] => b.map("%02x".format(_)).mkString
          case v => v
        }
      }
      key -> rest
    }.toMap

  /** The shared certification: op output with a mid-stream restart
    * equals the uninterrupted run bit-for-bit on the same batches.
    */
  private def certify[T <: Product : org.apache.spark.sql.Encoder](
      cols: Seq[String], batches: Seq[Seq[T]], stopAfter: Int)(
      op: DataFrame => DataFrame): Map[Long, Seq[Any]] = {
    val straight = byWindow(runBatches(cols, batches, None)(op))
    val recovered = byWindow(runBatches(cols, batches, Some(stopAfter))(op))
    assert(recovered === straight,
      "restart-from-checkpoint must reproduce the uninterrupted run")
    assert(straight.nonEmpty, "certification needs a finalized window")
    straight
  }

  // hour-0 data split across two pre-restart/post-restart batches,
  // then two watermark-advancing batches that finalize hour 0 (the
  // second makes the new watermark take effect on state eviction)

  test("ST10 heavy hitters recover exact counts from a file checkpoint") {
    val batches = Seq(
      Seq((ts(0), "a"), (ts(10), "a"), (ts(20), "b")),
      Seq((ts(60), "a"), (ts(70), "b"), (ts(80), "c")),
      Seq((ts(3600 * 3), "z")),
      Seq((ts(3600 * 3 + 1), "z")))
    val fin = certify(Seq("ts", "token"), batches, stopAfter = 0) { df =>
      StreamOps.streamingHeavyHitters(df, capacity = 10,
        watermarkDelay = "5 minutes", windowLength = "1 hour")
    }
    // value check on top of the bit-for-bit one: hour-0 counts exact
    val top = fin(0L).head.asInstanceOf[scala.collection.Seq[Row]]
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(top("a") === 3L && top("b") === 2L && top("c") === 1L)
  }

  test("ST11 windowed HLL distinct recovers exact estimates from a file checkpoint") {
    val batches = Seq(
      Seq((ts(0), 7L), (ts(60), 7L)),
      Seq((ts(120), 8L), (ts(180), 9L)),
      Seq((ts(3600 * 3), 1L)),
      Seq((ts(3600 * 3 + 1), 1L)))
    val fin = certify(Seq("ts", "user_id"), batches, stopAfter = 0) { df =>
      StreamOps.streamingDistinctUsers(df, p = 12,
        watermarkDelay = "5 minutes", windowLength = "1 hour")
    }
    // value check: n_zero pins the register state exactly (2^12 - 3
    // touched registers); est_users is the raw rational estimator,
    // whose small-range form the caller derives FROM n_zero
    assert(fin(0L)(1) === (1L << 12) - 3)
  }

  test("ST13 windowed CMS grids recover bit-for-bit from a file checkpoint") {
    val batches = Seq(
      Seq((ts(0), 7L), (ts(60), 7L)),
      Seq((ts(120), 7L), (ts(180), 8L)),
      Seq((ts(3600 * 3), 9L)),
      Seq((ts(3600 * 3 + 1), 9L)))
    val fin = certify(Seq("ts", "user_id"), batches, stopAfter = 0) { df =>
      StreamOps.streamingSeenCounts(df, probeKeys = Seq("7", "8"),
        width = 256, depth = 4,
        watermarkDelay = "5 minutes", windowLength = "1 hour")
    }
    // row layout: win_start, sketch(hex), n_7, n_8
    assert(fin(0L)(1) === 3L && fin(0L)(2) === 1L)
  }
}
