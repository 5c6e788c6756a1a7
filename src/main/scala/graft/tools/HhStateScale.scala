// Scratch measurement entry: ST10 streaming heavy-hitter STATE scale
// (VERDICT r13 next-round #6). ST10 is the one streaming operator with
// real per-window state (a Space-Saving sketch per open window); this
// measures state-store rows and bytes as open-window count grows 10x
// at fixed capacity, from the engine's own StreamingQueryProgress
// stateOperators metrics. The claim under test: state is bounded per
// window (O(capacity) counters regardless of events or distinct
// tokens seen), so total state grows LINEARLY in open windows and not
// at all in stream length — the property that lets a 100 TB/day token
// stream run with watermark-bounded memory.
// Run: sbt -batch "runMain graft.HhStateScale"
package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object HhStateScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val capacity = 64
    // tokens per window: >> capacity distincts so EVICTION runs in
    // every window's sketch (the bounded-state regime, not the exact
    // small-distinct regime)
    val eventsPerWindow = 2000
    val distinctPerWindow = 500

    def run(windows: Int): (Long, Long, Double) = {
      val in = MemoryStream[(Timestamp, String)]
      val name = s"hh_state_$windows"
      val q = streaming.StreamOps.streamingHeavyHitters(
          in.toDF().toDF("ts", "token"), capacity = capacity,
          // LONG watermark: every window stays OPEN for the whole run,
          // so the final progress reports peak state — W live sketches
          watermarkDelay = "30 days", windowLength = "1 hour")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        val rnd = new java.util.Random(7)
        (0 until windows).grouped(math.max(1, windows / 4)).foreach { ws =>
          val batch = ws.flatMap { wi =>
            (0 until eventsPerWindow).map { e =>
              val tok = f"w${wi}_t${rnd.nextInt(distinctPerWindow)}%04d"
              (new Timestamp((wi.toLong * 3600 + e % 3600) * 1000L), tok)
            }
          }
          in.addData(batch: _*)
          q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val st = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
          .head.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        (st.numRowsTotal, st.memoryUsedBytes, wall)
      } finally q.stop()
    }

    // warm once (state-store + codegen init lands on the first run)
    run(4)
    val results = Seq(24, 240).map { w =>
      val (rows, bytes, wall) = run(w)
      println(f"HHSTATE windows=$w%4d stateRows=$rows%6d " +
        f"stateBytes=$bytes%10d bytesPerWindow=${bytes / w}%8d " +
        f"rowsPerWindow=${rows.toDouble / w}%.1f wall=$wall%.1f s " +
        f"events=${w * eventsPerWindow}")
      (w, rows, bytes, wall)
    }
    val (w0, r0, b0, _) = results.head
    val (w1, r1, b1, _) = results.last
    println(f"HHSTATE 10x windows: rows ${r1.toDouble / r0}%.2fx, " +
      f"bytes ${b1.toDouble / b0}%.2fx (linear-in-windows = 10x; " +
      "per-window state bounded by capacity, independent of stream length)")
    spark.stop()
  }
}
