// Scratch diagnostic (r21): SsBuffer update cost in isolation vs the
// q125 in-plan ~4.4 µs/row. Replays one bench partition's token
// stream (62.5k rows, 20 heavies + distinct tail) through the
// Space-Saving buffer. Run: sbt "runMain graft.tools.SsBench"
package graft.tools

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.FreqItemsAgg

object SsBench {
  def main(args: Array[String]): Unit = {
    val cap = 8192
    val n = 62500
    def stream(partition: Int): Array[UTF8String] = {
      val base = partition.toLong * n
      Array.tabulate(n) { i =>
        val id = base + i
        val b = id % 100
        val blk = id / 100
        val tok =
          if (b < 20 && blk < 20000 - 1000 * b) f"h$b%02d"
          else s"t${(blk * 80 + (b - 20)) % 400000}"
        UTF8String.fromString(tok)
      }
    }
    val agg = FreqItemsAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.Literal(cap))
    for (round <- 1 to 3) {
      var total = 0L
      var rows = 0L
      for (p <- 16 to 23) { // late partitions: pure-tail regime
        val toks = stream(p)
        val buf = agg.createAggregationBuffer()
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val t0 = System.nanoTime()
        var i = 0
        while (i < toks.length) {
          row.update(0, toks(i))
          agg.update(buf, row)
          i += 1
        }
        total += System.nanoTime() - t0
        rows += toks.length
      }
      println(f"[ssbench] round $round: ${total / 1e6}%.1f ms for $rows rows = ${total.toDouble / rows}%.0f ns/row")
    }
  }
}
