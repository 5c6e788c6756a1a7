// Scratch measurement entry: the distributed connected-components path
// ABOVE the r12 small-graph probe bound (128k edges), where the driver
// union-find regime hands off to min-label propagation + star
// escalation. Generates a 500k-edge graph with planted structure —
// 50k clique-ish dup clusters plus 1k long chains (diameter 200, past
// the propagation budget, forcing the star escalation) — runs
// duplicateComponents through its own regime selection, and verifies
// the output against a driver-side union-find ground truth.
// Run: sbt -batch "runMain graft.CcScale"
package graft

import org.apache.spark.sql.functions._

object CcScale {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // planted graph: 50k star clusters of 8 members (350k edges) +
    // 1k chains of length 200 (200k edges) -> 550k edges, 50k + 1k
    // components, max diameter 200
    val clusterEdges = (0 until 50000).flatMap { c =>
      val base = c.toLong * 10
      (1 to 7).map(i => (base, base + i))
    }
    val chainBase = 1000000L
    val chainEdges = (0 until 1000).flatMap { c =>
      val base = chainBase + c.toLong * 1000
      (0 until 200).map(i => (base + i, base + i + 1))
    }
    val all = clusterEdges ++ chainEdges
    println(s"CCSCALE edges=${all.size}")
    val pairs = all.toDF("da", "db").repartition(8)

    val t0 = System.nanoTime()
    val out = graft.llm.TextDedup.duplicateComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9

    // driver union-find ground truth
    val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def find(x: Long): Long = {
      var r = x
      while ({ val p = parent.getOrDefault(r, r); p != r }) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.getOrDefault(c, c); parent.put(c, r); c = n }
      r
    }
    all.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val nodes = all.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = nodes.map(id => id -> find(id)).toMap
    val nComponents = truth.values.toSet.size
    val match_ = out == truth
    println(f"CCSCALE distributed_path secs=$secs%.2f members=${out.size} " +
      s"components=$nComponents matchesGroundTruth=$match_")
    require(match_, "distributed CC output diverged from union-find ground truth")
    spark.stop()
  }
}
