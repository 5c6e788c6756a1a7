// Oracle-pinning tool for q115 (generator-twin): runs the q115 query
// live and prints the Q115Oracle.sql VALUES block to paste into
// src/main/scala/graft/queries/Q115Oracle.scala. The build is
// deterministic (md5 fixture vectors, sorted-id insertion, md5
// levels, key-hash repartition), so one run pins the expected rows
// for every future run on any JVM.
// Run: sbt -batch "runMain graft.PinQ115"
package graft

import org.apache.spark.sql.SparkSession

object PinQ115 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.queries.QueryPackExt.queries("q115_ann_hnsw")(spark, "")
      .collect()
      .map(r => s"        (CAST(${r.getLong(0)} AS BIGINT), " +
        s"CAST(${r.getLong(1)} AS BIGINT), CAST(${r.getLong(2)} AS BIGINT))")
    println("PINQ115-BEGIN")
    println("      SELECT * FROM (VALUES")
    println(rows.mkString(",\n"))
    println("        ) AS t(query_id, rnk, vec_id)")
    println("      ORDER BY query_id, rnk")
    println("PINQ115-END")
    spark.stop()
  }
}
