package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Hive-style partitioned layout + partition pruning — the other half
  * of the 100 TB scan story next to bucketing (BucketingSpec): a
  * corpus written `partitionBy(lang)` serves a lang-filtered query by
  * listing only the matching directories. The filter shows up as
  * `PartitionFilters` on the scan (metadata-only pruning — zero data
  * rows are read, let alone filtered, from other partitions), so a
  * 50-language corpus reads 1/50th of its bytes for a one-language
  * query at any scale.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSpec {

  test("partitionBy(lang) write serves lang filters via PartitionFilters") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val q = s.read.parquet(dir).filter(col("lang") === "en")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString.contains("lang"), plan)
    // and the pruned scan still returns exactly the right rows
    val expected = docs.filter(col("lang") === "en").count()
    assert(q.collect().head.getAs[Long]("n") === expected)
  }
}
