package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-files control for corpus writes — the operational half of the
  * 100 TB layout story next to bucketing and partition pruning: a
  * 1000-executor job writing per-task files produces hundreds of
  * thousands of small parquet files, and every later scan pays a
  * listing + open cost per file. Compacting to a byte target before
  * the write keeps file counts proportional to DATA size, not cluster
  * size.
  *
  * Sizing uses Catalyst's own plan statistics (`optimizedPlan.stats`),
  * so no extra pass over the data happens at plan time; round-robin
  * repartition gives near-uniform output files regardless of upstream
  * partitioning skew. The companion write-side knob
  * (`spark.sql.files.maxRecordsPerFile`) caps stragglers when row
  * width varies wildly.
  */
object Compaction {

  /** `df` repartitioned so a subsequent write produces files of
    * roughly `targetBytes` (default 512 MiB — the common warehouse
    * sweet spot between parallelism and file-count overhead).
    */
  def compactTo(df: DataFrame, targetBytes: Long = 512L << 20): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // UNKNOWN stats surface as spark.sql.defaultSizeInBytes
    // (Long.MaxValue unless tuned) — the old 2^20 clamp still turned
    // that into a million-task repartition, defeating the small-files
    // goal. With no usable estimate, keep the current partitioning
    // (compaction without information is a no-op, not a fan-out).
    val defaultSize = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    if (bytes >= defaultSize) df
    else {
      val parts = ((bytes + targetBytes - 1) / targetBytes).max(1)
      // clamp: a corrupt size estimate must not demand millions of tasks
      df.repartition(parts.min(1 << 20).toInt)
    }
  }
}
