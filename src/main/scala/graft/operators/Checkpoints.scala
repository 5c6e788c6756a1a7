package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for `localCheckpoint` blocks.
  *
  * `Dataset.localCheckpoint()` pins its materialized rows as persisted
  * RDD blocks for the LIFETIME of the SparkContext — there is no
  * Dataset-level API to release them (`Dataset.unpersist` only talks to
  * the CacheManager, which never heard of them). Iterative operators
  * that checkpoint per round (connected components, the curation
  * flagship's stage keep-lists) therefore leak executor memory round
  * over round unless the superseded round is explicitly unpersisted —
  * at 100 TB that is N_rounds × |labels| of pinned blocks squeezing
  * the execution-memory pool for every later stage.
  *
  * [[release]] frees exactly one checkpointed frame (pattern-matching
  * the `LogicalRDD` scan its plan was replaced with); [[releaseLeaked]]
  * is the harness-level broom: drop EVERY persistent RDD plus the
  * CacheManager's entries, for use BETWEEN independent queries in
  * Bench/Verify where nothing may legitimately survive the query that
  * created it.
  */
object Checkpoints {

  /** Unpersist the pinned blocks behind a `localCheckpoint`ed frame.
    * No-op for frames that aren't checkpoint scans. Non-blocking: the
    * caller never waits on block eviction.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(blocking = false))

  /** Drop every persistent RDD and cached plan in the session — the
    * between-queries broom for benchmark/verify harnesses. Without it,
    * checkpoint blocks from q61/q72 stay pinned for the rest of the
    * suite and every later query runs under their GC pressure.
    */
  def releaseLeaked(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }
}
