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

  /** ONE-job fused materialize-and-probe (r22; guide §1.5/§2.4 driver
    * round trips — the r21 form still ran a `count()` job and then a
    * separate `collect()` job on every bounded verdict): fully drains
    * every partition of `df`'s physical RDD — completing lazy
    * `localCheckpoint` blocks exactly like `count()` does — while ALSO
    * shipping up to `cap + 1` rows per partition back with the counts,
    * so a bounded frame needs no second job to collect.
    *
    * Returns `(n, rows)`: `rows` holds EVERY row of the frame
    * (external `Row`s in `df.schema`) iff `n <= cap`; for an oversized
    * frame each partition stops copying at `cap + 1` rows (the drain
    * still completes, so checkpoint blocks are whole) and `rows` is
    * empty — only `n` is meaningful. Driver transfer is bounded by
    * `numPartitions × (cap + 1)` rows; callers size `cap` like they
    * sized the old `collect()` bound.
    */
  def countAndCollect(df: DataFrame, cap: Long)
      : (Long, Array[org.apache.spark.sql.Row]) = {
    val schema = df.schema
    val parts = df.queryExecution.toRdd
      .mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.catalyst.InternalRow]
        var n = 0L
        while (it.hasNext) {
          val r = it.next() // rows are buffer-backed and reused: copy
          if (n <= cap) buf += r.copy()
          n += 1L
        }
        Iterator.single((n, buf.toArray))
      }
      .collect()
    val n = parts.iterator.map(_._1).sum
    if (n > cap) (n, Array.empty)
    else {
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(schema)
      (n, parts.iterator.flatMap(_._2)
        .map(r => conv(r).asInstanceOf[org.apache.spark.sql.Row]).toArray)
    }
  }

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
