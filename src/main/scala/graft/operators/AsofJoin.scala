package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row at
  * or before the left row's time, per key. Spark has no built-in as-of
  * operator; the naive encoding (range join + per-left-row argmax)
  * explodes to O(|L|·|R|) candidate pairs per key before the groupBy
  * collapses them.
  *
  * Re-expressed Spark-first as ONE shuffle and zero joins: tag both
  * inputs, union them, and take a running `last(payload, ignoreNulls)`
  * over a per-key window ordered by (time, tag). Right rows sort
  * before left rows at equal timestamps (tag 0 < 1), giving the
  * standard `l.ts >= r.ts` inclusive match. Cost is one Exchange on
  * the key plus a per-partition sort — the idiomatic distributed
  * as-of, and the same shape a backfill at 100 TB wants (the window
  * carries O(payload) state per key, not O(rows)).
  */
object AsofJoin {

  /** @param left     probe side
    * @param right    build side; MUST be unique per (key, rightTs) —
    *                 pre-aggregate otherwise (ties would make the
    *                 matched payload nondeterministic)
    * @param key      equi-key column name (same on both sides)
    * @param leftTs   left event-time column (numeric or timestamp)
    * @param rightTs  right event-time column
    * @param payloads right columns to carry onto each matched left row
    *                 (null where no right row is at or before leftTs)
    */
  def joinAsof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloads: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val matchedNames = payloads.map(p => s"asof_$p")

    val rightU = right.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        payloads.map(p => col(p).as(s"asof_$p"))) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val leftU = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        payloads.map(p => lit(null).as(s"asof_$p"))) ++
        leftCols.filterNot(_ == key).map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightU.unionByName(leftU)
      .select((leftCols.map(col) ++ (col("__tag") +:
        matchedNames.map(m => last(col(m), ignoreNulls = true).over(w).as(m)))): _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }
}
