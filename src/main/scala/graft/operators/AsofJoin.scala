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

    // ALL payloads ride in ONE struct, and the running last() picks the
    // struct whole: with per-column last(ignoreNulls) a legitimately
    // NULL payload value fell through to an OLDER right row's value,
    // and multi-payload outputs could stitch together columns from
    // DIFFERENT right rows (ADVICE r3). The struct itself is null
    // exactly on left rows, so ignoreNulls still skips them.
    val payloadType = org.apache.spark.sql.types.StructType(
      payloads.map(p => right.schema(p).copy(name = p)))
    val rightU = right.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        struct(payloads.map(col): _*).as("__payload") +:
        leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
    val leftU = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        lit(null).cast(payloadType).as("__payload") +:
        leftCols.filterNot(_ == key).map(col)): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightU.unionByName(leftU)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((leftCols.map(col) ++
        payloads.map(p => col(s"__m.$p").as(s"asof_$p"))): _*)
  }
}
