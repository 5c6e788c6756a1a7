package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key skew mitigation by salting. A shuffle join partitions by
  * join key, so one hot key lands its entire row set on one task —
  * the classic straggler at 100 TB. Salting spreads it: the big side
  * gets a deterministic salt in [0, factor), the small side is
  * replicated once per salt value, and the join runs on (key, salt).
  * The result multiset is IDENTICAL to the plain join (every big row
  * still meets every matching small row, exactly once); only the
  * partitioning changes — a hot key's rows now spread over `factor`
  * tasks.
  *
  * This is the manual/deterministic counterpart to AQE's runtime
  * skew-join splitting (enabled elsewhere in the engine): AQE splits
  * post-hoc on observed partition sizes; salting is the plan-time
  * guarantee for joins known to be skewed (and works where AQE's
  * splitting can't, e.g. under bucketed layouts or non-AQE runners).
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways.
    * The small side is replicated `factor` times — keep it
    * broadcast-small or pay factor× its shuffle weight.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // deterministic per-row salt (hash of the whole row): same data ->
    // same partitioning, so runs are reproducible
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted
      // hint the shuffle join: broadcasting the replicated side would
      // make the salt pointless (broadcast joins don't skew)
      .join(replicated.hint("merge"),
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(salted("__salt")).drop(replicated("__salt")).drop(replicated(key))
  }
}
