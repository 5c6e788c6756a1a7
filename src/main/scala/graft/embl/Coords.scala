package graft.embl

/** Circular/linear genomic coordinate normalization — the one genuinely
  * novel kernel in the reference (see reference
  * `ena_build/parse_embl.py:364-441`; golden cases
  * `tests/location_parsing_test.py:17-119`).
  *
  * Given the location ranges of a CDS feature, the chromosome structure
  * (1 = linear, 0 = circular — per the reference *code* at
  * parse_embl.py:341, not its docstring) and the chromosome length:
  *
  *  - linear: (min, max) over all range endpoints;
  *  - circular: sort ranges by start; compute the inter-range gaps
  *    `next.lo - cur.hi - 1` and the wrap gap
  *    `(len - last.hi) + (first.lo - 1)`. If some interior gap strictly
  *    exceeds the wrap gap, the gene spans the origin and the result is
  *    `(ranges(g+1).lo, ranges(g).hi)` (start > end encodes wraparound);
  *    ties favor the wrap gap (strict `>`, parse_embl.py:423).
  *
  * Pure Scala (no Spark dependency) so the 24 golden cases run without a
  * session; [[graft.embl.EmblSegmenter]] calls it per CDS block, and
  * [[Coords.registerUdf]] exposes it to SQL/DataFrame users.
  */
object Coords {

  /** @param chrStruct 1 = linear, 0 = circular (negative/other nonzero
    *                  values behave like the reference's truthiness: any
    *                  nonzero value takes the linear branch).
    */
  def normalizeLocation(
      ranges: Seq[(Long, Long)],
      chrStruct: Int,
      chrLen: Long): (Long, Long) = {
    require(ranges.nonEmpty, "normalizeLocation needs at least one range")
    if (chrStruct != 0) {
      // linear: hard boundaries at 1 and chrLen
      var lo = Long.MaxValue
      var hi = Long.MinValue
      ranges.foreach { case (a, b) =>
        if (a < lo) lo = a
        if (b < lo) lo = b
        if (a > hi) hi = a
        if (b > hi) hi = b
      }
      (lo, hi)
    } else {
      // circular: periodic boundary at chrLen|1
      val sorted = ranges.sortBy(_._1) // stable, like python sorted(key=x[0])
      val wrapGap = (chrLen - sorted.last._2) + (sorted.head._1 - 1)
      var maxGap = wrapGap
      var gapIndex = -1
      var i = 0
      while (i < sorted.length - 1) {
        val gap = sorted(i + 1)._1 - sorted(i)._2 - 1
        if (gap > maxGap) { // strict: ties favor the wrap gap
          maxGap = gap
          gapIndex = i
        }
        i += 1
      }
      if (gapIndex < 0) (sorted.head._1, sorted.last._2)
      else (sorted(gapIndex + 1)._1, sorted(gapIndex)._2)
    }
  }

  /** SQL/DataFrame exposure: `normalize_location(los, his, chr_struct,
    * chr_len)` returns a `struct<start:bigint, end:bigint>`. The parser
    * itself calls [[normalizeLocation]] directly (no serialization
    * cost); SQL users get the native codegen expression
    * [[graft.functions.NormalizeLocation]] (upgraded from a Scala UDF —
    * no encoder boxing, call compiled inside WholeStageCodegen).
    */
  def registerUdf(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.ensureRegistered(spark)
}
