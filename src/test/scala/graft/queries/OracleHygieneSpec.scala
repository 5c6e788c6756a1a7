package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Static hygiene checks over every oracle SQL string — the cheap
  * Scala-side guard for corruption classes the DuckDB gate only
  * catches after a full Verify run. Round 5 shipped a q69 oracle whose
  * continuation lines STARTED with `||`: `oracleSql`'s `stripMargin`
  * treats a line-leading `|` as the margin marker and eats it, turning
  * string concat into bitwise OR — a binder error in DuckDB. No JVM
  * DuckDB exists in this sandbox, so full parse-checking stays with
  * `scripts/check_oracle.py`; these assertions catch the known
  * text-level corruption classes at `sbt test` time.
  */
class OracleHygieneSpec extends AnyFunSuite {

  private val allQs = QueryPack.all ++ QueryPackExt.all

  test("no raw oracle line begins with | (stripMargin would eat it)") {
    for (q <- allQs; o <- q.oracle) {
      val bad = o.linesIterator.zipWithIndex.filter {
        case (line, _) => line.dropWhile(_.isWhitespace).startsWith("|")
      }.toSeq
      assert(bad.isEmpty,
        s"${q.name}: line(s) ${bad.map(_._2).mkString(",")} start with '|' — " +
          "stripMargin strips it; put || at the END of the previous line")
    }
  }

  test("every oracle has balanced parens and single quotes") {
    for ((name, sql) <- graft.SparkEntry.oracleSql) {
      val depth = sql.foldLeft(0) {
        case (d, '(') => d + 1
        case (d, ')') => d - 1
        case (d, _) => d
      }
      assert(depth === 0, s"$name: unbalanced parentheses")
      assert(sql.count(_ == '\'') % 2 === 0, s"$name: odd quote count")
    }
  }

  test("every queries entry with an oracle appears in oracleSql and vice versa") {
    val qNames = graft.SparkEntry.queries.keySet
    val oNames = graft.SparkEntry.oracleSql.keySet
    assert(oNames.subsetOf(qNames),
      s"oracles without queries: ${(oNames -- qNames).mkString(",")}")
  }
}
