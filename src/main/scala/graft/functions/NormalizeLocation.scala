package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.embl.Coords

/** Java-callable bridge from generated code to the pure-Scala K1 kernel
  * ([[graft.embl.Coords.normalizeLocation]], reference
  * parse_embl.py:364-441). Returns null for empty/mismatched range
  * arrays (SQL semantics) instead of throwing.
  */
object NormalizeLocationKernel {
  def compute(los: ArrayData, his: ArrayData,
      chrStruct: Int, chrLen: Long): InternalRow = {
    val n = math.min(los.numElements(), his.numElements())
    if (n == 0) return null
    val ranges = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) {
      ranges(i) = (los.getLong(i), his.getLong(i))
      i += 1
    }
    val (s, e) = Coords.normalizeLocation(ranges.toSeq, chrStruct, chrLen)
    new GenericInternalRow(Array[Any](s, e))
  }
}

/** K1 as a native Catalyst expression — the SURVEY §2.9 upgrade path
  * from the Scala UDF: no Scala-function serialization, no
  * Row/encoder boxing at the boundary, and the call compiles inside
  * WholeStageCodegen.
  * `normalize_location(los ARRAY<BIGINT>, his ARRAY<BIGINT>,
  * chr_struct INT, chr_len BIGINT) -> STRUCT<start BIGINT, end BIGINT>`.
  */
case class NormalizeLocation(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(ArrayType(LongType), ArrayType(LongType), IntegerType, LongType)
    val actual = children.map(_.dataType)
    def matches(a: DataType, e: DataType): Boolean = (a, e) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case _ => a == e
    }
    if (actual.zip(expected).forall { case (a, e) => matches(a, e) })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>, INT, BIGINT), " +
        s"got ${actual.map(_.sql).mkString(", ")}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "normalize_location"

  override def nullSafeEval(los: Any, his: Any, st: Any, len: Any): Any =
    NormalizeLocationKernel.compute(
      los.asInstanceOf[ArrayData], his.asInstanceOf[ArrayData],
      st.asInstanceOf[Int], len.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (los, his, st, len) => {
      val row = ctx.freshName("row")
      s"""
         |InternalRow $row = graft.functions.NormalizeLocationKernel
         |    .compute($los, $his, $st, $len);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): NormalizeLocation =
    copy(first = f, second = s, third = t, fourth = q)
}
