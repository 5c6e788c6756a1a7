package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen squared euclidean distance between an `ARRAY<FLOAT>`
  * vector and an `ARRAY<DOUBLE>` centroid: Σᵢ (double(xᵢ) − cᵢ)²,
  * folded left-to-right — numerically identical to the
  * `aggregate(zip_with(v, c, (x,cc) -> (double(x)-cc)*(double(x)-cc)),
  * 0.0, +)` composition it replaces (and to the DuckDB oracle's
  * `list_sum(list_transform(...))`), compiled to a tight primitive
  * loop.
  *
  * Why it exists (same policy tier as [[FloatVecDot]]): IVF evaluates
  * it O(vectors × centroids) in the assignment step and O(queries ×
  * centroids) in the probe step — a scalar hot loop that interpreted
  * array HOFs pay per-element dispatch for. NULL elements propagate to
  * a NULL result, matching the HOF behavior.
  */
case class FloatVecDist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<DOUBLE>) arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dist2"

  // length-mismatched arrays are NULL, matching zip_with (see
  // FloatVecDot — a partial sum would mask upstream schema bugs)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != c.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || c.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - c.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $c.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $d = ((double) $a.getFloat($i)) - $c.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDist2 =
    copy(left = newLeft, right = newRight)
}
