package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two `ARRAY<FLOAT>` columns:
  * Σᵢ double(aᵢ)·double(bᵢ), folded left-to-right — numerically
  * identical to the `aggregate(zip_with(a, b, (x,y) -> double(x)*
  * double(y)), 0.0, +)` composition it replaces (and to the DuckDB
  * oracle's `list_sum(list_transform(...))`), but compiled to a tight
  * primitive loop inside WholeStageCodegen: no per-row intermediate
  * array, no boxing, no lambda dispatch.
  *
  * This is the (b)-tier custom kernel of the engine's extension policy
  * (SURVEY.md §7.4): built-ins CAN express the semantics, but the
  * pair-wise cosine paths (ANN rerank, embedding near-dup) evaluate it
  * O(candidates × dim) times — the one scalar hot spot worth native
  * code. Interpreted eval is provided for completeness/fallback.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual input-type check (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4, so the trait can't be used from here)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  // NULL array elements propagate to a NULL result — the same
  // semantics as the aggregate(zip_with(...)) HOF composition (and the
  // DuckDB list_sum mirror) this expression replaces. Reading a null
  // slot via getFloat would return arbitrary garbage (ADVICE r3), and
  // checkInputDataTypes accepts containsNull arrays, so the slot check
  // is reachable and required.
  override def nullable: Boolean = true

  // length-mismatched arrays are NULL, matching zip_with (which pads
  // the shorter side with nulls, nulling the fold) — a partial sum
  // over the common prefix would silently mask an upstream schema bug
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
