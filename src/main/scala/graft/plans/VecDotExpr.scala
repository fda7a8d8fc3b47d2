package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native dot product over two `array<float>` / `array<double>`
  * embedding columns, accumulating in double (SURVEY "similarity search"
  * scale path).
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold: Spark's
  * higher-order functions evaluate their lambda per element through
  * interpreted variable binding and `zip_with` materializes an
  * intermediate array per row — per candidate pair that's two
  * allocations and ~3×64 lambda dispatches at 64 dims. This expression
  * is one codegen'd tight loop, no intermediates.
  *
  * Numeric parity: terms are accumulated IN INDEX ORDER as
  * `acc + (double) a[i] * (double) b[i]` — bit-for-bit the same result
  * as the zip_with fold and DuckDB's `list_dot_product` on the same
  * input (both are sequential left folds), so oracle hash-matches are
  * preserved. NULL semantics also mirror the fold: mismatched lengths or
  * any NULL element yield NULL.
  */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  /** Always nullable: mismatched lengths or a NULL element yield NULL
    * even when both child arrays are non-nullable. Without this override
    * BinaryExpression would report `left.nullable || right.nullable`,
    * and with two non-nullable inputs codegen's `ev.isNull` would be the
    * literal `false` — the `isNull = true` branch above would not
    * compile, and the interpreted path would declare a value that can be
    * NULL as non-nullable. */
  override def nullable: Boolean = true

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
          ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"graft_vec_dot needs array<float>/array<double> inputs, got " +
              s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val ld = elemIsDouble(left)
    val rd = elemIsDouble(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val xv =
        if (elemIsDouble(left)) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      val yv =
        if (elemIsDouble(right)) s"$b.getDouble($i)"
        else s"(double) $b.getFloat($i)"
      s"""
      int $n = $a.numElements();
      boolean $bad = $n != $b.numElements();
      double $sum = 0.0;
      for (int $i = 0; !$bad && $i < $n; $i++) {
        if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
        $sum += $xv * $yv;
      }
      if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

object VecDotExpr {

  /** Lift to a Column (the `functions._`-style entry used by the ops
    * layer); float/double arrays pass through untouched (no precision
    * change), other array types cast to array<double>. */
  def dot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(VecDotExpr(
      castIfNeeded(ColumnBridge.expression(a)),
      castIfNeeded(ColumnBridge.expression(b))))
  }

  private def castIfNeeded(e: Expression): Expression =
    if (!e.resolved) e // pre-analysis: checkInputDataTypes() guards later
    else e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => e
      case _: ArrayType => Cast(e, ArrayType(DoubleType))
      case _ => e // non-array: let the analyzer report it
    }

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_vec_dot")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecDotExpr].getCanonicalName, "graft_vec_dot")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_vec_dot takes two array arguments")
    VecDotExpr(children.head, children(1))
  }
}
