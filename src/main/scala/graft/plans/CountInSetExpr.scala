package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements that belong to a small static string set —
  * the stopword-hit primitive under language ID and quality scoring
  * (SURVEY "text analysis").
  *
  * Replaces `size(filter(ws, w => w.isin(set: _*)))`: the higher-order
  * `filter` evaluates its lambda through interpreted variable binding
  * per element and materializes a filtered array per row, and `isin`
  * is a linear scan of the list. This is one codegen'd loop over the
  * ArrayData against a hashed set — no intermediate array, O(1) per
  * element. Semantics match the HOF chain exactly: NULL elements are
  * not counted (isin(null) is NULL, which filter drops), NULL input
  * array yields NULL.
  */
case class CountInSetExpr(child: Expression, set: Seq[String],
    lowercase: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in_set"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"graft_count_in_set needs array<string>, got ${other.simpleString}")
    }

  @transient private lazy val hashed: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        if (hashed.contains(if (lowercase) w.toLowerCase else w)) n += 1
      }
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("set", hashed,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val elem = if (lowercase) s"$a.getUTF8String($i).toLowerCase()"
        else s"$a.getUTF8String($i)"
      s"""
      int $n = 0;
      for (int $i = 0; $i < $a.numElements(); $i++) {
        if (!$a.isNullAt($i) && $setRef.contains($elem))
          $n++;
      }
      ${ev.value} = $n;
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInSetExpr = copy(child = newChild)
}

object CountInSetExpr {

  /** Column-level entry (the ops-layer API). */
  def countInSet(c: org.apache.spark.sql.Column,
      set: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CountInSetExpr(ColumnBridge.expression(c), set))
  }

  /** Per-word case-folded variant: counts `lower(w) IN set`. Lets a
    * caller share ONE whitespace split between case-sensitive and
    * case-insensitive consumers (lowercasing never creates or removes
    * whitespace, so `words(lower(t)) == words(t)` lowered per word) —
    * languageId reuses qualityScore's split via codegen CSE instead of
    * lowering and re-splitting the whole text (measured on q53). */
  def countInSetLower(c: org.apache.spark.sql.Column,
      set: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CountInSetExpr(ColumnBridge.expression(c), set, lowercase = true))
  }

  val identifier: FunctionIdentifier =
    FunctionIdentifier("graft_count_in_set")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CountInSetExpr].getCanonicalName, "graft_count_in_set")

  /** SQL builder: graft_count_in_set(arr, array('a','b',...)) — the
    * second argument must be a foldable string array, evaluated once at
    * plan time into the static set. */
  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      "graft_count_in_set takes (array<string>, constant array<string>)")
    val setExpr = children(1)
    require(setExpr.foldable,
      "graft_count_in_set: the set argument must be a constant array")
    require(setExpr.dataType.isInstanceOf[ArrayType] &&
      setExpr.dataType.asInstanceOf[ArrayType].elementType == StringType,
      s"graft_count_in_set: the set argument must be array<string>, got " +
        setExpr.dataType.simpleString)
    val arr = setExpr.eval(null).asInstanceOf[ArrayData]
    require(arr != null,
      "graft_count_in_set: the set argument must not be NULL")
    val words = (0 until arr.numElements()).flatMap { i =>
      // NULL set elements can never match (isin(null) is NULL → dropped
      // by filter in the HOF form this expression replaces) — skip them.
      if (arr.isNullAt(i)) None else Some(arr.getUTF8String(i).toString)
    }
    CountInSetExpr(children.head, words)
  }
}
