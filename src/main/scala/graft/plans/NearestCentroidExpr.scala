package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType, LongType}

/** Nearest-centroid id for an embedding column — the IVF assignment
  * kernel as ONE expression node (round 12).
  *
  * Why an expression and not composed built-ins: the assignment is an
  * argmax of `nCells` 6-dp-rounded cosines. Composed per-centroid
  * (`least` over `struct(-round(cos, 6), cent_id)` with the centroid
  * vectors as array LITERALS) the expression TREE is
  * nCells × dims-sized, and every fresh centroid set pays ~1 s of
  * driver-side analysis/optimization/codegen per plan (measured on the
  * q116 chain — planning, not execution, dominated). The broadcast-join
  * + `min_by` aggregation form pays a full corpus exchange with the
  * vector payload riding it — the scale cost this expression removes.
  * Here the centroid matrix lives in the expression as plain JVM arrays
  * (constructor data, not child literals): tree size 1, planning cost
  * ~zero, evaluation one tight primitive loop per row, and the corpus
  * is never joined or shuffled for assignment.
  *
  * Semantics are the round-11 `min_by` contract VERBATIM (bit-parity
  * spec-asserted against the composed form):
  *   - per centroid k: `cos_k = dot(v, c_k) / (sqrt(dot(v, v)) *
  *     sqrt(dot(c_k, c_k)))`, every dot a sequential index-order left
  *     fold in double (the VecDotExpr / DuckDB list_dot_product
  *     discipline); `sqrt(dot(c_k, c_k))` is precomputed once on the
  *     driver with the identical fold;
  *   - `r_k = round(cos_k, 6)` replicating Spark's Round on doubles
  *     (NaN/Inf pass through; else BigDecimal.valueOf → setScale
  *     HALF_UP);
  *   - argmax = minimum of `(-r_k, cent_id_k)` under Spark ordering:
  *     doubles compare with `x == y ? 0 : Double.compare(x, y)` (so
  *     -0.0 == 0.0 and NaN is greatest — a NaN similarity loses to any
  *     real one; an all-NaN row, e.g. a zero vector, ties and takes the
  *     smallest cent_id), a NULL `r_k` (length-mismatched centroid)
  *     sorts FIRST like a NULL struct field in ascending order;
  *   - a NULL input vector yields a NULL cell.
  *
  * Codegen: the generated code calls [[assignKernel]] on the
  * expression instance (one virtual call per row into a JIT-compiled
  * primitive loop) — NOT CodegenFallback, which would evict the whole
  * surrounding stage from whole-stage codegen and send neighboring
  * higher-order expressions (the Lloyd mean's `transform`/`round`
  * micro-unit projection) to interpreted evaluation — measured 2×
  * on the Lloyd rounds.
  */
case class NearestCentroidExpr(child: Expression, centIds: Seq[Long],
    cents: Seq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(centIds.nonEmpty && centIds.length == cents.length,
    "one cent_id per centroid vector, at least one centroid")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("graft_nearest_centroid needs an " +
            s"array<float>/array<double> input, got ${other.simpleString}")
    }

  @transient private lazy val ids: Array[Long] = centIds.toArray
  @transient private lazy val cvs: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  // sqrt(dot(c, c)) per centroid, the same sequential left fold the
  // Spark-side sqrt(VecDotExpr(cv, cv)) performed — identical doubles.
  @transient private lazy val cnorms: Array[Double] = cvs.map { cv =>
    var s = 0.0; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }
  @transient private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Spark's Round(_, 6) on doubles, verbatim. */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark double ordering: -0.0 == 0.0, NaN greatest. */
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  override protected def nullSafeEval(input: Any): Any =
    assignKernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroidExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.assignKernel($v);")
  }

  /** The per-row kernel (public so generated code can call it). */
  def assignKernel(v: ArrayData): Long = {
    val n = v.numElements()
    // dot(v, v) and element-null detection in one pass
    var dv = 0.0
    var vecElemNull = false
    var i = 0
    while (i < n && !vecElemNull) {
      if (v.isNullAt(i)) vecElemNull = true
      else {
        val x = if (elemIsDouble) v.getDouble(i)
          else v.getFloat(i).toDouble
        dv += x * x
      }
      i += 1
    }
    val vnorm = math.sqrt(dv)
    var bestCid = 0L
    var bestNs = 0.0
    var bestNull = false // best -r is a SQL NULL (sorts first)
    var has = false
    var k = 0
    while (k < cvs.length) {
      val cv = cvs(k)
      val rIsNull = vecElemNull || n != cv.length
      var ns = 0.0
      if (!rIsNull) {
        var dot = 0.0
        var j = 0
        while (j < n) {
          val x = if (elemIsDouble) v.getDouble(j)
            else v.getFloat(j).toDouble
          dot += x * cv(j)
          j += 1
        }
        ns = -round6(dot / (vnorm * cnorms(k)))
      }
      val better =
        if (!has) true
        else if (rIsNull != bestNull) rIsNull // null ns sorts first
        else if (rIsNull) ids(k) < bestCid
        else {
          val c = cmpD(ns, bestNs)
          c < 0 || (c == 0 && ids(k) < bestCid)
        }
      if (better) {
        bestCid = ids(k); bestNs = ns; bestNull = rIsNull; has = true
      }
      k += 1
    }
    bestCid
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidExpr = copy(child = newChild)
}

object NearestCentroidExpr {
  /** Lift to a Column. */
  def cell(vec: org.apache.spark.sql.Column, centIds: Seq[Long],
      cents: Seq[IndexedSeq[Double]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NearestCentroidExpr(
      ColumnBridge.expression(vec), centIds, cents))
  }
}
