package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of N integer dimensions into one long —
  * the space-filling-curve layout key behind multi-dimensional data
  * skipping (the Delta/Iceberg `OPTIMIZE ZORDER BY` idea, here as a
  * first-class expression usable with plain `repartitionByRange` +
  * `sortWithinPartitions`, see [[graft.ops.Layout]]).
  *
  * Why it matters at 100 TB: file-level min/max stats prune a linearly
  * sorted table on the LEADING sort column only; a Z-ordered table
  * keeps every file's bounding box compact in ALL interleaved
  * dimensions, so a scan predicated on any subset of them skips most
  * files (quantified in LayoutSpec: partition bounding boxes vs a box
  * predicate).
  *
  * Bit mapping: dimension d of n occupies bits d, d+n, d+2n, … — bit i
  * of dimension d lands at position i·n + d. Each dimension contributes
  * its low 64/n bits (32 for the 2-D case); higher bits are masked off,
  * so callers bound their dimensions (e.g. `pmod(key, 1 << 20)`) when
  * the domain exceeds that. NULL in any dimension → NULL. The 2-D fast
  * path is the classic magic-number bit spread (5 shift-mask steps per
  * dimension, branch-free, whole-stage-codegen'd); the DuckDB oracle
  * for q66 replays the identical chain in SQL.
  */
case class ZOrderExpr(children: Seq[Expression]) extends Expression {

  require(children.size >= 2 && children.size <= 8,
    s"graft_zorder takes 2..8 integer dimensions, got ${children.size}")

  private val n = children.size
  private val bitsPerDim = 64 / n

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(c =>
        c.dataType == IntegerType || c.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          "graft_zorder needs int/bigint dimensions, got " +
            children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      if (v == null) return null
      val raw = v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
      }
      if (n == 2) z |= ZOrderExpr.spread32(raw) << d
      else {
        val masked = raw & ((1L << bitsPerDim) - 1)
        var i = 0
        while (i < bitsPerDim) {
          z |= ((masked >>> i) & 1L) << (i * n + d)
          i += 1
        }
      }
      d += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val nl = ctx.freshName("zNull") // assignable even when !nullable
    val dimCode = evals.zipWithIndex.map { case (e, d) =>
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val body =
        if (n == 2)
          s"""
          long $s = ${e.value} & 0xFFFFFFFFL;
          $s = ($s | ($s << 16)) & 0x0000FFFF0000FFFFL;
          $s = ($s | ($s << 8))  & 0x00FF00FF00FF00FFL;
          $s = ($s | ($s << 4))  & 0x0F0F0F0F0F0F0F0FL;
          $s = ($s | ($s << 2))  & 0x3333333333333333L;
          $s = ($s | ($s << 1))  & 0x5555555555555555L;
          $z |= $s << $d;
          """
        else
          s"""
          long $s = ${e.value} & ${(1L << bitsPerDim) - 1}L;
          for (int $i = 0; $i < $bitsPerDim; $i++) {
            $z |= (($s >>> $i) & 1L) << ($i * $n + $d);
          }
          """
      val nullCheck =
        if (e.isNull == FalseLiteral) body
        else s"if (${e.isNull}) { $nl = true; } else { $body }"
      // dims short-circuit on the first NULL via the running flag
      s"""
      if (!$nl) {
        ${e.code}
        $nullCheck
      }
      """
    }
    val assignIsNull =
      if (nullable) s"${ev.isNull} = $nl;" else ""
    val declIsNull =
      if (nullable) s"boolean ${ev.isNull} = false;" else ""
    val full =
      s"""
      $declIsNull
      boolean $nl = false;
      long $z = 0L;
      ${dimCode.mkString("\n")}
      $assignIsNull
      long ${ev.value} = $z;
      """
    if (nullable) ev.copy(code = code"$full")
    else ev.copy(code = code"$full", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderExpr =
    copy(children = newChildren)
}

object ZOrderExpr {

  /** Spread the low 32 bits of v so bit i lands at bit 2i. */
  def spread32(v: Long): Long = {
    var s = v & 0xFFFFFFFFL
    s = (s | (s << 16)) & 0x0000FFFF0000FFFFL
    s = (s | (s << 8)) & 0x00FF00FF00FF00FFL
    s = (s | (s << 4)) & 0x0F0F0F0F0F0F0F0FL
    s = (s | (s << 2)) & 0x3333333333333333L
    s = (s | (s << 1)) & 0x5555555555555555L
    s
  }

  /** Column-level entry: `zorder(x, y, ...)`. */
  def zorder(dims: Column*): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      ZOrderExpr(dims.map(ColumnBridge.expression)))
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_zorder")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ZOrderExpr].getCanonicalName, "graft_zorder")

  val builder: Seq[Expression] => Expression = { children =>
    ZOrderExpr(children)
  }
}
