package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `map(key -> min(value))` as ONE aggregation — the pivot-aggregation
  * primitive under the SRM output view (reference
  * `benchmark_srm_output_view.py:50-77`: rows = stimulus, one column per
  * implementation, cells = min observed output).
  *
  * Spark's `pivot(col, values).agg(min(x))` compiles to ONE conditional
  * aggregate PER PIVOT VALUE — every input row evaluates
  * `min(if(key = v) x else null)` for all N values: N× the expression
  * evaluations and N aggregation buffers per group. This operator does
  * a single hash-map upsert per row regardless of pivot width; the
  * caller projects the map into columns with `element_at` (see
  * [[graft.queries.CanonicalQueries.srmOutputView]]), which preserves
  * the pivot's exact output shape: keys with only NULL values or absent
  * keys both surface as NULL cells, and min is UTF-8 binary order —
  * identical to the built-in string MIN.
  */
case class KeyedMinAgg(key: Expression, value: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      java.util.HashMap[UTF8String, UTF8String]] {

  type Buf = java.util.HashMap[UTF8String, UTF8String]

  override def children: Seq[Expression] = Seq(key, value)
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_keyed_min"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == StringType && value.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_keyed_min needs (string key, string value), got " +
          s"(${key.dataType.simpleString}, ${value.dataType.simpleString})")

  override def createAggregationBuffer(): Buf = new Buf

  override def update(b: Buf, input: InternalRow): Buf = {
    val k = key.eval(input)
    val v = value.eval(input)
    // NULL values don't participate in MIN; NULL keys have no column
    if (k != null && v != null) {
      val ks = k.asInstanceOf[UTF8String]
      val vs = v.asInstanceOf[UTF8String]
      val cur = b.get(ks)
      if (cur == null) b.put(ks.clone(), vs.clone())
      else if (vs.compareTo(cur) < 0) b.put(ks.clone(), vs.clone())
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      if (cur == null || e.getValue.compareTo(cur) < 0)
        a.put(e.getKey, e.getValue)
    }
    a
  }

  override def eval(b: Buf): Any = {
    val n = b.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = b.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(b.size())
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      val vb = e.getValue.getBytes
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(vb.length); out.write(vb)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new Buf
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      b.put(UTF8String.fromBytes(kb), UTF8String.fromBytes(vb))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyedMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyedMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeyedMinAgg =
    copy(key = newChildren(0), value = newChildren(1))
}

object KeyedMinAgg {

  /** Column-level entry: `map(key -> min(value))` over the group. */
  def keyedMin(key: Column, value: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(KeyedMinAgg(
      ColumnBridge.expression(key), ColumnBridge.expression(value))
      .toAggregateExpression())
  }

  /** SQL surface (GraftExtensions). */
  val identifier: org.apache.spark.sql.catalyst.FunctionIdentifier =
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_keyed_min")

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[KeyedMinAgg].getCanonicalName, "graft_keyed_min")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      "graft_keyed_min takes (key string, value string)")
    KeyedMinAgg(children(0), children(1))
  }
}
