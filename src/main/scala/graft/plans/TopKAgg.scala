package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StructField, StructType}

/** Bounded-state per-group top-k: the k smallest `(rank, id)` pairs of
  * the group (callers wanting largest-first negate the rank), as ONE
  * aggregation with O(k) state.
  *
  * The window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY r) <= k`) shuffles
  * EVERY row of every group and sorts whole partitions before it can
  * discard anything; at 100 TB of events with k=16 that is a
  * full-data exchange + sort for a 16-row-per-group answer. This
  * aggregate keeps a k-bounded buffer per group, so map-side partial
  * aggregation discards below-cutoff rows BEFORE the exchange — the
  * shuffle carries at most k pairs per (mapper, group) and no sort
  * ever sees the full data. Same result, bit for bit (spec-asserted
  * against the window form): ties are total-ordered by (rank, id).
  *
  * Buffer discipline: a binary max-heap of the CURRENT k-smallest
  * (root = cutoff pair). Update is O(log k) worst case but O(1) for
  * the common below-cutoff row (one root comparison, then discard);
  * merge re-inserts the smaller heap into the larger.
  */
case class TopKAgg(rank: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Heap] {

  import TopKAgg.Heap

  override def children: Seq[Expression] = Seq(rank, id)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("r", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (k >= 1 && rank.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk needs k >= 1 and (bigint rank, bigint id), got " +
          s"k=$k (${rank.dataType.simpleString}, " +
          s"${id.dataType.simpleString})")

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(b: Heap, input: InternalRow): Heap = {
    val r = rank.eval(input)
    val i = id.eval(input)
    // NULL ranks/ids don't rank (the window form's ORDER BY would
    // place NULLs deterministically; we exclude them — spec'd)
    if (r != null && i != null)
      b.offer(r.asInstanceOf[Long], i.asInstanceOf[Long])
    b
  }

  override def merge(a: Heap, b: Heap): Heap =
    if (b.size > a.size) { b.absorb(a); b } else { a.absorb(b); a }

  override def eval(b: Heap): Any = {
    val sorted = b.sortedPairs // ascending (r, id)
    new GenericArrayData(sorted.map { case (r, i) =>
      InternalRow(r, i)
    })
  }

  override def serialize(b: Heap): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(b.size)
    b.foreach { (r, i) => out.writeLong(r); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new Heap(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      b.offer(in.readLong(), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(rank = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Binary max-heap over (r, id) pairs in two parallel long arrays,
    * capped at k: root = largest retained pair = the cutoff. */
  final class Heap(k: Int) {
    private val rs = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    private def gt(i: Int, j: Int): Boolean =
      rs(i) > rs(j) || (rs(i) == rs(j) && ids(i) > ids(j))
    private def gtPair(i: Int, r: Long, id: Long): Boolean =
      rs(i) > r || (rs(i) == r && ids(i) > id)
    private def swap(i: Int, j: Int): Unit = {
      val tr = rs(i); rs(i) = rs(j); rs(j) = tr
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def offer(r: Long, id: Long): Unit = {
      if (n < k) {
        rs(n) = r; ids(n) = id; n += 1
        var c = n - 1
        while (c > 0 && gt(c, (c - 1) / 2)) { swap(c, (c - 1) / 2); c = (c - 1) / 2 }
      } else if (gtPair(0, r, id)) {
        // beats the cutoff: replace root, sift down
        rs(0) = r; ids(0) = id
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1
          val rr = l + 1
          var m = p
          if (l < n && gt(l, m)) m = l
          if (rr < n && gt(rr, m)) m = rr
          if (m == p) done = true
          else { swap(p, m); p = m }
        }
      } // else: below cutoff, one comparison, discarded
    }

    def absorb(other: Heap): Unit = other.foreach(offer)

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(rs(i), ids(i)); i += 1 }
    }

    def sortedPairs: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { out(i) = (rs(i), ids(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long), b: (Long, Long)) =>
          a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }
  }

  /** Column-level entry: array of the k smallest (rank, id) structs,
    * ascending. Largest-first callers negate the rank. */
  def topK(rank: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TopKAgg(
      ColumnBridge.expression(rank), ColumnBridge.expression(id), k)
      .toAggregateExpression())
  }

  /** SQL surface (GraftExtensions): `graft_topk(rank, id, k)` with a
    * foldable integer k. */
  val identifier: org.apache.spark.sql.catalyst.FunctionIdentifier =
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk")

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TopKAgg].getCanonicalName, "graft_topk")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 3,
      "graft_topk takes (rank bigint, id bigint, k int literal)")
    val k = children(2) match {
      case e if e.foldable =>
        e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "graft_topk k must be a literal")
    }
    TopKAgg(children(0), children(1), k)
  }
}
