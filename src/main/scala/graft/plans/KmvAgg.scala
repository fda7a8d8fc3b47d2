package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded-state K-minimum-values distinct sketch (Bar-Yossef et al.
  * 2002): the k smallest DISTINCT hash values seen by the group, as
  * one aggregation with O(k) state.
  *
  * The point next to Spark's built-in `hll_sketch_agg`: the KMV
  * state over graft's portable md5-derived 60-bit hash
  * ([[graft.functions.Fns.portableHash60]], |H| = 2^60) is a plain
  * sorted long array that an external engine reproduces exactly
  * (DISTINCT hashes, ORDER BY, LIMIT k), so the distinct ESTIMATE —
  * `(k-1) * |H| div h_k`, exact integer arithmetic, no FP anywhere —
  * is oracle-checkable bit for bit, where the HLL sketch's register
  * hashing is opaque. The full 60-bit space matters: a rank statistic
  * only needs hash comparability, and at |H| = 2^60 birthday
  * collisions stay negligible through ~1e9 distinct keys per group,
  * so the textbook 1/sqrt(k-2) standard error actually holds at data
  * scale (a mod-2^30 space starts under-counting from ~1e7-1e8
  * distinct keys — the collision ceiling becomes the error floor).
  * Sketches over disjoint corpora merge losslessly (union of min-sets
  * re-capped at k), the same property the incremental-stats layer
  * relies on for its HLL state.
  *
  * Scale shape: map-side partial aggregation keeps at most k longs
  * per (mapper, group) — above-cutoff hashes die on one comparison
  * before the exchange — so the shuffle is sketch-sized regardless of
  * group cardinality, while `COUNT(DISTINCT …)` must shuffle every
  * distinct value to its group.
  */
case class KmvAgg(hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvAgg.MinSet] {

  import KmvAgg.MinSet

  override def children: Seq[Expression] = Seq(hash)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (k >= 2 && hash.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv needs k >= 2 and a bigint hash, got k=$k " +
          s"(${hash.dataType.simpleString})")

  override def createAggregationBuffer(): MinSet = new MinSet(k)

  override def update(b: MinSet, input: InternalRow): MinSet = {
    val h = hash.eval(input)
    if (h != null) b.offer(h.asInstanceOf[Long])
    b
  }

  override def merge(a: MinSet, b: MinSet): MinSet = { a.absorb(b); a }

  override def eval(b: MinSet): Any = new GenericArrayData(b.sorted)

  override def serialize(b: MinSet): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    val vs = b.sorted
    out.writeInt(vs.length)
    vs.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinSet = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new MinSet(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { b.offer(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(hash = newChildren(0))
}

object KmvAgg {

  /** The k smallest distinct longs seen so far. TreeSet keeps
    * distinctness and order in one structure; k is sketch-sized
    * (tens to hundreds), so boxing is irrelevant next to the rows
    * it absorbs. The hot path — a hash at or above the cutoff of a
    * full set — is one comparison and a discard. */
  final class MinSet(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def offer(v: Long): Unit =
      if (set.size < k) { set.add(v); () }
      else if (v < set.last()) {
        if (set.add(v)) { set.pollLast(); () }
      }

    def absorb(other: MinSet): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) offer(it.next())
    }

    def sorted: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** Column-level entry: the ascending array of the group's k
    * smallest distinct hash values. */
  def kmv(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(KmvAgg(ColumnBridge.expression(hash), k)
      .toAggregateExpression())
  }

  /** SQL surface (GraftExtensions): `graft_kmv(hash, k)` with a
    * foldable integer k. */
  val identifier: org.apache.spark.sql.catalyst.FunctionIdentifier =
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv")

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[KmvAgg].getCanonicalName, "graft_kmv")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      "graft_kmv takes (hash bigint, k int literal)")
    val k = children(1) match {
      case e if e.foldable =>
        e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_kmv k must be an integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "graft_kmv k must be a literal")
    }
    KmvAgg(children(0), k)
  }
}
