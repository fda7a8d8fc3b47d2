package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator realization of ordered string aggregation (SURVEY A6:
  * "alternatively a custom TypedImperativeAggregate") — the scale path
  * for when collect_list + array_sort buffers would pressure memory: the
  * buffer stays a flat list merged per partition, sorted only once at
  * finish. Output/tie-break semantics match
  * [[Fns.orderedStringAgg]] exactly (property-tested): NULL values
  * skipped, (ord, value) lexicographic order, comma-joined.
  *
  * Use via `functions.udaf`:
  * {{{
  *   val agg = udaf(new OrderedStringAggregator)
  *   df.groupBy("k").agg(agg(col("ord"), col("v")))
  * }}}
  */
class OrderedStringAggregator
    extends Aggregator[(Int, String), List[(Int, String)], String] {

  override def zero: List[(Int, String)] = Nil

  override def reduce(b: List[(Int, String)],
      a: (Int, String)): List[(Int, String)] =
    if (a == null || a._2 == null) b else a :: b

  override def merge(x: List[(Int, String)],
      y: List[(Int, String)]): List[(Int, String)] = x ::: y

  override def finish(b: List[(Int, String)]): String =
    b.sorted.map(_._2).mkString(",")

  override def bufferEncoder: Encoder[List[(Int, String)]] =
    Encoders.kryo[List[(Int, String)]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
