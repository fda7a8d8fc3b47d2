package org.apache.spark

import org.apache.spark.rdd.RDD

/** Accessor for the scheduler's preferred-location walk (package-private
  * in Spark). This is the EXACT lookup DefaultPartitionCoalescer uses to
  * group partitions under coalesce(1) — unlike RDD.preferredLocations,
  * it descends narrow dependencies to cached/checkpointed parents, which
  * is how checkpoint block locations leak into output order (the q88
  * sf10 find; see graft.tools.LocProbe and SCALE.md). */
object GraftSchedulerView {
  def preferredLocs(sc: SparkContext, rdd: RDD[_], p: Int): Seq[String] =
    sc.getPreferredLocs(rdd, p).map(_.toString).toSeq
}
