package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §2.9: the reference names CI
  * streaming "under development" — this is the Spark-native realization).
  * Transforms are defined on unbounded DataFrames; the same builders run
  * in batch tests and against `readStream` sources.
  */
object EventsStreaming {

  /** Streaming ingestion source over an events directory (parquet files
    * appearing over time — the CI-append pattern). */
  def readEventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window aggregation: event-time correctness with
    * bounded state; late rows beyond the watermark are dropped. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  final case class SessionInput(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int,
      total: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState: a 30-min
    * inactivity gap closes a session. State per user is O(1) (just the
    * open session) — the scale-safe streaming analog of the batch
    * gaps-and-islands query (q29). Rows within the batch are processed
    * in event order; closed sessions are emitted immediately.
    *
    * `emitOpen = true` (default, bounded/batch inputs) also emits the
    * trailing still-open session so the result is complete; streaming
    * deployments set it false and rely on timeout-based emission.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      emitOpen: Boolean = true): org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    def out(user: Long, s: SessionState) =
      SessionOut(user, new Timestamp(s.start), new Timestamp(s.last),
        s.n, s.total)
    events.select(col("user_id"), col("ts"), col("value"))
      .as[SessionInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionInput],
            state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
          val closed = Seq.newBuilder[SessionOut]
          var cur = state.getOption
          sorted.foreach { r =>
            val t = r.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(SessionState(s.start, math.max(s.last, t),
                  s.n + 1, s.total + r.value))
              case Some(s) =>
                closed += out(user, s)
                cur = Some(SessionState(t, t, 1, r.value))
              case None =>
                cur = Some(SessionState(t, t, 1, r.value))
            }
          }
          cur.foreach(state.update)
          if (emitOpen) cur.foreach(s => closed += out(user, s))
          closed.result().iterator
      }
  }

  /** Streaming arena ingestion — the reference's "real-world CI
    * ingestion ... under development" (`README.md:163`), realized: a
    * file stream of raw arena cell exports is regrouped into observation
    * rows per micro-batch (the same EP2 plan as batch ingest) and
    * appended to the partitioned lakehouse, checkpointed and
    * restart-incremental.
    *
    * Batch-boundary note: the regroup is per micro-batch, so one
    * sequence-sheet step's cells must arrive in one file — which is how
    * arena exports are written (file-atomic per execution).
    */
  def streamArenaIngest(spark: SparkSession, cellsDir: String,
      cellSchema: org.apache.spark.sql.types.StructType,
      lake: graft.lake.Lakehouse, dataSetId: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(cellSchema).parquet(cellsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // single-shuffle ingest per micro-batch (see clusterByProblem)
        lake.append("observations",
          graft.ingest.ArenaIngest.observationsFromArena(
            graft.ingest.ArenaIngest.clusterByProblem(batch), dataSetId),
          graft.schema.Schemas.observations,
          sortCols = Seq("implementation_id", "test_id", "step_id"),
          clustered = true)
      }
      .start()

  /** Streaming incremental stats maintenance: each micro-batch's
    * per-group state folds into a persisted stats table via
    * [[graft.ops.IncrementalAgg.merge]] — the stats table is exactly
    * `IncrementalAgg.statsOf(all rows so far)` after every batch
    * (StreamingSpec), with per-batch cost ∝ the batch + its touched
    * groups, never the history. The 100 TB shape end to end: the
    * stats table is PARTITIONED by a hash bucket of the group key, so
    * a batch reads only the buckets its groups hash into
    * (partition-pruned scan) and dynamic partition overwrite rewrites
    * ONLY those buckets — without the bucketing, every micro-batch
    * would re-read and re-write the whole stats table no matter how
    * small the delta. The checkpoint is the recovery log. */
  def streamIncrementalStats(spark: SparkSession, srcDir: String,
      srcSchema: org.apache.spark.sql.types.StructType,
      keys: Seq[String], valueCol: String, statsDir: String,
      checkpoint: String, nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(srcSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        def bucketed(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("__bucket",
            pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int"))
        val delta = bucketed(
          graft.ops.IncrementalAgg.statsOf(batch, keys, valueCol))
        // existence probe through the path's own FileSystem (HDFS/S3A/
        // local) — java.io.File is always false on a remote statsDir,
        // which would silently re-write the table non-merged every batch
        val statsPath = new org.apache.hadoop.fs.Path(statsDir)
        val statsFs = statsPath.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        if (!statsFs.exists(statsPath))
          delta.write.partitionBy("__bucket").parquet(statsDir)
        else {
          // bounded driver-side list (≤ nBuckets) drives partition
          // pruning on the read AND scopes the dynamic overwrite
          val touched = delta.select("__bucket").distinct()
            .collect().map(_.getInt(0))
          val prevTouched = batch.sparkSession.read.parquet(statsDir)
            .filter(col("__bucket").isin(touched.map(Integer.valueOf): _*))
          val merged = bucketed(graft.ops.IncrementalAgg.merge(
            prevTouched.drop("__bucket"), delta.drop("__bucket"), keys))
          // materialize before overwriting partitions the plan reads
          merged.localCheckpoint(true)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(statsDir)
        }
      }
      .start()

  /** Watermarked stream-stream interval join: pairs each left event with
    * right events of the same key within [left.ts, left.ts + window].
    * Both sides carry watermarks so the join state is bounded — the
    * streaming analog of TemporalJoins.rangeJoin. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      window_ : String = "5 minutes",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(keyCol).as("k"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    // the event-time range condition + both-side watermarks are what
    // make an OUTER stream-stream join legal: Spark can prove when an
    // unmatched left row can no longer match and emit it with NULLs
    l.join(r, col("k") === col("rk") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window_") &&
      col("l_id") =!= col("r_id"), joinType)
      .select("k", "l_id", "r_id", "l_ts", "r_ts")
  }

  /** Streaming exact dedup with bounded state: drops rows whose key was
    * already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — the streaming face of
    * [[graft.ops.Dedup.exact]]; state is evicted as the watermark
    * advances, so it runs indefinitely. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming sink: append windowed aggregates to partitioned parquet
    * with checkpointing — the incremental-append lakehouse path. */
  def writeWindowed(df: DataFrame, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
}
