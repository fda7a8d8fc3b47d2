package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** One media item: opaque bytes + typed metadata. */
final case class MediaItem(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    content: Array[Byte],
    n_bytes: Long)

/** Decoded-media features (fixed schema regardless of decoder). */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per partition.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[FakeDecoder]] derives deterministic metadata and a
  * 16-dim byte-histogram feature from the raw bytes. The Spark-side
  * plumbing — schema, binary column handling, partition-batched decode
  * via `mapPartitions` (the JVM analog of `mapInPandas`: one decoder
  * instantiation per partition, streaming over rows), partitioning — is
  * real and tested. Swap [[Decoder]] for a codec-backed one in
  * production.
  */
object Multimodal {

  /** Per-partition decoder contract: instantiated once per partition
    * (amortizes model/codec setup), streams items → features. */
  trait Decoder extends Serializable {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures]
  }

  /** STUB decoder — deterministic fake standing in for a real codec
    * (`???` territory, kept runnable): metadata from a content hash,
    * feature = 16-bin byte histogram normalized to [0,1]. */
  object FakeDecoder extends Decoder {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      items.map { m =>
        val h = java.util.Arrays.hashCode(m.content) & 0x7fffffff
        val hist = new Array[Float](16)
        m.content.foreach(b => hist((b & 0xff) >> 4) += 1f)
        val total = math.max(1f, m.content.length.toFloat)
        MediaFeatures(m.media_id, m.media_type, m.n_bytes,
          width = h % 640 + 1, height = h % 480 + 1,
          n_frames = if (m.media_type == "video") h % 10 + 1 else 1,
          feature = hist.map(_ / total))
      }
  }

  /** Wrap a text/binary source into the media-item shape (fake content
    * for this environment; real pipelines read binary files or BLOB
    * columns directly). */
  def asMediaItems(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("content"))
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))

  /** Partition-batched decode: repartition for even decode work (media
    * rows are heavily size-skewed at scale), then one decoder per
    * partition. */
  def decodeFeatures(spark: SparkSession, items: DataFrame,
      decoder: Decoder = FakeDecoder,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val ds = items.as[MediaItem]
    val balanced =
      if (partitions > 0) ds.repartition(partitions, col("media_id"))
      else ds
    balanced.mapPartitions(decoder.decode)
  }

  /** Feature "resize": average-pool the per-item feature vector down to
    * `outBins` (the embedding-downsample step of a media pipeline, e.g.
    * 16→4 bins). Pure column expression over the typed Dataset. */
  def poolFeatures(features: Dataset[MediaFeatures],
      outBins: Int): DataFrame = {
    val f = features.toDF()
    val inBins = 16 // MediaFeatures.feature width from the decoder
    require(inBins % outBins == 0, "outBins must divide the feature width")
    val k = inBins / outBins
    f.withColumn("pooled",
      transform(sequence(lit(0), lit(outBins - 1)), b =>
        aggregate(slice(col("feature"), b * k + 1, lit(k)),
          lit(0.0f).cast("double"), (acc, x) => acc + x) / k))
  }

  /** Frame-sampling plan for video rows: explode a deterministic frame
    * index list (every `stride`-th frame) so downstream per-frame work is
    * row-parallel — the shape a real frame extractor plugs into. */
  def sampleFrames(features: Dataset[MediaFeatures],
      stride: Int): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_idx"))
}
