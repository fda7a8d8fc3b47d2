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
  * Image AND audio decode are REAL end-to-end, zero extra
  * dependencies: [[ImageIODecoder]] decodes PNG / JPEG / GIF / BMP
  * pixels through the JDK's `javax.imageio` (true dimensions + a
  * 16-bin luminance-histogram content feature), [[AudioDecoder]]
  * decodes WAV / AIFF / AU PCM through `javax.sound.sampled` (sample
  * rate / channels / frame count + amplitude histogram), and
  * [[ImageHeaderDecoder]] parses PNG IHDR / JPEG SOF / GIF
  * logical-screen headers when only dimensions are needed (no pixel
  * pass). VIDEO decode is real for the MJPEG-AVI family:
  * [[VideoDecoder]] walks the RIFF container ([[RiffVideo]], pure JVM)
  * and decodes each `00dc`/`00db` frame codestream through ImageIO —
  * covering MJPEG AVIs (JPEG frames) and any ImageIO-readable
  * intra-frame codec; INTER-frame codecs (H.264 &c.) remain out of JDK
  * reach and fall back to the deterministic [[FakeDecoder]] stub (swap
  * in a codec-backed [[Decoder]] in production). [[JdkDecoder]]
  * combines all three. The Spark-side plumbing — schema, binary column
  * handling, partition-batched decode via `mapPartitions` (the JVM
  * analog of `mapInPandas`: one decoder instantiation per partition,
  * streaming over rows), partitioning — is real and tested.
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

  /** Container-header dimension parsing — the part of image decode that
    * needs no codec, just bytes. */
  object ImageHeaders {
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a).map(_.toByte)

    /** (width, height) from PNG / JPEG / GIF header bytes; None when the
      * content is not a recognized image container. */
    def dimensions(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length >= 24 && b.startsWith(pngSig) &&
          new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
            == "IHDR")
        Some((be32(b, 16), be32(b, 20)))          // PNG IHDR
      else if (b.length >= 10 &&
          (b.startsWith("GIF87a".getBytes) ||
            b.startsWith("GIF89a".getBytes)))
        Some((le16(b, 6), le16(b, 8)))            // GIF logical screen
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff &&
          (b(1) & 0xff) == 0xd8)
        jpegSof(b)                                // JPEG: walk markers
      else None
    }

    /** Walk JPEG marker segments to the first SOFn frame header (C0-CF
      * minus the non-frame C4/C8/CC): height at +5, width at +7.
      * Consecutive 0xFF bytes before a marker are legal fill/padding
      * (ITU T.81 §B.1.1.2) and carry no length — skip them rather than
      * reading a bogus length from the padding. */
    private def jpegSof(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 1 < b.length && (b(i) & 0xff) == 0xff) {
        // skip 0xFF fill bytes: the marker byte is the first non-FF
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val marker = b(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (j + 7 < b.length)
            Some((be16(b, j + 6), be16(b, j + 4))) else None
        }
        // standalone markers (RST0-7, SOI, EOI, TEM) have no length field
        if ((marker >= 0xd0 && marker <= 0xd9) || marker == 0x01) i = j + 1
        else if (j + 2 < b.length) i = j + 1 + be16(b, j + 1)
        else return None
      }
      None
    }
  }

  /** Real image-header decoder: true width/height parsed from PNG /
    * JPEG / GIF container headers; items that are not recognized image
    * containers (audio, video, unparseable bytes) fall back to
    * [[FakeDecoder]]'s deterministic stub metadata. The feature vector
    * stays the byte histogram — for real pixel features use
    * [[ImageIODecoder]]. */
  object ImageHeaderDecoder extends Decoder {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      items.map { m =>
        val base = FakeDecoder.decode(Iterator.single(m)).next()
        ImageHeaders.dimensions(m.content) match {
          case Some((w, h)) => base.copy(width = w, height = h)
          case None => base
        }
      }
  }

  /** REAL image pixel decoder, zero new dependencies: `javax.imageio`
    * ships in the JDK and decodes PNG / JPEG / GIF / BMP. Feature =
    * 16-bin luminance histogram over the decoded pixels (ITU BT.601
    * integer weights, bin = luma >> 4), normalized by pixel count —
    * a real, deterministic content feature (identical images ⇒
    * identical vectors regardless of byte-level encoding differences).
    * Non-image items and undecodable bytes fall back to
    * [[ImageHeaderDecoder]] (audio/video decode still needs external
    * codecs; [[VideoDecoder]] covers the MJPEG-AVI family, inter-frame
    * codecs remain external). Per-partition instantiation via
    * [[decodeFeatures]] amortizes ImageIO's plugin-registry lookup.
    * Production note: for throughput on large images, read the raster
    * row-wise (`getRGB(x, y, w, 1, buf, 0, w)`) exactly as done here —
    * per-pixel getRGB calls cross the ColorModel per call. */
  object ImageIODecoder extends Decoder {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      items.map { m =>
        if (m.media_type != "image") fallback(m)
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.content))
          if (img == null) fallback(m)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val hist = new Array[Float](16)
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                val lum = (((rgb >> 16) & 0xff) * 299 +
                  ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                hist(lum >> 4) += 1f
                x += 1
              }
              y += 1
            }
            val n = math.max(1f, (w.toLong * h).toFloat)
            MediaFeatures(m.media_id, m.media_type, m.n_bytes,
              w, h, 1, hist.map(_ / n))
          }
        } catch { case _: Exception => fallback(m) }
      }

    private def fallback(m: MediaItem): MediaFeatures =
      ImageHeaderDecoder.decode(Iterator.single(m)).next()
  }

  /** REAL audio decoder, zero new dependencies: `javax.sound.sampled`
    * ships in the JDK and decodes WAV / AIFF / AU PCM. Field mapping
    * onto the fixed [[MediaFeatures]] shape: `width` = sample rate
    * (Hz), `height` = channel count, `n_frames` = PCM frame count;
    * `feature` = 16-bin normalized amplitude histogram of the decoded
    * samples (bin = (amplitude+1)/2 × 16 over [-1, 1]) — a real,
    * deterministic content feature. 8/16-bit PCM, both endiannesses,
    * signed and unsigned. Non-audio items and undecodable bytes fall
    * back to [[ImageHeaderDecoder]]; MJPEG-family video decodes via
    * [[VideoDecoder]] (inter-frame codecs remain the one external
    * dependency — the JDK ships no H.264-class codec). */
  object AudioDecoder extends Decoder {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      items.map { m =>
        if (m.media_type != "audio") fallback(m)
        else try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.content))
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
          val n = bytes.length / bytesPerSample
          val hist = new Array[Float](16)
          var i = 0
          while (i < n) {
            val off = i * bytesPerSample
            // decode one sample to [-1, 1]
            val amp: Double = fmt.getSampleSizeInBits match {
              case 8 =>
                if (fmt.getEncoding ==
                    javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                  ((bytes(off) & 0xff) - 128) / 128.0
                else bytes(off) / 128.0
              case _ => // 16-bit
                val (lo, hi) =
                  if (fmt.isBigEndian) (bytes(off + 1), bytes(off))
                  else (bytes(off), bytes(off + 1))
                ((hi << 8) | (lo & 0xff)) / 32768.0
            }
            val bin = math.min(15, math.max(0,
              ((amp + 1.0) / 2.0 * 16).toInt))
            hist(bin) += 1f
            i += 1
          }
          MediaFeatures(m.media_id, m.media_type, m.n_bytes,
            width = fmt.getSampleRate.toInt,
            height = fmt.getChannels,
            n_frames = (n / math.max(1, fmt.getChannels)),
            feature = hist.map(_ / math.max(1f, n.toFloat)))
        } catch { case _: Exception => fallback(m) }
      }

    private def fallback(m: MediaItem): MediaFeatures =
      ImageHeaderDecoder.decode(Iterator.single(m)).next()
  }

  /** Minimal RIFF/AVI container support, pure JVM: a writer producing a
    * spec-shaped MJPEG-style AVI (RIFF → hdrl(avih, strl(strh vids,
    * strf)) → movi(00dc frames)) and a tolerant reader that walks the
    * chunk tree and returns each frame's codestream bytes. The reader
    * never trusts sizes past the buffer (corrupt files yield the
    * frames parsed so far). */
  object RiffVideo {
    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] =
        if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      fourcc(id) ++ le32(body.length) ++ body ++ pad
    }
    private def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(typ) ++ body)

    def makeAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
        fps: Int = 25): Array[Byte] = {
      val avih = chunk("avih",
        le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
          le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
          le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val strh = chunk("strh",
        fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le32(0) ++
          le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
          le32(frames.size) ++ le32(0) ++ le32(-1) ++ le32(0) ++
          le32(0) ++ le32(0))
      val strf = chunk("strf",
        le32(40) ++ le32(w) ++ le32(h) ++
          Array[Byte](1, 0, 24, 0) ++ fourcc("MJPG") ++
          le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi",
        frames.toArray.flatMap(f => chunk("00dc", f)))
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    /** Frame codestreams of an AVI, in stream order; Nil when the
      * bytes are not a RIFF container. */
    def frameStreams(avi: Array[Byte]): Seq[Array[Byte]] = {
      if (avi.length < 12 || avi(0) != 'R' || avi(1) != 'I' ||
        avi(2) != 'F' || avi(3) != 'F') return Nil
      def rd32(p: Int): Int = (avi(p) & 0xff) | ((avi(p + 1) & 0xff) << 8) |
        ((avi(p + 2) & 0xff) << 16) | ((avi(p + 3) & 0xff) << 24)
      def id(p: Int): String = new String(avi, p, 4, "US-ASCII")
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val cid = id(p)
          val sz = rd32(p + 4)
          if (sz < 0 || p + 8 + sz > to) return // corrupt: stop here
          if (cid == "LIST" && sz >= 4) walk(p + 12, p + 8 + sz)
          else if ((cid.endsWith("dc") || cid.endsWith("db")) && sz > 0)
            out += java.util.Arrays.copyOfRange(avi, p + 8, p + 8 + sz)
          p += 8 + sz + (sz & 1)
        }
      }
      walk(12, math.min(avi.length.toLong, 8L + rd32(4)).toInt)
      out.toSeq
    }
  }

  /** REAL video decoder for the MJPEG-AVI family: RIFF chunk walk →
    * per-frame ImageIO decode (JPEG frames in real MJPEG files; any
    * ImageIO-readable intra-frame codestream works). `width`/`height`
    * from the first decodable frame, `n_frames` = decoded frame count,
    * `feature` = 16-bin luminance histogram over ALL frames' pixels
    * (normalized by total pixel count). Non-RIFF video bytes (e.g.
    * inter-frame codecs the JDK cannot decode) fall back to the
    * deterministic stub. */
  object VideoDecoder extends Decoder {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      items.map { m =>
        if (m.media_type != "video") fallback(m)
        else try {
          val imgs = RiffVideo.frameStreams(m.content).flatMap(f =>
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f))))
          if (imgs.isEmpty) fallback(m)
          else {
            val w = imgs.head.getWidth
            val h = imgs.head.getHeight
            val hist = new Array[Float](16)
            var total = 0L
            imgs.foreach { img =>
              val fw = img.getWidth
              val row = new Array[Int](fw)
              var y = 0
              while (y < img.getHeight) {
                img.getRGB(0, y, fw, 1, row, 0, fw)
                var x = 0
                while (x < fw) {
                  val rgb = row(x)
                  val lum = (((rgb >> 16) & 0xff) * 299 +
                    ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                  hist(lum >> 4) += 1f
                  x += 1
                }
                y += 1
              }
              total += img.getWidth.toLong * img.getHeight
            }
            MediaFeatures(m.media_id, m.media_type, m.n_bytes,
              w, h, imgs.size,
              hist.map(_ / math.max(1L, total).toFloat))
          }
        } catch { case _: Exception => fallback(m) }
      }

    private def fallback(m: MediaItem): MediaFeatures =
      FakeDecoder.decode(Iterator.single(m)).next()
  }

  /** Full JDK decoder: image pixels via [[ImageIODecoder]], audio PCM
    * via [[AudioDecoder]], MJPEG-family video via [[VideoDecoder]] —
    * the most capable zero-dependency decoder. */
  object JdkDecoder extends Decoder {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      items.map { m =>
        m.media_type match {
          case "image" => ImageIODecoder.decode(Iterator.single(m)).next()
          case "audio" => AudioDecoder.decode(Iterator.single(m)).next()
          case "video" => VideoDecoder.decode(Iterator.single(m)).next()
          case _ => FakeDecoder.decode(Iterator.single(m)).next()
        }
      }
  }

  /** Deterministic synthetic media: REAL PNG and WAV bytes whose decoded
    * content is exactly predictable by integer arithmetic — the
    * generator behind the decoder oracle gate (q64_media_decode). PNG is
    * lossless and the BT.601 integer luma of a gray pixel (g,g,g) is
    * exactly g, WAV PCM roundtrips bit-exact, so a SQL-only engine can
    * replay every decoded value (dimensions, histogram bins) in closed
    * form without a codec. */
  object SyntheticMedia {

    /** Gray PNG: w = 8 + (i%5)·4, h = 8 + (i%3)·4, pixel gray
      * g(x,y) = (x·7 + y·13 + i·31) mod 256. Decoded luminance bin of
      * each pixel is exactly g >> 4. */
    def pngItem(i: Long): MediaItem = {
      val w = (8 + (i % 5) * 4).toInt
      val h = (8 + (i % 3) * 4).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((x * 7 + y * 13 + i * 31) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      val b = baos.toByteArray
      MediaItem(i, "image", b, b.length.toLong)
    }

    /** Mono 16-bit signed little-endian PCM WAV at 8000 Hz (hand-rolled
      * 44-byte RIFF header): n = 2000 + (i%5)·400 samples, sample
      * s(j) = ((j·1103 + i·12345) mod 65536) − 32768. The decoder's
      * amplitude bin of s is ((s+32768)/65536)·16 = (s+32768) div 4096 —
      * exact in double (power-of-two division) and in integer SQL. */
    def wavItem(i: Long): MediaItem = {
      val n = (2000 + (i % 5) * 400).toInt
      val data = new Array[Byte](n * 2)
      var j = 0
      while (j < n) {
        val s = (((j.toLong * 1103 + i * 12345) % 65536) - 32768).toInt
        data(2 * j) = (s & 0xff).toByte
        data(2 * j + 1) = ((s >> 8) & 0xff).toByte
        j += 1
      }
      val out = new java.io.ByteArrayOutputStream(44 + data.length)
      def le16(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16(v >>> 16) }
      out.write("RIFF".getBytes); le32(36 + data.length)
      out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); le32(16)
      le16(1); le16(1)        // PCM, mono
      le32(8000); le32(16000) // sample rate, byte rate
      le16(2); le16(16)       // block align, bits per sample
      out.write("data".getBytes); le32(data.length)
      out.write(data)
      val b = out.toByteArray
      MediaItem(i, "audio", b, b.length.toLong)
    }

    /** Alternating media kind by id: even → PNG image, odd → WAV audio. */
    def item(i: Long): MediaItem =
      if (i % 2 == 0) pngItem(i) else wavItem(i)

    /** Gray-PNG-frame AVI: `2 + (i%2)` frames of the pngItem pattern
      * shifted per frame — frame j pixel
      * `g(x,y) = (x·7 + y·13 + i·31 + j·17) mod 256`, dims as pngItem
      * (w = 8 + (i%5)·4, h = 8 + (i%3)·4). PNG frames are lossless, so
      * the decoded per-bin counts over ALL frames are exact integer
      * arithmetic — the video leg of the q64 oracle gate. (Real MJPEG
      * files carry JPEG frames; [[VideoDecoder]] reads either.) */
    def aviItem(i: Long): MediaItem = {
      val w = (8 + (i % 5) * 4).toInt
      val h = (8 + (i % 3) * 4).toInt
      val nf = (2 + (i % 2)).toInt
      val frames = (0 until nf).map { j =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((x * 7 + y * 13 + i * 31 + j * 17) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        baos.toByteArray
      }
      val avi = RiffVideo.makeAvi(frames, w, h)
      MediaItem(i, "video", avi, avi.length.toLong)
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
      decoder: Decoder = ImageHeaderDecoder,
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

  /** REAL pixel resize, zero new dependencies: ImageIO decode →
    * bilinear `Graphics2D` scale → PNG re-encode. None when the bytes
    * are not a decodable image. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))).map { src =>
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", baos)
      baos.toByteArray
    }

  /** Batch resize at the codec boundary (`mapPartitions`, like
    * [[decodeFeatures]]): image items re-encode at (w, h); non-image
    * items and undecodable bytes pass through untouched — the
    * normalize-resolution step of a multimodal training pipeline. */
  def resizeImages(spark: SparkSession, items: DataFrame, w: Int,
      h: Int): Dataset[MediaItem] = {
    import spark.implicits._
    items.as[MediaItem].mapPartitions(_.map { m =>
      if (m.media_type != "image") m
      else resizeImage(m.content, w, h)
        .map(b => m.copy(content = b, n_bytes = b.length.toLong))
        .getOrElse(m)
    })
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
