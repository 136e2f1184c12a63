package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed per-partition in typed maps.
  *
  * ⚠️ STUB BOUNDARY: no image/audio codec libraries exist in this container,
  * so `decode` parses a deterministic synthetic header and the "feature
  * extraction" is block-means over raw payload bytes. The Spark-side
  * plumbing — schema, binary columns, partitioning, batch-shaped
  * per-partition processing, feature vectors as ARRAY<FLOAT> — is real and
  * tested; swap `FakeCodec` for a real decoder on a cluster with the
  * codec jars/natives installed.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
      format: String)
  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte])

  /** The deterministic stand-in codec. Header layout (8 bytes):
    * [w_hi w_lo h_hi h_lo channels fmt reserved reserved]. */
  object FakeCodec {
    def encodeHeader(w: Int, h: Int, c: Int, fmt: Byte): Array[Byte] =
      Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
        c.toByte, fmt, 0, 0)

    def decode(payload: Array[Byte]): MediaMeta = {
      require(payload.length >= 8, "truncated media payload")
      val w = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
      val h = ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
      val c = payload(4) & 0xff
      val fmt = if ((payload(5) & 1) == 0) "img" else "aud"
      MediaMeta(w, h, c, fmt)
    }

    /** STUB feature extraction: `dim` block-means over payload bytes —
      * stands in for a real embedding model / mel spectrogram. */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val body = payload.drop(8)
      val out = new Array[Float](dim)
      if (body.isEmpty) return out
      val block = math.max(1, body.length / dim)
      var i = 0
      while (i < dim) {
        var s = 0L
        var n = 0
        var j = i * block
        val end = math.min(body.length, (i + 1) * block)
        while (j < end) { s += (body(j) & 0xff); n += 1; j += 1 }
        out(i) = if (n == 0) 0f else s.toFloat / n / 255f
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table derived from `documents` — binary
    * payload with a parsable header, sized by the text. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val w = 16 + (id % 64).toInt
        val h = 16 + ((id / 64) % 64).toInt
        val fmt: Byte = (id % 2).toByte
        val header = FakeCodec.encodeHeader(w, h, 3, fmt)
        MediaRow(id, if (fmt == 0) "image" else "audio", header ++ bytes)
      }
  }

  /** decode → typed metadata columns; per-partition batch shape. */
  def decodeMeta(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val meta = FakeCodec.decode(m.payload)
        (m.media_id, m.kind, meta.width, meta.height, meta.channels,
          meta.format, m.payload.length.toLong)
      }
    }.toDF("media_id", "kind", "width", "height", "channels", "format",
      "n_bytes")
  }

  /** feature extraction → ARRAY<FLOAT> column ready for Similarity ops. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(m => (m.media_id, FakeCodec.features(m.payload, dim).toSeq))
    }.toDF("media_id", "features")
  }

  /** resize → binary-to-binary typed map: new header with the target
    * dimensions, body nearest-neighbor-resampled so output size scales
    * with the pixel count. STUB resample (real codecs absent — see the
    * banner); the output round-trips through decode, which is the
    * plumbing contract a real resizer must also satisfy. */
  def resize(media: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val meta = FakeCodec.decode(m.payload)
        val body = m.payload.drop(8)
        // Long arithmetic: a large upscale must not wrap Int-negative; a
        // header-only payload yields an empty body. An output body above
        // the 64MB cap FAILS LOUDLY — silently truncating would leave the
        // header's targetW x targetH inconsistent with the body length,
        // breaking the pixel-count-proportional contract decode relies on.
        val rawLen =
          if (body.isEmpty) 0L
          else math.max(1L, body.length.toLong * (targetW.toLong * targetH) /
            math.max(1L, meta.width.toLong * meta.height))
        require(rawLen <= 64L * 1024 * 1024,
          s"resize of media ${m.media_id} to ${targetW}x$targetH would " +
            s"produce a $rawLen-byte body (cap 64MB)")
        val outLen = rawLen.toInt
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < outLen) {
          // nearest-neighbor index into the source body
          out(i) = body(((i.toLong * body.length) / outLen).toInt)
          i += 1
        }
        val fmt: Byte = if (meta.format == "img") 0 else 1
        MediaRow(m.media_id, m.kind,
          FakeCodec.encodeHeader(targetW, targetH, meta.channels, fmt) ++ out)
      }
    }
  }

  /** frame sampling → generator (0..n rows per media row): the payload
    * body is treated as a sequence of `width`-byte frames and every k-th
    * frame is emitted as its own BINARY row. The flatMap-over-binary shape
    * (and the frame row schema) is what a real video frame sampler needs;
    * only the frame decode itself is synthetic. */
  def frameSample(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    require(everyK > 0, s"everyK must be positive, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val meta = FakeCodec.decode(m.payload)
      val body = m.payload.drop(8)
      val frameLen = math.max(1, meta.width)
      val nFrames = body.length / frameLen
      (0 until nFrames by everyK).map { f =>
        (m.media_id, f, body.slice(f * frameLen, (f + 1) * frameLen))
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
