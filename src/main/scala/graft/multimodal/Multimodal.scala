package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs per-partition in bounded batches.
  *
  * The codec itself is STUBBED (no image/audio libraries in this
  * container): `StubCodec` is a deterministic fake standing in for a
  * JNI/FFI decoder. Everything Spark-side — schema, batch shape,
  * partition-local iteration, metadata projection — is real and tested.
  *
  * Scale notes: `mapPartitions` keeps one codec instance per task (the
  * expensive init happens once per partition, not per row) and streams
  * the iterator — no partition-sized materialization. Binary payloads
  * stay off the shuffle path: metadata is extracted first, heavy columns
  * are dropped before any wide operation.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      header_hex: String,
      // stub "decoded" outputs — deterministic fakes of width/height/
      // duration and a fixed-length feature vector
      width: Int,
      height: Int,
      features: Array[Float])

  /** Deterministic fake decoder: byte-derived pseudo-metadata. A real
    * deployment swaps this object for an FFI codec; the Spark plumbing
    * around it is unchanged. */
  object StubCodec {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)))
      val height = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)))
      val features = Array.tabulate(8) { i =>
        if (n == 0) 0f
        else payload(i % n).toFloat / 127f
      }
      (width, height, features)
    }
  }

  /** Decode + featurize each media row, one codec per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive, once)
      rows.map { r =>
        val (w, h, feats) = StubCodec.decode(r.payload)
        val headerHex = r.payload.take(4).map("%02X".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length, headerHex, w, h, feats)
      }
    }
  }

  /** Resize stage (stub): a real deployment calls the codec's scaler;
    * here target dims pass through the deterministic fake while the
    * Spark contract — binary in, (binary, new dims) out, partition-local
    * batches, payload never shuffled — is the real thing. */
  case class ResizedMedia(media_id: Long, kind: String, width: Int,
      height: Int, payload: Array[Byte])

  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _) = StubCodec.decode(r.payload)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        // stub: payload passes through; a real codec re-encodes
        ResizedMedia(r.media_id, r.kind,
          math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt),
          r.payload)
      }
    }
  }

  /** Frame sampling (stub): pick `n` deterministic byte offsets per
    * payload standing in for video frame extraction — one output row
    * per sampled frame, the UDTF batch shape a real ffmpeg-backed
    * sampler would use. */
  case class Frame(media_id: Long, frame_no: Int, offset: Long,
      frame_payload: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = math.max(1, r.payload.length)
      (0 until n).map { i =>
        val off = (len.toLong * i) / n
        Frame(r.media_id, i, off,
          r.payload.slice(off.toInt, math.min(len, off.toInt + 16)))
      }
    }
  }

  /** Metadata-only projection that never deserializes the payload past
    * length/prefix — the cheap path for filtering before decode. */
  def metadata(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      upper(hex(expr(s"substring($payloadCol, 1, 4)"))).as("header_hex"))

  /** Build a fake media table from documents (text bytes as payload) —
    * the container has no real images; plumbing-shape parity only. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }
}
