package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED with a deterministic fake (this container
  * has no image/audio codecs); everything around it — schema, typed
  * batch iteration, partitioning, feature shapes — is real. Swapping
  * `FakeCodec` for a JNI/Java codec changes no plumbing.
  */
object Multimodal {

  /** Typed metadata travelling next to the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)

  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(id: Long, kind: String, nBytes: Int,
      sha: String, features: Array[Float])

  /** Deterministic fake decoder: "decodes" a payload to a fixed-length
    * feature vector from its bytes. Stands in for decode→resize→embed. */
  object FakeCodec {
    val FeatureDim = 16
    def decodeAndFeaturize(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Synthesize a deterministic media table from any docs table: payload
    * = utf-8 bytes of text (an opaque blob as far as this operator is
    * concerned), metadata derived from id. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          MediaMeta(kind, 64 + (id % 16).toInt * 8, 64, 16000, 1000 + id % 5000))
      }
  }

  /** Batch decode + featurize: mapPartitions so a real codec could amortize
    * per-batch init (model load, decoder context) across the partition —
    * the Scala analogue of `mapInPandas` batch shape. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec/model handle)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        digest.reset()
        val sha = digest.digest(row.payload).map(b => f"${b & 0xff}%02x").mkString
        MediaFeatures(row.id, row.meta.kind, row.payload.length, sha,
          FakeCodec.decodeAndFeaturize(row.payload))
      }
    }
  }

  /** Frame-sampling plumbing: pick every k-th "frame" (fixed-size byte
    * window) of a video payload — the partition/batch shape of a real
    * frame sampler, with a byte-window stub for the actual decode. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
      everyK: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video").flatMap { row =>
      // ceil division: the final PARTIAL frame is a frame too — floor
      // silently never sampled the tail of any payload that wasn't an
      // exact multiple of frameBytes, while a short payload DID emit its
      // partial frame via the max(1,...) arm (code-review r05)
      val nFrames = math.max(1, (row.payload.length + frameBytes - 1) / frameBytes)
      Iterator.range(0, nFrames, everyK).map { f =>
        val start = f * frameBytes
        val end = math.min(row.payload.length, start + frameBytes)
        (row.id, f, end - start,
          FakeCodec.decodeAndFeaturize(java.util.Arrays.copyOfRange(row.payload, start, end)))
      }
    }.toDF("id", "frame", "frame_bytes", "features")
  }
}
