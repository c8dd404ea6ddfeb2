package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus partition-local decode / feature-extraction
  * operators.
  *
  * The actual image/audio codecs are NOT available in this environment, so
  * the decode kernel is a clearly-marked deterministic stub
  * ([[FakeDecoder]]). Everything around it — schema, batching, partition
  * shape, the `mapPartitions` operator signature — is the real design: at
  * cluster scale the decode kernel is swapped for a JNI/codec call and
  * nothing else changes.
  */
object Multimodal {

  /** A media item: opaque payload + typed metadata travelling with it. */
  case class MediaItem(
      media_id: Long,
      kind: String,           // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      payload_len: Long,
      features: Array[Float])

  /** STUB decode kernel. A real deployment replaces this body with an
    * actual codec (libjpeg/ffmpeg via JNI); it is deterministic here so
    * tests are stable: feature i = f(payload bytes, i) via a rolling hash.
    */
  object FakeDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L
      payload.foreach(b => h = h * 31 + (b & 0xff))
      Array.tabulate(featureDim) { i =>
        val x = h ^ (0x9E3779B97F4A7C15L * (i + 1))
        ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
    }
  }

  /** Wrap a text table as fake media items (payload = utf-8 bytes) — the
    * testdata has no true binary column, so this builds one while keeping
    * the pipeline shape identical to a real media table.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("bigint").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(64).as("width"), lit(64).as("height"),
      lit(16000).as("sample_rate"),
      (col(idCol) % 32 + 1).cast("int").as("n_frames"))

  /** Partition-local decode + featurize: the one genuinely imperative
    * kernel, expressed as `mapPartitions` over a typed Dataset so each task
    * streams its partition through the decoder without materialising it.
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          FakeDecoder.decode(m.payload))
      }
    }
  }

  /** Frame sampling for video-kind items: emit one row per sampled frame
    * index (stride `every`), the standard fan-out before per-frame decode.
    * A frameless item (`n_frames <= 0`: empty/corrupt media) yields no
    * rows — an unguarded `sequence(0, -1, +step)` is a task-killing
    * "Illegal sequence boundaries" error, the shingles pitfall.
    */
  def sampleFrames(media: DataFrame, every: Int): DataFrame = {
    require(every > 0, s"frame stride must be positive, got $every")
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(
          when(col("n_frames") > 0,
            sequence(lit(0), col("n_frames") - 1, lit(every)))
            .otherwise(array().cast("array<int>")))
          .as("frame_idx"))
  }

  /** Resize image-kind items to `targetW` × `targetH`. The STUB kernel
    * models the payload-size effect of a real resampler deterministically
    * and portably — the resized payload is the first
    * `ceil(len * (targetW*targetH)/(w*h))` bytes — so the operator is
    * oracle-checkable end-to-end; a real deployment swaps the kernel body
    * for an actual resampler and the schema/partitioning/metadata plumbing
    * is unchanged. Non-image rows pass through untouched.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else {
          val ratio = (targetW.toLong * targetH).toDouble / (m.width.toLong * m.height)
          val newLen = math.min(m.payload.length.toLong,
            math.ceil(m.payload.length * ratio).toLong).toInt
          m.copy(payload = m.payload.take(newLen), width = targetW, height = targetH)
        }
      }
    }
  }
}
