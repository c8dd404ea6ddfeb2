package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus partition-local decode / feature-extraction
  * operators.
  *
  * Two decode kernels exist behind the same operator shape:
  *
  *  - [[ImageCodec]] — REAL image decode via `javax.imageio` (PNG, JPEG,
  *    BMP, GIF ship in the JDK: zero new dependencies). Pixel-exact
  *    features, real resampling, PNG re-encode. Used by
  *    [[extractImageFeatures]] / [[resizeImages]].
  *  - [[FakeDecoder]] — deterministic stand-in for codecs genuinely NOT
  *    in this environment (audio/video; ML feature extractors), and the
  *    DuckDB-oracle-checkable kernel for [[extractFeatures]] /
  *    [[resize]] (an oracle cannot run ImageIO, so the parity queries
  *    keep the arithmetic kernel).
  *
  * Everything around the kernels — schema, batching, partition shape, the
  * `mapPartitions` operator signature — is shared: at cluster scale a
  * JNI/ffmpeg kernel drops into the same seam and nothing else changes.
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

  /** REAL image codec over the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF —
    * no external dependencies). Executor-side discipline:
    *
    *  - `ImageIO.setUseCache(false)` once per JVM: the default file-backed
    *    stream cache writes a temp file per decode — at cluster scale
    *    that is one disk round-trip per IMAGE, and tasks on diskless
    *    executors fail outright. In-memory cache is the only sane mode
    *    for payloads that already sit in memory as byte arrays.
    *  - decode failure returns None (corrupt bytes are DATA at 100 TB,
    *    not exceptions — a poison payload must not kill a 10k-row task).
    */
  object ImageCodec {
    ImageIO.setUseCache(false)

    val featureDim = 8

    /** Decode or None. ImageIO.read returns null (not throws) for bytes
      * it has no reader for; truncated streams throw — both are "not an
      * image" here. */
    def decode(payload: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Pixel-exact feature vector: [width, height, meanR, meanG, meanB,
      * meanLuma (Rec.601), pixel variance of luma, aspect ratio]. Means
      * are over every pixel — one pass, O(w·h) per image, no allocation
      * beyond the image itself (`getRGB` row buffer reused). */
    def features(img: BufferedImage): Array[Float] = {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var sy = 0.0; var syy = 0.0
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          sy += luma; syy += luma * luma
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      Array(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat,
        (sb / n).toFloat, (sy / n).toFloat,
        math.max(0.0, syy / n - (sy / n) * (sy / n)).toFloat,
        (w.toDouble / h).toFloat)
    }

    /** Deterministic area-correct resample to exactly (w, h): Graphics2D
      * bilinear draw into a fresh RGB canvas. Same bytes in → same bytes
      * out on any JVM with the same ImageIO (the software raster pipeline
      * is pure integer/float math, no platform rendering). */
    def resample(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    /** PNG bytes (lossless, deterministic) — the re-encode format for
      * resized payloads regardless of the input container. */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
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

  /** Deterministic REAL-PNG media derived from an id column — the
    * testdata has no true image column, so this builds one through the
    * real encoder: each row becomes a w×h PNG whose pixel (x, y) is a
    * pure function of (id, x, y) (a per-image color gradient, so
    * resampling and per-channel means are non-trivial). Generated in
    * executors via the same `mapPartitions` seam as the decode kernels —
    * the driver never sees a payload.
    */
  def syntheticImages(df: DataFrame, idCol: String, w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaItem] = {
    require(w > 0 && h > 0, s"image dimensions must be positive: ${w}x$h")
    import spark.implicits._
    df.select(col(idCol).cast("bigint").as("id")).as[Long].mapPartitions {
      it =>
        it.map { id =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((id * 53 + x * 7 + y * 13) & 0xff).toInt
              val g = ((id * 31 + x * 3) & 0xff).toInt
              val b = ((id * 17 + y * 5) & 0xff).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          MediaItem(id, "image", ImageCodec.encodePng(img), w, h, 0, 0)
        }
    }
  }

  /** REAL-codec feature extraction: decode every image-kind payload with
    * [[ImageCodec]] and emit pixel-derived features (true decoded
    * dimensions, per-channel means, luma stats). Undecodable payloads
    * emit an EMPTY feature vector rather than dying or vanishing — at
    * corpus scale "didn't decode" is a signal quality pipelines filter
    * on, and a poison payload must not kill the task. Non-image kinds
    * are excluded (their codecs are not in the JDK; see [[FakeDecoder]]).
    *
    * Same `mapPartitions` seam as [[extractFeatures]]: one streaming
    * pass per partition, no materialization, no driver involvement.
    */
  def extractImageFeatures(media: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaItem].mapPartitions { it =>
      it.map { m =>
        val fs = ImageCodec.decode(m.payload)
          .map(ImageCodec.features).getOrElse(Array.empty[Float])
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, fs)
      }
    }
  }

  /** REAL resize: decode image-kind payloads, bilinear-resample to
    * (targetW, targetH), re-encode as PNG, and stamp the TRUE new
    * dimensions. Undecodable image payloads and non-image kinds pass
    * through unchanged (their metadata still describes the original
    * payload — the caller distinguishes by `width/height` not matching
    * the target). Partition-local and streaming like every kernel here.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaItem] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else ImageCodec.decode(m.payload) match {
          case None => m
          case Some(img) =>
            val out = ImageCodec.resample(img, targetW, targetH)
            m.copy(payload = ImageCodec.encodePng(out),
              width = targetW, height = targetH)
        }
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
