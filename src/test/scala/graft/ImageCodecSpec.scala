package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.ImageCodec

/** The REAL image kernel (javax.imageio — ships in the JDK): pixel-exact
  * decode, feature extraction, resampling, and the distributed operators
  * end-to-end over generated PNG/JPEG payloads. The FakeDecoder parity
  * queries (q47/q52) are untouched — this suite gates the real-codec
  * path (q145).
  */
class ImageCodecSpec extends SparkSpec {

  private def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    ImageCodec.encodePng(img)
  }

  test("PNG decode + features are pixel-exact on a solid-color image") {
    val payload = solidPng(10, 6, 200, 100, 50)
    val img = ImageCodec.decode(payload).get
    assert(img.getWidth == 10 && img.getHeight == 6)
    val f = ImageCodec.features(img)
    assert(f.length == ImageCodec.featureDim)
    assert(f(0) == 10.0f && f(1) == 6.0f, "decoded dimensions")
    assert(f(2) == 200.0f && f(3) == 100.0f && f(4) == 50.0f,
      s"solid color means must be exact, got ${f.toSeq}")
    val luma = (0.299 * 200 + 0.587 * 100 + 0.114 * 50).toFloat
    assert(math.abs(f(5) - luma) < 1e-3, "Rec.601 luma mean")
    assert(f(6) < 1e-3, "solid image has zero luma variance")
    assert(math.abs(f(7) - 10.0f / 6.0f) < 1e-6, "aspect ratio")
  }

  test("JPEG decode works (lossy: near-exact on solid color)") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, (120 << 16) | (60 << 8) | 30)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val f = ImageCodec.features(ImageCodec.decode(bos.toByteArray).get)
    assert(f(0) == 8.0f && f(1) == 8.0f)
    assert(math.abs(f(2) - 120) <= 4 && math.abs(f(3) - 60) <= 4 &&
      math.abs(f(4) - 30) <= 4, s"JPEG means within codec error: ${f.toSeq}")
  }

  test("corrupt and non-image payloads decode to None (not exceptions)") {
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    // a PNG header with truncated body must also be survivable
    assert(ImageCodec.decode(solidPng(4, 4, 1, 2, 3).take(20)).isEmpty)
  }

  test("resample to target dims; bilinear preserves a solid color exactly") {
    val img = ImageCodec.decode(solidPng(16, 16, 77, 88, 99)).get
    val out = ImageCodec.resample(img, 4, 4)
    assert(out.getWidth == 4 && out.getHeight == 4)
    val f = ImageCodec.features(out)
    assert(f(2) == 77.0f && f(3) == 88.0f && f(4) == 99.0f,
      s"constant image resamples to the same constant: ${f.toSeq}")
  }

  test("syntheticImages round-trips pixel-exactly through PNG") {
    implicit val s = spark
    val df = spark.range(3, 6).toDF("doc_id")
    val rows = Multimodal.syntheticImages(df, "doc_id", w = 5, h = 4)
      .collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(3L, 4L, 5L))
    rows.foreach { m =>
      val img = ImageCodec.decode(m.payload).get
      assert(img.getWidth == 5 && img.getHeight == 4)
      // PNG is lossless: every pixel must match the generator formula
      (0 until 4).foreach { y => (0 until 5).foreach { x =>
        val p = img.getRGB(x, y)
        val er = ((m.media_id * 53 + x * 7 + y * 13) & 0xff).toInt
        val eg = ((m.media_id * 31 + x * 3) & 0xff).toInt
        val eb = ((m.media_id * 17 + y * 5) & 0xff).toInt
        assert(((p >> 16) & 0xff) == er && ((p >> 8) & 0xff) == eg &&
          (p & 0xff) == eb, s"pixel ($x,$y) of image ${m.media_id}")
      }}
    }
  }

  test("extractImageFeatures end-to-end: real decode, empty vector for " +
      "corrupt payloads, non-image kinds excluded") {
    implicit val s = spark
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaItem(1L, "image", solidPng(6, 3, 10, 20, 30), 6, 3, 0, 0),
      Multimodal.MediaItem(2L, "image", "garbage-bytes".getBytes, 0, 0, 0, 0),
      Multimodal.MediaItem(3L, "audio", Array[Byte](1, 2, 3), 0, 0, 16000, 0))
      .toDF()
    val out = Multimodal.extractImageFeatures(media).collect()
      .sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L),
      "image kinds only; audio is excluded")
    assert(out(0).features.toSeq.take(5) ==
      Seq(6.0f, 3.0f, 10.0f, 20.0f, 30.0f))
    assert(out(1).features.isEmpty, "corrupt payload -> empty features")
  }

  test("resizeImages end-to-end: true new dims + PNG payload; corrupt " +
      "and non-image rows pass through unchanged") {
    implicit val s = spark
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaItem(1L, "image", solidPng(12, 12, 5, 6, 7), 12, 12, 0, 0),
      Multimodal.MediaItem(2L, "image", "junk".getBytes, 0, 0, 0, 0),
      Multimodal.MediaItem(3L, "video", Array[Byte](9), 0, 0, 0, 17))
      .toDF()
    val out = Multimodal.resizeImages(media, 3, 3).collect().sortBy(_.media_id)
    val resized = ImageCodec.decode(out(0).payload).get
    assert(out(0).width == 3 && out(0).height == 3)
    assert(resized.getWidth == 3 && resized.getHeight == 3,
      "stamped dims must match the actually-decoded payload")
    assert(ImageCodec.features(resized).toSeq.slice(2, 5) ==
      Seq(5.0f, 6.0f, 7.0f), "solid color survives the resample")
    assert(out(1).payload.toSeq == "junk".getBytes.toSeq &&
      out(1).width == 0, "undecodable image passes through unchanged")
    assert(out(2).payload.toSeq == Seq(9.toByte) && out(2).n_frames == 17,
      "non-image kinds pass through unchanged")
  }

  test("q145 pipeline shape: synthetic -> resize -> features, all real") {
    implicit val s = spark
    val imgs = Multimodal.syntheticImages(
      spark.range(0, 10).toDF("doc_id"), "doc_id", w = 16, h = 12)
    val feats = Multimodal.extractImageFeatures(
      Multimodal.resizeImages(imgs.toDF(), 8, 8).toDF()).toDF()
    val rows = feats.select(col("media_id"),
        element_at(col("features"), 1).as("w"),
        element_at(col("features"), 2).as("h"))
      .collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getFloat(1) == 8.0f && r.getFloat(2) == 8.0f),
      "every decoded output must be truly 8x8")
  }

  test("binary payload columns are Iceberg pruning citizens: manifest " +
      "bounds recorded, Iceberg-truncated to <= 17 bytes, and planFiles " +
      "prunes on them soundly") {
    import org.apache.hadoop.fs.Path
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val dir = "/root/repo/target/test-binary-bounds"
    val conf = spark.sessionState.newHadoopConf()
    new Path(dir).getFileSystem(conf).delete(new Path(dir), true)
    import spark.implicits._
    // two appends with disjoint payload prefixes, payloads > 16 bytes so
    // the truncation rule is exercised
    def payload(prefix: String, i: Int): Array[Byte] =
      (prefix * 8 + s"-$i").getBytes("UTF-8")
    val a = (0 until 20).map(i => (i.toLong, payload("aa", i))).toDF("id", "payload")
    val b = (0 until 20).map(i => (100L + i, payload("zz", i))).toDF("id", "payload")
    IcebergWriter.seedTable(spark, dir, a.schema)
    IcebergWriter.append(spark, dir, a)
    IcebergWriter.append(spark, dir, b)
    val t = new IcebergTable(dir, conf)
    val files = t.planFiles()
    assert(files.size >= 2)
    val pid = t.metadata.fieldIds("payload")
    files.foreach { f =>
      val lo = f.lowerBounds.get(pid)
      val hi = f.upperBounds.get(pid)
      assert(lo.isDefined && hi.isDefined,
        s"binary payload bounds must be recorded: ${f.filePath}")
      assert(lo.get.length <= 17 && hi.get.length <= 17,
        s"bounds must be Iceberg-truncated: lo=${lo.get.length} " +
          s"hi=${hi.get.length} bytes")
    }
    // pruning bites: an equality probe for a zz-payload drops the aa file
    val probe = payload("zz", 3)
    val kept = t.planFiles(Seq(
      org.apache.spark.sql.sources.EqualTo("payload", probe)))
    assert(kept.size < files.size && kept.nonEmpty,
      s"binary bounds must prune: kept ${kept.size} of ${files.size}")
    // soundness: the pruned file set still contains the probed row
    // (toDF's filter arg prunes FILES; row filtering is the caller's)
    val got = t.toDF(spark, Seq(
        org.apache.spark.sql.sources.EqualTo("payload", probe)))
      .filter(col("payload") === lit(probe)).count()
    assert(got == 1L, s"exactly one zz-3 row, got $got")
    // an out-of-range probe (prefix between the two) prunes everything
    val none = t.planFiles(Seq(
      org.apache.spark.sql.sources.EqualTo("payload", payload("mm", 0))))
    assert(none.isEmpty, s"mid-range probe should prune all: ${none.size}")
  }
}
