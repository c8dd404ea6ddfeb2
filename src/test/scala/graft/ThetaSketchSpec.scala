package graft

import org.apache.spark.sql.functions._

import graft.iceberg.ThetaSketch

/** The DataSketches-compact theta serialization: murmur3 x64/128 against
  * published reference vectors, the byte layout against the documented
  * compact format, round-trips, exactness ≤ k, estimation accuracy > k,
  * and the cross-sketch merge rule an external engine would apply.
  */
class ThetaSketchSpec extends SparkSpec {

  private def hex(l: Long) = f"0x$l%016x"

  test("murmur3 x64/128 matches published reference vectors") {
    import java.nio.charset.StandardCharsets.UTF_8
    // canonical smhasher-derived vectors, seed 0
    assert(ThetaSketch.murmur128(Array.empty[Byte], 0L) == (0L, 0L))
    val (h1a, h2a) = ThetaSketch.murmur128("hello".getBytes(UTF_8), 0L)
    assert(hex(h1a) == "0xcbd8a7b341bd9b02" && hex(h2a) == "0x5b1e906a48ae1d19",
      s"'hello': ${hex(h1a)} ${hex(h2a)}")
    val (h1b, h2b) = ThetaSketch.murmur128("hello, world".getBytes(UTF_8), 0L)
    assert(hex(h1b) == "0x342fac623a5ebc8e" && hex(h2b) == "0x4cdcbc079642414d",
      s"'hello, world': ${hex(h1b)} ${hex(h2b)}")
    // the classic fox vector is published as a 16-byte hex STRING
    // ("6c1b07bc...437a"); as bytes that is the little-endian image of
    // the two u64s below
    val (h1c, h2c) = ThetaSketch.murmur128(
      "The quick brown fox jumps over the lazy dog".getBytes(UTF_8), 0L)
    val bytesC = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(h1c).putLong(h2c).array()
    assert(bytesC.map(b => f"$b%02x").mkString ==
      "6c1b07bc7bbc4be347939ac4a93c437a",
      s"fox: ${hex(h1c)} ${hex(h2c)}")
  }

  test("hashLong's allocation-free fast path is bit-identical to the " +
      "byte-array murmur") {
    val probe = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      0x0123456789abcdefL) ++ (1 to 50).map(i => i * 1234567891011L)
    probe.foreach { v =>
      val viaBytes = ThetaSketch.murmur128(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array(),
        ThetaSketch.DefaultSeed)._1 >>> 1
      assert(ThetaSketch.hashLong(v) == viaBytes, s"value $v")
    }
  }

  test("deserialize handles the DataSketches single-item form (preLongs " +
      "1, EMPTY clear) — not misread as empty") {
    val sh = ThetaSketch.defaultSeedHash
    val hash = ThetaSketch.hashLong(42L)
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // preLongs 1, serVer 3, family 3, flags RO|COMPACT|ORDERED (no EMPTY)
    bb.put(1.toByte).put(3.toByte).put(3.toByte).put(0.toByte).put(0.toByte)
      .put((2 | 8 | 16).toByte).putShort(sh).putLong(hash)
    val sk = ThetaSketch.deserialize(bb.array())
    assert(sk.entries.toSeq == Seq(hash) && sk.estimate == 1.0,
      s"single-item sketch must read 1 entry, got ${sk.entries.length}")
    // and a genuinely empty 8-byte sketch still reads empty
    assert(ThetaSketch.deserialize(ThetaSketch.Compact(
      Array.empty, Long.MaxValue, sh).serialize()).isEmpty)
  }

  test("value hashing: 63-bit, screened zero, canonical -0.0, seed hash") {
    assert(ThetaSketch.hashLong(42L) > 0)
    assert(ThetaSketch.hashString("") == 0L, "empty string screens out")
    assert(ThetaSketch.hashString(null) == 0L)
    assert(ThetaSketch.hashDouble(-0.0) == ThetaSketch.hashDouble(0.0),
      "-0.0 canonicalizes like the library's update(double)")
    assert(ThetaSketch.defaultSeedHash != 0,
      "seed 9001 must produce a nonzero 16-bit seed hash")
  }

  test("compact layout golden bytes: empty, exact, estimation modes") {
    val sh = ThetaSketch.defaultSeedHash
    // EMPTY: 8 bytes, preLongs 1, serVer 3, family 3, flags RO|C|O|EMPTY
    val e = ThetaSketch.Compact(Array.empty, Long.MaxValue, sh).serialize()
    assert(e.length == 8)
    assert(e(0) == 1 && e(1) == 3 && e(2) == 3 && e(3) == 0 && e(4) == 0)
    assert((e(5) & 0xff) == (2 | 4 | 8 | 16), s"empty flags ${e(5)}")
    val bbE = java.nio.ByteBuffer.wrap(e).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bbE.getShort(6) == sh)
    // EXACT, 3 entries: preLongs 2, 16 + 24 bytes, count at offset 8,
    // entries ascending from offset 16
    val ents = Array(100L, 200L, 300L)
    val x = ThetaSketch.Compact(ents, Long.MaxValue, sh).serialize()
    assert(x.length == 16 + 24)
    assert(x(0) == 2 && x(1) == 3 && x(2) == 3)
    assert((x(5) & 0xff) == (2 | 8 | 16), s"exact flags ${x(5)}")
    val bbX = java.nio.ByteBuffer.wrap(x).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bbX.getInt(8) == 3)
    assert((0 until 3).map(i => bbX.getLong(16 + i * 8)) == Seq(100L, 200L, 300L))
    // ESTIMATION: preLongs 3, thetaLong at offset 16, entries from 24
    val th = Long.MaxValue / 2
    val s = ThetaSketch.Compact(Array(10L, 20L), th, sh).serialize()
    assert(s.length == 24 + 16)
    assert(s(0) == 3)
    val bbS = java.nio.ByteBuffer.wrap(s).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bbS.getInt(8) == 2 && bbS.getLong(16) == th && bbS.getLong(24) == 10L)
  }

  test("serialize/deserialize round-trips all three modes") {
    val sh = ThetaSketch.defaultSeedHash
    Seq(
      ThetaSketch.Compact(Array.empty, Long.MaxValue, sh),
      ThetaSketch.Compact(Array(7L), Long.MaxValue, sh),
      ThetaSketch.Compact(Array(5L, 6L, 9L), Long.MaxValue, sh),
      ThetaSketch.Compact(Array(1L, 2L, 3L, 4L), 1000L, sh)
    ).foreach { c =>
      val back = ThetaSketch.deserialize(c.serialize())
      assert(back.entries.toSeq == c.entries.toSeq &&
        back.thetaLong == c.thetaLong && back.seedHash == c.seedHash)
    }
  }

  test("bottom-k semantics: exact ≤ k, ~2% estimation beyond k, and the " +
      "external merge rule converges") {
    val k = 256
    def sketchOf(values: Seq[Long]) = {
      val hs = values.map(ThetaSketch.hashLong(_)).filter(_ != 0L)
        .distinct.sorted.toArray
      ThetaSketch.fromSortedHashes(hs, k)
    }
    val small = sketchOf(1L to 200L)
    assert(small.thetaLong == Long.MaxValue && small.estimate == 200.0,
      "below k the sketch is exact")
    val big = sketchOf(1L to 100000L)
    assert(big.entries.length == k)
    assert(math.abs(big.estimate - 100000) / 100000.0 < 0.15,
      s"estimate ${big.estimate} for 100k distinct (k=$k)")
    // merge as another engine would: union entries below min theta, re-cap
    val a = sketchOf(1L to 60000L)
    val b = sketchOf(40001L to 120000L)
    val minTheta = math.min(a.thetaLong, b.thetaLong)
    val merged = (a.entries ++ b.entries).distinct.filter(_ < minTheta).sorted
    val m =
      if (merged.length <= k) ThetaSketch.Compact(merged, minTheta, a.seedHash)
      else ThetaSketch.Compact(merged.take(k), merged(k), a.seedHash)
    assert(math.abs(m.estimate - 120000) / 120000.0 < 0.2,
      s"merged estimate ${m.estimate} for 120k true distinct")
  }

  test("columnSketch: distributed build is exact below k and matches " +
      "local hashing; unsupported types decline") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 300, s"s${i % 150}"))
      .toDF("k", "s")
    val ks = ThetaSketch.columnSketch(df, "k").get
    assert(ks.thetaLong == Long.MaxValue && ks.estimate == 300.0)
    // entries equal the locally-computed hash set (encoding agreement)
    val local = (0L until 300L).map(ThetaSketch.hashLong(_)).sorted
    assert(ks.entries.toSeq == local)
    val ss = ThetaSketch.columnSketch(df, "s").get
    assert(ss.estimate == 150.0)
    // nested arrays build REAL sketches through the recursive frame
    // (round 16); only variant/unknown decline
    val arr = Seq((1L, Array(Array(1, 2))), (2L, Array(Array(1), Array(2))))
      .toDF("k", "a")
    assert(ThetaSketch.columnSketch(arr, "a").get.estimate == 2.0,
      "nested-array columns build real sketches via the recursive frame")
  }

  test("columnSketch arrays: REAL mergeable payloads over the Iceberg " +
      "single-value element encoding (injective frame)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // 60 distinct int-array values; the frame must be injective enough
    // that ["ab","c"] never collides with ["a","bc"]
    val ints = spark.range(0, 600)
      .select(expr("array(CAST(id % 60 AS INT), CAST(id % 6 AS INT))").as("a"))
    val is = ThetaSketch.columnSketch(ints, "a").get
    assert(is.thetaLong == Long.MaxValue && is.estimate == 60.0,
      s"60 distinct int arrays, got ${is.estimate}")
    // encoding agreement: locally recompute the canonical frame
    def le32(n: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    def frame(elems: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(le32(elems.length))
      elems.foreach { b => out.write(1); out.write(le32(b.length)); out.write(b) }
      out.toByteArray
    }
    val localI = (0L until 60L).map { i =>
      ThetaSketch.hashBytes(frame(Seq(le32((i % 60).toInt), le32((i % 6).toInt))))
    }.sorted
    assert(is.entries.toSeq == localI,
      "int-array hashes must be the framed single-value encoding")
    // string arrays: length prefixes keep the form injective
    val strs = Seq(Seq("ab", "c"), Seq("a", "bc"), Seq("abc"), Seq("abc", null),
      Seq.empty[String]).toDF("a")
    val ss = ThetaSketch.columnSketch(strs, "a").get
    assert(ss.estimate == 5.0,
      s"5 structurally distinct string arrays, got ${ss.estimate}")
    // merge rule holds across two array sketches like any scalar column
    val other = spark.range(0, 600)
      .select(expr("array(CAST(id % 90 AS INT), CAST(id % 6 AS INT))").as("a"))
    val os = ThetaSketch.columnSketch(other, "a").get
    val minTheta = math.min(is.thetaLong, os.thetaLong)
    val merged = (is.entries ++ os.entries).distinct
      .filter(_ < minTheta).sorted
    val m = ThetaSketch.Compact(merged, minTheta, is.seedHash)
    val trueUnion = ((0L until 600L).map(i => ((i % 60).toInt, (i % 6).toInt)) ++
      (0L until 600L).map(i => ((i % 90).toInt, (i % 6).toInt))).distinct.size
    assert(math.round(m.estimate) == trueUnion,
      s"merged estimate ${m.estimate} vs true union $trueUnion")
  }

  test("columnSketch structs/maps: real payloads via the documented " +
      "frames — struct arity-prefixed, map entries key-sorted") {
    import org.apache.spark.sql.functions.expr
    def le32(n: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach(out.write)
      out.toByteArray
    }
    def framed(b: Array[Byte]): Array[Byte] =
      cat(Array[Byte](1), le32(b.length), b)
    // structs: 40 distinct (int, string) pairs, one with a null field
    val structs = spark.range(0, 400).select(
      expr("named_struct('a', CAST(id % 40 AS INT), " +
        "'b', IF(id % 40 = 7, NULL, CAST(id % 40 AS STRING)))").as("s"))
    val ss = ThetaSketch.columnSketch(structs, "s").get
    assert(ss.estimate == 40.0, s"40 distinct structs, got ${ss.estimate}")
    val localS = (0 until 40).map { i =>
      val a = framed(le32(i))
      val b = if (i == 7) Array[Byte](0)
        else framed(i.toString.getBytes("UTF-8"))
      ThetaSketch.hashBytes(cat(le32(2), a, b))
    }.sorted
    assert(ss.entries.toSeq == localS,
      "struct hashes must be the arity-prefixed framed field encoding")
    // maps: construction order must not matter (entries sort by key
    // bytes) — both column orders hash to the SAME canonical form
    val m1 = spark.range(0, 30).select(
      expr("map(CAST(id % 10 AS INT), 'x', CAST(id % 10 + 100 AS INT), 'y')")
        .as("m"))
    val m2 = spark.range(0, 30).select(
      expr("map(CAST(id % 10 + 100 AS INT), 'y', CAST(id % 10 AS INT), 'x')")
        .as("m"))
    val s1 = ThetaSketch.columnSketch(m1, "m").get
    val s2 = ThetaSketch.columnSketch(m2, "m").get
    assert(s1.estimate == 10.0 && s1.entries.toSeq == s2.entries.toSeq,
      "map sketches must canonicalize entry order (sorted by key bytes)")
    // local frame agreement: int32-LE keys sort bytewise little-endian
    val localM = (0 until 10).map { i =>
      val (k1, k2) = (le32(i), le32(i + 100))
      val e1 = cat(le32(k1.length), k1, framed("x".getBytes("UTF-8")))
      val e2 = cat(le32(k2.length), k2, framed("y".getBytes("UTF-8")))
      // unsigned-lex order of the two 4-byte LE keys: i < i+100 < 256
      // means byte 0 decides (i vs i+100) for i+100 < 256
      ThetaSketch.hashBytes(cat(le32(2), e1, e2))
    }.sorted
    assert(s1.entries.toSeq == localM,
      "map hashes must be the key-sorted framed entry encoding")
    // variant columns are the one shape that still declines
    val v = spark.range(0, 3).select(expr("parse_json('1')").as("v"))
    assert(ThetaSketch.columnSketch(v, "v").isEmpty,
      "variant has no deterministic value encoding -> decline")
  }

  test("columnSketch boolean/decimal: Iceberg single-value binary " +
      "encodings, exact NDV, local hash agreement") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val bools = spark.range(0, 40).select(expr("id % 2 = 0").as("b"))
    val bs = ThetaSketch.columnSketch(bools, "b").get
    assert(bs.estimate == 2.0, s"2 distinct booleans, got ${bs.estimate}")
    val localB = Seq(Array[Byte](0), Array[Byte](1))
      .map(ThetaSketch.hashBytes(_)).sorted
    assert(bs.entries.toSeq == localB,
      "boolean hashes must be the single-byte 0x00/0x01 encoding")
    val decs = spark.range(0, 90)
      .select(expr("CAST((id % 45) * 1.25 AS DECIMAL(10,2))").as("d"))
    val ds = ThetaSketch.columnSketch(decs, "d").get
    assert(ds.estimate == 45.0, s"45 distinct decimals, got ${ds.estimate}")
    // encoding agreement: minimal big-endian two's-complement unscaled
    // bytes (java BigInteger.toByteArray) at the column's scale 2
    val localD = (0L until 45L).map { i =>
      val unscaled = java.math.BigDecimal.valueOf(i * 125, 2)
        .setScale(2).unscaledValue.toByteArray
      ThetaSketch.hashBytes(unscaled)
    }.sorted
    assert(ds.entries.toSeq == localD,
      "decimal hashes must be the unscaled two's-complement bytes")
  }

  test("columnSketch temporal encodings: date = epoch days, timestamp = " +
      "TRUE epoch micros (sub-second NDV preserved)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val dates = spark.range(0, 100)
      .select(expr("date_add(DATE'2024-01-01', CAST(id % 31 AS INT))").as("d"))
    val ds = ThetaSketch.columnSketch(dates, "d").get
    assert(ds.estimate == 31.0, s"31 distinct dates, got ${ds.estimate}")
    // encoding agreement: sketch entries = hash of the epoch-day longs
    val day0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val local = (0L until 31L).map(i => ThetaSketch.hashLong(day0 + i)).sorted
    assert(ds.entries.toSeq == local, "date hashes must be epoch-day longs")
    // timestamps differing only in MICROS must stay distinct (a
    // seconds-truncating encoding would collapse them all)
    val ts = spark.range(0, 50).select(
      expr("timestamp_micros(1700000000000000 + id)").as("t"))
    assert(ThetaSketch.columnSketch(ts, "t").get.estimate == 50.0,
      "sub-second timestamp NDV must not collapse")
    val ntz = spark.range(0, 20).select(
      expr("CAST(timestamp_micros(1700000000000000 + id * 1000000) " +
        "AS TIMESTAMP_NTZ)").as("t"))
    assert(ThetaSketch.columnSketch(ntz, "t").get.estimate == 20.0,
      "timestamp_ntz must sketch without an analyzer error")
    // timestamps INSIDE arrays (excluded until round 16): epoch-micros
    // leaves make the frame session-timezone-independent
    val tsArr = spark.range(0, 60).select(
      expr("array(timestamp_micros(1700000000000000 + id % 12))").as("a"))
    assert(ThetaSketch.columnSketch(tsArr, "a").get.estimate == 12.0,
      "timestamp array elements must sketch via epoch micros")
  }

  test("ANALYZE writes a deserializable theta payload into Puffin") {
    import graft.iceberg.{IcebergTable, IcebergWriter, Puffin}
    import graft.iceberg.connector.GraftCatalog
    import org.apache.hadoop.fs.Path
    val warehouse = "/root/repo/target/theta-warehouse"
    val conf = spark.sessionState.newHadoopConf()
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.thcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.thcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS thcat.ns")
    spark.sql(
      """CREATE TABLE thcat.ns.t AS
        |SELECT id % 37 AS k, concat('v', id % 11) AS v FROM range(500)"""
        .stripMargin)
    val dir = s"$warehouse/ns/t"
    IcebergWriter.analyzeTable(spark, dir, Seq("k", "v"))
    val t = new IcebergTable(dir, conf)
    val stats = t.metadata.statistics.last
    val footer = Puffin.readFooter(new Path(stats.path), conf)
    val blobs = footer.get("blobs")
    assert(blobs.size == 2)
    (0 until blobs.size).foreach { i =>
      val b = blobs.get(i)
      val payload = Puffin.readBlob(new Path(stats.path), conf,
        b.get("offset").asLong, b.get("length").asInt)
      val sk = ThetaSketch.deserialize(payload)
      val expected = if (b.get("fields").get(0).asInt ==
        t.metadata.fieldIds("k")) 37.0 else 11.0
      assert(sk.estimate == expected,
        s"blob $i: sketch estimate ${sk.estimate}, want $expected")
      assert(sk.seedHash == ThetaSketch.defaultSeedHash)
    }
  }

  test("stand-in payload round-trips and is externally detectable " +
      "(defensive path — every concrete analyzable type now sketches real)") {
    import graft.iceberg.Puffin
    val p = Puffin.thetaStandInPayload(1234L)
    assert(Puffin.decodeStandIn(p).contains(1234L))
    // a REAL compact sketch must never decode as a stand-in
    assert(Puffin.decodeStandIn(
      ThetaSketch.fromSortedHashes(Array(1L)).serialize()).isEmpty)
  }

  test("blob ndv property agrees with the payload estimate; nested " +
      "columns (arrays-of-arrays, maps) now carry REAL payloads") {
    import graft.iceberg.{IcebergTable, IcebergWriter, Puffin}
    import graft.iceberg.connector.GraftCatalog
    import org.apache.hadoop.fs.Path
    val warehouse = "/root/repo/target/theta-props-warehouse"
    val conf = spark.sessionState.newHadoopConf()
    new Path(warehouse).getFileSystem(conf).delete(new Path(warehouse), true)
    spark.conf.set("spark.sql.catalog.thpcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.thpcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS thpcat.ns")
    // Every concrete column shape now carries a REAL payload: scalars,
    // nested arrays (recursive frame, round 16) and MAPS — which
    // approx_count_distinct cannot even hash, so their ndv property must
    // come from the sketch itself.
    spark.sql(
      """CREATE TABLE thpcat.ns.t AS
        |SELECT id % 23 AS k, array(array(id % 7), array(id % 3)) AS a,
        |       map(id % 11, CAST(id % 5 AS STRING)) AS m
        |FROM range(400)""".stripMargin)
    val dir = s"$warehouse/ns/t"
    IcebergWriter.analyzeTable(spark, dir, Seq("k", "a", "m"))
    val t = new IcebergTable(dir, conf)
    val stats = t.metadata.statistics.last
    val footer = Puffin.readFooter(new Path(stats.path), conf)
    val blobs = footer.get("blobs")
    assert(blobs.size == 3)
    val trueNdv = Map(
      t.metadata.fieldIds("k") -> 23L,
      // distinct (id%7, id%3) pairs over range(400): lcm(7,3)=21 values
      t.metadata.fieldIds("a") -> 21L,
      // distinct (id%11 -> id%5) maps: lcm(11,5)=55 values
      t.metadata.fieldIds("m") -> 55L)
    (0 until blobs.size).foreach { i =>
      val b = blobs.get(i)
      val props = b.get("properties")
      val payload = Puffin.readBlob(new Path(stats.path), conf,
        b.get("offset").asLong, b.get("length").asInt)
      assert(props.get("graft.theta.stand-in") == null,
        "no analyzable column may fall back to the stand-in any more")
      // the value-hashing rule is versioned so a merger can detect
      // blobs written under a different encoding (pre-r15 blobs hash
      // -0.0/NaN array elements by raw IEEE bits) and re-analyze
      // instead of double-counting
      assert(props.get("graft.theta.encoding").asText == "2",
        "real sketch blobs must carry the encoding version tag")
      val sk = ThetaSketch.deserialize(payload)
      assert(props.get("ndv").asText.toLong == math.round(sk.estimate),
        s"ndv property ${props.get("ndv")} must equal the payload " +
          s"estimate ${sk.estimate}")
      val fid = b.get("fields").get(0).asInt
      assert(math.round(sk.estimate) == trueNdv(fid),
        s"field $fid: estimate ${sk.estimate} != true NDV ${trueNdv(fid)}")
    }
    // the graft.stats.ndv.* property for the MAP column (not
    // Spark-hashable) is served from the sketch estimate
    assert(t.metadata.properties("graft.stats.ndv.m").toLong == 55L)
  }
}
