package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{GeoWkb, TableMetadata, WriteTypeGuards}

/** WKB coordinate extraction for geo write bounds ([[GeoWkb]]) and the
  * table-metadata write-type guards ([[WriteTypeGuards]]) — pure logic,
  * no Spark session needed. The end-to-end geo/ns write round-trips
  * live in [[FormatV3Spec]].
  */
class GeoWriteSpec extends AnyFunSuite {

  private def le(parts: (ByteBuffer => Unit)*): Array[Byte] = {
    val bb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach(_(bb))
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }
  private def point(x: Double, y: Double): Array[Byte] =
    le(_.put(1.toByte), _.putInt(1), _.putDouble(x), _.putDouble(y))

  private def box(wkbs: Array[Byte]*): (Double, Double, Double, Double) = {
    val b = new GeoWkb.BBox
    wkbs.foreach(b.merge)
    (b.minX, b.minY, b.maxX, b.maxY)
  }

  test("bbox: point, linestring, polygon with hole, multi-* forms") {
    assert(box(point(3, 7)) == ((3.0, 7.0, 3.0, 7.0)))
    val line = le(_.put(1.toByte), _.putInt(2), _.putInt(3),
      _.putDouble(-1), _.putDouble(4), _.putDouble(2), _.putDouble(-5),
      _.putDouble(0), _.putDouble(0))
    assert(box(line) == ((-1.0, -5.0, 2.0, 4.0)))
    // polygon: outer ring + hole (hole coords count toward the box — a
    // containing box is what the bound needs)
    val poly = le(_.put(1.toByte), _.putInt(3), _.putInt(2),
      _.putInt(4), _.putDouble(0), _.putDouble(0), _.putDouble(10),
      _.putDouble(0), _.putDouble(10), _.putDouble(10), _.putDouble(0),
      _.putDouble(0),
      _.putInt(3), _.putDouble(2), _.putDouble(2), _.putDouble(3),
      _.putDouble(3), _.putDouble(2), _.putDouble(2))
    assert(box(poly) == ((0.0, 0.0, 10.0, 10.0)))
    // multipoint nests full WKB points (each with its own header)
    val mp = le(_.put(1.toByte), _.putInt(4), _.putInt(2),
      _.put(point(5, 6)), _.put(point(-2, 9)))
    assert(box(mp) == ((-2.0, 6.0, 5.0, 9.0)))
    // multipolygon
    val mpoly = le(_.put(1.toByte), _.putInt(6), _.putInt(1), _.put(poly))
    assert(box(mpoly) == ((0.0, 0.0, 10.0, 10.0)))
    // several values merge into one running box
    assert(box(point(1, 1), line, point(100, -100)) ==
      ((-1.0, -100.0, 100.0, 4.0)))
  }

  test("bbox: big-endian WKB, empty geometries, NaN empty-point") {
    val bePoint = {
      val bb = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
      bb.put(0.toByte).putInt(1).putDouble(42).putDouble(-7)
      bb.array()
    }
    assert(box(bePoint) == ((42.0, -7.0, 42.0, -7.0)))
    // empty linestring (0 points) contributes nothing
    val emptyLine = le(_.put(1.toByte), _.putInt(2), _.putInt(0))
    val b1 = new GeoWkb.BBox; b1.merge(emptyLine)
    assert(b1.isEmpty)
    // the conventional NaN empty POINT is skipped, not propagated
    val nanPoint = point(Double.NaN, Double.NaN)
    val b2 = new GeoWkb.BBox
    b2.merge(nanPoint); b2.merge(point(3, 4))
    assert((b2.minX, b2.minY, b2.maxX, b2.maxY) == ((3.0, 4.0, 3.0, 4.0)))
  }

  test("ISO Z/M/ZM kinds stride their extra ordinates; x/y box is exact") {
    // Z point (1001): z ordinate skipped, x/y bound
    val zPoint = le(_.put(1.toByte), _.putInt(1001), _.putDouble(3),
      _.putDouble(7), _.putDouble(99))
    assert(box(zPoint) == ((3.0, 7.0, 3.0, 7.0)))
    // M linestring (2002): 3 doubles per point
    val mLine = le(_.put(1.toByte), _.putInt(2002), _.putInt(2),
      _.putDouble(-1), _.putDouble(4), _.putDouble(11),
      _.putDouble(2), _.putDouble(-5), _.putDouble(12))
    assert(box(mLine) == ((-1.0, -5.0, 2.0, 4.0)))
    // ZM polygon (3003): 4 doubles per point
    val zmPoly = le(_.put(1.toByte), _.putInt(3003), _.putInt(1), _.putInt(3),
      _.putDouble(0), _.putDouble(0), _.putDouble(1), _.putDouble(2),
      _.putDouble(10), _.putDouble(5), _.putDouble(1), _.putDouble(2),
      _.putDouble(0), _.putDouble(0), _.putDouble(1), _.putDouble(2))
    assert(box(zmPoly) == ((0.0, 0.0, 10.0, 5.0)))
    // Z multipoint: nested Z points, each with its own header
    val zmp = le(_.put(1.toByte), _.putInt(1004), _.putInt(1), _.put(zPoint))
    assert(box(zmp) == ((3.0, 7.0, 3.0, 7.0)))
    // Z empty point: (NaN, NaN, NaN) skipped like the 2D convention
    val zNan = le(_.put(1.toByte), _.putInt(1001), _.putDouble(Double.NaN),
      _.putDouble(Double.NaN), _.putDouble(Double.NaN))
    val bz = new GeoWkb.BBox; bz.merge(zNan)
    assert(bz.isEmpty)
    // a TRUNCATED Z run still refuses (stride-aware bound check)
    val e = intercept[UnsupportedOperationException] {
      new GeoWkb.BBox().merge(le(_.put(1.toByte), _.putInt(1001),
        _.putDouble(1), _.putDouble(2)))
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("geography (pointsOnly): Point/MultiPoint bound; edge kinds refuse") {
    val b = new GeoWkb.BBox
    b.merge(point(170, 10), pointsOnly = true)
    val mp = le(_.put(1.toByte), _.putInt(4), _.putInt(2),
      _.put(point(-170, -10)), _.put(point(5, 6)))
    b.merge(mp, pointsOnly = true)
    assert((b.minX, b.minY, b.maxX, b.maxY) == ((-170.0, -10.0, 170.0, 10.0)))
    def refuses(wkb: Array[Byte]): Unit = {
      val e = intercept[UnsupportedOperationException] {
        new GeoWkb.BBox().merge(wkb, pointsOnly = true)
      }
      assert(e.getMessage.contains("GEOGRAPHY"), e.getMessage)
    }
    // the antimeridian linestring from the advice: x=170 → x=-170 — its
    // geodesic lies OUTSIDE the vertices' planar box, so it must refuse
    refuses(le(_.put(1.toByte), _.putInt(2), _.putInt(2),
      _.putDouble(170), _.putDouble(0), _.putDouble(-170), _.putDouble(0)))
    // polygon and the multi edge kinds refuse too (outer and nested)
    refuses(le(_.put(1.toByte), _.putInt(3), _.putInt(1), _.putInt(3),
      _.putDouble(0), _.putDouble(0), _.putDouble(1), _.putDouble(0),
      _.putDouble(0), _.putDouble(0)))
    refuses(le(_.put(1.toByte), _.putInt(5), _.putInt(0)))
    refuses(le(_.put(1.toByte), _.putInt(6), _.putInt(0)))
  }

  test("refusals are loud: EWKB flags, SRID, collection, malformed") {
    def refuses(wkb: Array[Byte], frag: String): Unit = {
      val e = intercept[UnsupportedOperationException] {
        new GeoWkb.BBox().merge(wkb)
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // ISO offset beyond ZM (4001): not a defined dimension group
    refuses(le(_.put(1.toByte), _.putInt(4001), _.putDouble(1),
      _.putDouble(2), _.putDouble(3)), "unsupported WKB")
    // EWKB Z flag
    refuses(le(_.put(1.toByte), _.putInt(0x80000001), _.putDouble(1),
      _.putDouble(2), _.putDouble(3)), "unsupported WKB")
    // EWKB SRID flag
    refuses(le(_.put(1.toByte), _.putInt(0x20000001), _.putInt(4326),
      _.putDouble(1), _.putDouble(2)), "unsupported WKB")
    // GeometryCollection
    refuses(le(_.put(1.toByte), _.putInt(7), _.putInt(0)),
      "unsupported WKB geometry kind")
    // bad byte-order marker
    refuses(le(_.put(9.toByte), _.putInt(1), _.putDouble(1),
      _.putDouble(2)), "byte-order")
    // truncated coordinate run
    refuses(le(_.put(1.toByte), _.putInt(1), _.putDouble(1)), "truncated")
    // a hostile count that overflows Int*16 must refuse, not read past
    refuses(le(_.put(1.toByte), _.putInt(2), _.putInt(0x10000000)),
      "truncated")
    // one-sided NaN is corrupt data, not the empty-POINT convention —
    // skipping just the NaN side would emit an inverted/infinite bound
    refuses(point(5.0, Double.NaN), "NaN component")
    refuses(point(Double.NaN, 7.0), "NaN component")
    // negative counts refuse instead of silently reading as empty
    refuses(le(_.put(1.toByte), _.putInt(4), _.putInt(-1)),
      "negative multi-geometry count")
    refuses(le(_.put(1.toByte), _.putInt(3), _.putInt(-2)),
      "negative ring count")
    // trailing garbage after a complete geometry
    refuses(point(1, 2) ++ Array[Byte](0), "trailing")
    // multi nested deeper than one level (multi inside multi)
    val innerMp = le(_.put(1.toByte), _.putInt(4), _.putInt(1),
      _.put(point(1, 1)))
    refuses(le(_.put(1.toByte), _.putInt(4), _.putInt(1), _.put(innerMp)),
      "nesting")
  }

  test("pointWkb is the 21-byte little-endian spec encoding") {
    val p = GeoWkb.pointWkb(2.5, -1.0)
    assert(p.length == 21 && java.util.Arrays.equals(p, point(2.5, -1.0)))
    // and round-trips through the parser
    assert(box(p) == ((2.5, -1.0, 2.5, -1.0)))
  }

  // -- WriteTypeGuards over table metadata -----------------------------------

  private def meta(fieldsJson: String, specJson: String = "[]",
                   props: String = ""): TableMetadata =
    TableMetadata.fromJson(
      s"""{"format-version": 3, "location": "/t", $props
         |"schema": {"type": "struct", "schema-id": 0,
         |  "fields": [$fieldsJson]},
         |"partition-specs": [{"spec-id": 0, "fields": $specJson}],
         |"default-spec-id": 0,
         |"current-snapshot-id": -1, "snapshots": []}""".stripMargin)

  private val geoField =
    """{"id": 1, "name": "g", "required": false, "type": "geometry(srid:4326)"}"""
  private val kField =
    """{"id": 2, "name": "k", "required": false, "type": "long"}"""
  private val nsProps =
    s""""properties": {"${TableMetadata.NsAsBigintKey}": "true"},"""

  test("guards: top-level geo on parquet is writable; ORC/Avro refuse; " +
      "geo partition sources refuse") {
    val m = meta(s"$geoField, $kField")
    val g = WriteTypeGuards.forTable(m, "PARQUET")
    assert(g.refusals.isEmpty && g.geoByName == Map("g" -> "geometry(srid:4326)"))
    assert(WriteTypeGuards.forTable(m, "ORC").refusals
      .exists(_.contains("parquet")))
    assert(WriteTypeGuards.forTable(m, "AVRO").refusals
      .exists(_.contains("parquet")))
    val mPart = meta(s"$geoField, $kField",
      """[{"name": "g_p", "transform": "identity",
        |  "source-id": 1, "field-id": 1000}]""".stripMargin)
    assert(WriteTypeGuards.forTable(mPart, "PARQUET").refusals
      .exists(_.contains("partition")), "geo partition source must refuse")
  }

  test("guards: nested geo/ns refuse with the column named; top-level ns " +
      "maps its UTC flag by declared type") {
    val nested = meta(
      s"""{"id": 1, "name": "s", "required": false, "type": {
         |  "type": "struct", "fields": [
         |    {"id": 3, "name": "inner", "required": false,
         |     "type": "geometry"}]}}, $kField""".stripMargin)
    val g = WriteTypeGuards.forTable(nested, "PARQUET")
    assert(g.refusals.exists(m => m.contains("NESTED") && m.contains("s")),
      g.refusals.toString)
    assert(g.geoByName.isEmpty, "nested geo is not a bounds-tracked column")
    val ns = meta(
      s"""{"id": 1, "name": "a", "required": false, "type": "timestamp_ns"},
         |{"id": 2, "name": "b", "required": false,
         | "type": "timestamptz_ns"}""".stripMargin,
      props = nsProps)
    val gn = WriteTypeGuards.forTable(ns, "PARQUET")
    assert(gn.refusals.isEmpty &&
      gn.nsByName == Map("a" -> false, "b" -> true))
    // ns partition source refuses (no evaluable spec transform on the
    // BIGINT passthrough)
    val nsPart = meta(
      s"""{"id": 1, "name": "a", "required": false, "type": "timestamp_ns"}""",
      """[{"name": "a_d", "transform": "day",
        |  "source-id": 1, "field-id": 1000}]""".stripMargin,
      props = nsProps)
    assert(WriteTypeGuards.forTable(nsPart, "PARQUET").refusals
      .exists(_.contains("partition")))
  }
}
