package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB (well-known binary) coordinate extraction for the write
  * path's geo bounds: the Iceberg v3 spec records a geometry/geography
  * column's per-file `lower_bounds`/`upper_bounds` as bounding-box
  * POINTs serialized as (x, y) WKB — computable from the stored WKB
  * coordinates alone, no geometry library needed (the reference prunes
  * binary-family columns the same bytes-in/bytes-out way,
  * `pruning_statistics.rs:233-238`).
  *
  * Scope (loud by design): 2D ISO WKB kinds 1–6 (Point, LineString,
  * Polygon, MultiPoint, MultiLineString, MultiPolygon), either byte
  * order. Z/M kinds (ISO +1000/+2000/+3000 or EWKB flag bits),
  * GeometryCollection, EWKB-embedded SRIDs, and malformed buffers THROW
  * `UnsupportedOperationException` — a silently-guessed bound would
  * corrupt pruning for every spatial-capable reader of the manifest.
  * Empty geometries (zero points / NaN point coordinates) contribute
  * nothing to the box.
  */
private[graft] object GeoWkb {

  /** Running bounding box over many WKB values (one per open data file
    * per geo column). Start empty; `merge` each non-null value.
    */
  final class BBox {
    var minX: Double = Double.PositiveInfinity
    var minY: Double = Double.PositiveInfinity
    var maxX: Double = Double.NegativeInfinity
    var maxY: Double = Double.NegativeInfinity
    def isEmpty: Boolean = minX > maxX
    def add(x: Double, y: Double): Unit = {
      val xn = java.lang.Double.isNaN(x)
      val yn = java.lang.Double.isNaN(y)
      // one-sided NaN is NOT the empty-POINT convention, it is corrupt
      // data: silently skipping just the NaN side would emit an
      // inverted/infinite POINT bound (non-empty minX..maxX with
      // minY=+Inf) that spatial readers would prune by — refuse loudly
      if (xn != yn) throw new UnsupportedOperationException(
        "malformed WKB: coordinate pair with a single NaN component")
      if (xn) return // (NaN, NaN): the conventional empty POINT, skipped
      if (x < minX) minX = x
      if (x > maxX) maxX = x
      if (y < minY) minY = y
      if (y > maxY) maxY = y
    }
    def merge(wkb: Array[Byte]): Unit = GeoWkb.foreachCoord(wkb, this)
  }

  private def order(b: Byte): ByteOrder = b match {
    case 0 => ByteOrder.BIG_ENDIAN
    case 1 => ByteOrder.LITTLE_ENDIAN
    case other => throw new UnsupportedOperationException(
      s"malformed WKB: byte-order marker $other (expected 0 or 1)")
  }

  /** Walk one WKB geometry (possibly nested multi-*), feeding every
    * coordinate pair into `box`. Throws on unsupported kinds.
    */
  private def foreachCoord(wkb: Array[Byte], box: BBox): Unit = {
    val buf = ByteBuffer.wrap(wkb)
    readGeom(buf, box, depth = 0)
    if (buf.remaining() > 0) throw new UnsupportedOperationException(
      s"malformed WKB: ${buf.remaining()} trailing byte(s) after geometry")
  }

  private def readGeom(buf: ByteBuffer, box: BBox, depth: Int): Unit = {
    if (depth > 1) throw new UnsupportedOperationException(
      "malformed WKB: multi-geometry nesting deeper than one level")
    if (buf.remaining() < 5) throw new UnsupportedOperationException(
      "malformed WKB: truncated header")
    buf.order(order(buf.get()))
    val rawType = buf.getInt()
    // EWKB flag bits (Z/M/SRID) and ISO Z/M offsets: refuse — the box
    // below would silently drop dimensions a spatial reader expects
    if ((rawType & 0xE0000000) != 0 || rawType >= 1000)
      throw new UnsupportedOperationException(
        s"unsupported WKB geometry (type word 0x${rawType.toHexString}): " +
          "only 2D ISO kinds 1-6 are supported for engine writes — Z/M " +
          "coordinates, embedded SRIDs, and extended kinds need a " +
          "spatial-capable writer")
    def needs(n: Long, what: String): Unit =
      if (n < 0 || buf.remaining() < n) throw new UnsupportedOperationException(
        s"malformed WKB: truncated $what")
    def readPoints(n: Int): Unit = {
      // Long arithmetic: a hostile/corrupt count like 0x10000000 would
      // overflow Int (n * 16 == 0) and slip past the bound check
      needs(n.toLong * 16, s"coordinate run of $n point(s)")
      var i = 0
      while (i < n) { box.add(buf.getDouble(), buf.getDouble()); i += 1 }
    }
    rawType match {
      case 1 => // Point
        readPoints(1)
      case 2 => // LineString
        needs(4, "LineString count"); readPoints(buf.getInt())
      case 3 => // Polygon
        needs(4, "Polygon ring count")
        val rings = buf.getInt()
        if (rings < 0) throw new UnsupportedOperationException(
          s"malformed WKB: negative ring count $rings")
        var r = 0
        while (r < rings) {
          needs(4, "ring count"); readPoints(buf.getInt()); r += 1
        }
      case 4 | 5 | 6 => // Multi{Point,LineString,Polygon}: nested WKBs
        needs(4, "multi-geometry count")
        val n = buf.getInt()
        if (n < 0) throw new UnsupportedOperationException(
          s"malformed WKB: negative multi-geometry count $n")
        var i = 0
        while (i < n) { readGeom(buf, box, depth + 1); i += 1 }
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported WKB geometry kind $other: only Point, LineString, " +
            "Polygon and their Multi- forms are supported for engine " +
            "writes — use a spatial-capable writer for this value")
    }
  }

  /** A 2D point as 21-byte little-endian ISO WKB — the spec's encoding
    * for a geo column's bounding-box lower/upper manifest bounds. */
  def pointWkb(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    bb.array()
  }
}
