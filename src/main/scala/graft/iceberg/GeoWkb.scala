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
  * Scope (loud by design): ISO WKB kinds 1–6 (Point, LineString,
  * Polygon, MultiPoint, MultiLineString, MultiPolygon) in 2D or with
  * ISO Z/M/ZM ordinates (+1000/+2000/+3000 type offsets — the bound
  * stays the x/y box, extra ordinates are strided over), either byte
  * order. EWKB flag bits (Z/M/SRID), GeometryCollection, and malformed
  * buffers THROW `UnsupportedOperationException` — a silently-guessed
  * bound would corrupt pruning for every spatial-capable reader of the
  * manifest. Empty geometries (zero points / NaN point coordinates)
  * contribute nothing to the box.
  *
  * GEOGRAPHY columns additionally restrict to Point/MultiPoint
  * (`pointsOnly`): a vertex min/max box is exact for points, but a
  * GEODESIC edge is not contained by its vertices' planar box — an edge
  * from x=170 to x=-170 lies in the longitude band that box excludes,
  * and geodesics bow poleward above their endpoints' latitude — so a
  * vertex box recorded for linestrings/polygons would make spatial
  * readers prune files that hold matching rows. Edge-bearing geography
  * kinds refuse loudly (use a geodesic-capable writer).
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
    def merge(wkb: Array[Byte]): Unit = merge(wkb, pointsOnly = false)
    def merge(wkb: Array[Byte], pointsOnly: Boolean): Unit =
      GeoWkb.foreachCoord(wkb, this, pointsOnly)
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
  private def foreachCoord(wkb: Array[Byte], box: BBox,
                           pointsOnly: Boolean): Unit = {
    val buf = ByteBuffer.wrap(wkb)
    readGeom(buf, box, depth = 0, pointsOnly)
    if (buf.remaining() > 0) throw new UnsupportedOperationException(
      s"malformed WKB: ${buf.remaining()} trailing byte(s) after geometry")
  }

  private def readGeom(buf: ByteBuffer, box: BBox, depth: Int,
                       pointsOnly: Boolean): Unit = {
    if (depth > 1) throw new UnsupportedOperationException(
      "malformed WKB: multi-geometry nesting deeper than one level")
    if (buf.remaining() < 5) throw new UnsupportedOperationException(
      "malformed WKB: truncated header")
    buf.order(order(buf.get()))
    val rawType = buf.getInt()
    // EWKB flag bits (Z/M/SRID): refuse — the flag word changes the
    // layout (optional embedded SRID) in ways the ISO walk below cannot
    // honestly skip
    if ((rawType & 0xE0000000) != 0)
      throw new UnsupportedOperationException(
        s"unsupported WKB geometry (type word 0x${rawType.toHexString}): " +
          "EWKB flag bits (Z/M/SRID) are not supported for engine " +
          "writes — use ISO WKB or a spatial-capable writer")
    // ISO dimension offsets: +1000 = Z, +2000 = M, +3000 = ZM. The
    // manifest bound is the x/y box either way; the extra ordinates are
    // strided over with a deterministic per-point width.
    val dimGroup = rawType / 1000
    if (dimGroup > 3) throw new UnsupportedOperationException(
      s"unsupported WKB geometry (type word 0x${rawType.toHexString}): " +
        "type offset beyond ISO ZM — use a spatial-capable writer")
    val extraOrdinates = dimGroup match {
      case 1 | 2 => 1 // Z or M
      case 3 => 2     // ZM
      case _ => 0     // plain 2D
    }
    val kind = rawType % 1000
    val pointBytes = (2 + extraOrdinates) * 8L
    if (pointsOnly && kind != 1 && kind != 4)
      throw new UnsupportedOperationException(
        s"unsupported WKB for a GEOGRAPHY column (kind $kind): only " +
          "Point and MultiPoint are writable — a vertex box is exact for " +
          "points, but geodesic edges (linestrings/polygons) are not " +
          "contained by their vertices' planar box, so the recorded bound " +
          "would corrupt pruning; use a geodesic-capable writer")
    def needs(n: Long, what: String): Unit =
      if (n < 0 || buf.remaining() < n) throw new UnsupportedOperationException(
        s"malformed WKB: truncated $what")
    def readPoints(n: Int): Unit = {
      // Long arithmetic: a hostile/corrupt count like 0x10000000 would
      // overflow Int (n * 16 == 0) and slip past the bound check
      needs(n.toLong * pointBytes, s"coordinate run of $n point(s)")
      var i = 0
      while (i < n) {
        box.add(buf.getDouble(), buf.getDouble())
        var e = 0
        while (e < extraOrdinates) { buf.getDouble(); e += 1 }
        i += 1
      }
    }
    kind match {
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
        while (i < n) { readGeom(buf, box, depth + 1, pointsOnly); i += 1 }
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
