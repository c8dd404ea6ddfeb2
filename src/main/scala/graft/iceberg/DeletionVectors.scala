package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}

/** Iceberg v3 deletion-vector blob codec (`deletion-vector-v1` Puffin
  * blobs): a per-data-file set of deleted row positions, stored as a
  * 64-bit "portable" RoaringBitmap inside a checksummed frame. This is
  * the READ path that keeps v3-written tables scannable (current
  * upstream writers are moving position deletes to DVs); our own writers
  * still emit v2 position-delete files.
  *
  * Frame (Iceberg spec, deletion vectors):
  * {{{
  *   length (4 BE: magic + vector byte count) | magic D1 D3 39 64 |
  *   vector (portable 64-bit roaring) | CRC-32 of magic+vector (4 BE)
  * }}}
  *
  * Portable 64-bit roaring (RoaringFormatSpec): 8-byte LE bucket count,
  * then per bucket a 4-byte LE high-32 key + a standard 32-bit roaring
  * serialization (cookie 12346 without run containers / 12347 with;
  * array, bitmap, and run containers all handled below).
  */
object DeletionVectors {

  private val Magic: Array[Byte] =
    Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4
  val BlobType = "deletion-vector-v1"

  /** Decode a DV blob's deleted positions, ascending. Validates frame
    * length, magic, and CRC — a corrupt DV silently dropping deletes
    * would resurrect rows, so every mismatch is a hard error. */
  def decode(blob: Array[Byte]): Array[Long] = {
    require(blob.length >= 12, s"DV blob too short: ${blob.length} bytes")
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt
    require(len == blob.length - 8,
      s"DV frame length $len != payload ${blob.length - 8}")
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(magic.sameElements(Magic),
      s"bad DV magic: ${magic.map(b => f"$b%02X").mkString(" ")}")
    val vector = java.util.Arrays.copyOfRange(blob, 8, blob.length - 4)
    val crc = new java.util.zip.CRC32()
    crc.update(blob, 4, 4 + vector.length)
    val want = ByteBuffer.wrap(blob, blob.length - 4, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt
    require(crc.getValue.toInt == want,
      f"DV CRC mismatch: computed ${crc.getValue.toInt}%08X want $want%08X")
    decodePortable64(vector)
  }

  private def decodePortable64(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buckets = bb.getLong
    val out = Array.newBuilder[Long]
    var b = 0L
    while (b < buckets) {
      val high = bb.getInt.toLong & 0xFFFFFFFFL
      decode32(bb, pos => out += (high << 32) | (pos.toLong & 0xFFFFFFFFL))
      b += 1
    }
    out.result()
  }

  /** One 32-bit roaring bitmap, emitting each set value via `emit`. */
  private def decode32(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt
    val hasRuns = (cookie & 0xFFFF) == SerialCookie
    require(hasRuns || cookie == SerialCookieNoRun,
      s"unknown roaring cookie $cookie")
    val nContainers =
      if (hasRuns) (cookie >>> 16) + 1 else bb.getInt
    val runFlags: Array[Byte] =
      if (hasRuns) {
        val f = new Array[Byte]((nContainers + 7) / 8)
        bb.get(f); f
      } else Array.empty
    def isRun(i: Int): Boolean =
      hasRuns && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort.toInt & 0xFFFF
      cards(i) = (bb.getShort.toInt & 0xFFFF) + 1
      i += 1
    }
    // offset section present for the no-run cookie, and for the run
    // cookie once there are >= NoOffsetThreshold containers; the data is
    // sequential either way, so the offsets are skipped, not used
    if (!hasRuns || nContainers >= NoOffsetThreshold)
      bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort.toInt & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort.toInt & 0xFFFF
          val extra = bb.getShort.toInt & 0xFFFF // run covers [start, start+extra]
          var v = start
          while (v <= start + extra) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) { // bitmap container: 1024 LE longs
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          val wordBase = base | (w << 6)
          while (word != 0L) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            emit(wordBase | bit)
            word &= word - 1
          }
          w += 1
        }
      } else { // array container: cardinality sorted LE shorts
        var v = 0
        while (v < cards(i)) {
          emit(base | (bb.getShort.toInt & 0xFFFF))
          v += 1
        }
      }
      i += 1
    }
  }

  /** Encode positions as a framed DV blob. Emits the no-run cookie with
    * the standard roaring container choice per 65536-position chunk —
    * a sorted array of 16-bit lows up to 4096 entries, a 1024-long
    * bitmap above (a DELETE matching most of a row group produces dense
    * chunks, so the write path cannot live on array containers alone).
    * Run containers are a read-side-only concern here: the bitmap form
    * is at worst 8 KB per dense chunk and every roaring reader accepts
    * it, while emitting runs would add a second writer format for no
    * interop gain. */
  def encode(positions: Seq[Long]): Array[Byte] = {
    // the write path feeds per-file position arrays already sorted and
    // deduplicated (sortWithinPartitions + adjacent-skip); detect that in
    // one linear pass so the hot path skips the boxed distinct + re-sort
    // that fixture callers still need
    val isSortedDistinct = {
      var ok = true
      var prev = Long.MinValue
      var first = true
      val it = positions.iterator
      while (ok && it.hasNext) {
        val v = it.next()
        if (!first && prev >= v) ok = false
        prev = v; first = false
      }
      ok
    }
    val sorted = if (isSortedDistinct) positions else positions.distinct.sorted
    val byHigh = sorted.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val vec = new java.io.ByteArrayOutputStream()
    def le(n: Int, width: Int): Unit = {
      val b = ByteBuffer.allocate(width).order(ByteOrder.LITTLE_ENDIAN)
      if (width == 8) b.putLong(n.toLong) else if (width == 4) b.putInt(n)
      else b.putShort(n.toShort)
      vec.write(b.array())
    }
    le(byHigh.size, 8)
    byHigh.foreach { case (high, ps) =>
      le(high, 4)
      val low = ps.map(p => (p & 0xFFFFFFFFL).toInt)
      val containers = low.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      le(SerialCookieNoRun, 4)
      le(containers.size, 4)
      containers.foreach { case (k, vs) => le(k, 2); le(vs.size - 1, 2) }
      // offsets: container data start positions relative to this 32-bit
      // bitmap's first byte (cookie position)
      def bytesOf(vs: Seq[Int]): Int = if (vs.size > 4096) 8192 else 2 * vs.size
      var off = 4 + 4 + 4 * containers.size + 4 * containers.size
      containers.foreach { case (_, vs) => le(off, 4); off += bytesOf(vs) }
      containers.foreach { case (_, vs) =>
        if (vs.size > 4096) { // bitmap container: 1024 LE longs
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val bit = v & 0xFFFF
            words(bit >>> 6) |= 1L << (bit & 63)
          }
          val bb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
          words.foreach(bb.putLong)
          vec.write(bb.array())
        } else vs.foreach(v => le(v & 0xFFFF, 2))
      }
    }
    val vector = vec.toByteArray
    val out = ByteBuffer.allocate(4 + 4 + vector.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vector.length)
    out.put(Magic)
    out.put(vector)
    val crc = new java.util.zip.CRC32()
    crc.update(Magic)
    crc.update(vector)
    out.putInt(crc.getValue.toInt)
    out.array()
  }
}
