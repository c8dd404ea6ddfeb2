package graft.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Minimal writer/reader for the Puffin statistics-file format (Iceberg
  * spec, Puffin appendix) — the interoperable home for table-level NDV
  * sketches, referenced from table metadata's `statistics` field.
  *
  * Layout written (and accepted back):
  * {{{
  *   Magic | blob1 … blobN | Magic | FooterPayload | PayloadSize (4 LE) |
  *   Flags (4) | Magic
  * }}}
  * with `Magic = "PFA1"`, an uncompressed UTF-8 JSON footer payload
  * (flags = 0), and footer JSON `{"blobs": [...], "properties": {...}}`
  * where each blob entry carries `type`, `fields`, `snapshot-id`,
  * `sequence-number`, `offset`, `length`, and `properties`.
  *
  * Blob PAYLOAD: the spec's NDV blob type is
  * `apache-datasketches-theta-v1`. Columns with an update()-compatible
  * value encoding get a REAL DataSketches-compact sketch
  * ([[ThetaSketch.columnSketch]], golden-byte-pinned against the
  * published format), whose blob `ndv` property is the sketch's own
  * estimate — property and payload always agree. Column types WITHOUT
  * such an encoding fall back to [[thetaStandInPayload]], a DOCUMENTED
  * deterministic stand-in (magic-prefixed big-endian NDV) whose blob is
  * marked `graft.theta.stand-in = true` so an external engine can
  * detect it WITHOUT opening the payload: planners reading the `ndv`
  * property are unaffected; a cross-engine sketch MERGER seeing the
  * marker (or the stand-in magic) must re-analyze instead.
  *
  * MERGE COMPATIBILITY: real sketch blobs carry
  * `graft.theta.encoding = 2`, versioning the value→bytes hashing rule
  * (encoding 2 canonicalizes -0.0/NaN float/double array elements;
  * blobs written before the tag hashed them by raw IEEE bits). Two
  * sketches for the same column are mergeable only when their encoding
  * tags match — a merger seeing a missing or different tag must
  * re-analyze rather than union, or canonicalized and raw hashes of the
  * same value double-count.
  */
object Puffin {

  val Magic: Array[Byte] = Array('P'.toByte, 'F'.toByte, 'A'.toByte, '1'.toByte)
  val ThetaBlobType = "apache-datasketches-theta-v1"
  private val StandInMagic: Array[Byte] =
    Array('G'.toByte, 'F'.toByte, 'T'.toByte, 'S'.toByte)

  /** One blob to write: spec metadata + payload bytes. */
  final case class Blob(blobType: String, fields: Seq[Int], snapshotId: Long,
                        sequenceNumber: Long, payload: Array[Byte],
                        properties: Map[String, String])

  /** A written file's shape — what the metadata `statistics` entry
    * records about the container (callers mirror the blob list
    * themselves, since the metadata form also carries per-blob
    * snapshot/sequence fields this writer does not own). */
  final case class Written(path: String, fileSizeInBytes: Long,
                           footerSizeInBytes: Long)

  /** Deterministic stand-in payload for a theta NDV blob: StandInMagic +
    * big-endian ndv. See the object scaladoc for why this is not a
    * DataSketches binary. */
  def thetaStandInPayload(ndv: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(StandInMagic.length + 8)
    bb.put(StandInMagic).putLong(ndv)
    bb.array()
  }

  def write(path: Path, conf: Configuration, blobs: Seq[Blob],
            fileProperties: Map[String, String] = Map.empty): Written = {
    val mapper = new ObjectMapper()
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val footerBlobs = mapper.createArrayNode()
      blobs.foreach { b =>
        out.write(b.payload)
        val e = footerBlobs.addObject()
        e.put("type", b.blobType)
        val fl = e.putArray("fields")
        b.fields.foreach(fl.add)
        e.put("snapshot-id", b.snapshotId)
        e.put("sequence-number", b.sequenceNumber)
        e.put("offset", offset)
        e.put("length", b.payload.length.toLong)
        val p = e.putObject("properties")
        b.properties.foreach { case (k, v) => p.put(k, v) }
        offset += b.payload.length
      }
      val footer = mapper.createObjectNode()
      footer.set[JsonNode]("blobs", footerBlobs)
      val fp = footer.putObject("properties")
      fileProperties.foreach { case (k, v) => fp.put(k, v) }
      val payload = mapper.writeValueAsString(footer)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length).putInt(0) // flags = 0: uncompressed footer
      out.write(tail.array())
      out.write(Magic)
      val fileSize = offset + Magic.length + payload.length + 8 + Magic.length
      Written(path.toString, fileSize,
        // spec: footer size = everything after the blobs
        Magic.length + payload.length + 8L + Magic.length)
    } finally out.close()
  }

  /** Parsed footer: the blob-metadata JSON array (type/fields/offset/
    * length/properties per entry). Validates both magics and rejects a
    * compressed footer (we never write one). */
  def readFooter(path: Path, conf: Configuration): JsonNode = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0, head)
      require(head.sameElements(Magic), s"$path is not a Puffin file")
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val bb = java.nio.ByteBuffer.wrap(tail)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt
      val flags = bb.getInt
      require((flags & 1) == 0, s"$path: compressed Puffin footer unsupported")
      val magic2 = new Array[Byte](4)
      bb.get(magic2)
      require(magic2.sameElements(Magic), s"$path: bad trailing Puffin magic")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      new ObjectMapper().readTree(
        new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  /** Raw payload bytes of one blob (by the footer's offset/length). */
  def readBlob(path: Path, conf: Configuration, offset: Long,
               length: Int): Array[Byte] = {
    val in = path.getFileSystem(conf).open(path)
    try {
      val buf = new Array[Byte](length)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  /** Decode [[thetaStandInPayload]]; None for any other payload (e.g. a
    * real DataSketches sketch written by another engine). */
  def decodeStandIn(payload: Array[Byte]): Option[Long] =
    if (payload.length == StandInMagic.length + 8 &&
        payload.take(4).sameElements(StandInMagic))
      Some(java.nio.ByteBuffer.wrap(payload, 4, 8).getLong)
    else None
}
