package graft.iceberg

import java.nio.charset.StandardCharsets

/** Theta NDV sketches in the Apache DataSketches compact binary format —
  * the payload the Iceberg spec mandates for Puffin
  * `apache-datasketches-theta-v1` blobs, implemented from the PUBLISHED
  * format documentation (datasketches.apache.org, "Theta Sketch
  * Framework" + the memory-layout appendix; the library itself is not on
  * this offline classpath):
  *
  *  - values hash through MurmurHash3 x64/128 (Appleby's public-domain
  *    function) with the DataSketches default update seed 9001, taking
  *    `h1 >>> 1` (63-bit positive); hash 0 is never retained;
  *  - the sketch is bottom-k over distinct hashes (nominal k = 4096):
  *    ≤ k distinct values is EXACT (theta = 2^63); beyond that the k
  *    smallest are retained and theta = the (k+1)-th smallest hash, so
  *    any reader computes `estimate = count / (theta / 2^63)`;
  *  - compact serialization, little-endian, serialization version 3,
  *    family 3 (COMPACT), flags READ_ONLY|COMPACT|ORDERED (+EMPTY):
  *    preamble 1 long when empty, 2 longs in exact mode (curCount),
  *    3 longs in estimation mode (curCount + thetaLong), then the
  *    retained hashes sorted ascending;
  *  - the 16-bit seed hash (bytes 6-7) is `murmur(seed)`'s low 16 bits —
  *    what lets another engine verify both sketches used the same seed
  *    before merging.
  *
  * Input encodings match the Java library's update() family so hashes
  * agree cross-engine: integral types as the 8-byte little-endian long,
  * floating point as `doubleToLongBits` (with -0.0 canonicalized to
  * 0.0), strings as UTF-8 bytes, binary as raw bytes.
  */
object ThetaSketch {

  val DefaultSeed = 9001L
  val DefaultNominal = 4096

  // -- MurmurHash3 x64/128 (public domain; Appleby) --------------------------

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** 128-bit murmur of `data`, returning (h1, h2). Little-endian block
    * packing, identical to hashing the equivalent long[] — which is how
    * the Java library hashes long inputs. */
  def murmur128(data: Array[Byte], seed: Long): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nBlocks = data.length / 16
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nBlocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nBlocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = data.length & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length.toLong; h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  // -- DataSketches value hashing --------------------------------------------

  /** 63-bit theta hash of raw bytes; 0 means "rejected" (never retained,
    * same as the library's screening). */
  def hashBytes(b: Array[Byte], seed: Long = DefaultSeed): Long =
    murmur128(b, seed)._1 >>> 1

  /** h1 of murmur128 over ONE 8-byte little-endian long, computed
    * directly from the value — an 8-byte input is a single tail block,
    * and the LE packing of a long IS the long, so the per-row UDFs this
    * feeds allocate nothing. Bit-identical to
    * `murmur128(leBytes(v), seed)` (asserted in the spec). */
  private def murmur128LongH1(v: Long, seed: Long): Long = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    var k1 = v
    k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
    h1 ^= 8L; h2 ^= 8L
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2
    h1
  }

  def hashLong(v: Long, seed: Long = DefaultSeed): Long =
    murmur128LongH1(v, seed) >>> 1

  def hashDouble(d: Double, seed: Long = DefaultSeed): Long =
    hashLong(java.lang.Double.doubleToLongBits(
      if (d == 0.0) 0.0 else d), seed) // canonicalizes -0.0, like update(double)

  def hashString(s: String, seed: Long = DefaultSeed): Long =
    if (s == null || s.isEmpty) 0L else hashBytes(s.getBytes(StandardCharsets.UTF_8), seed)

  /** The preamble's 16-bit seed hash: murmur of the seed itself (as one
    * long), low 16 bits — must be nonzero per the spec. */
  def computeSeedHash(seed: Long): Short = {
    val sh = (murmur128(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(seed).array(), 0L)
      ._1 & 0xffffL).toShort
    require(sh != 0, s"seed $seed produces seedHash 0 — pick another seed")
    sh
  }

  lazy val defaultSeedHash: Short = computeSeedHash(DefaultSeed)

  // -- compact sketch model --------------------------------------------------

  private val SerVer = 3
  private val FamilyCompact = 3
  private val FlagReadOnly = 2
  private val FlagEmpty = 4
  private val FlagCompact = 8
  private val FlagOrdered = 16

  /** An ordered compact theta sketch: `entries` sorted ascending, all
    * `< thetaLong`. `thetaLong = Long.MaxValue` ⇔ exact mode. */
  final case class Compact(entries: Array[Long], thetaLong: Long,
                           seedHash: Short) {
    def isEmpty: Boolean = entries.isEmpty && thetaLong == Long.MaxValue
    def estimate: Double =
      if (isEmpty) 0.0
      else entries.length / (thetaLong.toDouble / Long.MaxValue.toDouble)

    def serialize(): Array[Byte] = {
      val preLongs =
        if (isEmpty) 1 else if (thetaLong == Long.MaxValue) 2 else 3
      val bb = java.nio.ByteBuffer
        .allocate(preLongs * 8 + entries.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val flags = FlagReadOnly | FlagCompact | FlagOrdered |
        (if (isEmpty) FlagEmpty else 0)
      bb.put(preLongs.toByte).put(SerVer.toByte).put(FamilyCompact.toByte)
        .put(0.toByte).put(0.toByte).put(flags.toByte).putShort(seedHash)
      if (!isEmpty) {
        bb.putInt(entries.length).putInt(0)
        if (thetaLong != Long.MaxValue) bb.putLong(thetaLong)
        entries.foreach(bb.putLong)
      }
      bb.array()
    }
  }

  /** Build from DISTINCT sorted-ascending 63-bit hashes (zeros already
    * screened): exact when ≤ k remain, else bottom-k with theta = the
    * (k+1)-th smallest. `hashes` may exceed k+1; only the prefix is
    * consulted. */
  def fromSortedHashes(hashes: Array[Long], k: Int = DefaultNominal,
                       seedHash: Short = defaultSeedHash): Compact =
    if (hashes.length <= k) Compact(hashes, Long.MaxValue, seedHash)
    else Compact(hashes.take(k), hashes(k), seedHash)

  // -- distributed per-column sketch build ------------------------------------

  /** The theta sketch of one DataFrame column, built distributed: hash
    * map-side (partial-aggregated distinct), then `orderBy(h).limit(k+1)`
    * — Spark's TakeOrdered, a per-partition bottom-k that returns at most
    * k+1 fixed-width longs to the driver no matter the corpus size. One
    * job per analyzed column, paid only at ANALYZE time.
    *
    * None only for column types with no deterministic value encoding at
    * all (variant, unknown — callers fall back to the documented
    * stand-in payload, marked `graft.theta.stand-in` in the blob
    * properties). Nested arrays/structs/maps build REAL mergeable
    * payloads through [[canonicalEncoder]]'s documented frames.
    * Dates hash as their epoch-day long, timestamps as epoch-micros —
    * stated here because the Java library has no update(date); engines
    * merging across writers must agree on the scalar encoding anyway.
    * Booleans and decimals hash through their Iceberg single-value
    * BINARY serialization (boolean: one byte 0x00/0x01; decimal: the
    * minimal big-endian two's-complement unscaled bytes) — the encoding
    * the Puffin spec grounds column values in — via update(byte[]).
    */
  def columnSketch(df: org.apache.spark.sql.DataFrame, c: String,
                   k: Int = DefaultNominal): Option[Compact] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val hashCol: Option[org.apache.spark.sql.Column] =
      df.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          Some(udf((v: java.lang.Long) =>
            if (v == null) 0L else hashLong(v)).apply(col(c).cast("long")))
        case DateType =>
          // epoch-day long (CAST(date AS int) is rejected by Spark's
          // analyzer; unix_date is the supported conversion)
          Some(udf((v: java.lang.Long) =>
            if (v == null) 0L else hashLong(v))
            .apply(expr(s"unix_date(`$c`)").cast("long")))
        case TimestampType =>
          // TRUE epoch-micros (CAST(ts AS long) yields SECONDS —
          // sub-second precision would silently collapse the NDV)
          Some(udf((v: java.lang.Long) =>
            if (v == null) 0L else hashLong(v))
            .apply(expr(s"unix_micros(`$c`)")))
        case TimestampNTZType =>
          // NTZ has no instant; pin the encoding to its UTC reading so
          // the hash is session-timezone-independent
          Some(udf((v: java.lang.Long) =>
            if (v == null) 0L else hashLong(v))
            .apply(expr(s"unix_micros(to_utc_timestamp(`$c`, 'UTC'))")))
        case DoubleType | FloatType =>
          Some(udf((v: java.lang.Double) =>
            if (v == null) 0L else hashDouble(v)).apply(col(c).cast("double")))
        case StringType =>
          Some(udf((s: String) => hashString(s)).apply(col(c)))
        case BinaryType =>
          Some(udf((b: Array[Byte]) =>
            if (b == null || b.isEmpty) 0L else hashBytes(b)).apply(col(c)))
        case BooleanType =>
          Some(udf((v: java.lang.Boolean) =>
            if (v == null) 0L
            else hashBytes(Array[Byte](if (v) 1 else 0))).apply(col(c)))
        case _: DecimalType =>
          Some(udf((v: java.math.BigDecimal) =>
            if (v == null) 0L
            else hashBytes(v.unscaledValue.toByteArray)).apply(col(c)))
        case dt @ (_: ArrayType | _: StructType | _: MapType)
            if canonicalEncoder(dt).isDefined =>
          // Nested values hash through a canonical byte form grounded in
          // the Iceberg SINGLE-VALUE binary serialization of each leaf
          // (the same encoding bounds and defaults use), composed by the
          // frames documented on [[canonicalEncoder]]. Length prefixes
          // keep the form INJECTIVE (["ab","c"] never collides with
          // ["a","bc"]); null markers separate [null] from []. An
          // external engine agreeing on this composition (leaf encoding
          // is spec-fixed; the frames are documented here) merges these
          // sketches like any scalar column's — with ONE documented
          // deviation from raw single-value bytes: float/double leaves
          // canonicalize -0.0 to 0.0 and NaN to the canonical bit
          // pattern before encoding, so NDV agrees with SQL DISTINCT; a
          // merging engine must canonicalize identically, and sketches
          // persisted before round 15 hash -0.0/NaN elements differently.
          val enc = canonicalEncoder(dt).get
          val f = new org.apache.spark.sql.api.java.UDF1[Any, java.lang.Long] {
            override def call(v: Any): java.lang.Long =
              if (v == null) 0L else hashBytes(enc(v))
          }
          Some(udf(f, LongType).apply(col(c)))
        case _ => None
      }
    hashCol.map { h =>
      val hashes = df.select(h.as("__h")).filter(col("__h") =!= 0L)
        .distinct().orderBy(col("__h")).limit(k + 1)
        .collect().map(_.getLong(0))
      fromSortedHashes(hashes, k)
    }
  }

  /** Canonical injective byte encoding of one external (UDF-visible)
    * value of type `dt`, for nested-column NDV hashing. Leaves use the
    * Iceberg SINGLE-VALUE binary serialization (kept in lockstep with
    * [[SingleValue.encode]]'s coverage), temporal leaves their spec
    * scalar (date = int32-LE epoch days, timestamp[_ntz] = int64-LE
    * epoch micros, NTZ read at UTC — session-timezone-independent by
    * construction). Composite frames (each documented so an external
    * merger can reproduce them):
    *   array:  int32-LE(length) ++ per element:
    *             0x00 (null) | 0x01 ++ int32-LE(|bytes|) ++ bytes
    *   struct: int32-LE(arity) ++ per field, in schema order, same
    *             null-marked length-prefixed form
    *   map:    entries sorted by key bytes (unsigned lexicographic —
    *             maps are unordered, so the frame canonicalizes):
    *             int32-LE(size) ++ per entry:
    *               int32-LE(|key|) ++ key ++
    *               0x00 (null value) | 0x01 ++ int32-LE(|val|) ++ val
    * The array frame is byte-identical to the round-14 flat-array frame,
    * so existing flat-array sketches stay mergeable under encoding tag 2;
    * struct/map/nested-array sketches are NEW under that tag (those
    * columns only ever had marked stand-ins before). None only for types
    * with no deterministic encoding (variant, unknown). */
  private[iceberg] def canonicalEncoder(dt: org.apache.spark.sql.types.DataType)
      : Option[Any => Array[Byte]] = {
    import org.apache.spark.sql.types._
    def le(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(b); b.array()
    }
    def le32(n: Int): Array[Byte] = le(4)(_.putInt(n))
    def frameInto(out: java.io.ByteArrayOutputStream,
                  enc: Any => Array[Byte], v: Any): Unit =
      if (v == null) out.write(0)
      else {
        val b = enc(v)
        out.write(1); out.write(le32(b.length)); out.write(b)
      }
    // unsigned lexicographic byte compare (shorter prefix sorts first)
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    dt match {
      case ArrayType(et, _) =>
        canonicalEncoder(et).map { enc => (v: Any) =>
          val a = v.asInstanceOf[scala.collection.Seq[Any]]
          val out = new java.io.ByteArrayOutputStream()
          out.write(le32(a.length))
          a.foreach(e => frameInto(out, enc, e))
          out.toByteArray
        }
      case s: StructType =>
        val encs = s.fields.map(f => canonicalEncoder(f.dataType))
        if (encs.exists(_.isEmpty)) None
        else Some { (v: Any) =>
          val r = v.asInstanceOf[org.apache.spark.sql.Row]
          val out = new java.io.ByteArrayOutputStream()
          out.write(le32(encs.length))
          var i = 0
          while (i < encs.length) {
            frameInto(out, encs(i).get, r.get(i))
            i += 1
          }
          out.toByteArray
        }
      case m: MapType =>
        for {
          ke <- canonicalEncoder(m.keyType)
          ve <- canonicalEncoder(m.valueType)
        } yield { (v: Any) =>
          val mp = v.asInstanceOf[scala.collection.Map[Any, Any]]
          val entries = mp.toArray.map { case (k, mv) => (ke(k), mv) }
            .sortWith((a, b) => cmpBytes(a._1, b._1) < 0)
          val out = new java.io.ByteArrayOutputStream()
          out.write(le32(entries.length))
          entries.foreach { case (kb, mv) =>
            out.write(le32(kb.length)); out.write(kb)
            frameInto(out, ve, mv)
          }
          out.toByteArray
        }
      case DateType =>
        Some { v =>
          val epochDay = v match {
            case d: java.sql.Date => d.toLocalDate.toEpochDay
            case d: java.time.LocalDate => d.toEpochDay
            case other => throw new IllegalArgumentException(
              s"unexpected external date value: ${other.getClass}")
          }
          le(4)(_.putInt(epochDay.toInt))
        }
      case TimestampType =>
        Some { v =>
          val micros = v match {
            case t: java.sql.Timestamp =>
              math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
            case t: java.time.Instant =>
              math.multiplyExact(t.getEpochSecond, 1000000L) + t.getNano / 1000L
            case other => throw new IllegalArgumentException(
              s"unexpected external timestamp value: ${other.getClass}")
          }
          le(8)(_.putLong(micros))
        }
      case TimestampNTZType =>
        Some { v =>
          val t = v.asInstanceOf[java.time.LocalDateTime]
          le(8)(_.putLong(math.multiplyExact(
            t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
            t.getNano / 1000L))
        }
      case p => primitiveEncoder(p)
    }
  }

  /** Iceberg single-value BINARY encoder for one non-temporal primitive
    * leaf — the round-14 element encodings, unchanged (golden-byte-pinned
    * in ThetaSketchSpec). */
  private def primitiveEncoder(et: org.apache.spark.sql.types.DataType)
      : Option[Any => Array[Byte]] = {
    import org.apache.spark.sql.types._
    def le(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(b); b.array()
    }
    et match {
      case ByteType | ShortType | IntegerType =>
        Some(v => le(4)(_.putInt(v.asInstanceOf[Number].intValue)))
      case LongType =>
        Some(v => le(8)(_.putLong(v.asInstanceOf[Number].longValue)))
      case FloatType =>
        // NOT the raw IEEE bytes: -0.0 normalizes to 0.0 and NaN to the
        // canonical bit pattern (floatToIntBits does the latter), so
        // array-element NDV agrees with SQL DISTINCT semantics — the
        // same normalization the scalar path's hashDouble applies
        Some(v => le(4)(_.putInt(java.lang.Float.floatToIntBits {
          val f = v.asInstanceOf[Number].floatValue
          if (f == 0.0f) 0.0f else f
        })))
      case DoubleType =>
        Some(v => le(8)(_.putLong(java.lang.Double.doubleToLongBits {
          val d = v.asInstanceOf[Number].doubleValue
          if (d == 0.0) 0.0 else d
        })))
      case StringType =>
        Some(v => v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case BinaryType => Some(v => v.asInstanceOf[Array[Byte]])
      case BooleanType =>
        Some(v => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0))
      case _: DecimalType =>
        Some(v => v.asInstanceOf[java.math.BigDecimal]
          .unscaledValue.toByteArray)
      case _ => None
    }
  }

  /** Parse a compact theta sketch (ours or another engine's — any
    * serVer-3 compact form). Loud on layout violations. */
  def deserialize(bytes: Array[Byte]): Compact = {
    require(bytes.length >= 8, s"theta sketch too short: ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val preLongs = bb.get(0) & 0x3f
    val serVer = bb.get(1) & 0xff
    val family = bb.get(2) & 0xff
    val flags = bb.get(5) & 0xff
    val seedHash = bb.getShort(6)
    require(serVer == SerVer, s"unsupported theta serVer $serVer")
    require(family == FamilyCompact, s"not a compact theta sketch: family $family")
    require((flags & 1) == 0, "big-endian theta sketch unsupported")
    if ((flags & FlagEmpty) != 0 || bytes.length == 8)
      return Compact(Array.empty, Long.MaxValue, seedHash)
    if (preLongs == 1) {
      // DataSketches' SINGLE-ITEM form: preLongs 1, EMPTY clear, one
      // retained hash directly after the preamble (16 bytes total) —
      // misreading it as empty would report NDV 0 for NDV 1
      require(bytes.length >= 16,
        s"single-item theta sketch truncated: ${bytes.length} bytes")
      return Compact(Array(bb.getLong(8)), Long.MaxValue, seedHash)
    }
    val count = bb.getInt(8)
    val thetaLong = if (preLongs >= 3) bb.getLong(16) else Long.MaxValue
    val dataOff = preLongs * 8
    require(bytes.length >= dataOff + count * 8,
      s"theta sketch truncated: $count entries, ${bytes.length} bytes")
    val entries = Array.tabulate(count)(i => bb.getLong(dataOff + i * 8))
    Compact(entries, thetaLong, seedHash)
  }
}
