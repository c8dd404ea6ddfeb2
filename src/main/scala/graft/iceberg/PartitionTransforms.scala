package graft.iceberg

import java.time.LocalDate

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Iceberg partition-transform evaluation for pruning: rewrites pushed
  * filters on SOURCE columns into filters on TRANSFORMED partition values
  * (the space manifest partition summaries and data-file partition tuples
  * live in), so `day(ts)` / `bucket(id)` / `truncate(s)` partitioned
  * tables prune instead of scanning everything.
  *
  * This goes beyond the reference, which supports only identity
  * (`v1.metadata.json:70`; SURVEY §2.C) — but at warehouse scale the
  * overwhelmingly common layouts are temporal and bucket transforms, so
  * refusing them turns manifest pruning off exactly where it matters.
  *
  * Soundness rules (the transform rewrite must never prune a matching
  * container):
  *  - temporal transforms and truncate are **monotone non-decreasing**,
  *    so `x > v ⟹ T(x) >= T(v)` (and dually) — strict bounds are relaxed
  *    to inclusive ones in transformed space;
  *  - bucket supports only equality/IN — `x = v ⟹ bucket(x) = bucket(v)`;
  *    its murmur3 hash follows the Iceberg spec exactly and is pinned
  *    against the spec's published test vectors (a wrong hash here would
  *    prune wrongly, unlike every other keep-by-default path);
  *  - anything not expressible returns None → the filter prunes nothing.
  */
object PartitionTransforms {

  private val TruncateRe = """truncate\[(\d+)\]""".r
  private val BucketRe = """bucket\[(\d+)\]""".r

  /** Virtual attribute name for partition-spec field `idx` — the key the
    * pruning stats functions serve transformed-space bounds under. */
  def virtualName(idx: Int): String = s"__graft_part_$idx"

  final case class FieldInfo(idx: Int, transform: String, sourceType: DataType)

  /** Spark type of the transformed value (= how summary bounds decode). */
  def resultType(transform: String, sourceType: DataType): DataType = transform match {
    case "identity" => sourceType
    case "year" | "month" | "hour" => IntegerType
    case "day" => if (sourceType == DateType) DateType else IntegerType
    case BucketRe(_) => IntegerType
    case TruncateRe(_) => sourceType
    case _ => NullType
  }

  private def isTemporal(t: String): Boolean =
    t == "year" || t == "month" || t == "day" || t == "hour"

  /** Monotone non-decreasing transforms admit range-filter rewrites. */
  def isMonotone(t: String): Boolean = t match {
    case "identity" => true
    case _ if isTemporal(t) => true
    case TruncateRe(_) => true
    case _ => false
  }

  /** Transforms where T(x) is null iff x is null, which is what makes an
    * IsNull/IsNotNull rewrite into transformed space sound. `void` (written
    * by v1 spec evolution when a partition field is dropped) maps EVERY
    * value to null, so treating its all-null stats as "source column is
    * all null" would wrongly prune files under IsNotNull; unknown future
    * transforms get the same refusal. */
  def isNullPreserving(t: String): Boolean = t match {
    case "identity" => true
    case _ if isTemporal(t) => true
    case TruncateRe(_) | BucketRe(_) => true
    case _ => false
  }

  /** Transform a filter value (post-[[Pruning.normalize]]: dates = epoch
    * days Int, timestamps = epoch micros Long). None = not computable →
    * do not rewrite.
    */
  def apply(transform: String, sourceType: DataType, raw: Any): Option[Any] = {
    if (raw == null) return Some(null)
    val v = Pruning.normalize(raw)
    transform match {
      case "identity" => Some(v)
      case t if isTemporal(t) =>
        val days: Option[Int] = (sourceType, v) match {
          case (DateType, d: Int) => Some(d)
          case (TimestampType | TimestampNTZType, us: Long) =>
            Some(Math.floorDiv(us, 86400000000L).toInt)
          case _ => None
        }
        t match {
          case "day" => days
          case "year" => days.map(d => LocalDate.ofEpochDay(d.toLong).getYear - 1970)
          case "month" => days.map { d =>
            val ld = LocalDate.ofEpochDay(d.toLong)
            (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
          }
          case "hour" => (sourceType, v) match {
            case (TimestampType | TimestampNTZType, us: Long) =>
              Some(Math.floorDiv(us, 3600000000L).toInt)
            case _ => None
          }
        }
      case TruncateRe(w) => truncateValue(w.toInt, v)
      case BucketRe(n) => bucketValue(n.toInt, sourceType, v)
      case _ => None
    }
  }

  /** `truncate[width]` on a NORMALIZED value — the regex-free entry for
    * per-row callers (the V2 `truncate` function above all). */
  def truncateValue(width: Int, v: Any): Option[Any] = v match {
    case null => Some(null)
    case i: Int => Some(i - Math.floorMod(i, width))
    case l: Long => Some(l - Math.floorMod(l, width.toLong))
    case s: String =>
      // Iceberg truncates strings by Unicode CODE POINTS, not UTF-16
      // units — take(width) would split surrogate pairs and produce a
      // wrong (unsoundly pruning) transformed value
      val cps = s.codePointCount(0, s.length)
      Some(if (cps <= width) s
           else s.substring(0, s.offsetByCodePoints(0, width)))
    case _ => None
  }

  /** `bucket[n]` on a NORMALIZED value — regex-free per-row entry. */
  def bucketValue(n: Int, sourceType: DataType, v: Any): Option[Any] =
    if (v == null) Some(null)
    else icebergHash(sourceType, v).map(h => Math.floorMod(h & Int.MaxValue, n))

  /** Iceberg bucket hash (spec Appendix B): murmur3_x86_32, seed 0.
    * int/long/date/time/timestamp hash as the 8-byte little-endian long;
    * string as UTF-8 bytes. Pinned against the spec's test vectors in
    * `PruningSpec`. */
  def icebergHash(sourceType: DataType, v: Any): Option[Int] = v match {
    case i: Int => Some(murmur3(longBytesLE(i.toLong)))
    case l: Long => Some(murmur3(longBytesLE(l)))
    case s: String => Some(murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    case _ => None // decimal/binary/uuid buckets: refuse → keep
  }

  private def longBytesLE(l: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((l >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** murmur3_x86_32, seed 0 — public-domain algorithm (Austin Appleby). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      var k = (data(i * 4) & 0xff) | ((data(i * 4 + 1) & 0xff) << 8) |
        ((data(i * 4 + 2) & 0xff) << 16) | ((data(i * 4 + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    var k = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k ^= (data(tail + 2) & 0xff) << 16
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case 2 =>
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case 1 =>
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case _ => ()
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** Rewrite a source-column filter into transformed partition space
    * (virtual attributes). None = nothing usable → prune nothing with it.
    *
    * `And`: a partially-rewritable conjunction keeps the rewritable side
    * (dropping a conjunct only widens the match set — sound). `Or` needs
    * both sides. `Not` is never rewritten (monotone transforms are not
    * injective, so `x != v` says nothing about `T(x)`).
    */
  def rewrite(f: Filter, fieldFor: String => Seq[FieldInfo]): Option[Filter] = {
    def one(col: String)(mk: FieldInfo => Option[Filter]): Option[Filter] = {
      val rewritten = fieldFor(col).flatMap(fi => mk(fi))
      if (rewritten.isEmpty) None else Some(rewritten.reduce(And(_, _)))
    }
    f match {
      case And(l, r) => (rewrite(l, fieldFor), rewrite(r, fieldFor)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
      case Or(l, r) => for {
        a <- rewrite(l, fieldFor)
        b <- rewrite(r, fieldFor)
      } yield Or(a, b)
      case EqualTo(c, v) => one(c)(fi =>
        apply(fi.transform, fi.sourceType, v).map(EqualTo(virtualName(fi.idx), _)))
      case EqualNullSafe(c, v) if v != null => one(c)(fi =>
        apply(fi.transform, fi.sourceType, v).map(EqualTo(virtualName(fi.idx), _)))
      case In(c, vs) if vs != null && vs.nonEmpty => one(c) { fi =>
        val tvs = vs.toSeq.map(v => apply(fi.transform, fi.sourceType, v))
        if (tvs.forall(_.isDefined)) Some(In(virtualName(fi.idx), tvs.flatten.toArray))
        else None
      }
      case GreaterThan(c, v) => one(c)(fi =>
        if (isMonotone(fi.transform))
          apply(fi.transform, fi.sourceType, v).map(GreaterThanOrEqual(virtualName(fi.idx), _))
        else None)
      case GreaterThanOrEqual(c, v) => one(c)(fi =>
        if (isMonotone(fi.transform))
          apply(fi.transform, fi.sourceType, v).map(GreaterThanOrEqual(virtualName(fi.idx), _))
        else None)
      case LessThan(c, v) => one(c)(fi =>
        if (isMonotone(fi.transform))
          apply(fi.transform, fi.sourceType, v).map(LessThanOrEqual(virtualName(fi.idx), _))
        else None)
      case LessThanOrEqual(c, v) => one(c)(fi =>
        if (isMonotone(fi.transform))
          apply(fi.transform, fi.sourceType, v).map(LessThanOrEqual(virtualName(fi.idx), _))
        else None)
      case IsNull(c) => one(c)(fi =>
        if (isNullPreserving(fi.transform)) Some(IsNull(virtualName(fi.idx))) else None)
      case IsNotNull(c) => one(c)(fi =>
        if (isNullPreserving(fi.transform)) Some(IsNotNull(virtualName(fi.idx))) else None)
      case _ => None
    }
  }
}
