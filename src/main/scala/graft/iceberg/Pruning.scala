package graft.iceberg

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Column statistics for one pruning container (a manifest's partition
  * summary or a data file's column bounds). `lower`/`upper` are decoded,
  * normalized values (see [[Pruning.normalize]]); counts are absent when
  * the writer didn't record them.
  */
final case class ColStats(
    lower: Option[Any],
    upper: Option[Any],
    nullCount: Option[Long],
    valueCount: Option[Long])

/** Statistics-based pruning: decide whether a container (manifest / data
  * file) *may* contain rows matching a pushed-down filter.
  *
  * Same decision procedure as the reference's `PruningPredicate` evaluation
  * over `PruneManifests` / `PruneDataFiles`
  * (`datafusion_iceberg/src/pruning_statistics.rs:34-196`, driven at
  * `table.rs:133-145`), re-expressed over Spark's `sources.Filter` algebra.
  *
  * Soundness invariant (SURVEY §7.4): every code path defaults to `true`
  * ("cannot exclude") on missing stats, unknown types, NaN bounds, or
  * decode failure — pruning is an optimization, never a semantics change.
  * Property-tested in `PruningSpec`.
  */
object Pruning {

  /** Normalize a pushed filter value to the canonical representation the
    * stats decoder produces: dates → epoch days (Int), timestamps → epoch
    * micros (Long), everything else native.
    */
  def normalize(v: Any): Any = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case t: java.time.Instant =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case t: java.time.LocalDateTime =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case d: java.math.BigDecimal => BigDecimal(d)
    case other => other
  }

  private def isNan(v: Any): Boolean = v match {
    case f: Float  => f.isNaN
    case d: Double => d.isNaN
    case _         => false
  }

  /** Typed three-way compare; None = incomparable (never prune on that). */
  def compare(a: Any, b: Any): Option[Int] = {
    if (isNan(a) || isNan(b)) return None
    (a, b) match {
      case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
      case (x: String, y: String)   => Some(x.compareTo(y))
      case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
      case (x: Array[Byte], y: Array[Byte]) =>
        // unsigned lexicographic, the parquet/iceberg binary ordering
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xff).compareTo(y(i) & 0xff)
          if (c != 0) return Some(c)
          i += 1
        }
        Some(x.length.compareTo(y.length))
      case (x: Number, y: Number) =>
        (x, y) match {
          case (fx: java.lang.Float, fy: java.lang.Float) => Some(fx.compareTo(fy))
          case _ if isIntegral(x) && isIntegral(y) =>
            Some(x.longValue.compareTo(y.longValue))
          case _ => Some(x.doubleValue.compareTo(y.doubleValue))
        }
      case _ => None
    }
  }

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
         _: java.lang.Byte => true
    case _ => false
  }

  /** May the container hold a row with column == v? */
  private def mayEqual(s: ColStats, v: Any): Boolean = {
    if (v == null) return mayBeNull(s)
    if (allNull(s)) return false
    val geLower = s.lower.forall(lo => compare(normalize(v), normalize(lo)).forall(_ >= 0))
    val leUpper = s.upper.forall(hi => compare(normalize(v), normalize(hi)).forall(_ <= 0))
    geLower && leUpper
  }

  private def mayBeNull(s: ColStats): Boolean = s.nullCount.forall(_ > 0)

  private def allNull(s: ColStats): Boolean =
    (for (n <- s.nullCount; t <- s.valueCount) yield n >= t && t > 0).getOrElse(false)

  /** Decide whether `filter` may match; `stats` returns the container's
    * stats for an attribute name, or None when unknown (→ keep).
    */
  def mayMatch(filter: Filter, stats: String => Option[ColStats]): Boolean = filter match {
    case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
    case Or(l, r)  => mayMatch(l, stats) || mayMatch(r, stats)
    case Not(EqualTo(col, v)) =>
      // only provably excludable when the container is constant == v
      stats(col).forall { s =>
        !(s.lower.isDefined && s.upper.isDefined &&
          compare(normalize(s.lower.get), normalize(v)).contains(0) &&
          compare(normalize(s.upper.get), normalize(v)).contains(0) &&
          !mayBeNull(s))
      }
    case Not(_) => true
    case EqualTo(col, v) => stats(col).forall(mayEqual(_, v))
    case EqualNullSafe(col, v) =>
      if (v == null) stats(col).forall(mayBeNull)
      else stats(col).forall(mayEqual(_, v))
    case In(col, vs) =>
      if (vs == null || vs.isEmpty) false
      else stats(col).forall(s => vs.exists(v => mayEqual(s, v)))
    case GreaterThan(col, v) =>
      stats(col).forall(s => !allNull(s) &&
        s.upper.forall(hi => compare(normalize(hi), normalize(v)).forall(_ > 0)))
    case GreaterThanOrEqual(col, v) =>
      stats(col).forall(s => !allNull(s) &&
        s.upper.forall(hi => compare(normalize(hi), normalize(v)).forall(_ >= 0)))
    case LessThan(col, v) =>
      stats(col).forall(s => !allNull(s) &&
        s.lower.forall(lo => compare(normalize(lo), normalize(v)).forall(_ < 0)))
    case LessThanOrEqual(col, v) =>
      stats(col).forall(s => !allNull(s) &&
        s.lower.forall(lo => compare(normalize(lo), normalize(v)).forall(_ <= 0)))
    case IsNull(col)    => stats(col).forall(mayBeNull)
    case IsNotNull(col) => stats(col).forall(s => !allNull(s))
    case StringStartsWith(col, prefix) =>
      stats(col).forall { s =>
        !allNull(s) && {
          // a string with this prefix exists in [lower, upper] iff
          // lower.take(n) <= prefix <= upper.take(n)
          val n = prefix.length
          val okLo = s.lower.forall {
            case lo: String => lo.take(n) <= prefix
            case _ => true
          }
          val okHi = s.upper.forall {
            case hi: String => prefix <= hi.take(n) ||
              (hi.length < n && hi == prefix.take(hi.length))
            case _ => true
          }
          okLo && okHi
        }
      }
    case AlwaysTrue()  => true
    case AlwaysFalse() => false
    case _ => true // StringContains, StringEndsWith, unknown: cannot prune
  }

  /** Conjunction over all pushed filters — the reference folds filters with
    * `conjunction(...)` before pruning (`table.rs:133-136`); ANDing the
    * per-filter verdicts is the same decision.
    */
  def mayMatchAll(filters: Seq[Filter], stats: String => Option[ColStats]): Boolean =
    filters.forall(mayMatch(_, stats))
}
