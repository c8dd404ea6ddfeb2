package graft.iceberg.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.iceberg.PartitionTransforms

/** DataSource V2 function catalog entries for the Iceberg partition
  * transforms (`bucket`, `truncate`, `years/months/days/hours`).
  *
  * These exist for STORAGE-PARTITIONED JOINS: when two tables are
  * partitioned by the same transform of their join key, Catalyst proves
  * the two scans co-partitioned by resolving each side's reported
  * `KeyGroupedPartitioning` transform through the table catalog's
  * `FunctionCatalog` and comparing the bound functions' `canonicalName`
  * (`V2ExpressionUtils` → `TransformExpression.equivalentTo`). With the
  * proof in hand the join plans with ZERO shuffle — at 100 TB that is the
  * difference between a metadata decision and re-shuffling both fact
  * tables.
  *
  * Every function delegates to [[PartitionTransforms]] — the single
  * implementation the writer clusters by, the planner prunes with, and
  * (here) the function catalog evaluates. One murmur3, one truncation
  * rule, agreeing by construction; `bucket` is pinned to the spec's test
  * vectors in `PruningSpec`.
  *
  * The reference has no function catalog and no joins across Iceberg
  * partitioning (its engine plans single-table scans; SURVEY §2.A) — this
  * is extension surface.
  */
object GraftFunctions {

  /** Names served through `FunctionCatalog.loadFunction`. Spark's
    * `V2ExpressionUtils` looks transforms up by the DSv2 plural spellings
    * (`years(ts)`); the singular Iceberg spec spellings are aliased for
    * direct SQL use (`SELECT lakehouse.days(ts)`). */
  val names: Seq[String] =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "years" | "year" => Some(new TemporalUnbound("years", "year"))
    case "months" | "month" => Some(new TemporalUnbound("months", "month"))
    case "days" | "day" => Some(new TemporalUnbound("days", "day"))
    case "hours" | "hour" => Some(new TemporalUnbound("hours", "hour"))
    case _ => None
  }

  /** Value types the transforms accept — the types [[PartitionTransforms]]
    * computes over (Catalyst internal representations: dates = epoch-day
    * Int, timestamps = epoch-micro Long, strings = UTF8String). */
  private def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType | StringType => true
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Catalyst internal value → the JVM value [[PartitionTransforms.apply]]
    * expects (it normalizes dates/timestamps itself; internal Int/Long
    * already ARE epoch days/micros). */
  private def jvmValue(row: InternalRow, ordinal: Int, dt: DataType): Any =
    if (row.isNullAt(ordinal)) null
    else dt match {
      case IntegerType | DateType => row.getInt(ordinal)
      case LongType | TimestampType | TimestampNTZType => row.getLong(ordinal)
      case StringType => row.getUTF8String(ordinal).toString
      case other => throw new UnsupportedOperationException(
        s"partition transform over unsupported type $other")
    }

  /** JVM transform result → Catalyst internal (strings back to
    * UTF8String; numeric results already internal). */
  private[connector] def internalValue(v: Any): AnyRef = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case other => other.asInstanceOf[AnyRef]
  }

  /** `bucket(numBuckets, col)` — Iceberg spec Appendix B murmur3 bucket.
    * Bound per source type so `canonicalName` equality implies identical
    * hashing on both join sides. */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): Iceberg murmur3 bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        supported(inputType.fields(1).dataType),
        s"bucket expects (int numBuckets, value); got $inputType")
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  private final class BucketBound(valueType: DataType)
      extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${valueType.catalogString})"
    override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(0))
        throw new IllegalArgumentException("bucket: numBuckets is null")
      val n = input.getInt(0)
      val v = jvmValue(input, 1, valueType)
      if (v == null) return null
      // regex-free per-row entry: internal ints/longs/strings are already
      // in PartitionTransforms' normalized form
      PartitionTransforms.bucketValue(n, valueType, v) match {
        case Some(b: Int) => b
        case other => throw new IllegalStateException(
          s"bucket[$n] over $valueType produced $other")
      }
    }
  }

  /** `truncate(width, col)` — Iceberg truncate transform (ints/longs to
    * width multiples, strings to `width` code points). */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): Iceberg truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        supported(inputType.fields(1).dataType),
        s"truncate expects (int width, value); got $inputType")
      new TruncateBound(inputType.fields(1).dataType)
    }
  }

  private final class TruncateBound(valueType: DataType)
      extends ScalarFunction[AnyRef] {
    override def name(): String = "truncate"
    override def canonicalName(): String =
      s"graft.truncate(${valueType.catalogString})"
    override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
    override def resultType(): DataType = valueType
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef = {
      if (input.isNullAt(0))
        throw new IllegalArgumentException("truncate: width is null")
      val w = input.getInt(0)
      val v = jvmValue(input, 1, valueType)
      if (v == null) return null
      PartitionTransforms.truncateValue(w, v) match {
        case Some(r) => internalValue(r)
        case None => throw new IllegalStateException(
          s"truncate[$w] over $valueType not computable")
      }
    }
  }

  /** `years/months/days/hours(col)` over date/timestamp — offsets from
    * epoch, exactly the write-clustering and pruning arithmetic. */
  private final class TemporalUnbound(plural: String, spec: String)
      extends UnboundFunction {
    override def name(): String = plural
    override def description(): String =
      s"$plural(col): Iceberg $spec transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$plural expects (value)")
      val dt = inputType.fields(0).dataType
      val temporalOk = dt match {
        case DateType => spec != "hour" // hour of a date is undefined
        case TimestampType | TimestampNTZType => true
        case _ => false
      }
      require(temporalOk, s"$plural expects a date/timestamp; got $dt")
      new TemporalBound(plural, spec, dt)
    }
  }

  private final class TemporalBound(plural: String, spec: String,
      valueType: DataType) extends ScalarFunction[AnyRef] {
    override def name(): String = plural
    override def canonicalName(): String =
      s"graft.$plural(${valueType.catalogString})"
    override def inputTypes(): Array[DataType] = Array(valueType)
    /** Spec: `day` of a date stays date-typed (epoch days either way);
      * everything else is an int offset from epoch. */
    override def resultType(): DataType =
      PartitionTransforms.resultType(spec, valueType)
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef = {
      val v = jvmValue(input, 0, valueType)
      if (v == null) return null
      PartitionTransforms.apply(spec, valueType, v) match {
        case Some(r) => internalValue(r)
        case None => throw new IllegalStateException(
          s"$spec over $valueType not computable")
      }
    }
  }
}
