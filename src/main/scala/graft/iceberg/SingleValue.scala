package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** Iceberg single-value serialization decoder: the byte layout used for
  * manifest `lower_bounds` / `upper_bounds` and partition-summary bounds.
  *
  * Same role as the reference's `bytes_to_any` + `any_iter_to_array`
  * (`datafusion_iceberg/src/pruning_statistics.rs:198-243`), covering the
  * same scalar set. Layout per the Iceberg spec Appendix D: fixed-width
  * values little-endian, strings UTF-8, binary raw, decimals unscaled
  * big-endian.
  *
  * Decoding is *advisory*: callers must treat `None` as "no statistics" and
  * never prune on doubt (SURVEY §7.4 hard-parts rule).
  */
object SingleValue {

  def decode(bytes: Array[Byte], dt: DataType): Option[Any] = {
    if (bytes == null) return None
    def le(n: Int): Option[ByteBuffer] =
      if (bytes.length < n) None
      else Some(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))
    try dt match {
      case BooleanType => bytes.headOption.map(_ != 0)
      case IntegerType => le(4).map(_.getInt)
      case DateType    => le(4).map(_.getInt)           // days since epoch
      case LongType    => le(8).map(_.getLong)
      case TimestampType | TimestampNTZType => le(8).map(_.getLong) // micros
      case FloatType   => le(4).map(_.getFloat)
      case DoubleType  => le(8).map(_.getDouble)
      case StringType  => Some(new String(bytes, StandardCharsets.UTF_8))
      case BinaryType  => Some(bytes)
      case d: DecimalType =>
        Some(BigDecimal(BigInt(bytes), d.scale)) // unscaled big-endian
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Inverse of [[decode]] for the writer: encodes a JVM value (post-
    * [[Pruning.normalize]] — dates as epoch-day Int, timestamps as micros
    * Long) into the spec's single-value byte layout. None = type not
    * encodable → the writer records no bound (advisory stats, never
    * required). */
  def encode(v: Any, dt: DataType): Option[Array[Byte]] = {
    if (v == null) return None
    def le(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
      fill(b); b.array()
    }
    try dt match {
      case BooleanType => Some(Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte))
      case IntegerType | DateType =>
        Some(le(4)(_.putInt(v.asInstanceOf[Number].intValue)))
      case LongType | TimestampType | TimestampNTZType =>
        Some(le(8)(_.putLong(v.asInstanceOf[Number].longValue)))
      case FloatType  => Some(le(4)(_.putFloat(v.asInstanceOf[Number].floatValue)))
      case DoubleType => Some(le(8)(_.putDouble(v.asInstanceOf[Number].doubleValue)))
      case StringType => Some(v.toString.getBytes(StandardCharsets.UTF_8))
      case BinaryType => Some(v.asInstanceOf[Array[Byte]])
      case d: DecimalType =>
        Some(v.asInstanceOf[BigDecimal].underlying.unscaledValue.toByteArray)
      case _ => None
    } catch { case _: Exception => None }
  }
}
