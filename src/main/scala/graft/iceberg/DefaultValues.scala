package graft.iceberg

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg v3 column default values: the JSON single-value serialization
  * (spec Appendix D, "JSON single-value serialization") that `initial-default`
  * / `write-default` schema-field attributes carry, bridged to Spark's
  * column-default machinery.
  *
  * The bridge is deliberately thin:
  *
  *  - `initial-default` → the field's `EXISTS_DEFAULT` metadata: Spark's
  *    parquet (vectorized + parquet-mr, id- and name-resolved) and ORC
  *    readers fill a column ABSENT FROM THE FILE with it — per file, at
  *    footer-open time, which is exactly the spec's read rule ("used when
  *    reading files that do not contain the field") with zero plan-time
  *    IO at any table size. The Avro read path serves the same value
  *    through [[AvroDataRead.FieldSpec]] when per-file resolution finds
  *    the field absent.
  *  - `write-default` → the field's `CURRENT_DEFAULT` metadata: Spark's
  *    analyzer fills INSERTs that omit the column (or say `DEFAULT`), so
  *    data files always materialize the write-default and the writer
  *    needs no special casing.
  *
  * Values are primitives only — the spec defines single-value forms for
  * nested types, but a default on a struct/list/map column is refused
  * loudly here (no read path could fill it constant-per-file under
  * Spark's vectorized readers without falling off codegen).
  *
  * The reference predates v3 (its SchemaV2, `table.rs:371`, carries
  * identifier-field-ids but no field defaults); this follows the
  * published Iceberg v3 spec directly.
  */
object DefaultValues {

  private val TzFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'")
  private val NtzFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** Parse a JSON single value of Iceberg type `icebergType` (textual
    * form, e.g. "long", "decimal(9, 2)") into the CATALYST-internal value
    * of the Spark type this engine maps it to. Loud on unsupported types
    * or malformed values — a silently-dropped default reads wrong data. */
  def jsonToCatalyst(node: JsonNode, icebergType: String): Any = {
    def refuse(why: String): Nothing = throw new IllegalArgumentException(
      s"cannot read default value $node of iceberg type $icebergType: $why")
    if (node == null || node.isNull) refuse("JSON null (absent means no default)")
    icebergType match {
      case "boolean" => node.asBoolean
      case "int"     => node.asInt
      case "long"    => node.asLong
      case "float"   => node.floatValue
      case "double"  => node.asDouble
      case "date"    => LocalDate.parse(node.asText).toEpochDay.toInt
      case "time"    => LocalTime.parse(node.asText).toNanoOfDay / 1000L
      case "timestamp" =>
        val ldt = LocalDateTime.parse(node.asText)
        ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case "timestamptz" =>
        val i = OffsetDateTime.parse(node.asText).toInstant
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      // nanosecond timestamps reach here ONLY under the BIGINT-nanos
      // read opt-in (the type parse refused otherwise): the default
      // serves as epoch NANOS, matching the column's read representation
      case "timestamp_ns" =>
        val ldt = LocalDateTime.parse(node.asText)
        Math.addExact(Math.multiplyExact(
          ldt.toEpochSecond(ZoneOffset.UTC), 1000000000L), ldt.getNano.toLong)
      case "timestamptz_ns" =>
        val i = OffsetDateTime.parse(node.asText).toInstant
        Math.addExact(Math.multiplyExact(
          i.getEpochSecond, 1000000000L), i.getNano.toLong)
      case "string" | "uuid" => UTF8String.fromString(node.asText)
      case t if t == "binary" || t.startsWith("fixed") =>
        val hex = node.asText
        if (hex.length % 2 != 0) refuse("odd-length hex")
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      case t if t.startsWith("decimal") =>
        val dt = TableMetadata.primitive(t).asInstanceOf[DecimalType]
        Decimal(new java.math.BigDecimal(node.asText)
          .setScale(dt.scale), dt.precision, dt.scale)
      case other => refuse(s"no single-value form implemented for $other")
    }
  }

  /** The Spark SQL literal string of a JSON single value — what the
    * schema's `EXISTS_DEFAULT` / `CURRENT_DEFAULT` field metadata carries
    * (Catalyst `Literal.sql` round-trips through Spark's parser). */
  def jsonToSql(node: JsonNode, icebergType: String): String = {
    // nanosecond columns only exist Spark-side under the BIGINT-nanos
    // read opt-in; this call is only reached when that parse succeeded,
    // so resolve their type the same way instead of re-refusing here
    val dt = TableMetadata.primitive(icebergType,
      nsAsBigint = TableMetadata.isNsType(icebergType))
    Literal(jsonToCatalyst(node, icebergType), dt).sql
  }

  /** Serialize a CATALYST-internal value back to the spec's JSON single
    * value for `icebergType` — the emission side of [[jsonToCatalyst]]. */
  def catalystToJson(mapper: ObjectMapper, value: Any,
                     icebergType: String): JsonNode = {
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"cannot write default value of iceberg type $icebergType: $why")
    if (value == null) refuse("NULL is expressed by omitting the default")
    val nf = mapper.getNodeFactory
    icebergType match {
      case "boolean" => nf.booleanNode(value.asInstanceOf[Boolean])
      case "int"     => nf.numberNode(value.asInstanceOf[Number].intValue)
      case "long"    => nf.numberNode(value.asInstanceOf[Number].longValue)
      case "float"   => nf.numberNode(value.asInstanceOf[Number].floatValue)
      case "double"  => nf.numberNode(value.asInstanceOf[Number].doubleValue)
      case "date"    =>
        nf.textNode(LocalDate.ofEpochDay(
          value.asInstanceOf[Number].longValue).toString)
      case "time"    =>
        nf.textNode(LocalTime.ofNanoOfDay(
          value.asInstanceOf[Number].longValue * 1000L)
          .format(DateTimeFormatter.ISO_LOCAL_TIME))
      case "timestamp" =>
        val us = value.asInstanceOf[Number].longValue
        nf.textNode(LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
          .format(NtzFmt))
      case "timestamptz" =>
        val us = value.asInstanceOf[Number].longValue
        nf.textNode(OffsetDateTime.ofInstant(
          Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L), ZoneOffset.UTC)
          .format(TzFmt))
      case "string" | "uuid" => nf.textNode(value.toString)
      case t if t == "binary" || t.startsWith("fixed") =>
        nf.textNode(value.asInstanceOf[Array[Byte]]
          .map(b => f"${b & 0xff}%02X").mkString)
      case t if t.startsWith("decimal") =>
        nf.textNode(value.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString)
      case other => refuse(s"no single-value form implemented for $other")
    }
  }

  /** Analyze a DDL-provided default (connector `DefaultValue` — SQL
    * string and/or connector expression) against the COLUMN's type and
    * fold it to the Catalyst-internal constant the metadata will record.
    * Non-constant or ill-typed defaults refuse with Spark's own error. */
  def analyzeDefault(colName: String, dt: DataType,
      dv: org.apache.spark.sql.connector.catalog.DefaultValue,
      statement: String): Any = {
    val expr: Expression = org.apache.spark.sql.catalyst.util
      .ResolveDefaultColumns.analyze(colName, dt, dv, statement)
    require(expr.foldable,
      s"default for $colName must be a constant expression, got: $expr")
    expr.eval(null)
  }

  /** Analyze a default stored as a SQL string (the `CURRENT_DEFAULT` /
    * `EXISTS_DEFAULT` field-metadata form) to its Catalyst constant. */
  def analyzeSql(colName: String, dt: DataType, sql: String,
                 statement: String): Any = {
    val expr: Expression = org.apache.spark.sql.catalyst.util
      .ResolveDefaultColumns.analyze(colName, dt, sql, statement)
    require(expr.foldable,
      s"default for $colName must be a constant expression, got: $sql")
    expr.eval(null)
  }

  /** DDL-side support gate: nested types have no constant-per-file fill
    * path, and BINARY constants are refused by Spark's vectorized
    * parquet reader's default-fill ("data type is not supported") — a
    * binary default would poison every later read of pre-column files.
    * Refused AT DECLARATION, loudly; parsing stays liberal so foreign
    * metadata carrying one still loads (it only matters when a file
    * actually misses the column). */
  def requireDefaultable(name: String, dt: DataType, what: String): Unit = dt match {
    case _: StructType | _: ArrayType | _: MapType =>
      throw new UnsupportedOperationException(
        s"$what $name: defaults are supported on primitive columns only")
    case BinaryType =>
      throw new UnsupportedOperationException(
        s"$what $name: BINARY defaults are not supported (Spark's " +
          "vectorized readers cannot fill binary constants for files " +
          "written before the column existed)")
    case VariantType | NullType =>
      throw new UnsupportedOperationException(
        s"$what $name: VARIANT / VOID columns cannot carry defaults " +
          "(the spec's single-value serialization has no encoding for " +
          "them; unknown columns are always null)")
    case _ => ()
  }

  /** READ-schema form of a table schema: a REQUIRED column carrying an
    * initial-default must be declared nullable AT THE READER — Spark's
    * parquet/ORC readers refuse a missing required column ("Required
    * column is missing in data file") before consulting EXISTS_DEFAULT.
    * The values actually served are the non-null default, so only the
    * reader-facing declaration relaxes; the table schema (and the write
    * path's NOT NULL enforcement) keeps `required`. */
  def relaxForRead(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      if (!f.nullable && f.metadata.contains("EXISTS_DEFAULT"))
        f.copy(nullable = true)
      else f))

  /** The EXTERNAL (Row-visible) form of a field's `EXISTS_DEFAULT`, for
    * readers that assemble external Rows themselves (the Avro data
    * path): None when the field declares no initial default. */
  def existenceDefaultExternal(f: StructField): Option[Any] =
    if (!f.metadata.contains("EXISTS_DEFAULT")) None
    else {
      val internal = analyzeSql(f.name, f.dataType,
        f.metadata.getString("EXISTS_DEFAULT"), "READ")
      Some(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(f.dataType)(internal))
    }
}
