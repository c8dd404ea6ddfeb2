package graft.iceberg.connector

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.iceberg.IcebergWriter

/** Session extensions: the snapshot-ref DDL Spark's grammar lacks,
  * following the Iceberg SQL-extensions surface —
  *
  * {{{
  *   ALTER TABLE t CREATE BRANCH [IF NOT EXISTS] audit [AS OF VERSION <id>]
  *   ALTER TABLE t CREATE TAG    [IF NOT EXISTS] v1    [AS OF VERSION <id>]
  *   ALTER TABLE t DROP BRANCH [IF EXISTS] audit
  *   ALTER TABLE t DROP TAG    [IF EXISTS] v1
  * }}}
  *
  * so write-audit-publish is reachable from pure SQL: create the branch,
  * `SET spark.wap.branch = audit`, run INSERT/DELETE statements (staged
  * on the branch), audit via `VERSION AS OF 'audit'`, publish with
  * [[IcebergWriter.fastForward]]. Register via
  * `spark.sql.extensions=graft.iceberg.connector.GraftSparkExtensions`.
  *
  * Everything else falls through to the delegate parser verbatim — the
  * intercept keys on the `ALTER TABLE … CREATE/DROP BRANCH/TAG` shape,
  * which stock Spark rejects, so no accepted statement changes meaning.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // schema-shaping changelog read options (compute-updates,
    // row-lineage, columns) rewrite the relation's output at analysis —
    // a DSv2 Table.schema() cannot see options, and the micro-batch
    // planner never calls pruneColumns (see GraftChangelogReshapeRule)
    ext.injectResolutionRule(_ => GraftChangelogReshapeRule)
  }
}

final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateRefRe(table, kind, ifNot, name, version) =>
      GraftCreateRefCommand(delegate.parseMultipartIdentifier(table),
        kind.toLowerCase, unquote(name), ifNot != null,
        Option(version).map(_.toLong))
    case DropRefRe(table, kind, ifExists, name) =>
      GraftDropRefCommand(delegate.parseMultipartIdentifier(table),
        kind.toLowerCase, unquote(name), ifExists != null)
    case CallRe(catalog, proc, args) =>
      GraftCallCommand(unquote(catalog), proc.toLowerCase,
        GraftProcedures.splitArgs(args).map(GraftProcedures.parseArg))
    case AddPartFieldRe(table, expr, asName) =>
      GraftAddPartitionFieldCommand(delegate.parseMultipartIdentifier(table),
        expr.trim, Option(asName).map(unquote))
    case DropPartFieldRe(table, expr) =>
      GraftDropPartitionFieldCommand(delegate.parseMultipartIdentifier(table),
        expr.trim)
    case ReplacePartFieldRe(table, oldExpr, newExpr, asName) =>
      GraftReplacePartitionFieldCommand(
        delegate.parseMultipartIdentifier(table),
        oldExpr.trim, newExpr.trim, Option(asName).map(unquote))
    case WriteOrderedRe(table, cols) =>
      GraftWriteOrderedByCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.parseSortCols(cols))
    case WriteUnorderedRe(table) =>
      GraftWriteUnorderedCommand(delegate.parseMultipartIdentifier(table))
    case SetIdFieldsRe(table, cols) =>
      GraftSetIdentifierFieldsCommand(delegate.parseMultipartIdentifier(table),
        GraftSqlParser.parseNameList(cols))
    case DropIdFieldsRe(table, cols) =>
      GraftDropIdentifierFieldsCommand(delegate.parseMultipartIdentifier(table),
        Option(cols).map(GraftSqlParser.parseNameList).getOrElse(Nil))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** `(?i)` case-insensitive, `(?s)` dot-matches-newline: builder-authored
    * SQL often spans lines. Table identifier is captured lazily up to the
    * CREATE/DROP keyword and re-parsed by the delegate, so quoting and
    * multi-part names behave exactly like everywhere else. */
  private[connector] val CreateRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+CREATE\s+(BRANCH|TAG)\s+""" +
      """(?:(IF\s+NOT\s+EXISTS)\s+)?([\w`]+)""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r
  private[connector] val DropRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+(BRANCH|TAG)\s+""" +
      """(?:(IF\s+EXISTS)\s+)?([\w`]+)\s*;?\s*$""").r
  /** `CALL cat.system.proc(args)` — stock Spark has no CALL statement, so
    * the intercept cannot change an accepted statement's meaning. */
  private[connector] val CallRe =
    """(?is)^\s*CALL\s+([\w`]+)\s*\.\s*system\s*\.\s*(\w+)\s*\((.*)\)\s*;?\s*$""".r
  /** `ALTER TABLE t ADD PARTITION FIELD bucket(4, id) [AS name]` — the
    * Iceberg partition-evolution DDL; stock Spark rejects the statement
    * (its ADD PARTITION takes a `(spec)` value list, not FIELD). */
  private[connector] val AddPartFieldRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+PARTITION\s+FIELD\s+""" +
      """([\w`]+(?:\s*\([^()]*\))?)(?:\s+AS\s+([\w`]+))?\s*;?\s*$""").r
  private[connector] val DropPartFieldRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+PARTITION\s+FIELD\s+""" +
      """([\w`]+(?:\s*\([^()]*\))?)\s*;?\s*$""").r
  /** `ALTER TABLE t REPLACE PARTITION FIELD old WITH new [AS name]` —
    * drop + add in ONE metadata commit. */
  private[connector] val ReplacePartFieldRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+REPLACE\s+PARTITION\s+FIELD\s+""" +
      """([\w`]+(?:\s*\([^()]*\))?)\s+WITH\s+([\w`]+(?:\s*\([^()]*\))?)""" +
      """(?:\s+AS\s+([\w`]+))?\s*;?\s*$""").r
  /** `ALTER TABLE t WRITE ORDERED BY (a ASC, b DESC)` — sort-order
    * evolution (Iceberg SQL-extensions shape; stock Spark rejects it). */
  private[connector] val WriteOrderedRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+ORDERED\s+BY\s+""" +
      """\(?\s*([^();]+?)\s*\)?\s*;?\s*$""").r
  private[connector] val WriteUnorderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+UNORDERED\s*;?\s*$""".r
  /** `ALTER TABLE t SET IDENTIFIER FIELDS a, b` / `... (a, b)` — the
    * Iceberg SQL-extensions identifier-field DDL (stock Spark rejects
    * the statement). Declares the spec's `identifier-field-ids`. */
  private[connector] val SetIdFieldsRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+SET\s+IDENTIFIER\s+FIELDS\s+""" +
      """\(?\s*([^();]+?)\s*\)?\s*;?\s*$""").r
  /** `ALTER TABLE t DROP IDENTIFIER FIELDS [a, b]` — remove named
    * fields from the declaration, or clear it when no names given. */
  private[connector] val DropIdFieldsRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+IDENTIFIER\s+FIELDS""" +
      """(?:\s+\(?\s*([^();]+?)\s*\)?)?\s*;?\s*$""").r

  /** "a, `b`, c" → Seq("a", "b", "c") — bare column-name lists. */
  private[connector] def parseNameList(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { tok =>
      require(tok.matches("`[^`]+`|[\\w]+"), s"bad column name: '$tok'")
      tok.stripPrefix("`").stripSuffix("`")
    }

  /** "a ASC, b DESC, c" → Seq(("a","asc"), ("b","desc"), ("c","asc")). */
  private[connector] def parseSortCols(s: String): Seq[(String, String)] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { tok =>
      val parts = tok.split("\\s+")
      val dir =
        if (parts.length > 1 && parts(1).equalsIgnoreCase("DESC")) "desc"
        else "asc"
      require(parts.length <= 2 &&
        (parts.length == 1 || parts(1).matches("(?i)ASC|DESC")),
        s"bad sort token: '$tok' (expected col [ASC|DESC])")
      (parts(0).stripPrefix("`").stripSuffix("`"), dir)
    }

  private def unquote(name: String): String = name.stripPrefix("`").stripSuffix("`")

  /** Resolve a statement's multipart table name to (GraftCatalog,
    * Identifier, its SparkIcebergTable) through the session's catalog
    * manager — same head-is-a-catalog rule the analyzer uses. */
  private[graft] def resolveTable(spark: SparkSession, parts: Seq[String])
      : (GraftCatalog, Identifier, SparkIcebergTable) = {
    require(parts.nonEmpty, "empty table name")
    val cm = spark.sessionState.catalogManager
    val (plugin, rest) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    val cat = plugin match {
      case g: GraftCatalog => g
      case other => throw new UnsupportedOperationException(
        s"this DDL needs an Iceberg (GraftCatalog) table; " +
          s"'${parts.mkString(".")}' resolves via catalog '${other.name}'")
    }
    val ns = if (rest.length > 1) rest.init else cm.currentNamespace.toSeq
    val ident = Identifier.of(ns.toArray, rest.last)
    cat.loadTable(ident) match {
      case t: SparkIcebergTable => (cat, ident, t)
      case _ => throw new UnsupportedOperationException(
        s"this DDL targets a table, not a view: ${parts.mkString(".")}")
    }
  }
}

/** `ALTER TABLE t CREATE BRANCH|TAG name [AS OF VERSION id]` — a
  * metadata-only `set-snapshot-ref` commit through the table's committer
  * ([[IcebergWriter.createRef]]). Unlike the create-or-move API, the DDL
  * refuses to MOVE an existing ref (that is what `replace` would say). */
final case class GraftCreateRefCommand(table: Seq[String], refType: String,
    refName: String, ifNotExists: Boolean, asOfVersion: Option[Long])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    val meta = t.table.metadata
    if (meta.refs.contains(refName)) {
      if (ifNotExists) return Nil
      throw new IllegalArgumentException(
        s"ref '$refName' already exists on ${table.mkString(".")} " +
          s"(${if (meta.tagRefs.contains(refName)) "tag" else "branch"})")
    }
    val snapId = asOfVersion.getOrElse(meta.currentSnapshotId.filter(_ != -1L)
      .getOrElse(throw new IllegalStateException(
        s"${table.mkString(".")} has no snapshot to anchor $refType " +
          s"'$refName' to — write to the table first")))
    IcebergWriter.createRef(t.table.conf, t.table.tableDir, refName, snapId,
      refType, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t DROP BRANCH|TAG name` — `remove-snapshot-ref`. The
  * declared kind must match the ref's actual type: dropping a tag via
  * DROP BRANCH (or vice versa) is refused, mirroring upstream Iceberg. */
final case class GraftDropRefCommand(table: Seq[String], refType: String,
    refName: String, ifExists: Boolean)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    val meta = t.table.metadata
    if (!meta.refs.contains(refName)) {
      if (ifExists) return Nil
      throw new IllegalArgumentException(
        s"ref '$refName' not found on ${table.mkString(".")} " +
          s"(have: ${meta.refs.keys.mkString(", ")})")
    }
    val actual = if (meta.tagRefs.contains(refName)) "tag" else "branch"
    require(actual == refType,
      s"ref '$refName' is a $actual — use DROP ${actual.toUpperCase}")
    IcebergWriter.dropRef(t.table.conf, t.table.tableDir, refName,
      t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t ADD PARTITION FIELD expr [AS name]` — partition
  * evolution ([[graft.iceberg.PartitionEvolution]]): a metadata-only
  * add-spec + set-default-spec commit; no data file moves. */
final case class GraftAddPartitionFieldCommand(table: Seq[String],
    expr: String, asName: Option[String]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.PartitionEvolution.addField(
      t.table.tableDir, t.table.conf, expr, asName, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t DROP PARTITION FIELD expr` — the inverse commit; data
  * written under the old spec keeps its layout (and its pruning). */
final case class GraftDropPartitionFieldCommand(table: Seq[String],
    expr: String) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.PartitionEvolution.dropField(
      t.table.tableDir, t.table.conf, expr, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t REPLACE PARTITION FIELD old WITH new [AS name]` — one
  * commit, so concurrent writes never see a half-evolved spec. */
final case class GraftReplacePartitionFieldCommand(table: Seq[String],
    oldExpr: String, newExpr: String, asName: Option[String])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.PartitionEvolution.replaceField(
      t.table.tableDir, t.table.conf, oldExpr, newExpr, asName, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t WRITE ORDERED BY (a, b DESC)` — sort-order evolution
  * ([[graft.iceberg.SortOrderEvolution]]): future writes range-cluster +
  * sort by the new order; no data file moves on the DDL itself. */
final case class GraftWriteOrderedByCommand(table: Seq[String],
    cols: Seq[(String, String)]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.SortOrderEvolution.writeOrderedBy(
      t.table.tableDir, t.table.conf, cols, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t WRITE UNORDERED` — future writes stop sorting. */
final case class GraftWriteUnorderedCommand(table: Seq[String])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.SortOrderEvolution.writeUnordered(
      t.table.tableDir, t.table.conf, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t SET IDENTIFIER FIELDS a, b` — declare the schema's
  * `identifier-field-ids` ([[graft.iceberg.SchemaEvolution.setIdentifierFields]]):
  * a new-schema metadata commit, no data movement. */
final case class GraftSetIdentifierFieldsCommand(table: Seq[String],
    cols: Seq[String]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.SchemaEvolution.setIdentifierFields(
      t.table.tableDir, t.table.conf, cols, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}

/** `ALTER TABLE t DROP IDENTIFIER FIELDS [a, b]` — remove named fields
  * from the declaration (bare form clears it). */
final case class GraftDropIdentifierFieldsCommand(table: Seq[String],
    cols: Seq[String]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident, t) = GraftSqlParser.resolveTable(spark, table)
    graft.iceberg.SchemaEvolution.dropIdentifierFields(
      t.table.tableDir, t.table.conf, cols, t.committerOpt)
    cat.invalidateTable(ident)
    Nil
  }
}
