package graft.iceberg.connector

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.iceberg.IcebergWriter

/** `CALL catalog.system.<procedure>(...)` — the SQL face of the
  * maintenance and CDC APIs, following the Iceberg procedure surface so a
  * lakehouse operator never needs the Scala API:
  *
  * {{{
  *   CALL cat.system.expire_snapshots(table => 'ns.t', older_than => <ms|'ISO'>, retain_last => 2)
  *   CALL cat.system.remove_orphan_files(table => 'ns.t', older_than => <ms|'ISO'>)
  *   CALL cat.system.rewrite_data_files(table => 'ns.t', target_file_size_bytes => 134217728)
  *   CALL cat.system.fast_forward(table => 'ns.t', branch => 'main', to => 'audit')
  *   CALL cat.system.rollback_to_snapshot(table => 'ns.t', snapshot_id => 123)
  *   CALL cat.system.create_changelog_view(table => 'ns.t', changelog_view => 'v'
  *     [, start_snapshot_id => ..., end_snapshot_id => ...]
  *     [, net_changes => 1 | compute_updates => 1])
  *   CALL cat.system.add_files(table => 'ns.t', source => '/dir/or/glob' [, branch => 'b'])
  * }}}
  *
  * Args are named (`name => value`) or positional; values are `'strings'`
  * (doubled-quote escape) or integer literals. Timestamps accept epoch
  * millis or an ISO-8601 / `yyyy-MM-dd HH:mm:ss` UTC string. Each
  * procedure returns a small result row (counts / snapshot ids), so
  * effects are observable from SQL. The reference has no procedures at
  * all — extension surface.
  */
object GraftProcedures {

  final case class Arg(name: Option[String], value: Any) // String | Long

  /** Split a CALL arg list at top-level commas ('' escapes a quote). */
  def splitArgs(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        sb.append(c)
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { sb.append('\''); i += 1 }
          else inQ = false
        }
      } else c match {
        case '\'' => inQ = true; sb.append(c)
        case ',' => out += sb.toString; sb.clear()
        case _ => sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private val NamedRe = """(?s)^(\w+)\s*=>\s*(.+)$""".r

  def parseArg(raw: String): Arg = raw match {
    case NamedRe(n, v) => Arg(Some(n.toLowerCase), parseValue(v.trim))
    case v => Arg(None, parseValue(v))
  }

  private def parseValue(v: String): Any =
    if (v.startsWith("'") && v.endsWith("'") && v.length >= 2)
      v.substring(1, v.length - 1).replace("''", "'")
    else v.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"CALL argument must be a 'string' or an integer literal: $v"))

  /** Bind args to the procedure's declared parameter names (positional
    * fill the first unbound names in order). */
  def bind(proc: String, params: Seq[String], args: Seq[Arg]): Map[String, Any] = {
    val named = args.collect { case Arg(Some(n), v) => n -> v }
    named.map(_._1).foreach(n => require(params.contains(n),
      s"$proc has no parameter '$n' (takes: ${params.mkString(", ")})"))
    require(named.map(_._1).distinct.size == named.size,
      s"$proc: duplicate named argument")
    val positional = args.collect { case Arg(None, v) => v }
    val free = params.filterNot(named.map(_._1).contains)
    require(positional.size <= free.size,
      s"$proc takes at most ${params.size} arguments")
    (named ++ free.zip(positional)).toMap
  }

  /** Epoch millis from a long or a UTC timestamp string. */
  def toMillis(v: Any, what: String): Long = v match {
    case l: Long => l
    case s: String =>
      try java.time.Instant.parse(s).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    case other => throw new IllegalArgumentException(
      s"$what must be epoch millis or a timestamp string, got $other")
  }

  def str(m: Map[String, Any], k: String, proc: String): String =
    m.getOrElse(k, throw new IllegalArgumentException(
      s"$proc requires $k")) match {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$proc: $k must be a string, got $other")
    }

  def lng(m: Map[String, Any], k: String, proc: String): Long =
    m.getOrElse(k, throw new IllegalArgumentException(
      s"$proc requires $k")) match {
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$proc: $k must be an integer, got $other")
    }
}

/** One command for every procedure: output schema switches on the name so
  * results read naturally from SQL. */
final case class GraftCallCommand(catalogName: String, procedure: String,
    rawArgs: Seq[GraftProcedures.Arg]) extends LeafRunnableCommand {
  import GraftProcedures._

  private def attr(n: String, t: org.apache.spark.sql.types.DataType) =
    AttributeReference(n, t, nullable = false)()

  override val output: Seq[Attribute] = procedure match {
    case "expire_snapshots" => Seq(attr("expired_count", IntegerType))
    case "remove_orphan_files" => Seq(attr("deleted_count", IntegerType))
    case "rewrite_data_files" => Seq(attr("snapshot_id", LongType))
    case "rewrite_manifests" => Seq(attr("snapshot_id", LongType))
    case "fast_forward" => Seq(attr("branch", StringType),
      attr("previous_snapshot_id", LongType), attr("current_snapshot_id", LongType))
    case "rollback_to_snapshot" | "rollback_to_timestamp" =>
      Seq(attr("previous_snapshot_id", LongType),
        attr("current_snapshot_id", LongType))
    case "create_changelog_view" => Seq(attr("changelog_view", StringType))
    case "add_files" => Seq(attr("added_files_count", IntegerType),
      attr("snapshot_id", LongType))
    case "rewrite_position_delete_files" =>
      Seq(attr("rewritten_delete_files_count", IntegerType),
        attr("removed_data_files_count", IntegerType),
        attr("snapshot_id", LongType))
    case "cherrypick_snapshot" =>
      Seq(attr("source_snapshot_id", LongType),
        attr("current_snapshot_id", LongType))
    case "convert_equality_deletes" =>
      Seq(attr("converted_equality_files_count", IntegerType),
        attr("position_delete_rows_count", LongType),
        attr("snapshot_id", LongType))
    case "compute_partition_stats" =>
      Seq(attr("statistics_path", StringType))
    case "analyze_table" =>
      Seq(attr("analyzed_columns_count", IntegerType),
        attr("snapshot_id", LongType))
    case "create_mv" =>
      Seq(attr("source_snapshot_id", LongType))
    case "refresh_mv" =>
      Seq(attr("refreshed_through_snapshot_id", LongType),
        attr("refreshed", IntegerType))
    case "snapshot" => Seq(attr("snapshot_id", LongType))
    case "register_table" =>
      Seq(attr("snapshot_count", IntegerType),
        attr("current_snapshot_id", LongType))
    case "rebuild_vector_index" =>
      Seq(attr("index_epoch", StringType),
        attr("postings_count", LongType))
    case other => throw new UnsupportedOperationException(
      s"unknown procedure system.$other (have: expire_snapshots, " +
        "remove_orphan_files, rewrite_data_files, rewrite_manifests, " +
        "fast_forward, rollback_to_snapshot, rollback_to_timestamp, " +
        "cherrypick_snapshot, create_changelog_view, add_files, " +
        "rewrite_position_delete_files, convert_equality_deletes, " +
        "analyze_table, compute_partition_stats, create_mv, refresh_mv, " +
        "snapshot, register_table, rebuild_vector_index)")
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val params: Seq[String] = procedure match {
      case "expire_snapshots" => Seq("table", "older_than", "retain_last")
      case "remove_orphan_files" => Seq("table", "older_than")
      case "rewrite_data_files" =>
        Seq("table", "strategy", "sort_order", "target_file_size_bytes",
          "where")
      case "rewrite_manifests" => Seq("table", "target_entries_per_manifest")
      case "fast_forward" => Seq("table", "branch", "to")
      case "rollback_to_snapshot" => Seq("table", "snapshot_id")
      case "rollback_to_timestamp" => Seq("table", "timestamp")
      case "create_changelog_view" =>
        Seq("table", "changelog_view", "start_snapshot_id", "end_snapshot_id",
          "net_changes", "compute_updates")
      case "add_files" => Seq("table", "source", "branch")
      case "rewrite_position_delete_files" => Seq("table")
      case "cherrypick_snapshot" => Seq("table", "snapshot_id")
      case "convert_equality_deletes" => Seq("table")
      case "analyze_table" => Seq("table", "columns")
      case "compute_partition_stats" => Seq("table")
      case "create_mv" => Seq("table", "mv", "keys", "sums")
      case "refresh_mv" => Seq("table")
      case "snapshot" => Seq("source_table", "table")
      case "register_table" => Seq("table", "metadata_file")
      case "rebuild_vector_index" =>
        Seq("index", "n_centroids", "train_iters", "id_col", "vec_col")
    }
    val m = bind(procedure, params, rawArgs)
    // `snapshot` / `register_table` CREATE their target table — it must
    // not resolve through loadTable like every other procedure's target.
    if (procedure == "snapshot" || procedure == "register_table")
      return runTableCreating(spark, m)
    // `rebuild_vector_index` targets a VectorIndex DIRECTORY (the pair of
    // centroid/posting tables under it), not a catalog table ident
    if (procedure == "rebuild_vector_index") {
      val indexDir = str(m, "index", procedure)
      val n = if (m.contains("n_centroids"))
        lng(m, "n_centroids", procedure).toInt else 16
      val iters = if (m.contains("train_iters"))
        lng(m, "train_iters", procedure).toInt else 0
      val idc = if (m.contains("id_col")) str(m, "id_col", procedure)
        else "vec_id"
      val vc = if (m.contains("vec_col")) str(m, "vec_col", procedure)
        else "embedding"
      val (epoch, cnt) = graft.operators.VectorIndex.rebuild(
        spark, indexDir, n, iters, idc, vc)
      return Seq(Row(epoch, cnt))
    }
    val tableParts = spark.sessionState.sqlParser
      .parseMultipartIdentifier(str(m, "table", procedure))
    val (cat, ident, t) =
      GraftSqlParser.resolveTable(spark, catalogName +: tableParts)
    val dir = t.table.tableDir
    val cmtr = t.committerOpt

    val rows = procedure match {
      case "expire_snapshots" =>
        val retain =
          if (m.contains("retain_last")) lng(m, "retain_last", procedure).toInt
          else 1
        val n = IcebergWriter.expireSnapshots(spark, dir,
          toMillis(m("older_than"), "older_than"), retain, cmtr)
        Seq(Row(n))
      case "remove_orphan_files" =>
        val n = IcebergWriter.removeOrphanFiles(spark, dir,
          toMillis(m("older_than"), "older_than"), cmtr)
        Seq(Row(n))
      case "rewrite_data_files" =>
        // strategy 'binpack' (default) | 'sort'; sort_order is either
        // 'zorder(c1, c2, ...)' (multi-dimensional clustering) or a
        // column list 'c1, c2' (linear range-cluster + sort)
        val strategy = m.get("strategy").map(_.asInstanceOf[String].toLowerCase)
          .getOrElse("binpack")
        require(strategy == "binpack" || strategy == "sort",
          s"rewrite_data_files: unknown strategy '$strategy' (binpack|sort)")
        val order = m.get("sort_order").map(_.asInstanceOf[String].trim)
        require(strategy == "sort" || order.isEmpty,
          "rewrite_data_files: sort_order needs strategy => 'sort'")
        val ZOrderRe = """(?i)^zorder\s*\((.+)\)$""".r
        val (sortCols, zorderCols) = order match {
          case Some(ZOrderRe(inner)) =>
            (Nil, inner.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          case Some(cols) =>
            (cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq, Nil)
          case None => (Nil, Nil)
        }
        require(strategy == "binpack" || sortCols.nonEmpty || zorderCols.nonEmpty,
          "rewrite_data_files: strategy 'sort' needs sort_order")
        val target =
          if (m.contains("target_file_size_bytes"))
            lng(m, "target_file_size_bytes", procedure)
          else 128L << 20
        val sid = m.get("where") match {
          case Some(pred: String) =>
            // PARTIAL rewrite: the predicate selects files via the same
            // metadata pruning scans use (resolved against the table so
            // the SQL text means what a query would mean), and ONLY
            // those files are read and swapped
            val cond = org.apache.spark.sql.GraftColumnShim.column(
              spark.sessionState.sqlParser.parseExpression(pred))
            val analyzed = t.table.toDF(spark).where(cond)
              .queryExecution.analyzed
            val filters = analyzed.collect {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                // analysis wraps literals in casts ('k >= 20' on BIGINT k
                // becomes k >= CAST(20 AS BIGINT)) and translateFilter
                // needs bare literals — fold constants first, as the
                // optimizer would for a real query
                val folded = f.condition.transformUp {
                  case e: org.apache.spark.sql.catalyst.expressions.Expression
                      if e.foldable && e.deterministic &&
                        !e.isInstanceOf[
                          org.apache.spark.sql.catalyst.expressions.Literal] =>
                    org.apache.spark.sql.catalyst.expressions.Literal
                      .create(e.eval(), e.dataType)
                }
                org.apache.spark.sql.execution.datasources.GraftScanShims
                  .translateFilters(folded)
            }.flatten
            require(filters.nonEmpty,
              s"rewrite_data_files: where => '$pred' translates to no " +
                "pushable filter — it would silently rewrite the whole " +
                "table; drop `where` to do that explicitly")
            IcebergWriter.compactWhere(spark, dir, filters, target, cmtr,
              sortCols = sortCols, zorderCols = zorderCols)._1
          case Some(other) => throw new IllegalArgumentException(
            s"rewrite_data_files: where must be a string predicate, got $other")
          case None =>
            IcebergWriter.compact(spark, dir, target, cmtr,
              sortCols = sortCols, zorderCols = zorderCols)
        }
        Seq(Row(sid))
      case "rewrite_manifests" =>
        // metadata-only: merges small manifests (streaming sinks / frequent
        // appends accumulate one per commit); -1 = nothing to merge
        val target =
          if (m.contains("target_entries_per_manifest"))
            lng(m, "target_entries_per_manifest", procedure).toInt
          else 8192
        Seq(Row(IcebergWriter.rewriteManifests(spark, dir, target, cmtr)))
      case "fast_forward" =>
        val branch = str(m, "branch", procedure)
        val from = str(m, "to", procedure)
        val prev = t.table.metadata.refs.getOrElse(branch, -1L)
        val cur = IcebergWriter.fastForward(t.table.conf, dir,
          from = from, target = branch, committer = cmtr)
        Seq(Row(branch, prev, cur))
      case "rollback_to_snapshot" =>
        val sid = lng(m, "snapshot_id", procedure)
        val prev = t.table.metadata.currentSnapshotId.getOrElse(-1L)
        // set-snapshot-ref on main = the metadata-only rollback: the
        // applier moves current-snapshot-id with the ref
        IcebergWriter.createRef(t.table.conf, dir, "main", sid, "branch", cmtr)
        Seq(Row(prev, sid))
      case "rollback_to_timestamp" =>
        val ms = toMillis(m.getOrElse("timestamp",
          throw new IllegalArgumentException(s"$procedure requires timestamp")),
          "timestamp")
        // TIMESTAMP AS OF resolution (latest snapshot committed ≤ the
        // bound), then the same metadata-only ref move as by-id rollback
        val sid = t.table.asOfTimestamp(ms).pinnedSnapshotId.get
        val prev = t.table.metadata.currentSnapshotId.getOrElse(-1L)
        IcebergWriter.createRef(t.table.conf, dir, "main", sid, "branch", cmtr)
        Seq(Row(prev, sid))
      case "create_changelog_view" =>
        val view =
          if (m.contains("changelog_view")) str(m, "changelog_view", procedure)
          else s"${ident.name}_changes"
        val lineage = t.table.metadata.snapshotLineage
        val start =
          if (m.contains("start_snapshot_id"))
            lng(m, "start_snapshot_id", procedure)
          else 0L
        val end =
          if (m.contains("end_snapshot_id")) lng(m, "end_snapshot_id", procedure)
          else lineage.lastOption.getOrElse(0L)
        // net_changes => 1 collapses insert/delete pairs of identical row
        // content (what a downstream sync wants across COW rewrites)
        val net = m.get("net_changes").exists {
          case l: Long => l != 0L
          case s: String => s.equalsIgnoreCase("true")
          case _ => false
        }
        // compute_updates => 1 pairs rewrite halves into update_before/
        // update_after — by the v3 `_row_id`, or on v2 tables by the
        // declared identifier fields — and drops carryovers
        // (changesWithUpdates; refuses v2 tables WITHOUT identifier
        // fields loudly). Mutually exclusive with net_changes — they
        // answer different consumers.
        val updates = m.get("compute_updates").exists {
          case l: Long => l != 0L
          case s: String => s.equalsIgnoreCase("true")
          case _ => false
        }
        require(!(net && updates),
          "create_changelog_view: net_changes and compute_updates are " +
            "mutually exclusive (net collapses the pairs updates re-type)")
        val df = if (net) t.table.netChangesBetween(spark, start, end)
          else if (updates) t.table.changesWithUpdates(spark, start, end)
          else t.table.changesBetween(spark, start, end)
        df.createOrReplaceTempView(view)
        Seq(Row(view))
      case "add_files" =>
        // register EXISTING parquet/ORC/Avro files metadata-only (the
        // migration primitive): a directory lists its *.parquet/*.orc/*.avro
        // children; a glob or literal file resolves as-is
        val source = str(m, "source", procedure)
        val conf = t.table.conf
        val srcPath = new org.apache.hadoop.fs.Path(source)
        val fs = srcPath.getFileSystem(conf)
        val matched = Option(fs.globStatus(srcPath)).map(_.toSeq).getOrElse(Nil)
        val paths = matched.flatMap { st =>
          if (st.isDirectory)
            fs.listStatus(st.getPath).toSeq
              .filter(f => f.isFile && (f.getPath.getName.endsWith(".parquet")
                || f.getPath.getName.endsWith(".orc")
                || f.getPath.getName.endsWith(".avro")))
              .map(_.getPath.toString)
          else Seq(st.getPath.toString)
        }
        require(paths.nonEmpty, s"add_files: nothing matches '$source'")
        val branch =
          if (m.contains("branch")) str(m, "branch", procedure) else "main"
        val sid = IcebergWriter.addFiles(spark, dir, paths, cmtr, branch)
        Seq(Row(paths.size, sid))
      case "rewrite_position_delete_files" =>
        val (sid, rewritten, removed) =
          IcebergWriter.rewritePositionDeleteFiles(spark, dir, cmtr)
        Seq(Row(rewritten, removed, sid))
      case "cherrypick_snapshot" =>
        val sid = lng(m, "snapshot_id", procedure)
        val cur = IcebergWriter.cherrypickSnapshot(t.table.conf, dir, sid, cmtr)
        Seq(Row(sid, cur))
      case "convert_equality_deletes" =>
        val (sid, converted, rows) =
          IcebergWriter.convertEqualityDeletes(spark, dir, cmtr)
        Seq(Row(converted, rows, sid))
      case "compute_partition_stats" =>
        // full per-partition rollup written as the spec's
        // partition-statistics file for the CURRENT snapshot — the
        // bootstrap (and repair after row-level commits) of the
        // incremental append-maintained chain (PartitionStats)
        Seq(Row(graft.iceberg.PartitionStats.computeAndCommit(spark,
          cmtr.getOrElse(new graft.iceberg.FsCommitter(dir, t.table.conf)))))
      case "analyze_table" =>
        val cols =
          if (m.contains("columns"))
            str(m, "columns", procedure).split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq
          else Nil
        val (sid, n) = IcebergWriter.analyzeTable(spark, dir, cols, cmtr)
        Seq(Row(n, sid))
      case "create_mv" =>
        // seed state of the PINNED source snapshot + the MV definition,
        // committed as one CTAS; the pin is the first refresh cursor
        import graft.iceberg.MaterializedViews
        val mvName = str(m, "mv", procedure)
        val keys = str(m, "keys", procedure)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val sums = MaterializedViews.parseSums(str(m, "sums", procedure))
        val (state, sid) = MaterializedViews.seed(spark, dir, keys, sums)
        val view = "__graft_mv_seed_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        state.createOrReplaceTempView(view)
        try {
          def q(s: String) = s.replace("'", "''")
          spark.sql(
            s"""CREATE TABLE $catalogName.$mvName TBLPROPERTIES (
               |  '${MaterializedViews.SourceProp}' =
               |    '${q(str(m, "table", procedure))}',
               |  '${MaterializedViews.KeysProp}' = '${q(keys.mkString(","))}',
               |  '${MaterializedViews.SumsProp}' =
               |    '${q(sums.map { case (v, o) => s"$v:$o" }.mkString(","))}',
               |  '${MaterializedViews.SourceSnapProp}' = '$sid')
               |AS SELECT * FROM $view""".stripMargin)
          ()
        } finally { spark.catalog.dropTempView(view); () }
        Seq(Row(sid))
      case "refresh_mv" =>
        // here `table` IS the MV; its source resolves through the same
        // catalog from the stored definition
        import graft.iceberg.MaterializedViews
        val srcName = t.table.metadata.properties.getOrElse(
          MaterializedViews.SourceProp,
          throw new IllegalArgumentException(
            s"refresh_mv: ${str(m, "table", procedure)} is not a graft MV " +
              s"(no ${MaterializedViews.SourceProp} property)"))
        val srcParts = spark.sessionState.sqlParser
          .parseMultipartIdentifier(srcName)
        val (_, _, srcT) =
          GraftSqlParser.resolveTable(spark, catalogName +: srcParts)
        val (through, did) = MaterializedViews.refresh(
          spark, dir, srcT.table.tableDir, cmtr)
        Seq(Row(through, if (did) 1 else 0))
    }
    if (procedure != "create_changelog_view") cat.invalidateTable(ident)
    rows
  }

  /** The table-CREATING procedures: resolve the target identifier to a
    * fresh warehouse directory (never through loadTable) and hand off to
    * [[graft.iceberg.TableClone]]. Filesystem-warehouse catalogs only —
    * a REST catalog owns table locations service-side (the REST spec's
    * `/register` endpoint is the transport there). */
  private def runTableCreating(spark: SparkSession,
                               m: Map[String, Any]): Seq[Row] = {
    val cm = spark.sessionState.catalogManager
    def newTableTarget(nameArg: String): (GraftCatalog, Seq[String], String) = {
      val parts = catalogName +: spark.sessionState.sqlParser
        .parseMultipartIdentifier(nameArg)
      val (plugin, rest) =
        if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
          (cm.catalog(parts.head), parts.tail)
        else (cm.currentCatalog, parts)
      val cat = plugin match {
        case g: GraftCatalog => g
        case other => throw new UnsupportedOperationException(
          s"$procedure needs an Iceberg (GraftCatalog) target; " +
            s"'$nameArg' resolves via catalog '${other.name}'")
      }
      val ns = if (rest.length > 1) rest.init else cm.currentNamespace.toSeq
      val name = rest.last
      val store = cat.storeForTest
      require(store.namespaceExists(ns),
        s"$procedure: namespace ${ns.mkString(".")} does not exist")
      require(!store.tableExists(ns, name) && !store.isView(ns, name),
        s"$procedure: ${ns.mkString(".")}.$name already exists")
      (cat, ns, name)
    }
    def freshDir(cat: GraftCatalog, ns: Seq[String], name: String): String = {
      val nsLoc = cat.storeForTest.namespaceLocation(ns).getOrElse(
        throw new UnsupportedOperationException(
          s"$procedure targets a filesystem-warehouse catalog; this " +
            "catalog does not expose table locations (REST catalogs " +
            "register through the service's /register endpoint)"))
      s"$nsLoc/$name"
    }
    val conf = spark.sessionState.newHadoopConf()
    procedure match {
      case "snapshot" =>
        val (_, _, srcT) = GraftSqlParser.resolveTable(spark,
          catalogName +: spark.sessionState.sqlParser
            .parseMultipartIdentifier(str(m, "source_table", procedure)))
        val (cat, ns, name) = newTableTarget(str(m, "table", procedure))
        val sid = graft.iceberg.TableClone.snapshotClone(
          srcT.table.tableDir, freshDir(cat, ns, name), conf)
        Seq(Row(sid))
      case "register_table" =>
        val (cat, ns, name) = newTableTarget(str(m, "table", procedure))
        cat.storeForTest match {
          case r: RestCatalogStore =>
            // pointer registration: the SERVICE adopts the document; the
            // table's location stays whatever the metadata says
            r.registerTable(ns, name, str(m, "metadata_file", procedure))
            val meta = r.loadIcebergTable(ns, name).metadata
            Seq(Row(meta.snapshots.size, meta.currentSnapshotId.getOrElse(-1L)))
          case _ =>
            val (n, cur) = graft.iceberg.TableClone.register(
              str(m, "metadata_file", procedure),
              freshDir(cat, ns, name), conf)
            Seq(Row(n, cur.getOrElse(-1L)))
        }
    }
  }
}
