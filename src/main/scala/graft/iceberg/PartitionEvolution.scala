package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

/** Partition-spec evolution — Iceberg's "re-partition without rewriting
  * a single data file" (the capability the reference's static-spec reads
  * lack entirely; its scan path only ever consults one spec,
  * `table.rs:128-225`).
  *
  * A spec change is a METADATA-ONLY commit: the new spec is appended to
  * `partition-specs` and `default-spec-id` moves. Existing manifests keep
  * their `partition_spec_id`, so their partition tuples and summaries
  * stay typed by the spec that wrote them; new writes cluster by the new
  * default. At 100 TB this is the difference between an online layout
  * change and a multi-day table rewrite — the scan planner prunes each
  * manifest under its OWN spec ([[IcebergTable]]), so old data keeps its
  * old pruning and new data gets the new one.
  *
  * Commit algebra (same (requirements, updates) vocabulary as every other
  * writer): `add-spec` + `set-default-spec(-1)`, guarded by
  * `assert-default-spec-id` so two concurrent evolutions conflict instead
  * of silently shadowing each other. The APPLIER assigns spec ids and
  * partition field ids — an identical (source-id, transform) field keeps
  * its id across specs, so a drop + re-add round-trips.
  */
object PartitionEvolution {

  /** Spec-field name for a (sourceCol, transform) pair — the Iceberg
    * writer convention: identity keeps the column name; transforms
    * suffix it (`ts_day`, `id_bucket`, `s_trunc`). */
  def specFieldName(sourceCol: String, transform: String): String =
    transform match {
      case "identity" => sourceCol
      case t =>
        val base = t.takeWhile(_ != '[')
        s"${sourceCol}_${if (base == "truncate") "trunc" else base}"
    }

  private val FnRe = """(?i)^\s*(\w+)\s*\(\s*([^()]*)\s*\)\s*$""".r

  /** Parse a SQL transform expression to (sourceColumn, icebergTransform):
    * `col` → identity, `days(ts)`/`day(ts)` → day, `bucket(4, id)` →
    * bucket[4], `truncate(name, 3)` or `truncate(3, name)` → truncate[3].
    */
  def parseTransform(expr: String): (String, String) = expr.trim match {
    case FnRe(fn, args) =>
      val parts = args.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      def one: String = parts match {
        case Seq(c) => c
        case _ => throw new IllegalArgumentException(
          s"transform $fn takes one column: $expr")
      }
      def withInt(t: String): (String, String) = parts match {
        case Seq(n, c) if n.forall(_.isDigit) => c -> s"$t[$n]"
        case Seq(c, n) if n.forall(_.isDigit) => c -> s"$t[$n]"
        case _ => throw new IllegalArgumentException(
          s"$fn needs (N, col) or (col, N): $expr")
      }
      fn.toLowerCase match {
        case "years" | "year"   => one -> "year"
        case "months" | "month" => one -> "month"
        case "days" | "day"     => one -> "day"
        case "hours" | "hour"   => one -> "hour"
        case "identity"         => one -> "identity"
        case "bucket"           => withInt("bucket")
        case "truncate"         => withInt("truncate")
        case other => throw new IllegalArgumentException(
          s"unsupported partition transform: $other")
      }
    case bare =>
      bare.stripPrefix("`").stripSuffix("`") -> "identity"
  }

  /** Source types a transform accepts — checked at DDL time so a bad spec
    * fails the ALTER, not the first INSERT. Mirrors [[PartitionTransforms]]
    * (the evaluator) and the spec's transform/type table. */
  private[graft] def validateSourceType(transform: String, dt: DataType,
                                 col: String): Unit = {
    val base = transform.takeWhile(_ != '[')
    val ok = base match {
      // identity takes any SINGLE-VALUE type; variant has no manifest
      // tuple encoding and unknown is always null — neither partitions
      case "identity" => dt != VariantType && dt != NullType
      case "year" | "month" | "day" =>
        dt == DateType || dt == TimestampType || dt == TimestampNTZType
      case "hour" => dt == TimestampType || dt == TimestampNTZType
      case "bucket" => dt match {
        case IntegerType | LongType | DateType | TimestampType |
             TimestampNTZType | StringType | BinaryType | _: DecimalType => true
        case _ => false
      }
      case "truncate" => dt match {
        case IntegerType | LongType | StringType | _: DecimalType => true
        case _ => false
      }
      case _ => false
    }
    if (!ok) throw new IllegalArgumentException(
      s"transform $transform cannot partition $col: ${dt.simpleString}")
  }

  /** `ALTER TABLE … ADD PARTITION FIELD expr [AS name]`. */
  def addField(tableDir: String, conf: Configuration, expr: String,
               asName: Option[String] = None,
               committer: Option[TableCommitter] = None): Unit = {
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val meta = cmtr.currentMetadata()
    val (src, transform) = parseTransform(expr)
    val sourceId = meta.fieldIds.getOrElse(src,
      throw new IllegalArgumentException(
        s"partition source column '$src' not in schema " +
          s"(have: ${meta.schema.fieldNames.mkString(", ")})"))
    val dt = meta.schema.fields.find(_.name == src).map(_.dataType).get
    validateSourceType(transform, dt, src)
    val name = asName.getOrElse(specFieldName(src, transform))
    meta.partitionSpec.find(f =>
      f.sourceId == sourceId && f.transform == transform).foreach { f =>
      throw new IllegalArgumentException(
        s"table is already partitioned by $transform($src) " +
          s"(field '${f.name}')")
    }
    meta.partitionSpec.find(_.name == name).foreach { f =>
      throw new IllegalArgumentException(
        s"partition field name '$name' already used by " +
          s"${f.transform}(source-id ${f.sourceId}) — pick another AS name")
    }
    // a non-identity field must not shadow a schema column: partition
    // values are name-keyed downstream (re-injection, SPJ grouping) and a
    // shadowing name would make a transformed value look like column data
    if (transform != "identity" && meta.fieldIds.contains(name))
      throw new IllegalArgumentException(
        s"partition field name '$name' conflicts with a schema column — " +
          "pick another AS name")
    commitSpec(cmtr, meta,
      meta.partitionSpec :+ PartitionField(name, transform, sourceId, -1))
  }

  /** `ALTER TABLE … DROP PARTITION FIELD expr` — `expr` is a transform
    * expression (`bucket(4, id)`, `days(ts)`) or a bare field/column name.
    */
  def dropField(tableDir: String, conf: Configuration, expr: String,
                committer: Option[TableCommitter] = None): Unit = {
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val meta = cmtr.currentMetadata()
    val f = matchField(meta, expr)
    commitSpec(cmtr, meta, meta.partitionSpec.filterNot(_ == f))
  }

  /** `ALTER TABLE … REPLACE PARTITION FIELD old WITH new [AS name]` —
    * drop + add in ONE commit (two separate DDLs would leave a window
    * where concurrent writes cluster by neither layout). */
  def replaceField(tableDir: String, conf: Configuration,
                   oldExpr: String, newExpr: String,
                   asName: Option[String] = None,
                   committer: Option[TableCommitter] = None): Unit = {
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val meta = cmtr.currentMetadata()
    val matched = matchField(meta, oldExpr)
    val (src, transform) = parseTransform(newExpr)
    val sourceId = meta.fieldIds.getOrElse(src,
      throw new IllegalArgumentException(
        s"partition source column '$src' not in schema"))
    val dt = meta.schema.fields.find(_.name == src).map(_.dataType).get
    validateSourceType(transform, dt, src)
    val name = asName.getOrElse(specFieldName(src, transform))
    val remaining = meta.partitionSpec.filterNot(_ == matched)
    remaining.find(f => f.sourceId == sourceId && f.transform == transform)
      .foreach(f => throw new IllegalArgumentException(
        s"table is already partitioned by $transform($src) (field '${f.name}')"))
    remaining.find(_.name == name).foreach(f =>
      throw new IllegalArgumentException(
        s"partition field name '$name' already used by ${f.transform}"))
    if (transform != "identity" && meta.fieldIds.contains(name))
      throw new IllegalArgumentException(
        s"partition field name '$name' conflicts with a schema column")
    commitSpec(cmtr, meta, meta.partitionSpec.map(f =>
      if (f == matched) PartitionField(name, transform, sourceId, -1) else f))
  }

  /** Exactly one spec field matching a transform expr or bare name. */
  private def matchField(meta: TableMetadata, expr: String): PartitionField = {
    val matched: Seq[PartitionField] =
      if (expr.contains("(")) {
        val (src, transform) = parseTransform(expr)
        val sourceId = meta.fieldIds.getOrElse(src,
          throw new IllegalArgumentException(s"column '$src' not in schema"))
        meta.partitionSpec.filter(f =>
          f.sourceId == sourceId && f.transform == transform)
      } else {
        val bare = expr.trim.stripPrefix("`").stripSuffix("`")
        meta.partitionSpec.filter(f => f.name == bare ||
          (f.transform == "identity" &&
            meta.fieldIds.get(bare).contains(f.sourceId)))
      }
    matched match {
      case Seq(f) => f
      case Seq() => throw new IllegalArgumentException(
        s"no partition field matches '$expr' (current spec: " +
          meta.partitionSpec.map(f => s"${f.transform}→${f.name}").mkString(", ") + ")")
      case many => throw new IllegalArgumentException(
        s"'$expr' matches ${many.size} partition fields " +
          s"(${many.map(_.name).mkString(", ")}) — name one exactly")
    }
  }

  private def commitSpec(cmtr: TableCommitter, meta: TableMetadata,
                         fields: Seq[PartitionField]): Unit = {
    val mapper = new ObjectMapper()
    cmtr.commit(
      requirements = Seq(
        MetadataCommit.assertDefaultSpecId(mapper, meta.defaultSpecId)),
      updates = Seq(
        MetadataCommit.addPartitionSpec(mapper, fields),
        MetadataCommit.setDefaultSpec(mapper, -1)))
  }
}

/** Sort-order evolution — `ALTER TABLE … WRITE ORDERED BY (a, b DESC)` /
  * `WRITE UNORDERED`. Like partition evolution, a metadata-only commit
  * (`add-sort-order` + `set-default-sort-order(-1)`, guarded by
  * `assert-default-sort-order-id`): existing files keep their recorded
  * `sort_order_id`; FUTURE writes range-cluster and sort by the new
  * order, which is what makes range predicates on the sort key prune
  * files. At scale this turns "sort the table" into "sort from now on +
  * compact when convenient" — no rewrite on the DDL path.
  */
object SortOrderEvolution {

  /** `cols`: (column, direction) pairs, direction "asc" | "desc". */
  def writeOrderedBy(tableDir: String, conf: Configuration,
                     cols: Seq[(String, String)],
                     committer: Option[TableCommitter] = None): Unit = {
    require(cols.nonEmpty, "WRITE ORDERED BY needs at least one column")
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val meta = cmtr.currentMetadata()
    val fields = cols.map { case (name, dir) =>
      require(dir == "asc" || dir == "desc", s"bad sort direction: $dir")
      val id = meta.fieldIds.getOrElse(name,
        throw new IllegalArgumentException(
          s"sort column '$name' not in schema " +
            s"(have: ${meta.schema.fieldNames.mkString(", ")})"))
      meta.schema.find(_.name == name).map(_.dataType).foreach {
        case VariantType | NullType => throw new UnsupportedOperationException(
          s"sort column '$name' is VARIANT / VOID — variant values have " +
            "no sort order and unknown columns are always null")
        case _ => ()
      }
      SortOrderField(id, "identity", dir)
    }
    val dupes = cols.map(_._1).groupBy(identity).collect {
      case (c, more) if more.size > 1 => c
    }
    require(dupes.isEmpty, s"duplicate sort columns: ${dupes.mkString(", ")}")
    val mapper = new ObjectMapper()
    cmtr.commit(
      requirements = Seq(MetadataCommit.assertDefaultSortOrderId(
        mapper, meta.defaultSortOrderId)),
      updates = Seq(
        MetadataCommit.addSortOrder(mapper, fields),
        MetadataCommit.setDefaultSortOrder(mapper, -1)))
  }

  /** `WRITE UNORDERED`: future writes stop sorting (order 0). */
  def writeUnordered(tableDir: String, conf: Configuration,
                     committer: Option[TableCommitter] = None): Unit = {
    val cmtr = committer.getOrElse(new FsCommitter(tableDir, conf))
    val meta = cmtr.currentMetadata()
    val mapper = new ObjectMapper()
    cmtr.commit(
      requirements = Seq(MetadataCommit.assertDefaultSortOrderId(
        mapper, meta.defaultSortOrderId)),
      updates = Seq(MetadataCommit.setDefaultSortOrder(mapper, 0)))
  }
}
