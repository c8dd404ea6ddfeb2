package graft.iceberg.connector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, DynamicPruning, DynamicPruningSubquery, EqualTo, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.MetadataBuilder

import graft.iceberg.IcebergTable

/** Runtime-filtered probes of Iceberg-stored index tables — the 100 TB
  * replacement for the collect-keys-then-prune driver round-trip the
  * index probes used through round 13.
  *
  * Shape: the probed table is read through its DSv2 relation (the scan
  * that implements `SupportsRuntimeFiltering`) and joined against the
  * BROADCAST distinct probe keys, whose key column carries a marker.
  * [[GraftRuntimeProbeRule]] — a scoped optimizer rule — plants Spark's
  * own `DynamicPruningSubquery` on the scan side of exactly these
  * marker-tagged joins, and from there stock machinery takes over:
  * `PlanAdaptiveDynamicPruningFilters` feeds the subquery from the
  * join's own broadcast (exchange reuse — no extra job), the scan's
  * `SupportsRuntimeFiltering.filter` prunes files by the arrived key
  * set (identity/bucket transforms included), and tasks are scheduled
  * over the probed partitions only. No driver-side `collect()` in the
  * probe path, no 100k key cap, no silent full-scan fallback above it.
  *
  * Why a rule of our own: Spark's `PartitionPruning` triggers on a
  * SELECTIVITY HEURISTIC (a likely-selective filter on the keys side).
  * A probe's keys side is an aggregated distinct-key set — selective by
  * construction but carrying no such filter, so the stock rule declines.
  * The rule replaces only the TRIGGER; planning and execution of the
  * pruning subquery are Spark's, and the rule fires only on joins the
  * library marked — user query plans never match.
  *
  * Correctness does not depend on the pruning firing: the join itself
  * enforces the key filter row-exactly, so a plan where the filter is
  * dropped (non-broadcast build, exotic shape) reads more files but
  * returns identical rows. Specs pin that the filter DOES fire on the
  * steady probe shapes.
  */
object RuntimeProbe {

  /** DSv2 DataFrame over a (typically snapshot-pinned) [[IcebergTable]]
    * WITHOUT a catalog registration — the relation runtime filtering and
    * vectorized batch reads operate on. Read-only by construction. */
  def dsv2Read(spark: SparkSession, table: IcebergTable): DataFrame =
    org.apache.spark.sql.execution.datasources.GraftScanShims
      .dsv2DataFrame(spark,
        new SparkIcebergTable(table.tableDir, table, writable = false))

  /** The distinct non-null `keyCol` values of `keys`, cast to `castTo`
    * and MARKER-stamped for [[GraftRuntimeProbeRule]] — the one place the
    * marker contract (metadata key, cast rule, null/duplicate handling)
    * lives. The cast matters: the equi-join key must resolve to a bare
    * scan-side attribute for the runtime filter to translate to a source
    * In filter (a Cast on the scan side would block it). */
  def markedKeys(spark: SparkSession, keys: DataFrame, keyCol: String,
      castTo: org.apache.spark.sql.types.DataType): DataFrame = {
    ensureRule(spark)
    val marker = new MetadataBuilder()
      .putBoolean(GraftRuntimeProbeRule.Marker, true).build()
    keys.select(col(keyCol).cast(castTo).as(keyCol, marker))
      .filter(col(keyCol).isNotNull)
      .distinct()
  }

  /** The rows of `table` whose `keyCol` value appears in `keys` — an
    * index/posting-list probe whose per-batch IO is the touched
    * partitions, not the table. `keys` may carry duplicates, nulls
    * (never match) and extra columns; only its `keyCol` values matter. */
  def prunedByKeys(spark: SparkSession, table: IcebergTable,
      keyCol: String, keys: DataFrame): DataFrame = {
    val idx = dsv2Read(spark, table)
    idx.join(
      broadcast(markedKeys(spark, keys, keyCol, idx.schema(keyCol).dataType)),
      Seq(keyCol))
  }

  /** Idempotently register [[GraftRuntimeProbeRule]] on the session —
    * `experimental.extraOptimizations` needs no session-build-time
    * configuration, so probes work on any caller's session.
    *
    * Known race, accepted: `extraOptimizations` is session-global mutable
    * state synchronized only against this object — a user ASSIGNING their
    * own rules concurrently can drop ours (read-modify-write on their
    * side). Correctness survives a dropped rule by design: the probe's
    * join enforces the key set row-exactly and the pruning is a
    * best-effort IO reduction (`RuntimeFilterSpec` pins the
    * identical-rows-without-the-rule property). */
  private def ensureRule(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(GraftRuntimeProbeRule))
      spark.experimental.extraOptimizations = cur :+ GraftRuntimeProbeRule
  }

  /** TEST SEAM: drop the rule from a session (the race above, forced). */
  private[graft] def removeRuleForTest(spark: SparkSession): Unit = synchronized {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == GraftRuntimeProbeRule)
  }
}

/** Plants a [[DynamicPruningSubquery]] on the Graft-scan side of joins
  * whose OTHER side's join key carries the [[Marker]] metadata (stamped
  * only by [[RuntimeProbe.prunedByKeys]]). `onlyInBroadcast = false`: a
  * probe is selective by construction, so when broadcast reuse is not
  * available the keys side runs as its own small subquery rather than
  * giving up the pruning. Idempotent under the fixed-point batch (a scan
  * side already carrying a dynamic-pruning filter never matches again).
  */
object GraftRuntimeProbeRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Attribute-metadata key marking a probe's key column. */
  val Marker = "graft.runtime.probe"

  private def marked(a: Attribute): Boolean =
    a.metadata.contains(Marker)

  /** Exactly the keys-side shape [[RuntimeProbe.markedKeys]] produces
    * once the optimizer has run (distinct() → single-column Aggregate;
    * the broadcast hint is folded into the join by EliminateResolvedHint
    * before extraOptimizations fire). Requiring it means a USER plan
    * that happens to reuse a marked column in its own join can never
    * opt into the rule — marker metadata alone is not enough
    * (ADVICE r14). */
  private def markedKeysShape(plan: LogicalPlan): Boolean = plan match {
    case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
      a.output.size == 1 && marked(a.output.head) &&
        a.groupingExpressions.size == 1
    case _ => false
  }

  /** The scan relation under a Project/Filter chain — None once a
    * dynamic-pruning filter is already present (idempotence). */
  private def graftScan(plan: LogicalPlan): Option[DataSourceV2ScanRelation] =
    plan match {
      case r: DataSourceV2ScanRelation if r.scan.isInstanceOf[GraftBatchScan] =>
        Some(r)
      case p: Project => graftScan(p.child)
      case f: Filter =>
        if (f.condition.exists(_.isInstanceOf[DynamicPruning])) None
        else graftScan(f.child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.dynamicPartitionPruningEnabled) plan else applyInternal(plan)

  private def applyInternal(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), _)
        if jt == Inner || jt == LeftSemi =>
      val eqs = splitConjunctivePredicates(cond)
      def insert(scanSide: LogicalPlan, keysSide: LogicalPlan)
          : Option[LogicalPlan] =
        graftScan(scanSide).filter(_ => markedKeysShape(keysSide)).flatMap { rel =>
          val pairs = eqs.collect {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if rel.outputSet.contains(a) &&
                  keysSide.outputSet.contains(b) && marked(b) => (a, b)
            case EqualTo(b: AttributeReference, a: AttributeReference)
                if rel.outputSet.contains(a) &&
                  keysSide.outputSet.contains(b) && marked(b) => (a, b)
          }
          pairs.headOption.map { case (pruningKey, buildKey) =>
            Filter(DynamicPruningSubquery(pruningKey, keysSide,
              Seq(buildKey), Seq(0), onlyInBroadcast = false), scanSide)
          }
        }
      insert(left, right).map(f => j.copy(left = f))
        .orElse(if (jt == Inner) insert(right, left).map(f => j.copy(right = f))
                else None)
        .getOrElse(j)
  }
}
