package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a CDC changelog.
  *
  * The 100 TB story: a rollup (`GROUP BY k` with additive aggregates) over
  * a 100 TB fact table costs a full scan to recompute, but the day's
  * changes are usually a few GB. `IcebergTable.changesBetween` plans
  * exactly those changed rows from manifest diffs (IO proportional to the
  * change volume, never the table); [[refresh]] folds them into the stored
  * state with ONE shuffle over the delta keys plus one key join against
  * the state — the classic delta-maintenance algebra for distributive
  * aggregates (COUNT/SUM, and anything derived from them, e.g. AVG).
  *
  * Only ADDITIVE aggregates are maintainable this way; MIN/MAX are not
  * (a delete can expose a new minimum that only a group rescan can find),
  * so this operator deliberately does not accept them.
  *
  * Keys are compared null-safely (a NULL group is a real group, matching
  * `GROUP BY` semantics). Groups whose live row count drops to zero leave
  * the state, exactly as they would leave a recomputed rollup. Each SUM
  * carries a non-null-value count (`<out>_nn`) so the SQL edge case "every
  * remaining value is NULL ⇒ SUM is NULL, not 0" survives maintenance —
  * without it, deleting the last non-null value of a surviving group would
  * silently turn NULL into 0.
  */
object IncrementalView {

  /** Column name of the maintained row count (`COUNT(*)` of the group). */
  val CntCol = "cnt"

  /** Full recompute of the state: one row per key; `cnt` = COUNT(*), and
    * per `sums` entry (`valueCol -> out`) a `out` = SUM(valueCol) plus
    * `out_nn` = COUNT(valueCol). Used to seed the view and as the
    * correctness yardstick for [[refresh]].
    */
  def aggregateState(df: DataFrame, keys: Seq[String],
                     sums: Seq[(String, String)]): DataFrame = {
    val aggs = count(lit(1L)).as(CntCol) +:
      sums.flatMap { case (v, out) =>
        Seq(sum(col(v)).as(out), count(col(v)).as(s"${out}_nn"))
      }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a changelog window (schema columns + `_change_type` of
    * `insert`/`delete`, as produced by `IcebergTable.changesBetween`) into
    * an existing state. Copy-on-write UPDATEs arrive as delete+insert
    * pairs and fold naturally; `replace` (compaction) windows emit no
    * changes at all. Unknown change types fail loudly instead of being
    * mis-counted.
    *
    * Returns the refreshed state with the same schema as
    * [[aggregateState]]; equality with a full recompute is the operator's
    * contract (spec-pinned).
    */
  def refresh(state: DataFrame, changes: DataFrame, keys: Seq[String],
              sums: Seq[(String, String)]): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1L))
      .when(col("_change_type") === "delete", lit(-1L))
    val signed = changes.withColumn("__sign",
      coalesce(sign, raise_error(concat(
        lit("incremental refresh: unknown _change_type "),
        col("_change_type")))))

    val dCnt = s"__d_$CntCol"
    val dAggs = sum(col("__sign")).as(dCnt) +:
      sums.flatMap { case (v, out) =>
        Seq(sum(col(v) * col("__sign")).as(s"__d_$out"),
          sum(when(col(v).isNotNull, col("__sign")).otherwise(lit(0L)))
            .as(s"__d_${out}_nn"))
      }
    val delta = signed.groupBy(keys.map(col): _*).agg(dAggs.head, dAggs.tail: _*)

    // null-safe full-outer key join: a NULL key is a real group
    val st = state.alias("st")
    val dl = delta.alias("dl")
    val cond = keys.map(k => col(s"st.$k") <=> col(s"dl.$k")).reduce(_ && _)
    val keyCols = keys.map(k => coalesce(col(s"st.$k"), col(s"dl.$k")).as(k))
    val cnt = (coalesce(col(s"st.$CntCol"), lit(0L)) +
      coalesce(col(dCnt), lit(0L))).as(CntCol)
    val sumCols = sums.flatMap { case (_, out) =>
      val nn = coalesce(col(s"st.${out}_nn"), lit(0L)) +
        coalesce(col(s"__d_${out}_nn"), lit(0L))
      Seq(
        when(nn === 0, lit(null))
          .otherwise(coalesce(col(s"st.$out"), lit(0L)) +
            coalesce(col(s"__d_$out"), lit(0L))).as(out),
        nn.as(s"${out}_nn"))
    }
    st.join(dl, cond, "full_outer")
      .select((keyCols :+ cnt) ++ sumCols: _*)
      .filter(col(CntCol) > 0)
  }
}
