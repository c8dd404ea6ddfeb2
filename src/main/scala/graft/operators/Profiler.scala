package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling: per-column row/null/distinct counts and
  * min/max, for any column list, in a SINGLE aggregate over the table —
  * the "what is in this table" report that precedes every pipeline
  * onboarding. A naive profiler runs one job per column; at 100 TB that
  * is N full scans. Here every metric is an aggregate expression in ONE
  * `agg` (Spark plans the multi-column count-distinct with its Expand
  * rewrite — row amplification ×N columns inside one shuffle, still one
  * pass over the files), and the 1×(5N) result row pivots to long form
  * with a driver-free `stack`.
  *
  * Numeric min/max are rounded then stringified so every column type
  * shares one output schema and the DuckDB oracle's double formatting
  * agrees (shortest-representation printing on both engines).
  *
  * Plan note: MIN/MAX over STRING columns carry a variable-width
  * aggregation buffer, which Spark cannot hash-aggregate — the combined
  * pass runs as SortAggregate (n log n per partition over the expanded
  * rows). Profiling only fixed-width columns keeps the pass
  * hash-aggregated; either way it is ONE scan, which is the term that
  * dominates at 100 TB.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val numeric = df.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .toMap
    def s(c: String, agg: org.apache.spark.sql.Column) =
      (if (numeric.getOrElse(c, false)) round(agg.cast("double"), 4) else agg)
        .cast("string")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      s(c, min(col(c))).as(s"${c}__min"),
      s(c, max(col(c))).as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n, n_nulls, n_distinct, min_s, max_s)")
  }
}
