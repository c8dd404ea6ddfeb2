package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Extensions, IcebergQueries, Relational}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface: the relational queries
  * the reference exposes through its embedded SQL engine (SURVEY §2.B,
  * Q1/Q3–Q33) plus the training-data-pipeline extensions (Q34+). Each entry
  * with a portable kernel has a DuckDB oracle in `oracleSql`; engine-hash
  * based ops (minhash/simhash/LSH) are rows-only by design.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → partial/final hash aggregate → small sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q14_agg_tpch1")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Extensions.queries ++ IcebergQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Extensions.oracles ++ IcebergQueries.oracles
}
