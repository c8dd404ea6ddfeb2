package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape tools for skewed and co-located workloads — the remaining
  * dials from the 100 TB playbook next to `broadcast()` and AQE:
  * key salting (spread one hot key over many reducers) and bucketing
  * (pre-shuffle once, join shuffle-free forever after).
  */
object JoinStrategies {

  /** Equi join with the build side replicated over `saltBuckets` salts:
    * each fact row gets a salt from its physical position
    * (`monotonically_increasing_id`, i.e. partition id + row-in-partition),
    * the dimension is replicated once per salt, and the join key becomes
    * (key, salt). A hot key's rows now land on `saltBuckets` reducers
    * instead of one — including the common skew case where the hot rows
    * are fully identical duplicates (a whole-row hash would send those to
    * ONE salt and spread nothing), and without touching column values, so
    * un-hashable column types (maps) are fine. Position-derived salts are
    * stable under task retries of a deterministic source (a rescan yields
    * the same partition contents in the same order) — the replay-safety
    * `rand()` lacks — though not under a repartition of the input.
    *
    * Result-identical to `fact.join(dim, keys)`: every fact row matches
    * exactly the one dim replica carrying its salt. Worth it only when a
    * key is genuinely hot and the dim side is small enough to replicate
    * `saltBuckets`×; otherwise prefer AQE's skew-join splitting.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already contain a _salt column")
    val factSalted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val dimSalted = dim.withColumn("_salt",
      explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
    factSalted.join(dimSalted, keys :+ "_salt").drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins between
    * them are shuffle-free (`SortMergeJoin` over pre-sorted buckets, no
    * Exchange): the one-off shuffle cost is paid at write time, amortized
    * over every later join — the right trade for fact tables joined on
    * the same key query after query. Returns the saved table names.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): String = {
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    table
  }
}
