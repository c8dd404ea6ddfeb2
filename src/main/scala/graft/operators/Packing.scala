package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget bins (context windows) so batches waste minimal
  * padding. True first-fit-decreasing is inherently sequential; the
  * scalable contract here is DETERMINISTIC GREEDY FILL — documents in
  * (tokens DESC, id ASC) order, each bin filled until the running total
  * crosses the window:
  *
  *   bin(doc) = floor(prefixSum_exclusive(tokens) / windowTokens)
  *
  * Every bin's fill deviates from the window by less than the largest
  * single document (a straddler's tokens count toward the bin it started
  * in, so the next bin starts past its boundary) — the standard
  * streaming-packing tradeoff. The assignment is a pure function of the
  * sorted order, so a SQL window oracle reproduces it exactly.
  *
  * The global prefix sum is computed scale-safely: range-partition on the
  * sort key (exact global order, ids break ties), per-partition running
  * totals via a partition-local window, plus per-partition offsets
  * collected on the driver (ONE row per partition — partition-count
  * bounded, never data bounded) and joined back as a broadcast. No
  * single-partition global window anywhere.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    windowTokens: Long, partitions: Int = 0): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // NULL text counts as 0 tokens (wordCount propagates NULL, and a
    // trailing range partition holding only null-text docs would NULL
    // its partition total and NPE the driver-side offset scan)
    val toks = df.select(col(idCol).as("id"),
      coalesce(TextFunctions.wordCount(col(textCol)), lit(0L))
        .cast("long").as("tokens"))
    // The __pid assignment MUST be computed exactly once and seen
    // identically by the offsets-collect job and the final pass:
    // RangePartitioner samples with an rdd.id-derived seed, so a
    // re-execution of the range shuffle could draw DIFFERENT boundaries —
    // rows near a boundary would then land in a partition whose joined
    // offset was computed for someone else, silently corrupting every
    // downstream bin. `persist` pins the partitioning for both passes;
    // the RESULT (3 narrow columns per document — no text) is then
    // eagerly localCheckpoint'ed so the big intermediate can be freed
    // DETERMINISTICALLY before returning, with no recompute path left in
    // the returned plan. The small checkpoint blocks are released by RDD
    // GC, the same lifecycle as Dedup's iterative leaves.
    val ranged = toks
      .repartitionByRange(parts, col("tokens").desc, col("id").asc)
      .sortWithinPartitions(col("tokens").desc, col("id").asc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one row per RANGE partition: the prefix offset each partition's
      // running totals start from
      val partTotals = ranged.groupBy("__pid")
        .agg(sum("tokens").as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = partTotals.scanLeft((Int.MinValue, 0L)) {
        case ((_, acc), (pid, t)) => (pid, acc + t)
      }.sliding(2).collect { case Array((_, prev), (pid, _)) => (pid, prev) }
        .toSeq
      val offsetDF = spark.createDataFrame(offsets).toDF("__pid", "__offset")
      val local = Window.partitionBy("__pid")
        .orderBy(col("tokens").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      ranged
        .join(broadcast(offsetDF), Seq("__pid"))
        .withColumn("__pre",
          coalesce(sum("tokens").over(local), lit(0L)) + col("__offset"))
        .select(col("id").as(idCol), col("tokens"),
          floor(col("__pre") / windowTokens).as("bin"))
        .localCheckpoint(true)
    } finally { ranged.unpersist(); () }
  }
}
