package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._

import graft.functions.catalyst.CountMinAgg

/** Count-min sketch (Cormode & Muthukrishnan 2005): approximate
  * frequencies of a key stream in `depth × width × 8` bytes, with the
  * one-sided guarantee `estimate >= true count` (an estimate is the MIN
  * over `depth` counters the key hashes into; collisions only ever
  * inflate). The 100 TB use: term/URL/domain frequency questions over a
  * token stream whose exact distinct-key aggregate would shuffle
  * billions of group keys — the sketch folds map-side into one bounded
  * value ([[CountMinAgg]], elementwise-ADD partials), and lookups are
  * pure built-in expressions over the broadcast counters (codegen'd, no
  * shuffle, no driver loop).
  *
  * Pairs with [[BloomAdmission]]: same build/probe split, same
  * Column-space hash family shared by both sides so they cannot drift.
  * Exactness discipline: anything REPORTED from a sketch must either be
  * gated by an exact companion (the q139 gate requires
  * `exact <= estimate <= exact + err` against the true counts) or be
  * clearly labeled an estimate.
  */
object FrequencySketch {

  /** `depth` counter positions for one key — seed space disjoint from
    * [[BloomAdmission.hashPositions]] (offset 1000) so a pipeline using
    * both never correlates their collisions. */
  def hashPositions(key: Column, width: Int, depth: Int): Column =
    array((0 until depth).map(i =>
      pmod(xxhash64(key, lit(1000 + i)), lit(width.toLong))): _*)

  /** Fold `df`'s key column into one count-min counter matrix
    * (row-major `depth × width` longs). One aggregate job. */
  def build(df: DataFrame, key: Column, width: Int,
            depth: Int): Array[Long] = {
    val agg = GraftColumnShim.column(
      CountMinAgg(GraftColumnShim.expression(
        hashPositions(key, width, depth)), width, depth)
        .toAggregateExpression())
    val bytes = df.agg(agg.as("cms")).collect()(0).getAs[Array[Byte]](0)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  /** Map-side frequency estimate: min over the key's `depth` counters.
    * Pure built-in expressions over per-row literal arrays, so the
    * lookup rides whole-stage codegen wherever the key column flows. */
  def estimate(key: Column, counters: Array[Long], width: Int,
               depth: Int): Column = {
    require(counters.length == depth * width,
      s"counter matrix must be depth*width = ${depth * width}, " +
        s"got ${counters.length}")
    val perRow = (0 until depth).map { i =>
      val row = lit(counters.slice(i * width, (i + 1) * width))
      val pos = pmod(xxhash64(key, lit(1000 + i)), lit(width.toLong))
      element_at(row, pos.cast("int") + 1)
    }
    if (depth == 1) perRow.head else least(perRow: _*)
  }
}
