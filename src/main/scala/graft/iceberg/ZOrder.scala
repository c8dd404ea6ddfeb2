package graft.iceberg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering for `rewrite_data_files`: interleaves the
  * bits of k normalized column ranks into one 64-bit key, so range-sorting
  * by the key co-locates rows that are close in EVERY dimension. File
  * min/max bounds then stay tight on ALL z-ordered columns at once —
  * after a z-order rewrite, a filter on any of the columns prunes files,
  * where a linear sort only serves its leading column. At 100 TB this is
  * the difference between "fast queries on ts" and "fast queries on ts OR
  * user OR score" from one layout.
  *
  * The key is built from pure Catalyst bitwise expressions (shift/and/or
  * — whole-stage-codegen'd, no UDF):
  *
  *  1. each column is linearly mapped to a uint16 rank over its actual
  *     [min, max] (one driver-visible agg pass computes the bounds —
  *     without normalization, same-magnitude values share their top bits
  *     and the interleave degenerates to the first column);
  *  2. bit i of column j lands at position `i * k + j` of the key.
  *
  * 16 bits/dimension bounds the key to 64 bits for up to 4 dimensions —
  * 65k distinct ranks per dimension is far finer than file granularity,
  * so nothing is lost at the clustering level. Numeric, date, and
  * timestamp columns are supported; strings are refused (hashing would
  * destroy the locality that makes this useful).
  */
object ZOrder {

  val MaxDims = 4
  private val Bits = 16

  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The z-value column for `cols` of `df`. Runs one aggregate over `df`
    * to learn per-column bounds (a rewrite job reads the data anyway;
    * +one metadata-light pass is the price of a non-degenerate key). */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= MaxDims,
      s"zorder takes 1..$MaxDims columns, got ${cols.size}")
    val schema = df.schema
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"zorder column '$c' not in schema"))
      require(supported(f.dataType),
        s"zorder column '$c' has unsupported type ${f.dataType.catalogString} " +
          "(numeric/date/timestamp only — hashing strings would destroy locality)")
    }
    // bounds pass: min/max per column, as doubles (monotone, so the
    // rank order is exact even where the lerp loses precision)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"__mn_$c"),
      max(col(c).cast(DoubleType)).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val k = cols.size
    val ranks = cols.zipWithIndex.map { case (c, j) =>
      val mn = if (row.isNullAt(2 * j)) 0.0 else row.getDouble(2 * j)
      val mx = if (row.isNullAt(2 * j + 1)) 0.0 else row.getDouble(2 * j + 1)
      val span = mx - mn
      val unit =
        if (span <= 0) lit(0.0)
        else (col(c).cast(DoubleType) - lit(mn)) / lit(span)
      // nulls sort first: rank 0, same as Spark's default NULLS FIRST
      coalesce(least(greatest(unit, lit(0.0)), lit(1.0)) * lit((1 << Bits) - 1),
        lit(0.0)).cast(LongType)
    }
    (0 until Bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** `df` range-clustered and sorted by the z-value of `cols`, helper
    * column dropped (projection preserves the row order the sort
    * established). */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int): DataFrame = {
    val out = df.columns.toSeq
    df.withColumn("__graft_z", zValue(df, cols))
      .repartitionByRange(math.max(numPartitions, 1), col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .select(out.map(col): _*)
  }
}
