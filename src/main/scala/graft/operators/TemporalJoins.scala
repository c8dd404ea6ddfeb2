package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal join operators Spark lacks as built-ins (SURVEY §2.B marks
  * range/as-of joins "absent in reference; expressible as theta join" —
  * but the theta-join expression is a nested-loop / range-explosion plan,
  * so these are implemented Spark-first with scale-correct shapes):
  *
  *  - as-of join: union both sides + one window pass — a single hash
  *    shuffle on the key, no join at all;
  *  - range join: bucketize time, equi-join on (key, bucket) probing the
  *    adjacent buckets, then apply the exact predicate — turns an
  *    inequality join into a hash join with a 3× probe fan-out.
  */
object TemporalJoins {

  /** For each left row, attach the most recent right row with
    * `right.tsCol <= left.tsCol` on the same `on` key (NULLs when no such
    * row). Ties on the timestamp are broken by the greatest `tieCol`.
    *
    * Plan shape: one union, one window (single hash shuffle on `on`), one
    * filter — the classic sort-based as-of. The naive alternative
    * (`left JOIN right ON key AND r.ts <= l.ts` + row_number) materializes
    * every (left, earlier-right) pair first: quadratic per key at 100 TB.
    *
    * Output: all columns of `left`, plus each `rightCols` column as
    * `<prefix><name>`.
    *
    * NULL join keys follow equi-join semantics (NULL never equals NULL):
    * null-keyed left rows go straight to the NULL-fill output and
    * null-keyed right rows can never match — without the split they would
    * co-group in the window partition and incorrectly pair up. NULL
    * TIMESTAMPS follow SQL comparison semantics the same way: `NULL <=
    * ts` is not true, so a null-ts right row matches nothing (it would
    * otherwise sort nulls-first and become everyone's fallback match)
    * and a null-ts left row takes the NULL-fill output.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      on: Seq[String], tsCol: String, tieCol: String,
      rightCols: Seq[String], prefix: String = "r_"): DataFrame = {
    val rPayload = (rightCols :+ tieCol).distinct
    val rStructType = right.select(rPayload.map(col): _*).schema
    val lStructType = left.schema
    val nullKey = on.map(col(_).isNull).reduce(_ || _)
    val leftUnmatchable = nullKey || col(tsCol).isNull
    val (leftKeyed, leftNullKeyed) =
      (left.filter(!leftUnmatchable), left.filter(leftUnmatchable))
    val rightKeyed = right.filter(!nullKey && col(tsCol).isNotNull)

    val l2 = leftKeyed.select(
      on.map(col) ++ Seq(
        col(tsCol).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(LongType).as("_tie"),
        struct(left.columns.toSeq.map(col): _*).as("_l"),
        lit(null).cast(rStructType).as("_r")): _*)
    val r2 = rightKeyed.select(
      on.map(col) ++ Seq(
        col(tsCol).as("_ts"),
        lit(0).as("_side"),
        col(tieCol).cast(LongType).as("_tie"),
        lit(null).cast(lStructType).as("_l"),
        struct(rPayload.map(col): _*).as("_r")): _*)

    // rights sort before lefts at equal ts (side 0 < 1) so "<= ts" rows are
    // all behind the left row; among equal-ts rights the last (max tie)
    // wins — the deterministic tie-break the oracle mirrors.
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +:
        rightCols.map(c => col("_match").getField(c).as(s"$prefix$c")): _*)
    val rTypeByName = rStructType.fields.map(f => f.name -> f.dataType).toMap
    matched.unionByName(
      leftNullKeyed.select(left.columns.toSeq.map(col) ++
        rightCols.map(c => lit(null).cast(rTypeByName(c)).as(s"$prefix$c")): _*))
  }

  /** All (a, b) pairs on the same `on` key with
    * `|b.tsCol - a.tsCol| <= toleranceSec`. Both sides' time axis is
    * bucketized to `toleranceSec`-wide bins; `a` probes its own and both
    * adjacent bins, so the join is a pure equi hash join on (key, bin) and
    * the exact interval predicate filters the 3-bucket candidates. Each
    * qualifying pair matches exactly one probe bin — no dedup needed.
    */
  def rangeJoin(
      a: DataFrame, b: DataFrame,
      on: Seq[String], tsCol: String,
      toleranceSec: Long,
      aCols: Seq[String], bCols: Seq[String],
      aPrefix: String = "a_", bPrefix: String = "b_"): DataFrame = {
    require(toleranceSec > 0, "toleranceSec must be positive")
    val tolMicros = toleranceSec * 1000000L
    def bin(c: Column): Column = floor(unix_micros(c) / tolMicros)

    val a2 = a.select(
      on.map(col) ++
        Seq(unix_micros(col(tsCol)).as("_a_us"),
          explode(array(bin(col(tsCol)) - 1, bin(col(tsCol)), bin(col(tsCol)) + 1))
            .as("_bin")) ++
        aCols.map(c => col(c).as(s"$aPrefix$c")): _*)
    val b2 = b.select(
      on.map(col) ++
        Seq(unix_micros(col(tsCol)).as("_b_us"), bin(col(tsCol)).as("_bin")) ++
        bCols.map(c => col(c).as(s"$bPrefix$c")): _*)

    a2.join(b2, on :+ "_bin")
      .filter(abs(col("_b_us") - col("_a_us")) <= tolMicros)
      .drop("_bin", "_a_us", "_b_us")
  }
}
