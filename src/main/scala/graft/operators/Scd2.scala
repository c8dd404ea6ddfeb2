package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 (Kimball): apply a batch of updates
  * to a versioned dimension, closing out rows whose attributes changed
  * and inserting the new versions, while rows whose update carries
  * identical attributes are left untouched (no empty versions).
  *
  * Row shape: the dimension carries `validFrom`/`validTo` timestamp
  * columns, `validTo IS NULL` marking current rows; updates carry the
  * same key + attribute columns plus an effective-timestamp column.
  *
  * Scale shape: ONE equi-join of the current slice against the update
  * batch on the key (history rows stream through untouched), attribute
  * comparison with null-safe equality, and a union — no window, no
  * driver-side data. The update batch is the natural broadcast side
  * when it is a daily delta against a 100 TB dimension.
  *
  * Restated as Iceberg writes this is MERGE (close) + INSERT (new
  * versions); the pure-DataFrame form here is the engine-agnostic
  * kernel both share, and what the q142 oracle replays in SQL.
  */
object Scd2 {

  def apply(dim: DataFrame, updates: DataFrame, keyCols: Seq[String],
            attrCols: Seq[String], tsCol: String,
            validFrom: String = "valid_from",
            validTo: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val history = dim.filter(col(validTo).isNotNull)
    val current = dim.filter(col(validTo).isNull)

    val u = attrCols.foldLeft(
      updates.select((keyCols ++ attrCols :+ tsCol).map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, s"__u_$c")
    }
    // one update per key per batch, or the key join fans current rows
    // out and the "one current row per key" invariant silently breaks;
    // multi-change deltas must be collapsed (e.g. latest-ts wins) BEFORE
    // apply — refusing here beats corrupting the dimension. One small
    // aggregate job over the (delta-sized) batch.
    val dup = u.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"Scd2.apply: update batch carries multiple rows for key " +
        s"${dup.headOption.map(_.toSeq.init.mkString("(", ", ", ")"))
          .getOrElse("")} — collapse the batch to one change per key first")
    val joined = current.join(u, keyCols, "left")
    // null-safe: an attribute moving to/from NULL is a real change
    val differs = attrCols.map(c => !(col(c) <=> col(s"__u_$c")))
      .reduce(_ || _)
    val hasUpdate = col(tsCol).isNotNull

    val dimCols = dim.columns.toSeq
    // current rows with a CHANGING update: close at the update's ts
    val closed = joined.filter(hasUpdate && differs)
      .withColumn(validTo, col(tsCol))
      .select(dimCols.map(col): _*)
    // current rows with no update, or an identical-attribute update:
    // stay current (no empty version)
    val stillCurrent = joined.filter(!hasUpdate || !differs)
      .select(dimCols.map(col): _*)
    // new versions: changing updates + brand-new keys
    val newKeys = u.join(current.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val changedVersions = joined.filter(hasUpdate && differs)
      .select((keyCols.map(col) ++
        attrCols.map(c => col(s"__u_$c").as(c)) :+
        col(tsCol)): _*)
    val opened = changedVersions.unionByName(
        newKeys.select((keyCols.map(col) ++
          attrCols.map(c => col(s"__u_$c").as(c)) :+ col(tsCol)): _*))
      .withColumn(validFrom, col(tsCol))
      .withColumn(validTo, lit(null).cast(
        dim.schema(validTo).dataType))
      .select(dimCols.map(col): _*)

    history.unionByName(closed).unionByName(stillCurrent)
      .unionByName(opened)
  }
}
