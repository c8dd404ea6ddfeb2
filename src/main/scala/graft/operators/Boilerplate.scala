package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boilerplate removal — the corpus-frequency cousin of the CCNet /
  * RefinedWeb duplicated-line filters: word n-grams that recur across
  * many documents (navigation chrome, license headers, cookie banners)
  * are detected corpus-wide and STRIPPED from every document, leaving
  * the surrounding text intact.
  *
  * Two passes, both scale-shaped:
  *  1. detection — explode n-gram starts, count DISTINCT docs per gram
  *     (one shuffle over the gram space), keep `df >= minDf` capped to
  *     the `topK` worst offenders under the total order (df DESC, gram
  *     ASC) — so the boilerplate list is deterministic and BOUNDED. It
  *     collects to the driver (topK rows, the same bounded-collect
  *     contract as k-means centroids) and broadcasts into pass 2.
  *  2. rewrite — purely map-side per document: mark word positions
  *     covered by any boilerplate occurrence, rebuild the text from the
  *     uncovered positions. The corpus is never shuffled.
  *
  * Texts are single-space tokenized (the corpus contract shared by every
  * text operator here); rebuilding uses the same tokenization, so a
  * document with no boilerplate round-trips byte-identically.
  */
object Boilerplate {

  /** Pass 1: boilerplate candidates as (gram, df), `df >= minDf`, at most
    * `topK` rows, ordered (df DESC, gram ASC). */
  def frequentNgrams(df: DataFrame, idCol: String, textCol: String,
                     n: Int, minDf: Long, topK: Int): DataFrame = {
    require(n >= 1 && topK >= 1)
    // the shared codegen'd shingle kernel (r21): per-doc distinct grams
    // map-side — the per-(doc, gram) set after `.distinct()` is
    // identical to the former duplicate-emitting transform's, the
    // distinct-doc counts therefore too, with the interpreted
    // per-position lambda dispatch gone
    df.select(col(idCol),
        explode(graft.functions.TextFunctions.shingles(col(textCol), n))
          .as("gram"))
      .distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("gram").asc)
      .limit(topK)
  }

  /** Pass 2: strip every occurrence of `grams` (each exactly `n` words)
    * from `textCol`; adds `cleaned` and `n_removed_words`. Map-side only.
    *
    * Membership is a hash probe ([[graft.functions.catalyst.InStringSet]]
    * — O(1) per window position, so the rewrite is O(words) per document
    * regardless of `topK`; an `array_contains` over the gram list would
    * be O(words × topK), 100× the work at topK=10k), and the kept-index
    * set difference is `array_except`, whose right side is hashed once
    * per row — O(words), not O(words × covered). */
  def removeNgrams(df: DataFrame, textCol: String, grams: Seq[String],
                   n: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    // one codegen'd kernel call per row (r21): the former
    // `filter(starts, inGrams) → transform → array_except → transform
    // (keptIdx, element_at)` chain was four higher-order functions —
    // interpreted lambda dispatch, O(words) per document each. The
    // kernel probes the same hash set per window, marks covered
    // positions, and re-joins the survivors; output bit-identical
    // (gated by the OperatorsSpec parity test).
    val res = GraftColumnShim.column(
      graft.functions.catalyst.RemoveNgrams(
        GraftColumnShim.expression(split(col(textCol), " ")), grams, n))
    // NULL text stays NULL: concat_ws over the propagated null would
    // quietly coerce absent documents into present-but-empty ones,
    // changing downstream dedup keys and counts
    df.withColumn("__g_bp", res)
      .withColumn("cleaned",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(col("__g_bp").getField("cleaned")))
      .withColumn("n_removed_words",
        coalesce(col("__g_bp").getField("removed"), lit(0)).cast("long"))
      .drop("__g_bp")
  }

  /** The composed operator: detect boilerplate, strip it everywhere. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        n: Int, minDf: Long, topK: Int): DataFrame = {
    val grams = frequentNgrams(df, idCol, textCol, n, minDf, topK)
      .collect().map(_.getString(0)).toSeq
    removeNgrams(df, textCol, grams, n)
  }
}
