package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus TF-IDF keyword extraction: the standard "what is this document
  * about" primitive a curation pipeline uses for topic sampling, domain
  * tagging, and index-time keyword fields.
  *
  * Scores are INTEGER-scaled (`tf * scale div df`) rather than
  * `tf * ln(N/df)`: the ranking is identical for any fixed tf (idf is
  * monotone-decreasing in df either way), and integer arithmetic makes the
  * per-document top-k ORDER-FREE — no cross-engine ulp coin flips at rank
  * boundaries, the same determinism discipline as DSIR's importance scores
  * ([[Selection.importanceScores]]).
  *
  * Scale design: one explode + one (doc, word) aggregate (partial-merged),
  * one word-level df aggregate over the already-aggregated (doc, word)
  * pairs — df rows are unique per (doc, word), so no count-distinct
  * shuffle — and a top-k window over each document's own terms (partition
  * = doc, bounded by doc length). The df side joins back by word: at
  * 100 TB that is a shuffle join on the word key whose build side is one
  * row per vocabulary word.
  */
object TfIdf {

  /** Top-`k` terms per document by tf·idf. Output:
    * (idCol, term, tf, df, score, rank), rank 1..k per doc.
    */
  def topTerms(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, scale: Long = 1000000L): DataFrame = {
    val tf = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // (id, term) rows are unique ⇒ plain count == distinct-doc count.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", expr(s"tf * ${scale}L div df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
}
