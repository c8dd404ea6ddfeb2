package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** CCNet-style n-gram language-model quality scoring: train smoothed
  * bigram statistics on a REFERENCE corpus (CCNet uses Wikipedia; the
  * declared gate uses the corpus's own `lang = 'en'` slice), score every
  * document by its mean smoothed bigram probability, and split each
  * language into head/middle/tail quality buckets — the pretraining-data
  * triage CCNet (Wenzek et al. 2020 §4.3) runs before sampling.
  *
  * The per-bigram probability is add-one smoothed `(c2+1)/(c1+V)` kept in
  * INTEGER space (`× scale`, integer division): exactly reproducible
  * across engines with no ln/float ulp coin flips (the DSIR/TfIdf
  * discipline). Mean scaled probability ranks documents identically to
  * mean probability; it differs from log-space perplexity by weighting
  * typical bigrams more than rare ones, which is the robustness trade a
  * rank-into-buckets consumer wants anyway.
  *
  * Scale design: bigrams are built MAP-SIDE (two slices zipped — no
  * per-word explode+window pass); the model tables aggregate once each
  * (partial-merged) and join back by word keys, build side = one row per
  * vocab entry / bigram type. The vocabulary size rides along as a
  * broadcast one-row aggregate, never a driver-side action, so the whole
  * score is ONE lazy plan. Nothing in the pipeline holds more than a
  * document's own bigrams per task row.
  *
  * Skew: the unigram join key `w1` follows the Zipfian word distribution
  * ("the" alone is ~5-7% of a natural corpus), so a plain shuffle join
  * would put that fraction of ALL bigram rows in one task. Two built-in
  * mitigations cover it: Spark broadcasts the aggregated model tables
  * when they fit (vocab ≪ corpus — the common case, no shuffle of the
  * probe side at all), and above broadcast size AQE's skew-join splits
  * the hot partition at runtime (`spark.sql.adaptive.skewJoin`, on by
  * default). The bigram-key join skews far less (the top BIGRAM is ~1%)
  * and the same AQE path covers it.
  */
object NgramLm {

  /** (w1, w2) bigram structs, map-side. Empty for docs shorter than 2
    * words (slice of length 0), so they produce no score rows. */
  private def bigramPairs(text: Column): Column = {
    val w = TextFunctions.tokens(text)
    arrays_zip(slice(w, lit(1), size(w) - 1).as("w1"),
               slice(w, lit(2), size(w) - 1).as("w2"))
  }

  /** Per-document mean scaled smoothed-bigram probability against the
    * model trained on `ref`. Output: (idCol, n_bigrams, lm_score); docs
    * with fewer than 2 words keep NULL score and 0 bigrams.
    */
  def bigramScore(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      scale: Long = 1000000000L): DataFrame = {
    val uni = ref
      .select(explode(TextFunctions.tokens(col(refTextCol))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("vsize"))
    val bi = ref
      .select(explode(bigramPairs(col(refTextCol))).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val pairs = docs
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))
    val scored = pairs
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        expr(s"(coalesce(c2, 0L) + 1L) * ${scale}L div " +
             "(coalesce(c1, 0L) + vsize)").as("ps"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
           expr("sum(ps) div count(1)").as("lm_score"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
  }

  /** CCNet head/middle/tail triage: per-`langCol` ntile(`buckets`) over
    * the LM score (best score = bucket 1). Output adds `bucket`. */
  def qualityBuckets(
      scores: DataFrame, idCol: String, langCol: String,
      buckets: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("lm_score").desc_nulls_last, col(idCol).asc)
    scores.withColumn("bucket", ntile(buckets).over(w).cast("bigint"))
  }
}
