package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by distributional importance — the DSIR idea (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * 2023): score every candidate document by how much more likely its
  * tokens are under a TARGET distribution (the domain you want more of)
  * than under the source corpus, then keep the top-scoring slice.
  *
  * This is the hashed/unigram instantiation: per-word likelihood ratios
  * `(count_target(w)+1) / (count_source(w)+1)` (add-one smoothed), and a
  * document's score is the sum of its words' ratios. Two deliberate
  * engineering choices for scale and reproducibility:
  *
  *  - The ratio is stored as the INTEGER `(scale*(ct+1)) div (cs+1)`
  *    (exact 64-bit integer division, not a float): per-doc scores are
  *    integer SUMs, so they are summation-ORDER-free and bit-identical
  *    across engines — a float log-ratio sum would differ in ULPs between
  *    Spark's and the oracle's reduction order.
  *  - The vocabulary table (one row per distinct word, already
  *    aggregated) is broadcast: the corpus explodes map-side into the
  *    hash join and partially re-aggregates per doc before the one
  *    doc-key shuffle. The 100 TB corpus is never shuffled whole; the
  *    vocab side is bounded by distinct-token count, not corpus size.
  *
  * Documents with no tokens have no defined score and are excluded.
  */
object Selection {

  /** Per-document importance scores. `isTarget` marks the rows whose
    * distribution we want more of; every row contributes to the source
    * (denominator) counts. Returns (idCol, n_words, score).
    *
    * `broadcastVocab` (default true) forces the vocab side of the join
    * into a broadcast — right for curated-corpus vocabularies (millions
    * of tokens). The distinct-token count of a RAW web crawl is
    * billions (typos, unicode, identifiers) and would OOM the driver:
    * pass false there for a shuffled hash join, or pre-hash tokens into
    * a bounded feature space (DSIR proper's hashed n-grams) upstream. */
  def importanceScores(corpus: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, scale: Long = 1000000L,
                       broadcastVocab: Boolean = true): DataFrame = {
    val words = corpus
      .select(col(idCol), isTarget.cast("boolean").as("__tgt"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
    val vocab = words.groupBy("__w").agg(
      count(lit(1)).as("__cs"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    // the product is formed in DECIMAL(38,0): `scale * (__ct + 1)` in
    // Long wraps silently (ANSI off) past ~9.2e18 — reachable for a
    // stop-word's corpus-wide count at the 100 TB scale this targets —
    // while 38 digits hold any Long × Long product; `div` on decimals
    // still yields the exact integral quotient as a Long
    val ratio = vocab.select(col("__w"),
      expr(s"(CAST($scale AS DECIMAL(38,0)) * (__ct + 1)) div (__cs + 1)")
        .as("__r"))
    words.join(if (broadcastVocab) broadcast(ratio) else ratio, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__r")).as("score"))
  }

  /** The selection: top `k` documents by (score DESC, id ASC). A total
    * deterministic order — integer scores, id tie-break — so the selected
    * set is reproducible bit-for-bit. Plans as TakeOrderedAndProject
    * (never a global sort). */
  def selectTopK(corpus: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int,
                 scale: Long = 1000000L): DataFrame =
    importanceScores(corpus, idCol, textCol, isTarget, scale)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
}
