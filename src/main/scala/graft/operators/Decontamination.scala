package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination for training pipelines.
  *
  * A training corpus must not contain the evaluation benchmarks it will
  * later be scored against, so the standard curation step flags every
  * training document that shares at least one word n-gram with the
  * benchmark set (the GPT-3/PaLM-style "13-gram overlap" rule — `n` is a
  * parameter because the right value is corpus-dependent).
  *
  * Scale shape: the benchmark side is small by nature (benchmarks are
  * megabytes; the corpus is the 100 TB side), so its distinct shingle set
  * is BROADCAST and the exploded corpus side streams through a map-side
  * hash join — the corpus is never shuffled. The only shuffle is the
  * per-document hit aggregation over the MATCHED rows, a vanishing
  * fraction of the corpus. Shingling itself is map-side row amplification
  * (`TextFunctions.shingles`: distinct word n-grams, codegen'd builtins).
  */
object Decontamination {

  /** Per-document overlap hits: (idCol, n_hits = distinct shared shingles).
    * Documents shorter than `n` words produce no shingles and cannot be
    * flagged — same convention as [[TextFunctions.shingles]]. */
  def overlapHits(train: DataFrame, bench: DataFrame, idCol: String,
                  textCol: String, n: Int = 8): DataFrame = {
    val benchSh = bench
      .select(explode(TextFunctions.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    val trainSh = train.select(col(idCol),
      explode(TextFunctions.shingles(col(textCol), n)).as("shingle"))
    // (doc_id, shingle) pairs are already unique — `shingles` is
    // array_distinct per document and the bench side is distinct'd — so a
    // plain count IS the distinct-shingle count, without the
    // distinct-aggregate expansion in the operator's only shuffle
    trainSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The clean corpus: training rows with zero benchmark overlap (anti
    * join against the flagged ids — matched ids are few, so the anti join
    * broadcasts too under AQE). */
  def removeContaminated(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 8): DataFrame =
    train.join(overlapHits(train, bench, idCol, textCol, n).select(col(idCol)),
      Seq(idCol), "left_anti")
}
