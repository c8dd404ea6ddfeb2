package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Gopher/MassiveText-style quality RULE BATTERY: the per-document metric
  * primitives live in [[graft.functions.TextFunctions]]; this operator is
  * the gate that turns them into thresholded per-rule flags and one `keep`
  * decision — the shape every production curation pipeline runs before
  * training (Rae et al. 2021 §A1.1; the reference has no curation surface,
  * so this is extension, not parity).
  *
  * Everything is a map-side codegen'd projection: zero shuffles, zero UDFs.
  * At 100 TB the battery streams through the scan at IO speed, and because
  * every flag is a plain Column the filter (`keep = true`) pushes into the
  * same stage as the metrics — rejected documents never leave the task.
  */
object QualityFilters {

  /** Per-rule thresholds. Defaults follow the Gopher paper's published
    * bounds where this schema can express them. */
  final case class GopherBounds(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minStopwords: Long = 2L,
      maxSymbolRatio: Double = 0.1,
      minAlphaWordRatio: Double = 0.8,
      maxDupNgramRatio: Double = 0.2,
      stopwords: Seq[String] =
        Seq("the", "a", "of", "to", "and", "in", "is", "that"))

  /** Count of words containing at least one ASCII letter. One regex scan:
    * every maximal non-space run with a letter yields exactly one match
    * (the trailing greedy `[^ ]*` always consumes to the word end), and the
    * pattern sits in the Java∩RE2 subset so the DuckDB oracle runs the
    * IDENTICAL regex — the PII-scrubber discipline.
    */
  def alphaWordCount(text: Column): Column =
    regexp_count(text, lit("[^ ]*[A-Za-z][^ ]*")).cast("bigint")

  /** '#' and '...' occurrences per word (the paper's "symbol-to-word
    * ratio"; ellipsis and hash floods mark scraped navigation/spam). */
  def symbolRatio(text: Column, scale: Int = 4): Column =
    round(regexp_count(text, lit("#|\\.\\.\\.")).cast("double") /
      TextFunctions.wordCount(text).cast("double"), scale)

  /** The battery: input plus metric columns, one boolean per rule, and
    * `keep` (AND of all rules). Flags are kept separate rather than folded
    * into `keep` so a pipeline can log WHY each document died — the audit
    * column every real curation run needs.
    */
  def gopherBattery(
      df: DataFrame, idCol: String, textCol: String,
      b: GopherBounds = GopherBounds()): DataFrame = {
    val text = col(textCol)
    val nWords = TextFunctions.wordCount(text)
    val meanLen = TextFunctions.meanWordLen(text)
    val nStop = TextFunctions.stopwordCount(text, b.stopwords)
    val symR = symbolRatio(text)
    val alphaR = round(alphaWordCount(text).cast("double") /
      nWords.cast("double"), 4)
    val dupNg = TextFunctions.dupNgramRatio(text, 3)
    val rWords = nWords.between(b.minWords, b.maxWords)
    val rMean = meanLen.between(b.minMeanWordLen, b.maxMeanWordLen)
    val rStop = nStop >= b.minStopwords
    val rSym = symR <= b.maxSymbolRatio
    val rAlpha = alphaR >= b.minAlphaWordRatio
    val rDup = dupNg <= b.maxDupNgramRatio
    df.select(col(idCol),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      nStop.as("n_stop"), symR.as("symbol_ratio"),
      alphaR.as("alpha_ratio"), dupNg.as("dup_3gram_ratio"),
      rWords.as("r_word_count"), rMean.as("r_mean_len"),
      rStop.as("r_stopwords"), rSym.as("r_symbols"),
      rAlpha.as("r_alpha"), rDup.as("r_dup_ngram"),
      (rWords && rMean && rStop && rSym && rAlpha && rDup).as("keep"))
  }
}
