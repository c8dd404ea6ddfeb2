package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level EXACT-SUBSTRING deduplication — the ExactSubstr operator
  * of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better"): any span of `k` consecutive tokens that appears more
  * than once ACROSS THE WHOLE CORPUS survives only at its globally-first
  * occurrence; every other copy is stripped in place, leaving the
  * surrounding text intact. This catches long verbatim repeats
  * (press-release bodies, quoted passages, license blocks) that
  * document-level near-dup misses (the documents differ) and that the
  * boilerplate filter only sees once a span recurs in ≥ minDf DISTINCT
  * documents — here TWO copies anywhere (even within one document)
  * already dedupe.
  *
  * The paper builds a corpus suffix array; the Spark-shaped equivalent
  * is a k-shingle fingerprint join, the same gram-space discipline as
  * decontamination/boilerplate:
  *
  *  1. explode each document into k-token shingles with their start
  *     positions — map-side;
  *  2. ONE aggregation over the shingle space: per shingle, the
  *     occurrence count and the lexicographically-first (doc, start)
  *     (a `min(struct(...))` — partial-aggregated map-side, so a
  *     mega-duplicated shingle never concentrates rows on one task the
  *     way a window would);
  *  3. occurrences of a duplicated shingle that are NOT the global
  *     first become covered positions; per document they union
  *     (overlapping spans coalesce) and the rewrite is the same
  *     map-side positional cover as boilerplate's pass 2.
  *
  * Tokens are single-space splits (the corpus contract shared by every
  * text operator here); a document with no duplicated span round-trips
  * byte-identically. The total order (doc_id, start) makes the kept
  * copy deterministic and engine-reproducible — the oracle recomputes
  * the identical winner.
  *
  * Scale: shingles shuffle once (hash-sized rows); the per-document
  * covered-position lists are bounded by document length; the corpus
  * text itself never shuffles — it meets its covered positions through
  * one key join on the document id.
  */
object SubstringDedup {

  /** Occurrences of duplicated k-shingles, split by role: `_1` = the
    * non-first copies (to strip), `_2` = the globally-first occurrences
    * (to PROTECT). Both are (idCol, start) rows. */
  private def spanRoles(df: DataFrame, idCol: String, textCol: String,
                        k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"span length must be >= 1, got $k")
    import org.apache.spark.sql.GraftColumnShim
    // positioned shingles via one codegen'd kernel call per row (r21):
    // the former transform(sequence(...), i => struct(i, concat_ws(...)))
    // was interpreted lambda dispatch per position; output identical
    // (same (start, gram) rows, short arrays empty, null text no rows)
    val pos = GraftColumnShim.column(
      graft.functions.catalyst.PositionedShingles(
        GraftColumnShim.expression(split(col(textCol), " ")), k))
    val occ = df
      .select(col(idCol).as("__id"),
        explode(coalesce(pos,
          array().cast("array<struct<start:int,g:string>>"))).as("o"))
      .select(col("__id"), col("o.start").as("start"), col("o.g").as("g"))
    val firsts = occ.groupBy(col("g")).agg(
      count(lit(1)).as("__n"),
      min(struct(col("__id"), col("start"))).as("__first"))
      .filter(col("__n") >= 2)
    val tagged = occ.join(firsts, Seq("g"))
      .withColumn("__isFirst",
        col("__id") === col("__first.__id") &&
          col("start") === col("__first.start"))
    (tagged.filter(!col("__isFirst")).select(col("__id").as(idCol), col("start")),
      tagged.filter(col("__isFirst")).select(col("__id").as(idCol), col("start")))
  }

  /** Non-first occurrences of duplicated k-shingles: (idCol, start) rows
    * to strip. Exposed for inspection/testing; `stripRepeatedSpans` is
    * the composed operator. */
  def repeatedSpanStarts(df: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame =
    spanRoles(df, idCol, textCol, k)._1

  /** The composed operator: strip every non-first copy of every
    * duplicated k-token span; adds `cleaned` and `n_removed_words`.
    *
    * A position is removed iff it lies inside some NON-FIRST occurrence
    * and inside NO first occurrence. The protection clause matters when
    * different duplicated spans overlap across documents: without it, a
    * span's globally-first copy could sit inside another span's
    * non-first copy and be stripped with it — the duplicated text would
    * then survive NOWHERE. With it, every duplicated span's first
    * occurrence is preserved intact (the copy that overlapped it keeps
    * exactly the protected words). NULL text stays NULL. */
  def stripRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame = {
    val (nonFirst, firstSpans) = spanRoles(df, idCol, textCol, k)
    val covered = nonFirst.groupBy(col(idCol))
      .agg(collect_list(col("start")).as("__starts"))
    val protectedS = firstSpans.groupBy(col(idCol))
      .agg(collect_list(col("start")).as("__pstarts"))
    val joined = df.join(covered, Seq(idCol), "left")
      .join(protectedS, Seq(idCol), "left")
    import org.apache.spark.sql.GraftColumnShim
    // positional cover + rebuild in one codegen'd kernel call (r21): the
    // former ranges → array_except → array_except → transform rebuild
    // was a chain of interpreted higher-order functions per document;
    // the kernel marks covered-minus-protected positions and re-joins
    // the survivors — identical output (OperatorsSpec parity test)
    val res = GraftColumnShim.column(
      graft.functions.catalyst.StripSpans(
        GraftColumnShim.expression(split(col(textCol), " ")),
        GraftColumnShim.expression(col("__starts")),
        GraftColumnShim.expression(col("__pstarts")), k))
    joined
      .withColumn("__g_ss", res)
      .withColumn("cleaned",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(col("__g_ss").getField("cleaned")))
      .withColumn("n_removed_words",
        coalesce(col("__g_ss").getField("removed"), lit(0)).cast("long"))
      .drop("__starts", "__pstarts", "__g_ss")
  }
}
