package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: tokenization,
  * token counting, n-gram shingling, quality metrics, a language-ID
  * heuristic, and document fingerprinting. All are pure Column expressions
  * (codegen'd, no UDFs), so they distribute trivially and push through
  * Catalyst like any built-in.
  */
object TextFunctions {

  /** Whitespace tokenizer (the testdata is space-separated words). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish sub-word-aware token count: words plus punctuation splits. */
  def tokenCount(text: Column): Column =
    size(split(text, "[\\s\\p{Punct}]+")).cast("bigint")

  def wordCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** Word n-gram shingles (n consecutive words, space-joined), distinct.
    * One codegen'd kernel call per row
    * ([[graft.functions.catalyst.ShingleStrings]]); the
    * `transform(sequence(...))` higher-order formulation it replaces is
    * interpreted lambda dispatch per element — the round-21 profile
    * found it as the last interpreted expression on a bench hot path
    * (decontamination evaluates it across the whole corpus side).
    * Output is bit-identical: short/empty documents yield the empty
    * array (the old `otherwise(array())` arm, kept via coalesce for
    * null text), distinctness keeps first-occurrence order.
    */
  def shingles(text: Column, n: Int): Column =
    coalesce(
      org.apache.spark.sql.GraftColumnShim.column(
        graft.functions.catalyst.ShingleStrings(
          org.apache.spark.sql.GraftColumnShim.expression(tokens(text)), n)),
      array().cast("array<string>"))

  // -- quality scoring ------------------------------------------------------

  /** Count of tokens contained in `words` — a codegen'd hash-set probe
    * ([[graft.functions.catalyst.CountInSet]]); the `filter` higher-order
    * function it replaces is CodegenFallback (interpreted), which cost 7×
    * on language-ID at bench scale.
    */
  private def countInSet(arr: Column, words: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.catalyst.CountInSet(
        org.apache.spark.sql.GraftColumnShim.expression(arr), words))

  /** Count of tokens that are in `stop` (codegen'd hash-set probe). */
  def stopwordCount(text: Column, stop: Seq[String]): Column =
    countInSet(tokens(text), stop).cast("bigint")

  /** Ratio of tokens that are in `stop`, rounded for oracle stability. */
  def stopwordRatio(text: Column, stop: Seq[String], scale: Int = 4): Column = {
    val w = tokens(text)
    round(
      countInSet(w, stop).cast("double") / size(w).cast("double"),
      scale)
  }

  /** Punctuation-character ratio over total characters. */
  def punctRatio(text: Column, scale: Int = 4): Column =
    round(
      (length(text) - length(regexp_replace(text, "\\p{Punct}", "")))
        .cast("double") / length(text).cast("double"),
      scale)

  /** Mean word length in characters (codegen'd char-length sum). */
  def meanWordLen(text: Column, scale: Int = 3): Column = {
    val w = tokens(text)
    val total = org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.catalyst.SumCharLengths(
        org.apache.spark.sql.GraftColumnShim.expression(w)))
    round(total.cast("double") / size(w).cast("double"), scale)
  }

  // -- repetition signals (Gopher-style quality rules) ----------------------

  /** Fraction of words that are repeats of an earlier word:
    * `1 − distinct/total`. The Gopher/MassiveText rules gate documents on
    * exactly this family of signals (templated spam and boilerplate score
    * high). Map-side array builtins, no shuffle. */
  def dupWordRatio(text: Column, scale: Int = 4): Column = {
    val w = tokens(text)
    round(lit(1.0) -
      size(array_distinct(w)).cast("double") / size(w).cast("double"), scale)
  }

  /** Fraction of words taken by the single most frequent word. One
    * O(n) hash-count pass per document via the codegen'd
    * [[graft.functions.catalyst.MaxElementCount]] kernel (an `aggregate`
    * HOF fold here would be CodegenFallback — interpreted with
    * per-element boxing, the hot-path pattern this codebase bans). */
  def topWordFraction(text: Column, scale: Int = 4): Column = {
    val w = tokens(text)
    val best = org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.catalyst.MaxElementCount(
        org.apache.spark.sql.GraftColumnShim.expression(w)))
    round(best.cast("double") / size(w).cast("double"), scale)
  }

  /** Fraction of word n-grams that are repeats: `1 − distinct/total` over
    * the document's n-gram multiset (0.0 when the document is shorter than
    * `n` words). High values mean looping/templated text. */
  def dupNgramRatio(text: Column, n: Int, scale: Int = 4): Column = {
    val total = size(tokens(text)) - (n - 1)
    when(total > 0,
      round(lit(1.0) -
        size(shingles(text, n)).cast("double") / total.cast("double"), scale))
      .otherwise(lit(0.0))
  }

  // -- language identification ---------------------------------------------

  /** Stopword tables for the heuristic language identifier. Tiny on
    * purpose: they broadcast as literals inside the expression tree.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3"))

  /** Heuristic language ID: argmax of per-language stopword hit counts,
    * ties broken by table order (first language wins), default "en" when
    * nothing matches. Deterministic, so it can be mirrored in oracle SQL.
    */
  def languageId(text: Column): Column = {
    val w = tokens(text)
    val scores = stopwords.map { case (lang, stop) =>
      lang -> countInSet(w, stop)
    }
    // lang_i wins if its score is strictly greater than every earlier
    // language's and >= every later one's (stable argmax, table order).
    val best = scores.zipWithIndex.foldRight(lit("en")) {
      case (((lang, score), i), rest) =>
        val beatsEarlier = scores.take(i).map(_._2 < score)
        val tiesLater = scores.drop(i + 1).map(_._2 <= score)
        val isMax = (beatsEarlier ++ tiesLater :+ (score > 0))
          .reduce(_ && _)
        when(isMax, lit(lang)).otherwise(rest)
    }
    best
  }

  // -- fingerprinting -------------------------------------------------------

  /** Rolling polynomial fingerprint over words, engine-portable: the
    * per-word value uses only `ascii`/`length` semantics (identical in
    * DuckDB), and the accumulator stays under 2^63 via mod 1e9+7 (DuckDB
    * raises on BIGINT overflow, so unbounded `acc * p + v` would not be
    * mirrorable). Codegen'd ([[graft.functions.catalyst.RollingFingerprint]])
    * — the former `aggregate` higher-order call was interpreted.
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.catalyst.RollingFingerprint(
        org.apache.spark.sql.GraftColumnShim.expression(tokens(text))))

  // -- PII redaction ----------------------------------------------------------

  /** PII shapes a training-data pipeline scrubs before a corpus ships.
    * Patterns stay in the Java∩RE2 common subset (no lookaround, no
    * backrefs) so the DuckDB oracle can apply the SAME regex — the
    * parity is part of the declared contract, like every text kernel
    * here. Replacement order matters: emails first (their local part
    * contains digits a later numeric pattern could half-eat), then the
    * most-specific numeric shapes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  private val PiiTags = Seq(
    EmailRe -> "<EMAIL>", SsnRe -> "<SSN>", PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")

  /** Replace each PII shape with a typed tag (`<EMAIL>`, `<SSN>`,
    * `<PHONE>`, `<IP>`). Pure `regexp_replace` chain — codegen'd, no UDF,
    * scales as a map-only projection. */
  def redactPII(text: Column): Column =
    PiiTags.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** How many PII matches the text carries (all shapes summed) — the
    * audit metric next to the scrub. */
  def piiCount(text: Column): Column =
    PiiTags.map { case (re, _) => regexp_count(text, lit(re)) }
      .reduce(_ + _).cast("bigint")

  // -- context-window chunking ----------------------------------------------

  /** Sliding-window word offsets for [[chunkText]]: a new chunk starts
    * every `chunkWords - overlapWords` words WHILE more than
    * `overlapWords` words remain — so the tail is always covered and no
    * chunk is fully contained in its predecessor. 1-based (Spark `slice`
    * convention); every document yields at least one chunk. */
  def chunkStarts(words: Column, chunkWords: Int, overlapWords: Int): Column = {
    require(overlapWords >= 0 && chunkWords > overlapWords,
      s"need 0 <= overlap < chunk, got chunk=$chunkWords overlap=$overlapWords")
    sequence(lit(1), greatest(size(words) - overlapWords, lit(1)),
      lit(chunkWords - overlapWords))
  }

  /** Explode a corpus into overlapping context-window chunks — the
    * embedding/RAG preprocessing step: `(id, chunk_idx, chunk, n_words)`
    * per window of `chunkWords` words with `overlapWords` words shared
    * between neighbors. Pure explode-over-`sequence` (codegen'd, no UDF):
    * at 100 TB this is a map-side row amplification of ~size/stride with
    * no shuffle at all. */
  def chunkDocuments(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, chunkWords: Int, overlapWords: Int)
      : org.apache.spark.sql.DataFrame = {
    // NULL/empty text folds to a ZERO-length word array (one empty chunk
    // with n_words = 0) rather than vanishing or counting a phantom
    // word: posexplode of a null array emits nothing (the document would
    // silently disappear from a curation pipeline), and split("") yields
    // [""] (n_words would over-count by one per empty document)
    val txt = coalesce(col(textCol), lit(""))
    val words = when(length(txt) === 0, array().cast("array<string>"))
      .otherwise(tokens(txt))
    df.select(col(idCol), words.as("__w"))
      .select(col(idCol),
        posexplode(chunkStarts(col("__w"), chunkWords, overlapWords))
          .as(Seq("chunk_idx", "__start")),
        col("__w"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__w"), col("__start"), lit(chunkWords)))
          .as("chunk"),
        least(size(col("__w")) - col("__start") + 1, lit(chunkWords))
          .cast("long").as("n_words"))
  }

  // -- URL canonicalization (web-corpus curation) ----------------------------
  //
  // A crawl's URL column is the dedup and filtering key: the same page
  // arrives as HTTP://WWW.Site.com/A?utm_source=feed#top and
  // http://site.com/A. Canonicalization (scheme off, host lowercased,
  // www. stripped, fragment dropped, tracking params removed, trailing
  // slash normalized) folds those into one key; the registrable domain is
  // the blocklist/quality-list unit. All of it is a regexp_replace/extract
  // chain — codegen'd, map-only at 100 TB, no UDF — and the patterns stay
  // in the Java∩RE2 subset so the DuckDB oracle runs the IDENTICAL
  // regexes (the q70 PII contract, applied to URLs).

  /** Strip the scheme and fragment: `HTTPS://x/y#f` → `x/y`. */
  private def schemeFragmentOff(u: Column): Column =
    regexp_replace(regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "#.*$", "")

  /** Lowercased host with any leading `www.` removed (path untouched —
    * URL paths are case-sensitive, hosts are not). */
  def urlHost(u: Column): Column =
    regexp_replace(lower(regexp_extract(schemeFragmentOff(u), "^([^/?]+)", 1)),
      "^www\\.", "")

  /** Naive registrable domain: the last two dot-labels of the host. (A
    * production pipeline consults the public-suffix list; the two-label
    * rule is the deterministic, dependency-free stand-in and is exactly
    * what the oracle recomputes.) */
  def registeredDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)

  /** Canonical URL key: lowercased www-less host + path with the
    * fragment, tracking params (`utm_*`, `gclid`, `fbclid`), empty query
    * and trailing PATH slash removed. The slash strip is anchored to the
    * path only (`^[^?]*` — nothing before the match may be a `?`): a
    * slash ending a query VALUE (`?p=a/`) is data, and stripping it
    * would conflate `?p=a/` with `?p=a` into one dedup key. */
  def canonicalizeUrl(u: Column): Column = {
    val base = schemeFragmentOff(u)
    val rest = regexp_replace(base, "^[^/?]+", "") // path[?query], case kept
    // `?` → `?&` so every param is &-prefixed, drop tracking params, then
    // collapse the seam back and trim a dangling separator
    val marked = regexp_replace(rest, "\\?", "?&")
    val filtered = regexp_replace(marked,
      "&(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*", "")
    val unmarked = regexp_replace(filtered, "\\?&", "?")
    val noEmptyQ = regexp_replace(unmarked, "\\?$", "")
    val noSlash = regexp_replace(noEmptyQ, "^([^?]*)/$", "$1")
    concat(urlHost(u), noSlash)
  }
}
