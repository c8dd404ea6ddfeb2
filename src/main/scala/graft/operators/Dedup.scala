package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for a large-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup.
  *
  * Scale notes (the point of each design):
  *  - exact: one hash shuffle on the dedup key — the minimal possible cost.
  *  - MinHash+LSH: signatures are computed map-side (explode + 2 shuffles:
  *    per-doc min-agg, then band self-join). The self-join key is
  *    (band, bandHash), so only genuinely colliding docs ever meet — no
  *    all-pairs blowup.
  *  - SimHash: one agg shuffle for signatures; candidate generation joins
  *    on 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 chunks equal).
  *  - n-gram Jaccard: exact, via inverted index (explode shingle → self-join
  *    on shingle); cost is Σ bucket², bounded by shingle selectivity rather
  *    than doc-pair count.
  */
object Dedup {

  /** Exact dedup: keep one row per key set (hash-partitioned groupBy). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact dedup keeping the lowest id per duplicate text group. */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // -- MinHash + LSH ---------------------------------------------------------

  /** Per-document MinHash signature over word `shingleSize`-gram shingles.
    * Hash family k is `xxhash64(k, shingle)` — deterministic, seedable,
    * computed per-row with no driver state. Output: (idCol, sig array<long>).
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): DataFrame = {
    val exploded = df
      .select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), shingleSize))
          .as("shingle"))
    val minCols = (0 until numHashes).map(k =>
      min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
    exploded.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `sig.size /
    * bands` rows, hash each band, emit (idCol, band, bandHash). Docs
    * agreeing on any full band become candidate pairs.
    */
  def lshBands(sig: DataFrame, idCol: String, numHashes: Int,
               bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandRows = (0 until bands).map { b =>
      sig.select(col(idCol), lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rows).map(r => col("sig")(b * rows + r)): _*))
          .as("band_hash"))
    }
    bandRows.reduce(_.unionByName(_))
  }

  /** Candidate near-dup pairs from MinHash LSH: self-join the band table on
    * (band, bandHash). Returns distinct (qa, qb) with qa < qb.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    val banded = lshBands(sig, idCol, numHashes, bands)
    val a = banded.select(col(idCol).as("qa"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("qb"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("qa") < col("qb"))
      .select(col("qa"), col("qb"))
      .distinct()
  }

  // -- SimHash ---------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: each token votes ±1 on every
    * bit of `xxhash64(token)`; bit i of the signature is set iff the vote
    * sum is positive. One shuffle (the per-doc agg); everything else is
    * map-side, codegen'd expressions.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i"))
    val agg = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (≤ 15).
    * Pigeonhole over four 16-bit chunks: distance ≤ 15 cannot flip a bit in
    * all 4 chunks... (distance ≤ 3 guarantees a clean chunk; for larger
    * thresholds this is a recall-1.0 filter only up to 3 flips spread
    * adversarially — standard SimHash practice).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = simhash64(df, idCol, textCol)
    val chunked = (0 until 4).map { c =>
      sig.select(col(idCol), col("simhash"), lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ck"))
    }.reduce(_.unionByName(_))
    val a = chunked.select(col(idCol).as("qa"), col("simhash").as("sa"),
      col("chunk"), col("ck"))
    val b = chunked.select(col(idCol).as("qb"), col("simhash").as("sb"),
      col("chunk"), col("ck"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("qa") < col("qb"))
      .select(col("qa"), col("qb"),
        expr("bit_count(sa ^ sb)").cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // -- n-gram Jaccard --------------------------------------------------------

  /** Exact n-gram Jaccard similarity for all doc pairs sharing ≥ 1 shingle,
    * via inverted index. Returns (qa, qb, j) with qa < qb, j rounded to
    * `scale` for oracle-stable comparison.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, scale: Int = 4): DataFrame = {
    val sh = df.select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), n)).as("shingle"))
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("qa"), col("shingle"))
    val b = sh.select(col(idCol).as("qb"), col("shingle"))
    val shared = a.join(b, Seq("shingle"))
      .filter(col("qa") < col("qb"))
      .groupBy(col("qa"), col("qb")).agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed(idCol, "qa")
        .withColumnRenamed("n_sh", "na"), Seq("qa"))
      .join(counts.withColumnRenamed(idCol, "qb")
        .withColumnRenamed("n_sh", "nb"), Seq("qb"))
      .select(col("qa"), col("qb"),
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")).cast("double"), scale)
          .as("j"))
  }
}
