package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._

import graft.functions.catalyst.BloomBitsAgg

/** Bloom-filter-bounded exact admission: "which incoming documents are
  * NOT already in the corpus", answered exactly, with the expensive
  * anti-join paid only by the sliver of rows the Bloom filter cannot
  * clear.
  *
  * The 100 TB shape of the problem: a plain `incoming ANTI JOIN corpus`
  * shuffles BOTH sides on the key — the corpus side is the whole archive.
  * The two-tier plan here:
  *
  *   1. the corpus folds map-side into one `numBits/8`-byte bitset
  *      ([[BloomBitsAgg]], OR-merged partials — one small value to the
  *      driver no matter the corpus size);
  *   2. every incoming row probes the bitset in the scan stage with pure
  *      built-in expressions (xxhash64 + bit ops — whole-stage codegen,
  *      zero shuffle). A clear miss is DEFINITELY new (Bloom filters have
  *      no false negatives) and is admitted without ever entering a join;
  *   3. only the "possibly seen" remainder — true duplicates plus the
  *      false-positive rate's worth of new rows (~0.1% at 20 bits/key,
  *      k = 7) — pays the exact anti-join against the corpus keys.
  *
  * The output is EXACT (identical to the plain anti-join): the filter
  * only routes rows between the free path and the join path. This is the
  * classic admission-control pre-filter (Bloom 1970; the same shape
  * Spark's own runtime row-group filters use), complementing
  * [[Dedup.incrementalAdmission]]'s stored-LSH NEAR-duplicate gate with
  * an EXACT-key gate that costs one broadcast value.
  *
  * The hash family is defined ONCE in Column space ([[hashPositions]])
  * and shared by build and probe, so they cannot drift.
  */
object BloomAdmission {

  /** k bit positions for one key: double-hashing-free direct family
    * `pmod(xxhash64(key, seed_i), numBits)` — each seed is an
    * independent 64-bit hash of (key, i), codegen'd by Spark's native
    * xxhash64. */
  def hashPositions(key: Column, numBits: Int, numHashes: Int): Column = {
    require(numBits >= 64 && (numBits & 63) == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    array((0 until numHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong))): _*)
  }

  /** Fold `df`'s key column into one Bloom bitset (big-endian words).
    * One aggregate job; the result is bounded by `numBits/8` bytes. */
  def buildBits(df: DataFrame, key: Column, numBits: Int,
                numHashes: Int): Array[Byte] = {
    val agg = GraftColumnShim.column(
      BloomBitsAgg(GraftColumnShim.expression(
        hashPositions(key, numBits, numHashes)), numBits)
        .toAggregateExpression())
    df.agg(agg.as("bits")).collect()(0).getAs[Array[Byte]](0)
  }

  /** Map-side membership probe: true = POSSIBLY in the set the bits were
    * built from, false = DEFINITELY not. Pure built-in expressions over
    * a word-array literal, so the probe rides whole-stage codegen inside
    * the incoming scan. */
  def mightContain(key: Column, bits: Array[Byte], numBits: Int,
                   numHashes: Int): Column = {
    val bb = java.nio.ByteBuffer.wrap(bits)
    val words = Array.fill(numBits / 64)(bb.getLong())
    val wordsLit = lit(words)
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      val word = element_at(wordsLit, (pos / 64).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(1L) === 1L
    }.reduce(_ && _)
  }

  /** The incoming rows whose `keyCol` does NOT appear in `corpus` —
    * exactly `incoming ANTI JOIN corpus ON keyCol`, with the Bloom
    * pre-filter routing clear misses around the join. Duplicate keys
    * WITHIN incoming are kept (same as the anti-join). */
  def admitNew(corpus: DataFrame, incoming: DataFrame, keyCol: String,
               numBits: Int = 1 << 20, numHashes: Int = 7): DataFrame = {
    // Same coercion discipline as JoinStrategies.bloomReducedJoin:
    // xxhash64(int) != xxhash64(long) for equal values, so mismatched
    // key types must hash through the join's common type or be refused —
    // a raw-column probe would silently drop true matches map-side.
    val (ct, it) =
      (corpus.schema(keyCol).dataType, incoming.schema(keyCol).dataType)
    val hashType = commonHashType(ct, it).getOrElse(throw
      new IllegalArgumentException(
        s"admitNew: key '$keyCol' types $ct (corpus) vs $it (incoming) " +
        "have no common join type — the Bloom probe would drop matches"))
    val bits = buildBits(corpus, col(keyCol).cast(hashType), numBits, numHashes)
    val maybe = mightContain(col(keyCol).cast(hashType), bits, numBits, numHashes)
    val fresh = incoming.filter(!maybe)
    val confirmed = incoming.filter(maybe)
      .join(corpus.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    fresh.unionByName(confirmed)
  }

  /** The single type both sides of an equi-join on (`a`, `b`) coerce to —
    * the type Bloom build AND probe must hash through so equal values
    * hash equally. Equal types pass through; differing types resolve via
    * Catalyst's own tightest-common-type rule (the same one the join's
    * analysis applies), so the hash space and the join's comparison space
    * cannot drift. None = the join itself would not analyze. */
  private[operators] def commonHashType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType):
      Option[org.apache.spark.sql.types.DataType] =
    if (a == b) Some(a)
    else org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findTightestCommonType(a, b)
}
