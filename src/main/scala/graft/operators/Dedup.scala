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

  /** Fingerprint-keyed exact dedup — [[exactKeepFirst]] without document
    * bodies as shuffle keys. At 100 TB `groupBy(text)` ships the FULL
    * corpus text through the exchange and compares megabyte strings in
    * the aggregate hash map; here the corpus-wide shuffle carries fixed
    * bytes per row regardless of document length.
    *
    * Two verification modes, both preserving [[exactKeepFirst]]'s keep
    * decisions on real corpora:
    *
    *  - DEFAULT (`verifyTextExact = false`): the group key is
    *    `(length, xxhash64, md5)` — ONE aggregation, one shuffle of
    *    ~60 fixed bytes/row at EVERY duplicate rate. Equality is
    *    cryptographic (a false merge needs a simultaneous length +
    *    xxhash64 + md5 collision) — the same standard
    *    [[paragraphDedup]]'s md5 winner election uses.
    *  - `verifyTextExact = true`: fingerprint groups with `count > 1`
    *    re-verify by grouping the REAL text, so even an md5-grade
    *    collision splits correctly. The duplicate sliver ships its text
    *    (twice: join + regroup) — measured SLOWER than the default, and
    *    slower than text-keyed grouping itself, once the duplicate
    *    fraction is high; reserve it for adversarial corpora.
    *
    * Output: one row per distinct TEXT — `(text_len, text_hash, keep_id,
    * dup_count)`. The keep decision on fixed-width keys is the honest
    * 100 TB contract (callers semi-join `keep_id` to retain texts). NULL
    * text stays its own group (length(NULL) is NULL, never colliding
    * with empty text's 0), exactly like `groupBy(text)`'s null bucket.
    */
  def exactKeepFirstByHash(df: DataFrame, textCol: String, idCol: String,
                           verifyTextExact: Boolean = false): DataFrame = {
    if (!verifyTextExact) {
      df.select(col(idCol).as("__id"),
          length(col(textCol)).as("text_len"),
          xxhash64(coalesce(col(textCol), lit(""))).as("text_hash"),
          md5(encode(coalesce(col(textCol), lit("")), "UTF-8")).as("__md5"))
        .groupBy(col("text_len"), col("text_hash"), col("__md5"))
        .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("dup_count"))
        .select("text_len", "text_hash", "keep_id", "dup_count")
    } else {
      val fp = df.select(col(idCol).as("__id"),
        length(col(textCol)).as("text_len"),
        xxhash64(coalesce(col(textCol), lit(""))).as("text_hash"))
      val agg = fp.groupBy(col("text_len"), col("text_hash"))
        .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("dup_count"))
      val multi = agg.filter(col("dup_count") > 1)
      val unique = agg.filter(col("dup_count") === 1)
      // exact verify on the duplicate sliver only; the semi join is
      // null-safe on text_len (NULL fingerprints must find their group)
      val sliver = df.select(col(idCol).as("__id"), col(textCol).as("__text"),
          length(col(textCol)).as("text_len"),
          xxhash64(coalesce(col(textCol), lit(""))).as("text_hash"))
        .join(multi.select(col("text_len").as("__ml"),
            col("text_hash").as("__mh")),
          col("text_len") <=> col("__ml") && col("text_hash") === col("__mh"),
          "left_semi")
      val verified = sliver
        .groupBy(col("text_len"), col("text_hash"), col("__text"))
        .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("dup_count"))
        .select("text_len", "text_hash", "keep_id", "dup_count")
      unique.select("text_len", "text_hash", "keep_id", "dup_count")
        .unionByName(verified)
    }
  }

  // -- MinHash + LSH ---------------------------------------------------------

  /** Per-document MinHash signature over word `shingleSize`-gram shingles.
    * Hash family k is `xxhash64(k, shingle)` — deterministic, seedable,
    * computed per-row with no driver state. Output: (idCol, sig array<long>).
    *
    * Documents shorter than `shingleSize` words fall back to a single
    * whole-text shingle, so short exact duplicates still become dedup
    * candidates — without the skew bomb of hashing them all into one
    * sentinel bucket.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): DataFrame = {
    // Codegen-first design. Higher-order functions (transform/aggregate)
    // are CodegenFallback — interpreted, lambda-boxing per element — so
    // the shingle chain is a dedicated codegen'd expression
    // ([[graft.functions.catalyst.ShingleHashes]]): every n-gram hash of
    // a document computes MAP-SIDE from its token array, bit-identical
    // to Spark's multi-arg xxhash64 over the window-`lead` formulation
    // rounds 1–19 used — but with NO exchange before aggregation. The
    // pipeline's ONLY shuffle now carries the partially-aggregated
    // (id, numHashes-long signature buffer) rows; the former shape
    // shuffled every (id, token) row for the window and sorted each
    // partition by position. At corpus scale that was the dominant
    // shuffle of the whole dedup family (tokens ≈ the corpus bytes).
    //
    // Documents shorter than the shingle size (including null/empty text)
    // fall back to ONE whole-text shingle in the same single scan: their
    // token array is replaced by [coalesce(text, '')], so short exact
    // duplicates still become dedup candidates and no document vanishes
    // (ShingleHashes chains over ALL elements of a shorter-than-n array —
    // exactly the xxhash64-skips-null-leads behavior of the window form).
    val toks0 = TextFunctions.tokens(col(textCol))
    val isFull = coalesce(size(toks0) >= shingleSize, lit(false))
    import org.apache.spark.sql.GraftColumnShim
    val ws = when(isFull, toks0)
      .otherwise(array(coalesce(col(textCol), lit(""))))
    val shingles = GraftColumnShim.column(
      graft.functions.catalyst.ShingleHashes(
        GraftColumnShim.expression(ws), shingleSize))
    val sh = df.select(col(idCol), explode(shingles).as("sh"))
    // one typed aggregate with a primitive numHashes-slot buffer (same
    // class-size rationale as SimhashVotes; values bit-identical to the
    // former per-family min(xxhash64(k, sh)) columns)
    val sigAgg = GraftColumnShim.column(
      graft.functions.catalyst.MinHashAgg(
        GraftColumnShim.expression(col("sh")), numHashes)
        .toAggregateExpression())
    sh.groupBy(col(idCol)).agg(sigAgg.as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `numHashes /
    * bands` rows, hash each band, emit (idCol, band, bandHash). Docs
    * agreeing on any full band become candidate pairs.
    *
    * All band hashes are emitted in ONE projection + `posexplode`, so the
    * (expensive) signature job runs exactly once — not once per band. At
    * 100 TB the difference is `bands`× the whole explode+agg pipeline.
    */
  def lshBands(sig: DataFrame, idCol: String, numHashes: Int,
               bands: Int): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands), " +
        "otherwise trailing hashes would be silently ignored")
    val rows = numHashes / bands
    val bandHashes = array((0 until bands).map { b =>
      xxhash64((0 until rows).map(r => col("sig")(b * rows + r)): _*)
    }: _*)
    sig.select(col(idCol), posexplode(bandHashes).as(Seq("band", "band_hash")))
  }

  /** Expand each bucket (rows sharing `keys`) into its member pairs with a
    * single shuffle: groupBy bucket → collect members → nested explode.
    * Compared with a self-join on the bucket key this computes the
    * upstream pipeline ONCE (a self-join evaluates it per side) and
    * shuffles once instead of twice; the Σ bucket² pair expansion happens
    * map-side after the aggregation.
    *
    * `maxBucket` is the skew guard: a degenerate bucket (pathological hash
    * collision / boilerplate-heavy corpus) would otherwise expand
    * quadratically and hold its whole member list in one aggregation
    * buffer. Buckets above the cap are dropped — at dedup scale a bucket
    * that large is itself the answer ("these are all near-identical"), not
    * pair-enumeration material.
    *
    * The cap must prevent the hot bucket's aggregation buffer from ever
    * MATERIALIZING, not drop it after `collect_list` already buffered
    * millions of member structs in one reducer. A two-pass election
    * (`groupBy.count` + left-semi join back) achieves that but shuffles
    * the banded set TWICE — measured ~2x on the minhash family — so the
    * bound lives inside the aggregate instead:
    * [[graft.functions.catalyst.BoundedCollectAgg]] collects at most
    * `maxBucket` members per bucket and frees the list the moment the
    * exact count passes the cap, on the update path AND both merge
    * paths. One exchange, O(maxBucket) memory per key, and an over-cap
    * bucket ships zero members through the shuffle.
    */
  private def bucketPairs(
      banded: DataFrame, keys: Seq[String], payload: Seq[Column],
      maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    val item = struct(payload: _*)
    val bounded = GraftColumnShim.column(
      graft.functions.catalyst.BoundedCollectAgg(
        GraftColumnShim.expression(item), maxBucket)
        .toAggregateExpression())
    banded
      .groupBy(keys.map(col): _*)
      .agg(bounded.as("bc"))
      .filter(col("bc").getField("cnt") >= 2 &&
        col("bc").getField("cnt") <= maxBucket)
      .select(explode(col("bc").getField("items")).as("a"),
        col("bc").getField("items").as("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a").getField("_id") < col("b").getField("_id"))
  }

  /** Candidate near-dup pairs from MinHash LSH: bucket by (band, bandHash),
    * expand buckets to pairs. Returns distinct (qa, qb) with qa < qb.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      shingleSize: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    val banded = lshBands(sig, idCol, numHashes, bands)
    bucketPairs(banded, Seq("band", "band_hash"),
        Seq(col(idCol).as("_id")), maxBucket)
      .select(col("a._id").as("qa"), col("b._id").as("qb"))
      .distinct()
  }

  // -- duplicate clusters (connected components) -----------------------------

  /** Connected components over candidate duplicate pairs: the last stage
    * of every dedup pipeline — pairs say "these two match", components
    * say "this GROUP is one document", which is what lets a pipeline keep
    * exactly one canonical copy when A~B and B~C but A and C never met in
    * a bucket.
    *
    * Min-label propagation WITH pointer jumping: every node starts as its
    * own component; each iteration, (1) a node adopts the smallest
    * component id among itself and its neighbors, then (2) shortcuts
    * through its label's own label (`comp := min(comp, label(comp))`) —
    * the classic shortcutting step, which collapses chains geometrically,
    * so convergence is O(log diameter) iterations, not O(diameter) (a
    * 100 TB near-dup chain of depth thousands — pathological but real in
    * boilerplate-heavy corpora — finishes in ~12 rounds, not thousands).
    * Each iteration is ONE Spark job (the per-round `localCheckpoint`):
    * propagation join + min-agg + pointer-jump self-join + a prev-label
    * join that carries a `changed` flag, all over the EDGE/label sets
    * (pairs, not the corpus; the corpus never shuffles). Convergence is
    * then a shuffle-free take(1) on the materialized leaf — not a
    * separate shuffle-join action. The driver-side loop holds only a
    * converged flag per iteration — no component data ever collects.
    *
    * Exiting at `maxIter` without a fixpoint THROWS: partially-merged
    * labels would silently split one duplicate chain into several
    * "components" and keepCanonical would keep several copies. The
    * default bound (64 > log2 of any possible node count) is a pure
    * safety valve — a genuine non-convergence is a bug, never data shape.
    *
    * Returns (id, component) for every node appearing in `pairs`, where
    * `component` = the minimum id in the node's component. Nodes with no
    * pair are absent (they are their own singleton cluster).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "qa",
                          bCol: String = "qb", maxIter: Int = 64): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    var i = 0
    var converged = sym.isEmpty
    while (!converged && i < maxIter) {
      // (1) adopt the minimum label in the closed neighborhood
      val prop = sym.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("comp"))
      val minNbr = labels.union(prop)
        .groupBy("id").agg(min("comp").as("comp"))
      // (2) pointer jumping: follow the label's own label one hop —
      // monotone (label(comp) <= comp, same component), and what turns
      // chain collapse from linear to logarithmic.
      // localCheckpoint (not persist): each iteration's plan references
      // the previous one TWICE (the self-join), so without lineage
      // truncation the logical plan doubles per round — exponential
      // planning/analysis cost long before any data moves. Iterative
      // algorithms on Spark need their per-round result materialized
      // as a plan LEAF.
      val jumped = minNbr.join(
          minNbr.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("id"), least(col("comp"), col("comp2")).as("comp"))
      // Fold the convergence test into the SAME materialized pass: carry
      // the previous label through the plan and flag rows whose label
      // still moved (labels only ever decrease, so `comp < prev` ⇔
      // changed). Each round then costs exactly ONE Spark job — the
      // checkpoint — plus a shuffle-free take(1) scan of the
      // materialized leaf; the old separate convergence action was a
      // full shuffle join per round (the r8 q63 bench regression).
      val next = jumped
        .join(labels.select(col("id"), col("comp").as("prev")), "id")
        .select(col("id"), col("comp"),
                (col("comp") < col("prev")).as("changed"))
        .localCheckpoint(true)
      converged = next.where(col("changed")).isEmpty
      // Dataset.unpersist is a NO-OP on a localCheckpoint'd frame (its
      // blocks live outside the CacheManager): free the previous round's
      // RDD blocks explicitly or 64 rounds of labels pile up in storage
      graft.iceberg.IcebergTable.unpinLocalCheckpoint(labels)
      labels = next.select("id", "comp")
      i += 1
    }
    sym.unpersist()
    if (!converged) {
      graft.iceberg.IcebergTable.unpinLocalCheckpoint(labels)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter iterations " +
          "— returning partially-merged labels would silently keep " +
          "duplicate copies; raise maxIter (log2(nodes) rounds suffice " +
          "with pointer jumping) or investigate the pair set")
    }
    labels
  }

  /** Keep ONE canonical row per duplicate cluster: rows whose id is the
    * cluster minimum survive; other cluster members drop; rows in no pair
    * (singletons) always survive. `pairs` columns default to
    * [[minhashCandidatePairs]]' output. */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame,
                    aCol: String = "qa", bCol: String = "qb"): DataFrame = {
    // '__g_comp', not 'comp': the caller's df may legitimately carry a
    // 'comp' column (a pipeline that already ran clustering) and an
    // unprefixed join column would make every later reference ambiguous
    val comps = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("comp", "__g_comp")
    df.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("__g_comp").isNull || col("__g_comp") === col(idCol))
      .drop("__g_comp")
  }

  /** [[keepCanonical]] keeps each cluster's min-id member; real pipelines
    * keep its BEST member — the longest, cleanest, or highest-scoring
    * duplicate survives. Same cluster algebra (connected components over
    * the pair graph), but the winner is argmax(`quality`, ties → min id).
    *
    * Scale shape: the rank window runs ONLY over clustered rows (an inner
    * join against the components, usually a sliver of the corpus) — never
    * a corpus-wide window; unclustered rows pass through via one
    * left-anti join. Cluster membership shuffles by component id, whose
    * cardinality the duplicate structure bounds.
    */
  def keepCanonicalBy(df: DataFrame, idCol: String, quality: Column,
                      pairs: DataFrame, aCol: String = "qa",
                      bCol: String = "qb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("comp", "__g_comp")
    val clustered = df.join(comps, Seq(idCol))
    val rank = row_number().over(
      Window.partitionBy(col("__g_comp"))
        .orderBy(quality.desc, col(idCol).asc))
    val winners = clustered.withColumn("__rk", rank)
      .filter(col("__rk") === 1).drop("__rk", "__g_comp")
    df.join(comps, Seq(idCol), "left_anti").unionByName(winners)
  }

  // -- incremental (corpus-vs-batch) admission -------------------------------

  /** The persisted MinHash-LSH band index of a corpus: (idCol, band,
    * band_hash) — `bands` rows of three longs per document. This is the
    * artifact an incremental pipeline STORES alongside the corpus: at
    * 100 TB, re-shingling yesterday's corpus on every ingest is the cost
    * that kills incremental dedup, so the index is computed once per doc
    * (at admission time) and appended, exactly like the data files.
    */
  def minhashBandIndex(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 32, bands: Int = 8,
                       shingleSize: Int = 3): DataFrame = {
    // The index is self-describing: its build parameters ride along as
    // field metadata (preserved through a parquet round-trip), so
    // incrementalAdmission can refuse a probe whose parameters disagree
    // — a silent mismatch would degrade recall to ~zero with no signal.
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.numHashes", numHashes)
      .putLong("graft.bands", bands)
      .putLong("graft.shingleSize", shingleSize)
      .build()
    lshBands(minhashSignatures(df, idCol, textCol, numHashes, shingleSize),
        idCol, numHashes, bands)
      .select(col(idCol), col("band").as("band", md), col("band_hash"))
  }

  /** Incremental batch admission: dedupe a NEW batch against an EXISTING
    * corpus without ever re-processing the corpus — the shape every
    * growing training corpus actually runs (daily crawl ingest), where
    * "re-dedupe the world" is not an option.
    *
    * Mechanics: the batch is shingled/banded once ([[minhashBandIndex]],
    * materialized — it feeds both probes); corpus collisions come from a
    * hash join of batch bands against the STORED `corpusIndex` (the
    * corpus text is touched only to verify the candidates that collide);
    * batch-internal duplicates go through the standard bucket→pairs→
    * connected-components pipeline over the batch alone. Candidate pairs
    * from both probes are confirmed by `verify` — by default NULL-SAFE
    * exact text equality (`<=>`: two NULL texts ARE duplicates, matching
    * `exactKeepFirst`'s groupBy semantics and SQL's `PARTITION BY text`
    * / `IS NOT DISTINCT FROM`), which makes the whole operator's OUTPUT
    * engine-portable (any SQL engine reproduces it with equality joins;
    * LSH is only the blocking strategy that avoids the quadratic
    * compare). A fuzzy pipeline passes a Jaccard/cosine verifier instead
    * and accepts candidate-recall semantics (q41c's measured contract).
    * One bound on the exactness claim: both probes cap bucket expansion
    * (`maxBucket` internally, `probeMaxBucket` against the corpus), so
    * an exact-duplicate GROUP larger than the cap is not
    * pair-enumerated — at that size the bucket itself is the answer and
    * belongs to an upstream boilerplate rule, not pair admission.
    *
    * Returns `batch` plus three flags:
    *  - `dup_of_corpus`: some corpus doc collided in ≥1 band AND verified
    *  - `batch_dup`: the doc is in a verified batch-internal duplicate
    *    cluster and is not its minimum-id (canonical) member
    *  - `keep`: neither — the rows a pipeline appends to the corpus.
    *
    * Scale notes: batch bands shuffle once (they are (long,long,long)
    * rows, not text); the corpus side ships only index rows matching the
    * batch's band hashes (a runtime filter / DPP-style join, broadcast
    * when the batch is small); corpus text is read through a join keyed
    * by the (small) verified-candidate id set. Nothing recomputes corpus
    * signatures. With exact verification, equal texts have identical
    * signatures, hence collide in EVERY band — recall 1.0 by
    * construction, the property q87's oracle proves.
    *
    * `probeMaxBucket` is the corpus-probe twin of `maxBucket`: index rows
    * in a band bucket larger than the cap are excluded from the probe,
    * bounding the candidate join at Σ |batch bucket|·cap instead of
    * quadratic blowup on a hot bucket (boilerplate-dense corpora). Exact
    * recall degrades only if ALL `bands` buckets of a corpus twin are
    * over the cap — i.e. the twin sits in a >cap-dense near-dup
    * neighborhood that this same operator would have collapsed at ITS
    * admission; near-dup recall over capped buckets degrades to the
    * usual candidate semantics. Bucket sizes come from a map-side-
    * combined groupBy + semi-join (one small extra exchange) — a window
    * would ship the hot bucket whole to one task just to count it.
    */
  def incrementalAdmission(
      corpusIndex: DataFrame, corpus: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      maxBucket: Int = 10000, probeMaxBucket: Int = 10000,
      verify: (Column, Column) => Column = _ <=> _): DataFrame =
    incrementalAdmissionWithIndex(corpusIndex, corpus, batch, idCol, textCol,
      numHashes, bands, shingleSize, maxBucket, probeMaxBucket, verify)._1

  /** [[incrementalAdmission]] that ALSO returns the batch's band index
    * (already materialized internally) — callers that append admitted
    * rows to a stored index (the streaming ingest loop) filter it to the
    * kept ids instead of re-running the whole shingle+minhash pipeline a
    * second time. Returns (flags, batchBandIndex). */
  def incrementalAdmissionWithIndex(
      corpusIndex: DataFrame, corpus: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      maxBucket: Int = 10000, probeMaxBucket: Int = 10000,
      verify: (Column, Column) => Column = _ <=> _,
      /** Storage-pruned probe (the 100 TB path): given the batch's
        * `band_hash` key column (|batch| × bands values, duplicates
        * fine), return an index DataFrame covering AT LEAST those
        * buckets — an Iceberg-stored index partitioned by
        * `bucket[N](band_hash)` serves this through
        * [[graft.iceberg.connector.RuntimeProbe.prunedByKeys]], whose
        * runtime filter file-prunes the scan so per-batch index IO is
        * ∝ batch, not corpus, with no driver-side key collect and no
        * key-count cap (round 14; earlier rounds collected ≤100k keys
        * with a full-scan fallback). The probe's semi-join re-enforces
        * the key filter, so a provider returning MORE rows is always
        * correct. */
      prunedCorpusIndex: Option[DataFrame => DataFrame] = None)
      : (DataFrame, DataFrame) = {
    // Refuse a probe whose LSH parameters disagree with the ones the
    // stored index was built with (self-described via field metadata):
    // a mismatched (band, band_hash) join matches ~nothing and would
    // silently admit every duplicate.
    corpusIndex.schema.find(_.name == "band").map(_.metadata)
      .filter(_.contains("graft.bands")).foreach { m =>
        val (h, b, sh) = (m.getLong("graft.numHashes"),
          m.getLong("graft.bands"), m.getLong("graft.shingleSize"))
        require(h == numHashes && b == bands && sh == shingleSize,
          s"corpusIndex was built with numHashes=$h bands=$b " +
            s"shingleSize=$sh but admission was invoked with " +
            s"numHashes=$numHashes bands=$bands shingleSize=$shingleSize " +
            "— a mismatched probe would silently admit every duplicate")
      }
    // Materialized once: feeds the corpus probe AND the internal-pair
    // probe; without the pin the whole shingle+agg pipeline runs twice.
    val bIdx = minhashBandIndex(batch, idCol, textCol,
        numHashes, bands, shingleSize)
      .localCheckpoint(true)
    val bTxt = batch.select(col(idCol), col(textCol))

    // corpus probe: band collision -> candidate (batch, corpus) id pairs
    // -> verify on the two texts. distinct() before the text joins so a
    // doc pair colliding in k bands verifies once, not k times.
    //
    // TOUCHED-BUCKETS-FIRST (round 13): the stored index grows with the
    // corpus, but a batch can only collide in the ≤ |batch| × bands
    // buckets its own keys hash to — so the index is key-filtered to
    // those buckets BEFORE anything else. The semi-join keeps WHOLE
    // buckets (the filter is on the bucket key), so the probeMaxBucket
    // cap below counts exactly the same sizes it counted over the full
    // index. Previously the cap's groupBy ran over the ENTIRE index per
    // batch — two full index passes whose cost grew linearly with the
    // corpus (BenchScale stream_admission: 106 → 55 rows/s from 1× to
    // 20×); now the full index is streamed once through a (typically
    // broadcast) semi-join and every later stage sees only touched rows.
    val indexSource = prunedCorpusIndex match {
      case Some(provider) => provider(bIdx.select(col("band_hash")))
      case None => corpusIndex
    }
    val cIdxAll = indexSource.select(col(idCol).as("__cid"),
      col("band"), col("band_hash"))
    val batchKeys = bIdx.select(col("band"), col("band_hash")).distinct()
    val cIdx0 = cIdxAll.join(batchKeys, Seq("band", "band_hash"), "left_semi")
    val cIdx =
      if (probeMaxBucket == Int.MaxValue) cIdx0
      else {
        // bucket sizes via groupBy, NOT a window: a window has no partial
        // aggregation, so the pathological hot bucket the cap exists to
        // neutralize would itself be shipped whole to one task just to
        // be counted. groupBy map-side-combines to one row per bucket
        // per task; the semi-join back is AQE-skew-splittable.
        val small = cIdx0.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= probeMaxBucket)
          .select(col("band"), col("band_hash"))
        cIdx0.join(small, Seq("band", "band_hash"), "left_semi")
      }
    val candC = bIdx.join(cIdx, Seq("band", "band_hash"))
      .select(col(idCol), col("__cid")).distinct()
      // pinned: the candidate set feeds the verify join AND (as probe
      // keys) the pruned corpus read below — without the pin the whole
      // index-probe pipeline would re-run per consumer
      .localCheckpoint(true)
    // the verify join's CORPUS read is candidate-bounded at the storage
    // layer: the candidate ids broadcast-semi-join into the corpus rows
    // first, and when the corpus is a Graft DSv2 read (the streaming
    // sink's shape) the runtime-probe rule file-prunes that scan by id
    // bounds — per-batch corpus IO ∝ candidates, not corpus. With zero
    // candidates the runtime In filter prunes every file (no read at
    // all); a plain-DataFrame corpus just loses the file pruning, never
    // rows (the semi join enforces the ids exactly).
    val corpusRows = corpus.select(col(idCol).as("__cid"),
      col(textCol).as("__ct"))
    val prunedCorpusRows = corpusRows.join(
      org.apache.spark.sql.functions.broadcast(
        graft.iceberg.connector.RuntimeProbe.markedKeys(
          corpus.sparkSession, candC.select(col("__cid")), "__cid",
          corpusRows.schema("__cid").dataType)),
      Seq("__cid"), "left_semi")
    val corpusDup = candC
      .join(bTxt.select(col(idCol), col(textCol).as("__bt")), Seq(idCol))
      .join(prunedCorpusRows, Seq("__cid"))
      .filter(verify(col("__bt"), col("__ct")))
      .select(col(idCol)).distinct()

    // batch-internal probe: buckets -> pairs -> verify -> components.
    val pairs = bucketPairs(bIdx, Seq("band", "band_hash"),
        Seq(col(idCol).as("_id")), maxBucket)
      .select(col("a._id").as("qa"), col("b._id").as("qb")).distinct()
    val vPairs = pairs
      .join(bTxt.select(col(idCol).as("qa"), col(textCol).as("__ta")), Seq("qa"))
      .join(bTxt.select(col(idCol).as("qb"), col(textCol).as("__tb")), Seq("qb"))
      .filter(verify(col("__ta"), col("__tb")))
      .select(col("qa"), col("qb"))
    val comps = connectedComponents(vPairs)

    val flags = batch
      .join(corpusDup.withColumn("__dc", lit(true)), Seq(idCol), "left")
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("dup_of_corpus", coalesce(col("__dc"), lit(false)))
      .withColumn("batch_dup",
        col("comp").isNotNull && col("comp") =!= col(idCol))
      .withColumn("keep", !col("dup_of_corpus") && !col("batch_dup"))
      .drop("__dc", "comp")
    (flags, bIdx)
  }

  // -- SimHash ---------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: each token votes ±1 on every
    * bit of `xxhash64(token)`; bit i of the signature is set iff the vote
    * sum is positive. One shuffle (the per-doc agg); everything else is
    * map-side.
    *
    * The vote aggregation is a single typed aggregate over a primitive
    * 64-slot buffer ([[graft.functions.catalyst.SimhashVotes]]). Round 2
    * used 64 separate `sum` columns; the generated aggregate class was big
    * enough to blow the JIT method limit and pollute the JVM code cache
    * for unrelated queries, which the round-2 bench caught as 4–10×
    * regressions. Partial aggregation still applies — the shuffle carries
    * one 512-byte buffer per (doc, map partition), not token rows.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    val votes = GraftColumnShim.column(
      graft.functions.catalyst.SimhashVotes(
        GraftColumnShim.expression(xxhash64(col("tok"))))
        .toAggregateExpression())
    // NULL text tokenizes as [""] (the minhash fallback-shingle rule):
    // explode of a NULL array emits no rows, so null-text docs would get
    // NO signature and silently escape every simhash dedup — while two
    // NULL texts ARE duplicates under the codebase's null-safe convention
    df.select(col(idCol),
        explode(TextFunctions.tokens(coalesce(col(textCol), lit(""))))
          .as("tok"))
      .groupBy(col(idCol))
      .agg(votes.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming`.
    * Pigeonhole over four 16-bit chunks: hamming ≤ 3 flips bits in at most
    * 3 chunks, so at least one chunk matches exactly — recall 1.0. Beyond
    * 3 the guarantee breaks, so larger thresholds are rejected rather than
    * silently returning an incomplete pair set.
    *
    * Recall caveat: `maxBucket` (the quadratic-expansion skew guard)
    * bounds the pigeonhole guarantee — a 16-bit chunk value shared by more
    * than `maxBucket` documents (e.g. chunk 0 on sparse hashes at corpus
    * scale) is dropped from pair enumeration, exactly like
    * `ngramJaccardPairs`' document-frequency cap. Raise it if full recall
    * matters more than the hot-bucket bound.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming: the 4-chunk pigeonhole filter guarantees " +
        "full recall only for hamming <= 3")
    val sig = simhash64(df, idCol, textCol)
    // all 4 chunks in one projection + posexplode: the signature job runs
    // once, not once per chunk (and not again per self-join side)
    val chunked = sig.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ck")))
    bucketPairs(chunked, Seq("chunk", "ck"),
        Seq(col(idCol).as("_id"), col("simhash").as("_sig")), maxBucket)
      .select(col("a._id").as("qa"), col("b._id").as("qb"),
        expr("bit_count(a._sig ^ b._sig)").cast("bigint").as("hamming"))
      // filter BEFORE the distinct: bit_count is map-side-cheap and most
      // 16-bit chunk collisions are between unrelated docs — rejecting
      // them before the exchange keeps the shuffle to the accepted pairs
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // -- n-gram Jaccard --------------------------------------------------------

  /** Exact n-gram Jaccard similarity for all doc pairs sharing ≥ 1 shingle,
    * via inverted index. Returns (qa, qb, j) with qa < qb, j rounded to
    * `scale` for oracle-stable comparison.
    *
    * `maxShingleDf` is the skew guard: the self-join costs Σ bucket² over
    * shingle buckets, so one shingle shared by millions of documents at
    * 100 TB is a quadratic hot bucket. Shingles with document frequency
    * above the cap are dropped from the index before the join (standard
    * inverted-index practice); similarity is then exact Jaccard over the
    * capped shingle universe — pairs sharing ONLY ultra-common shingles
    * are missed, which is the intended trade. The default is far above
    * anything in the declared test data, so declared-query results are
    * exact over the full universe.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, scale: Int = 4, maxShingleDf: Long = 100000L): DataFrame = {
    val sh = df.select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), n)).as("shingle"))
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("shingle"))
    val indexed = sh.join(rare, Seq("shingle"))
    // per-doc sizes over the SAME capped shingle universe as the shared
    // counts, so reported Jaccard values stay internally consistent when
    // the cap is active (pure set-space restriction, not a biased ratio)
    val counts = indexed.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = indexed.select(col(idCol).as("qa"), col("shingle"))
    val b = indexed.select(col(idCol).as("qb"), col("shingle"))
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

  /** Paragraph-level exact dedup (MassiveText/Gopher-style): split each
    * document on `sep`, keep only the globally-FIRST occurrence of every
    * duplicated paragraph (first = lowest (id, position)), and reassemble
    * the survivors in document order. Paragraphs shorter than `minChars`
    * are never deduplicated (boilerplate-length fragments like headers are
    * the boilerplate stripper's job; nuking every 1-char paragraph
    * corpus-wide would shred unrelated documents).
    *
    * Scale design: the winner-election aggregate groups on md5(paragraph)
    * (16-byte keys, partial-aggregated min — no window over a hot
    * paragraph's bucket), the survivors join is hash-to-hash, and
    * reassembly is one groupBy over the document id with an array_sort on
    * (position, paragraph) — per-task memory is bounded by document size,
    * the same bound every whole-doc operator here already carries. Three
    * shuffles total, none carrying more than the exploded paragraph text
    * once. Dedup by 128-bit digest, not paragraph equality, so the
    * shuffled key is fixed-width; md5 collisions at 100 TB paragraph
    * counts (~2^40) sit ~2^-48 below the birthday bound — the standard
    * fingerprint-dedup trade, and the same one `exactKeepFirst`'s oracle
    * twin documents.
    *
    * Output: (idCol, textCol) with `textCol` rebuilt from surviving
    * paragraphs (empty string when every paragraph lost its election).
    */
  def paragraphDedup(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n", minChars: Int = 1): DataFrame = {
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("p_idx", "para")))
    val keyed = paras.withColumn("pkey", md5(col("para")))
    // One partial-aggregated shuffle elects each paragraph's first
    // occurrence; only digests and (id, idx) pairs travel.
    val winners = keyed
      .filter(length(col("para")) >= minChars)
      .groupBy(col("pkey"))
      .agg(min(struct(col(idCol), col("p_idx"))).as("w"))
      .select(col("pkey"), col("w").getField(idCol).as("w_id"),
        col("w").getField("p_idx").as("w_idx"))
    val surviving = keyed
      .join(winners, Seq("pkey"), "left")
      .filter(col("w_id").isNull ||
        (col(idCol) === col("w_id") && col("p_idx") === col("w_idx")))
    val rebuilt = surviving
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("p_idx"), col("para"))))
        .as("ps"))
      .select(col(idCol),
        array_join(col("ps").getField("para"), sep).as(textCol))
    // A doc whose every paragraph lost its election must still come back
    // (as the empty string) — downstream joins key on the id surviving.
    // NULL text stays NULL: rewriting it to '' would merge NULL-text docs
    // with genuinely-empty ones under operators that deliberately keep
    // NULL its own group (exactKeepFirstByHash's text_len NULL rule).
    df.select(col(idCol), col(textCol).isNull.as("__g_wasnull"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__g_wasnull"), lit(null).cast("string"))
          .otherwise(coalesce(col(textCol), lit(""))).as(textCol))
  }
}
