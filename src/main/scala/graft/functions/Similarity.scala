package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.catalyst.{DotProduct, NearestCentroids, SrpBuckets}

/** Vector-similarity primitives over `ArrayType(FloatType)` embedding
  * columns, built on native codegen'd Catalyst expressions
  * ([[graft.functions.catalyst.DotProduct]] /
  * [[graft.functions.catalyst.SrpBuckets]]) — tight primitive loops
  * inside whole-stage codegen. Spark's higher-order functions
  * (`aggregate`/`zip_with`) are CodegenFallback (interpreted, per-element
  * boxing) and cost 3–11× on these kernels at bench scale, so they are
  * deliberately not used here.
  *
  * Elements are widened to double *before* the multiply and accumulated
  * left-to-right, which makes the result bit-deterministic and matchable
  * against an oracle engine doing the same.
  */
object Similarity {

  /** dot(a, b) as a double, left-to-right summation. Codegen'd. */
  def dot(a: Column, b: Column): Column =
    GraftColumnShim.column(
      DotProduct(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b). For joins, prefer precomputing [[l2Norm]] once per side
    * (as every operator below does) — this convenience form recomputes
    * both norms per output row.
    */
  def cosine(a: Column, b: Column): Column =
    cosFromNorms(dot(a, b), l2Norm(a), l2Norm(b))

  /** Per-table SRP bucket ids for LSH — array<long>, codegen'd. */
  def srpBuckets(vec: Column, nBits: Int, tables: Int): Column =
    GraftColumnShim.column(
      SrpBuckets(GraftColumnShim.expression(vec), nBits, tables))

  /** Johnson–Lindenstrauss ±1 projection to `k` dims — array<double>,
    * codegen'd, deterministic sign family (oracle-exact). See
    * [[graft.functions.catalyst.SignedProjection]]. */
  def randomProjection(vec: Column, k: Int): Column =
    GraftColumnShim.column(
      graft.functions.catalyst.SignedProjection(
        GraftColumnShim.expression(vec), k))

  /** Broadcast-hint `df` only when the optimizer's size estimate fits
    * the session's `autoBroadcastJoinThreshold`; otherwise leave the
    * join strategy to the planner. The ANN kernels' query side is small
    * BY CONVENTION, not by contract — a forced broadcast of an
    * unbounded query batch (bulk re-scoring, a whole-corpus self-join)
    * was an executor-OOM path. An un-hinted small batch still
    * broadcasts at runtime: AQE re-plans the join from actual sizes, so
    * the steady interactive case keeps its broadcast either way. */
  private def broadcastIfSmall(df: DataFrame): DataFrame = {
    val threshold =
      df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // analyzed-plan stats: already materialized on the Dataset (no
    // second optimizer pass per kernel call) and CONSERVATIVE (no
    // filter/pruning estimation) — exactly right for a gate that must
    // only force a broadcast when provably small
    if (threshold > 0 &&
        df.queryExecution.analyzed.stats.sizeInBytes <= threshold)
      broadcast(df)
    else df
  }

  /** Shared tail of every ANN variant: per-query top-k by (score desc,
    * neighbour id asc) — one place for the tie-break contract. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** cosine from a precomputed dot and per-side norms. */
  /** Zero-norm vectors score 0.0 instead of raising DIVIDE_BY_ZERO under
    * ANSI mode (or yielding NaN otherwise, which fails every ranking
    * comparison and silently vanishes from top-k) — the same degenerate-
    * input rule [[graft.functions.catalyst.NearestCentroids]] applies. */
  private def cosFromNorms(d: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))

  /** Brute-force exact top-k nearest neighbours by cosine similarity.
    *
    * Plan shape: `queries` is broadcast when its size estimate allows
    * (the usual case — a handful of probe vectors; an over-threshold
    * batch falls to the planner's choice, where AQE still broadcasts
    * small runtime sizes), so the corpus is scanned exactly once with no
    * shuffle of the big side; the per-query top-k is a
    * window over the (small) joined result. Each side's L2 norm is
    * projected ONCE before the join — the per-pair work is a single dot
    * product, not three. At 100 TB corpus scale this is one pass + a
    * k-row-per-query shuffle, which is the right baseline; the LSH/IVF
    * variants below trade recall for pruning that single pass.
    *
    * Ties on the (rounded) score are broken by neighbour id so the result
    * is fully deterministic.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scoreScale: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_nrm"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_nrm"))
    val scored = broadcastIfSmall(q).join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosFromNorms(dot(col("q_vec"), col("n_vec")),
          col("q_nrm"), col("n_nrm")), scoreScale).as("score"))
    rankTopK(scored, k)
  }

  /** Symmetric per-vector int8 scalar quantization: `q[i] = round(v[i] /
    * max|v| × 127)`, values in [-127, 127] as `array<int>`. COSINE is
    * invariant to the per-vector scale (it cancels in the ratio), so
    * quantized search needs no dequantization and no stored scale.
    *
    * This is the standard at-scale memory lever for ANN: a float32
    * embedding column shrinks ~4× (storage, shuffle, and cache), and the
    * dot-product inner loop reads a quarter of the bytes. Quantization
    * itself runs ONCE at ingest (map-side, no shuffle); searches then
    * touch only the compact column. The arithmetic is pure IEEE-double +
    * round-half-away-from-zero, so any engine reproduces the exact same
    * codes (the q85 oracle gate pins this).
    */
  def quantizeInt8(vec: Column): Column = {
    val d = vec.cast("array<double>")
    val m = array_max(transform(d, x => abs(x)))
    when(m > 0, transform(d, x => round(x / m * 127).cast("int")))
      .otherwise(transform(d, _ => lit(0)))
  }

  /** Brute-force top-k over int8-quantized vectors — delegates to
    * [[bruteForceTopK]] over the quantized column, so the plan (broadcast
    * queries, single corpus pass, tie-break contract) is maintained once.
    * Integer dots are exact (|q|≤127, so a 2^38-dim vector would be
    * needed to lose a bit in the double accumulator); the only
    * approximation is the quantization itself.
    *
    * At scale, quantize ONCE at ingest (store [[quantizeInt8]] as a
    * column and pass `preQuantized = true`) so searches stream only the
    * 4×-smaller ints — the BenchScale quant_ann stage measures exactly
    * that shape. With `preQuantized = false` (the float-only test
    * tables), each call pays one inline quantization pass over its
    * input first.
    */
  def quantizedTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scoreScale: Int = 4, preQuantized: Boolean = false): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      if (preQuantized) df
      else df.withColumn(vecCol, quantizeInt8(col(vecCol)))
    bruteForceTopK(prep(queries), prep(corpus), k, idCol, vecCol, scoreScale)
  }

  /** Approximate top-k: sign-random-projection LSH with `tables`
    * independent hash tables. Each vector is bucketed per table by the
    * sign pattern of `nBits` fixed pseudo-random hyperplanes (plane
    * components derived from a splitmix64 mix of (table, bit, dim), so
    * every executor computes identical planes with no driver-side state
    * or broadcast of plane matrices — see
    * [[graft.functions.catalyst.SrpBuckets]]).
    *
    * Candidates are corpus vectors sharing any table's bucket with the
    * query — the join is a hash join on `(table, bucket)`, so at scale
    * each query probes `tables` buckets instead of the full corpus.
    * Recall < 1.0 by design: raise `tables` for recall (OR over tables),
    * raise `nBits` for precision (AND over bits) — the standard LSH
    * recall/cost dials. An identical vector always lands in the same
    * buckets, so exact duplicates are retrieved with probability 1 (the
    * property the q49b oracle gate pins).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nBits: Int = 8,
      tables: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String, nrm: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        l2Norm(col(vecCol)).as(nrm),
        posexplode(srpBuckets(col(vecCol), nBits, tables))
          .as(Seq("tbl", "bucket")))
    val q = withBuckets(queries, "q_id", "q_vec", "q_nrm")
    val c = withBuckets(corpus, "n_id", "n_vec", "n_nrm")
    val scored = broadcastIfSmall(q).join(c, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      // a pair can collide in several tables; score each candidate once
      .dropDuplicates("q_id", "n_id")
      .select(col("q_id"), col("n_id"),
        round(cosFromNorms(dot(col("q_vec"), col("n_vec")),
          col("q_nrm"), col("n_nrm")), 4).as("score"))
    rankTopK(scored, k)
  }

  /** Approximate top-k via IVF-flat: corpus vectors are assigned to their
    * nearest of `nCentroids` centroid vectors (one bucket each); each query
    * probes its `nProbe` nearest centroids' buckets only.
    *
    * Centroids are a deterministic pseudo-random corpus sample (the
    * `nCentroids` vectors with the smallest `xxhash64(id)`) — no k-means
    * iterations, no driver-side state. The sampled centroids (with
    * precomputed norms) are folded into ONE broadcast row holding a
    * sorted array of (c_id, c_vec, c_nrm) structs; assignment on BOTH
    * sides is a purely map-side [[graft.functions.catalyst.NearestCentroids]]
    * top-k over that array — **zero shuffle and zero row amplification**
    * (round 2 shipped a `corpus × nCentroids` join + a corpus-wide window
    * here, a 16× blowup the plan audit flagged). The candidate join is
    * then a broadcast hash join on the centroid id.
    *
    * An identical vector always shares its source's nearest centroid
    * (deterministic tie-break on centroid id), so exact duplicates are
    * retrieved with probability 1 when nProbe >= 1 — the property the q53
    * oracle gate pins.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 0): DataFrame = {
    val centRows = ivfCentroids(corpus, nCentroids, trainIters, idCol, vecCol)
    ivfScore(ivfProbes(queries, centRows, nProbe, idCol, vecCol),
      ivfAssign(corpus, centRows, idCol, vecCol), k)
  }

  /** The IVF coarse quantizer: `nCentroids` centroid rows (c_id, c_vec:
    * array<double>, c_nrm) — a deterministic sample, or Lloyd's-refined
    * when `trainIters > 0`. Exposed so a persisted index
    * ([[graft.operators.VectorIndex]]) can store the EXACT rows the
    * in-memory path computes and reproduce its results bit-for-bit. */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    if (trainIters <= 0) sampleCentroids(corpus, nCentroids, idCol, vecCol)
    else kmeansCentroids(corpus, nCentroids, trainIters, idCol, vecCol)

  // Both sides assign via one [[NearestCentroids]] call per row — a
  // runtime loop over the broadcast centroid array (generated code is
  // one static call, independent of nCentroids; an unrolled
  // per-centroid expression tree would be Janino-hostile at real-world
  // centroid counts).
  private def nearestCol(vec: String, k: Int): Column =
    GraftColumnShim.column(NearestCentroids(
      GraftColumnShim.expression(col(vec)),
      GraftColumnShim.expression(col("cents")), k))

  /** Corpus-side IVF assignment — each vector's single nearest centroid:
    * (c_id, n_id, n_vec, n_nrm). Argmax (k=1), purely map-side against
    * ONE broadcast centroid row: zero shuffle, zero row amplification.
    * These rows ARE the posting lists a persisted index stores. */
  def ivfAssign(corpus: DataFrame, centRows: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_nrm"))
      .join(broadcast(centroidArray(centRows)))
      .withColumn("c_id", get(nearestCol("n_vec", 1), lit(0)))
      .select(col("c_id"), col("n_id"), col("n_vec"), col("n_nrm"))

  /** Query-side IVF probes — each query exploded to its `nProbe` nearest
    * centroid ids: (q_id, q_vec, q_nrm, c_id). Map-side over the same
    * broadcast centroid row; no window, no shuffle. */
  def ivfProbes(queries: DataFrame, centRows: DataFrame, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_nrm"))
      .join(broadcast(centroidArray(centRows)))
      .select(col("q_id"), col("q_vec"), col("q_nrm"),
        explode(nearestCol("q_vec", nProbe)).as("c_id"))

  /** Candidate scoring + ranking shared by the in-memory and persisted
    * IVF paths: broadcast-join probes to posting rows on the centroid
    * id, score each candidate once, rank per query. A corpus row lives
    * in exactly one bucket, so a (q, n) pair meets through at most one
    * c_id — no dedup needed before ranking. */
  def ivfScore(probes: DataFrame, postings: DataFrame, k: Int): DataFrame = {
    val scored = broadcastIfSmall(probes).join(postings, Seq("c_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosFromNorms(dot(col("q_vec"), col("n_vec")),
          col("q_nrm"), col("n_nrm")), 4).as("score"))
    rankTopK(scored, k)
  }

  /** Caller-provided quantizer rows: convert raw (id, vector) rows into
    * the centroid row shape every IVF path consumes — the pretrained /
    * externally-chosen-quantizer workflow (train offline on a sample,
    * build the serving index with a FIXED quantizer), and the shape an
    * engine-portable oracle can reproduce (the centroid set is plain
    * SQL over the source rows, no sampling hash involved). */
  def centroidRows(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).cast("long").as("c_id"),
        col(vecCol).cast("array<double>").as("c_vec"))
      .select(col("c_id"), col("c_vec"), l2Norm(col("c_vec")).as("c_nrm"))

  /** Deterministic pseudo-random centroid sample: the `n` corpus vectors
    * with the smallest `xxhash64(id)`, as (c_id, c_vec: array<double>,
    * c_nrm) rows. Vectors are cast to double so sampled and k-means-
    * refined centroids share one schema. */
  private def sampleCentroids(corpus: DataFrame, n: Int,
      idCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(idCol).as("c_id"),
        col(vecCol).cast("array<double>").as("c_vec"))
      .withColumn("h", xxhash64(col("c_id")))
      .orderBy(col("h").asc, col("c_id").asc)
      .limit(n)
      .select(col("c_id"), col("c_vec"), l2Norm(col("c_vec")).as("c_nrm"))

  /** Centroid rows folded into the ONE broadcast row [[ivfTopK]] assigns
    * against (sorted for deterministic tie-breaks). */
  private def centroidArray(rows: DataFrame): DataFrame =
    rows.agg(sort_array(collect_list(struct(col("c_id"), col("c_vec"),
      col("c_nrm")))).as("cents"))

  /** Lloyd's k-means over the corpus, initialized from the deterministic
    * sample — the training step behind `ivfTopK(trainIters = …)`.
    *
    * Per iteration: assignment is the same zero-shuffle map-side
    * [[graft.functions.catalyst.NearestCentroids]] argmax over one
    * broadcast centroid row that serving uses, and recentering is ONE
    * hash aggregation with a primitive-buffer mean
    * ([[graft.functions.catalyst.VectorMean]]) — no posexplode to
    * corpus×dims rows, no per-dimension shuffle. Total cost: `iters`
    * aggregations over the corpus, each one shuffle of nCentroids×dims
    * partial sums per task. Clusters that lose every member keep their
    * previous centroid, so k stays fixed and ids stay stable (centroid
    * ids are the sample vectors' source ids throughout).
    */
  /** Farthest-first ("maxmin") init for [[kmeansCentroids]]: a bounded
    * deterministic candidate sample (8× the centroid count, by minimal
    * `xxhash64(id)`) is collected and greedily spread ON THE DRIVER —
    * pick the hash-minimal vector, then repeatedly the candidate least
    * cosine-similar to everything already picked. Lloyd's converges to a
    * local optimum of its init; a plain random sample regularly lands two
    * seeds in one cluster and leaves another uncovered, and no number of
    * iterations repairs that. The collect is k-bounded (8·k rows), not
    * corpus-bounded, so the driver does O(k²·dims) work regardless of
    * corpus size. */
  private def spreadCentroids(corpus: DataFrame, n: Int,
      idCol: String, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    val cand: Array[(Long, Seq[Double])] =
      sampleCentroids(corpus, math.max(8 * n, n), idCol, vecCol)
        .select(col("c_id"), col("c_vec"))
        .collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Double]](1).toSeq))
    if (cand.isEmpty) return sampleCentroids(corpus, n, idCol, vecCol)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
    }
    val picked = scala.collection.mutable.ArrayBuffer(cand.head)
    val rest = scala.collection.mutable.ArrayBuffer(cand.tail: _*)
    while (picked.size < n && rest.nonEmpty) {
      // the candidate whose BEST similarity to the picked set is worst
      val next = rest.minBy { case (id, v) =>
        (picked.map(p => cos(p._2, v)).max, id) // id tiebreak: deterministic
      }
      picked += next
      rest -= next
    }
    import spark.implicits._
    picked.toSeq.map { case (id, v) => (id, v.toArray) }
      .toDF("c_id", "c_vec")
      .select(col("c_id"), col("c_vec"), l2Norm(col("c_vec")).as("c_nrm"))
  }

  def kmeansCentroids(
      corpus: DataFrame, nCentroids: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    val spark = corpus.sparkSession
    import spark.implicits._
    // Centroids live on the DRIVER between iterations (≤ k rows of dims
    // doubles): each Lloyd's step is then exactly ONE corpus aggregation.
    // Keeping them as a DataFrame lineage instead would re-run the whole
    // corpus assignment a second time per step through the empty-cluster
    // check's recomputed branch (the regression PlanShapeSpec pins).
    var cents: Seq[(Long, Seq[Double])] =
      (if (iters <= 0) sampleCentroids(corpus, nCentroids, idCol, vecCol)
       else spreadCentroids(corpus, nCentroids, idCol, vecCol))
        .select(col("c_id"), col("c_vec")).collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Double]](1).toSeq))
        .toSeq
    def toDf(cs: Seq[(Long, Seq[Double])]): DataFrame =
      cs.map { case (id, v) => (id, v.toArray) }.toDF("c_id", "c_vec")
        .select(col("c_id"), col("c_vec"), l2Norm(col("c_vec")).as("c_nrm"))
    val meanAgg = GraftColumnShim.column(
      graft.functions.catalyst.VectorMean(
        GraftColumnShim.expression(col("v"))).toAggregateExpression())
    for (_ <- 1 to iters) {
      val arr = centroidArray(toDf(cents))
      val recentered: Map[Long, Seq[Double]] = corpus.select(col(vecCol).as("v"))
        .join(broadcast(arr))
        .select(get(GraftColumnShim.column(NearestCentroids(
          GraftColumnShim.expression(col("v")),
          GraftColumnShim.expression(col("cents")), 1)), lit(0)).as("c_id"),
          col("v"))
        .groupBy("c_id").agg(meanAgg.as("mv"))
        .collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]](1).toSeq)
        .toMap
      // clusters that lost every member keep their previous centroid
      cents = cents.map { case (id, v) => (id, recentered.getOrElse(id, v)) }
    }
    toDf(cents)
  }

  /** All-pairs cosine over a bounded id range (near-duplicate detection by
    * embedding). Caller bounds the id range; the self-join is equi-free so
    * both sides must be small enough to broadcast one of them. Norms are
    * projected once per side before the join.
    */
  def cosinePairs(
      vectors: DataFrame, maxId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.filter(col(idCol) < maxId)
      .select(col(idCol).as("qa"), col(vecCol).as("va"),
        l2Norm(col(vecCol)).as("na"))
    val b = vectors.filter(col(idCol) < maxId)
      .select(col(idCol).as("qb"), col(vecCol).as("vb"),
        l2Norm(col(vecCol)).as("nb"))
    broadcast(a).join(b, col("qa") < col("qb"))
      .select(col("qa"), col("qb"),
        round(cosFromNorms(dot(col("va"), col("vb")),
          col("na"), col("nb")), 4).as("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic near-duplicate
    * REMOVAL — cluster the embedding space coarsely, compare pairs only
    * WITHIN a cluster, connected-component the over-threshold pairs, keep
    * one canonical member (min id) per group.
    *
    * The scale argument is the paper's: all-pairs cosine is O(N²) and
    * dead at corpus size; clustering bounds the quadratic term to the
    * largest cluster. Assignment is the IVF serving path: one map-side
    * argmax over a broadcast centroid row, zero shuffle; the only
    * shuffles are the cluster-key pair join and the edge-set-only
    * connected components.
    *
    * The within-cluster pair join carries the SKEW GUARD its LSH
    * siblings have (`Dedup.incrementalAdmission`'s `probeMaxBucket`):
    * cluster sizes are counted first, and any cluster over `maxCluster`
    * is recursively SUB-CLUSTERED (`subSplitRounds` rounds of fresh IVF
    * assignment inside the hot cells — the paper's own recursion; the
    * accepted miss is the same cluster-boundary miss as at the top
    * level). A cluster still over the cap after the rounds — e.g. a mass
    * of IDENTICAL vectors, which no geometric split separates — goes
    * through a SALTED pair join: rows salt into `ceil(size/maxCluster)`
    * groups and every group×group cell joins as its own key, so the
    * inherent quadratic work spreads over g² bounded tasks instead of
    * landing on one executor. The salted path changes NO results (every
    * pair still meets exactly once); only sub-splitting trades recall,
    * exactly as coarse clustering already does.
    *
    * `nCentroids = 0` (the default) derives k from the corpus size so
    * the MEAN cluster tracks `maxCluster/4` — at 100 TB a constant k
    * would make every cell quadratic-hot no matter how healthy the
    * data. Pass an explicit k to pin it.
    *
    * Returns (idCol, keep) for every corpus row. Centroids default to
    * the deterministic hash-ordered sample; pass `trainIters` to Lloyd's-
    * train them (both reuse the k-means/IVF machinery).
    */
  def semanticDedup(
      corpus: DataFrame, threshold: Double,
      nCentroids: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainIters: Int = 0,
      maxCluster: Int = 10000,
      subSplitRounds: Int = 2): DataFrame = {
    require(maxCluster >= 2, s"maxCluster must be >= 2, got $maxCluster")
    // Auto-k needs the corpus size: catalyst's plan statistics answer it
    // for free when the source carries a row count (CBO-analyzed tables,
    // cached relations); otherwise this pays ONE extra counting pass
    // over the corpus lineage before the dedup's own passes — at real
    // scale either persist the input or pass an explicit nCentroids.
    val k =
      if (nCentroids > 0) nCentroids
      else {
        val n = corpus.queryExecution.optimizedPlan.stats.rowCount
          .map(_.toLong).getOrElse(corpus.count())
        math.max(16, math.ceil(
          n.toDouble / math.max(1, maxCluster / 4)).toInt)
      }
    val centRows =
      if (trainIters <= 0) sampleCentroids(corpus, k, idCol, vecCol)
      else kmeansCentroids(corpus, k, trainIters, idCol, vecCol)
    val centArr = centroidArray(centRows)
    def nearest(vec: String): Column =
      GraftColumnShim.column(NearestCentroids(
        GraftColumnShim.expression(col(vec)),
        GraftColumnShim.expression(col("cents")), 1))

    val assigned = corpus
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        l2Norm(col(vecCol)).as("nrm"))
      .join(broadcast(centArr))
      .withColumn("c_key", get(nearest("vec"), lit(0)).cast("string"))
      .select(col("id"), col("vec"), col("nrm"), col("c_key"))

    val pairs = boundedClusterPairs(assigned, threshold,
      maxCluster, subSplitRounds)

    val comps = graft.operators.Dedup.connectedComponents(pairs)
    corpus.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        (col("comp").isNull || col("comp") === col(idCol)).as("keep"))
  }

  /** [[semanticDedup]]'s guarded pair stage over (id, vec, nrm, c_key)
    * rows: per-key self-join where the key's population is ≤ `cap`;
    * sub-cluster-and-retry (then salt) where it is not. The size window
    * shuffles on exactly the pair join's key, so ReuseExchange serves
    * both branches from ONE exchange — on a healthy corpus the guard
    * costs no extra shuffle, and the hot branches are empty plans. */
  private def boundedClusterPairs(assigned: DataFrame, threshold: Double,
      cap: Int, subSplitRounds: Int): DataFrame = {
    def pairsWithin(rows: DataFrame): DataFrame = {
      val a = rows.select(col("c_key"), col("id").as("qa"),
        col("vec").as("va"), col("nrm").as("na"))
      val b = rows.select(col("c_key"), col("id").as("qb"),
        col("vec").as("vb"), col("nrm").as("nb"))
      a.join(b, Seq("c_key"))
        .filter(col("qa") < col("qb"))
        .filter(cosFromNorms(dot(col("va"), col("vb")),
          col("na"), col("nb")) >= threshold)
        .select(col("qa"), col("qb"))
    }
    def sized(rows: DataFrame): DataFrame = rows.withColumn("__csz",
      count(lit(1)).over(Window.partitionBy(col("c_key"))))

    // Fast path for the healthy corpus: ONE cheap aggregation (map-side
    // partial counts) decides whether any cluster is over the cap; when
    // none is — the overwhelmingly common case once k is scale-derived —
    // the pair stage is the plain one-shuffle join, none of the guard's
    // round machinery enters the plan. (Worth a driver job: the lazy
    // guard rounds cost several empty-branch shuffles per run even when
    // they have nothing to do.)
    val anyHot = !assigned.groupBy(col("c_key"))
      .agg(count(lit(1)).as("__csz"))
      .filter(col("__csz") > cap).isEmpty
    if (!anyHot) return pairsWithin(assigned)

    var cur = assigned
    val parts = Seq.newBuilder[DataFrame]
    for (round <- 1 to subSplitRounds) {
      val tagged = sized(cur)
      parts += pairsWithin(tagged.filter(col("__csz") <= cap).drop("__csz"))
      val hot = tagged.filter(col("__csz") > cap).drop("__csz")
      // fresh sub-centroids sampled from the hot rows themselves (round-
      // salted hash, so a retry draws a different sample); keys compose,
      // so rows from different hot clusters never meet even when they
      // share a sub-centroid
      val subCents = centroidArray(hot
        .select(col("id").as("c_id"),
          col("vec").cast("array<double>").as("c_vec"))
        .withColumn("h", xxhash64(col("c_id"), lit(round)))
        .orderBy(col("h").asc, col("c_id").asc)
        .limit(16)
        .select(col("c_id"), col("c_vec"), l2Norm(col("c_vec")).as("c_nrm")))
      cur = hot.join(broadcast(subCents))
        .withColumn("c_key", concat_ws("/", col("c_key"),
          get(GraftColumnShim.column(NearestCentroids(
            GraftColumnShim.expression(col("vec")),
            GraftColumnShim.expression(col("cents")), 1)), lit(0))))
        .select(col("id"), col("vec"), col("nrm"), col("c_key"))
    }
    val last = sized(cur)
    parts += pairsWithin(last.filter(col("__csz") <= cap).drop("__csz"))
    parts += saltedClusterPairs(last.filter(col("__csz") > cap),
      threshold, cap)
    parts.result().reduce(_ unionByName _)
  }

  /** Exact all-pairs within over-cap clusters, de-skewed: rows salt into
    * `g = ceil(size/cap)` hash groups; role A replicates each row to the
    * cells (own, own..g-1), role B to (0..own, own), and the join runs
    * per (c_key, ga, gb) cell — ≤ cap rows a side, so no task sees the
    * whole cluster. Each unordered pair meets exactly once, in its
    * (min-group, max-group) cell: distinct groups admit only one
    * orientation (A carries the lower group, B the higher), and the
    * ga = gb cell, where both orientations land, is deduped by
    * `qa < qb`. Replication is g+1 copies per row — the price of keeping
    * EXACT semantics on a cluster geometry cannot split (identical
    * vectors); the quadratic dot-product work is inherent there, this
    * spreads it over g² tasks. */
  private def saltedClusterPairs(rows: DataFrame, threshold: Double,
      cap: Int): DataFrame = {
    val salted = rows
      .withColumn("__g", ceil(col("__csz") / lit(cap.toDouble)).cast("int"))
      .withColumn("__s", pmod(xxhash64(col("id")), col("__g")).cast("int"))
    val a = salted
      .withColumn("ga", col("__s"))
      .withColumn("gb", explode(sequence(col("__s"), col("__g") - 1)))
      .select(col("c_key"), col("ga"), col("gb"), col("id").as("qa"),
        col("vec").as("va"), col("nrm").as("na"))
    val b = salted
      .withColumn("gb", col("__s"))
      .withColumn("ga", explode(sequence(lit(0), col("__s"))))
      .select(col("c_key"), col("ga"), col("gb"), col("id").as("qb"),
        col("vec").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("c_key", "ga", "gb"))
      .filter(col("ga") < col("gb") || col("qa") < col("qb"))
      .filter(cosFromNorms(dot(col("va"), col("vb")),
        col("na"), col("nb")) >= threshold)
      .select(least(col("qa"), col("qb")).as("qa"),
        greatest(col("qa"), col("qb")).as("qb"))
  }
}
