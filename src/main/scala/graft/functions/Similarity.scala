package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector-similarity primitives over `ArrayType(FloatType)` embedding
  * columns, built from codegen'd higher-order functions (`zip_with` +
  * `aggregate`) so they stay inside whole-stage codegen — no UDFs.
  *
  * Elements are cast to double *before* the multiply and accumulated
  * left-to-right, which makes the result bit-deterministic and matchable
  * against an oracle engine doing the same.
  */
object Similarity {

  /** dot(a, b) as a double, left-to-right summation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Shared tail of every ANN variant: per-query top-k by (score desc,
    * neighbour id asc) — one place for the tie-break contract. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** Brute-force exact top-k nearest neighbours by cosine similarity.
    *
    * Plan shape: `queries` is broadcast (it is the small side by
    * construction — a handful of probe vectors), so the corpus is scanned
    * exactly once with no shuffle of the big side; the per-query top-k is a
    * window over the (small) joined result. At 100 TB corpus scale this is
    * one pass + a k-row-per-query shuffle, which is the right baseline; the
    * LSH variant below trades recall for pruning that single pass.
    *
    * Ties on the (rounded) score are broken by neighbour id so the result
    * is fully deterministic.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scoreScale: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), scoreScale).as("score"))
    rankTopK(scored, k)
  }

  /** Approximate top-k: sign-random-projection LSH with `tables`
    * independent hash tables. Each vector is bucketed per table by the
    * sign pattern of `nBits` fixed pseudo-random hyperplanes
    * (deterministic: table t / plane i's component for dimension d is
    * derived from `xxhash64(t * nBits + i, d)`, so every executor computes
    * identical planes with no driver-side state or broadcast of plane
    * matrices).
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
    def bucket(vec: Column, table: Int): Column = {
      // sign bit i = sign of sum_d plane(i, d) * vec[d], plane in {-1, +1}
      val bits = (0 until nBits).map { i =>
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, d) => x.cast("double") *
              when(pmod(xxhash64(lit(table * nBits + i), d), lit(2)) === 0, -1.0)
                .otherwise(1.0)),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      bits.reduce(_.bitwiseOR(_))
    }
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(array((0 until tables).map(t => bucket(col(vecCol), t)): _*))
          .as(Seq("tbl", "bucket")))
    val q = withBuckets(queries, "q_id", "q_vec")
    val c = withBuckets(corpus, "n_id", "n_vec")
    val scored = broadcast(q).join(c, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      // a pair can collide in several tables; score each candidate once
      .dropDuplicates("q_id", "n_id")
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 4).as("score"))
    rankTopK(scored, k)
  }

  /** Approximate top-k via IVF-flat: corpus vectors are assigned to their
    * nearest of `nCentroids` centroid vectors (one bucket each); each query
    * probes its `nProbe` nearest centroids' buckets only.
    *
    * Centroids are a deterministic pseudo-random corpus sample (the
    * `nCentroids` vectors with the smallest `xxhash64(id)`) — no k-means
    * iterations, no driver-side state; at scale the sample is a cheap
    * 1-pass top-k and the centroid set broadcasts to every task. Corpus
    * assignment is one scan; the candidate join is a hash join on the
    * centroid id. An identical vector always shares its source's nearest
    * centroid (deterministic tie-break on centroid id), so exact
    * duplicates are retrieved with probability 1 when nProbe >= 1 — the
    * property the q53 oracle gate pins.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = corpus
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .withColumn("h", xxhash64(col("c_id")))
      .orderBy(col("h").asc, col("c_id").asc)
      .limit(nCentroids)
      .drop("h")

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("c_dist").asc, col("c_id").asc)
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .join(broadcast(cents))
        .withColumn("c_dist", -cosine(col(vec), col("c_vec")))
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= keep)
        .select(col(id), col(vec), col("c_id"))
    }

    val bucketed = assign(corpus, "n_id", "n_vec", keep = 1)
    val probes = assign(queries, "q_id", "q_vec", keep = nProbe)
    // corpus rows live in exactly one bucket (keep = 1), so a (q, n) pair
    // meets through at most one c_id — no dedup needed before ranking
    val scored = broadcast(probes).join(bucketed, Seq("c_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 4).as("score"))
    rankTopK(scored, k)
  }

  /** All-pairs cosine over a bounded id range (near-duplicate detection by
    * embedding). Caller bounds the id range; the self-join is equi-free so
    * both sides must be small enough to broadcast one of them.
    */
  def cosinePairs(
      vectors: DataFrame, maxId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.filter(col(idCol) < maxId)
      .select(col(idCol).as("qa"), col(vecCol).as("va"))
    val b = vectors.filter(col(idCol) < maxId)
      .select(col(idCol).as("qb"), col(vecCol).as("vb"))
    broadcast(a).join(b, col("qa") < col("qb"))
      .select(col("qa"), col("qb"),
        round(cosine(col("va"), col("vb")), 4).as("cos"))
  }
}
