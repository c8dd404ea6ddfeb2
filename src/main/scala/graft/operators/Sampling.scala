package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting for training pipelines.
  *
  * Membership is a pure function of the id — `(id * KnuthPrime) mod
  * Buckets` against cumulative weight thresholds — NOT a random sample:
  * a document's split never changes as the corpus grows, across runs, or
  * across engines (the arithmetic is exact in any 64-bit SQL dialect, so
  * an external system can reproduce the assignment bit-for-bit). That
  * stability is the property a 100 TB pipeline actually needs: retraining
  * with new data must not leak yesterday's test set into today's train
  * set. Fractions are approximate (hash-uniform), exactness of membership
  * is total.
  *
  * Map-only projection — no shuffle, no state, codegen'd.
  */
object Sampling {

  /** Knuth's multiplicative-hash constant (2^32 / phi); id × this stays
    * within Long for ids up to ~3.4e9 — beyond that, pre-fold the id. */
  val KnuthPrime = 2654435761L
  val Buckets = 10000L

  def splitBucket(id: Column): Column = pmod(id * KnuthPrime, lit(Buckets))

  /** Salted bucket for samples that must be INDEPENDENT of the
    * train/valid/test assignment: the unsalted bucket would correlate
    * every downstream sample with the split (a 10% sample drawn from the
    * same hash is exactly the test set). The salt offsets the id before
    * the multiplicative hash, so each purpose draws its own stream while
    * staying a pure, engine-portable function of (id, salt). */
  def saltedBucket(id: Column, salt: Long): Column =
    pmod((id + salt) * KnuthPrime, lit(Buckets))

  /** Add a `split` column per `weights` (name → fraction, summing to ~1).
    * Thresholds are cumulative over the GIVEN order, so the mapping is
    * part of the declared contract. */
  def assignSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"need positive weights, got $weights")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"weights must sum to 1, got $total")
    val bucket = splitBucket(col(idCol))
    val thresholds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * Buckets))
    val expr = weights.zip(thresholds).init
      .foldRight(lit(weights.last._1)) { case (((name, _), t), rest) =>
        when(bucket < t, name).otherwise(rest)
      }
    df.withColumn("split", expr)
  }

  /** Domain-mixture sampling: keep each row with a per-domain rate
    * (`rates`, falling back to `default`), deterministically — membership
    * is `saltedBucket(id) < rate × Buckets`, a pure function of the id, so
    * the drawn mixture is stable under corpus growth and reproducible by
    * any 64-bit engine. This is how a training pipeline re-weights sources
    * (up-sample curated text, down-sample crawl) without a random
    * generator whose seed placement would make reruns disagree.
    *
    * Map-only predicate — no shuffle, codegen'd. */
  def domainSampleFlag(id: Column, domain: Column,
                       rates: Seq[(String, Double)], default: Double,
                       salt: Long = 7919L): Column = {
    require((default +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1], got $rates default $default")
    val thr = rates.foldRight(lit(math.round(default * Buckets))) {
      case ((dom, r), rest) =>
        when(domain === dom, lit(math.round(r * Buckets))).otherwise(rest)
    }
    saltedBucket(id, salt) < thr
  }

  def sampleByDomain(df: DataFrame, idCol: String, domainCol: String,
                     rates: Seq[(String, Double)], default: Double,
                     salt: Long = 7919L): DataFrame =
    df.filter(domainSampleFlag(col(idCol), col(domainCol), rates, default, salt))

  /** Temperature-flattened mixture under a global token budget: the
    * sampled token share of domain `d` is `avail_d^alpha / Σ avail_e^alpha`
    * — `alpha = 1` preserves the natural mix, `alpha → 0` approaches
    * uniform. This is the standard multilingual/source re-balancing move
    * (sample low-resource domains up without letting the head domain
    * swamp the budget). `rate_d = min(1, budget·w_d / avail_d)`; the cap
    * means a tiny domain whose flattened share exceeds its size passes
    * through whole and the budget is under-filled by that surplus
    * (deliberately NOT redistributed: redistribution is iterative
    * water-filling, which no other engine reproduces from the spec —
    * callers wanting exact budgets compose [[sampleToTokenBudget]] with
    * explicit targets).
    *
    * Same physics as [[sampleToTokenBudget]]: one map-side-combined
    * aggregate to #domains rows (plus a second agg OVER those rows for
    * the normalizer — free), broadcast back, map-only membership filter
    * via the salted hash. All arithmetic is IEEE double + `pow`;
    * reproducibility caveat: the normalizer is a float SUM whose
    * accumulation order (and another engine's `pow`) can differ by an
    * ulp, so a rate landing WITHIN AN ULP of an integer bucket boundary
    * could in principle flip one document — measurable only in
    * adversarially-constructed token counts, but stated rather than
    * hidden. Domains whose token sum is 0 or NULL get rate 0 (not the
    * NaN that naive division would produce). */
  def sampleByTemperature(df: DataFrame, idCol: String, domainCol: String,
                          tokensCol: String, alpha: Double,
                          budgetTokens: Long,
                          salt: Long = 7919L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(budgetTokens >= 0, s"need a non-negative budget, got $budgetTokens")
    val w = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("double").as("__avail"))
      .select(col(domainCol), col("__avail"),
        pow(col("__avail"), lit(alpha)).as("__wa"))
    val z = w.agg(sum(col("__wa")).as("__z"))
    // 0.0/0.0 = NaN and least() orders NaN ABOVE 1.0, so an unguarded
    // zero-token domain would sample at rate 1 instead of 0
    val rates = w.crossJoin(broadcast(z))
      .select(col(domainCol).as("__dom"),
        when(col("__avail") > 0,
          least(lit(1.0),
            lit(budgetTokens.toDouble) * col("__wa") / col("__z") / col("__avail")))
          .otherwise(lit(0.0)).as("__rate"))
    // NULL-SAFE rate join: groupBy forms a NULL-domain group (it is in
    // the normalizer), so the membership join must reach it too — a
    // plain equi-join would silently drop every NULL-domain row while
    // still charging the budget for its share
    df.join(broadcast(rates), col(domainCol) <=> col("__dom"))
      .filter(saltedBucket(col(idCol), salt) < col("__rate") * Buckets)
      .drop("__rate", "__dom")
  }

  /** Large prime modulus for the shuffle sort key: fine-grained enough
    * that key ties are broken by the id tiebreak only in pathological
    * id spaces. */
  val ShuffleMod = 1000000007L

  /** Deterministic global shuffle into `numShards` output shards — the
    * training-export step: a model wants its corpus in pseudo-random
    * order, the pipeline wants that order REPRODUCIBLE (same corpus +
    * same salt ⇒ byte-identical shards, resumable across reruns and
    * re-derivable by any engine).
    *
    * `skey = (id + salt)·KnuthPrime mod [[ShuffleMod]]` is the shuffle
    * order; `shard = skey mod numShards`. One HASH-partition exchange +
    * a within-partition sort. Deliberately NOT `orderBy(skey)` /
    * `repartitionByRange`: a RangePartitioner samples its boundaries
    * (seeded by rdd.id), so re-executing the shuffle in another job can
    * draw DIFFERENT partition boundaries — silently different shard
    * files on retry. Hash sharding is a pure function of the id: a
    * lost-executor retry, a rerun, or a different engine all rebuild the
    * identical shard. Shards are hash-balanced (±√n), not exactly equal
    * — the trade for determinism.
    *
    * Output keeps `shard` and `__skey` (the within-shard sort key);
    * write with `.write.partitionBy("shard")` for one directory per
    * shard. The physical Spark partition index is NOT the shard id —
    * `repartition(n, col)` places rows by murmur3(shard) mod n, so a
    * partition can hold zero or several (whole, contiguous) shards;
    * anything that equates "partition" with "shard" (e.g. a naive
    * one-file-per-partition `foreachPartition` writer) silently mixes
    * or drops shards. */
  def shuffleIntoShards(df: DataFrame, idCol: String, numShards: Int,
                        salt: Long = 104729L): DataFrame = {
    require(numShards > 0, s"need a positive shard count, got $numShards")
    val skey = pmod((col(idCol) + salt) * KnuthPrime, lit(ShuffleMod))
    df.withColumn("__skey", skey)
      .withColumn("shard", pmod(col("__skey"), lit(numShards.toLong)))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__skey"), col(idCol))
  }

  /** Down-sample each domain to a TOKEN budget — mixture specs for
    * training runs are written in tokens, not documents, and sources
    * differ wildly in document length. `rate_d = min(1, target_d /
    * available_d)` computed from the data, then the same deterministic
    * salted-hash membership as [[sampleByDomain]]. Domains without a
    * target — or whose token sum is 0 or NULL — are dropped (rate 0).
    *
    * Two passes, both scale-safe: a per-domain token aggregate (one
    * shuffle with map-side combine, output = #domains rows) joined back
    * as a BROADCAST, then a map-only filter. The achieved token count is
    * hash-approximate around the target (exact when `target ≥ available`,
    * where the rate caps at 1 and the domain passes through whole). */
  def sampleToTokenBudget(df: DataFrame, idCol: String, domainCol: String,
                          tokensCol: String, targets: Seq[(String, Long)],
                          salt: Long = 7919L): DataFrame = {
    require(targets.forall(_._2 >= 0), s"need non-negative targets, got $targets")
    val tgt = targets.foldRight(lit(0L)) { case ((d0, t), rest) =>
      when(col(domainCol) === d0, lit(t)).otherwise(rest)
    }
    // the avail > 0 guard: 0/0 = NaN sorts ABOVE 1.0 in least(), so an
    // unguarded zero-token domain would pass whole instead of dropping
    val rates = df.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).as("__avail"))
      .select(col(domainCol),
        when(col("__avail") > 0,
          least(lit(1.0), tgt.cast("double") / col("__avail").cast("double")))
          .otherwise(lit(0.0)).as("__rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(saltedBucket(col(idCol), salt) < col("__rate") * Buckets)
      .drop("__rate")
  }
}
