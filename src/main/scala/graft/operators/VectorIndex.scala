package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.functions.Similarity
import graft.iceberg.{IcebergTable, IcebergWriter}

/** A persisted IVF(-flat) vector index AS Iceberg tables — the bridge
  * between the ANN operators and the lakehouse storage layer, and the
  * serving shape that survives 100 TB: build once (two passes over the
  * corpus: train + assign), then every query batch reads only the
  * posting lists it probes.
  *
  * Layout under `indexDir`:
  *   - `centroids/` — (c_id, c_vec: array<double>, c_nrm): the coarse
  *     quantizer, nCentroids rows, broadcast at probe time.
  *   - `postings/` — (c_id, n_id, n_vec, n_nrm), PARTITIONED BY
  *     identity(c_id): each centroid's posting list lands in its own
  *     partition directory, with per-file c_id bounds in the manifests.
  *
  * Probe cost model: a query batch touches at most |queries| × nProbe
  * distinct centroid ids. [[topK]] joins the postings scan against that
  * BROADCAST id set and [[graft.iceberg.connector.RuntimeProbe]] plants
  * a dynamic-pruning subquery on the scan, so identity-partition pruning
  * reads ONLY the probed posting lists — per-batch index IO is the
  * probed corpus fraction (≈ nProbe / nCentroids for balanced lists),
  * not the corpus, with no driver-side key collect and no key-count cap
  * (round 14; rounds 12–13 collected the ids with a 100k full-scan
  * fallback). The streaming admission probe
  * ([[Dedup.incrementalAdmissionWithIndex]]'s `prunedCorpusIndex`) rides
  * the same helper; both stay correct even when the runtime filter does
  * not fire because the join re-enforces the key filter row-exactly.
  *
  * Determinism contract: the stored centroid rows are the EXACT rows
  * [[Similarity.ivfCentroids]] computes (array<double> and doubles
  * round-trip parquet bit-for-bit, float vectors likewise), assignment
  * and scoring reuse the same kernels — so [[topK]] over a stored index
  * equals [[Similarity.ivfTopK]] over the live corpus with the same
  * parameters, row for row (the spec pins this).
  */
object VectorIndex {

  /** Train the quantizer and persist both index tables. `corpus` is read
    * twice (centroid training + assignment); the k-bounded centroid rows
    * are collected once so k-means training is NOT re-run by the
    * assignment pass. REFUSES an `indexDir` that already holds an index
    * (via [[IcebergWriter.seedTable]]): reads resolve the highest
    * metadata version, so re-seeding v1 under a surviving v2+ would
    * leave the stale index live and the appends would merge old and new
    * posting/centroid rows — duplicate neighbors, silently. Retraining
    * is a fresh build into a NEW dir (or delete this one first), swapped
    * atomically by the caller. */
  def build(spark: SparkSession, corpus: DataFrame, indexDir: String,
      nCentroids: Int = 16, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    // materialize the (k-bounded) centroid rows so the two downstream
    // uses (centroid-table write, corpus assignment) don't re-train
    val centRows = Similarity
      .ivfCentroids(corpus, nCentroids, trainIters, idCol, vecCol)
      .localCheckpoint(true)
    writeIndex(spark, corpus, indexDir, centRows, idCol, vecCol)
  }

  /** [[build]] with a CALLER-PROVIDED quantizer: `centroids` is raw
    * (idCol, vecCol) rows — the pretrained-quantizer workflow (train
    * offline on a sample, freeze, build serving indexes against it), and
    * the shape whose probe routing an external engine can reproduce
    * exactly (the centroid SET is plain SQL over the source rows — the
    * q158 recall oracle leans on this). Same refusal and layout rules as
    * [[build]]. */
  def buildWithCentroids(spark: SparkSession, corpus: DataFrame,
      indexDir: String, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    writeIndex(spark, corpus, indexDir,
      Similarity.centroidRows(centroids, idCol, vecCol).localCheckpoint(true),
      idCol, vecCol)

  private def writeIndex(spark: SparkSession, corpus: DataFrame,
      indexDir: String, centRows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val postings = Similarity.ivfAssign(corpus, centRows, idCol, vecCol)
    IcebergWriter.seedTable(spark, s"$indexDir/centroids", centRows.schema)
    IcebergWriter.seedTable(spark, s"$indexDir/postings", postings.schema,
      Seq("c_id" -> "identity"))
    // ONE transaction for both appends, stamped with a shared epoch —
    // two independent appends left a crash window whose torn result
    // (centroids live, postings empty) both tables' MISSING epochs made
    // loadConsistent bless as a consistent pair
    val conf = spark.sessionState.newHadoopConf()
    val epoch = java.util.UUID.randomUUID().toString
    graft.iceberg.Transactions.commitAll(Seq(
      stamped(spark, conf, epoch, s"$indexDir/centroids", centRows),
      stamped(spark, conf, epoch, s"$indexDir/postings", postings)))
  }

  /** Stage `df` into `dir` (append or overwrite) with the shared rebuild
    * epoch riding the SAME commit — the building block [[writeIndex]]
    * and [[rebuild]] publish their two-table transactions from. */
  private def stamped(spark: SparkSession,
      conf: org.apache.hadoop.conf.Configuration, epoch: String,
      dir: String, df: DataFrame, overwrite: Boolean = false)
      : graft.iceberg.Transactions.TableChange = {
    import graft.iceberg.{FsCommitter, Transactions}
    val ch = Transactions.stage(new FsCommitter(dir, conf))(c =>
      { if (overwrite) IcebergWriter.overwrite(spark, dir, df, committer = Some(c))
        else IcebergWriter.append(spark, dir, df, committer = Some(c)); () })
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val upd = mapper.createObjectNode()
    upd.put("action", "set-properties")
    upd.putObject("updates").put(EpochProp, epoch)
    ch.copy(updates = ch.updates :+ upd)
  }

  /** Append a vector batch to a stored index: assign against the STORED
    * centroid table — so the quantizer, and therefore probe routing,
    * never drifts from what [[build]] trained — and commit the new
    * posting rows under the same identity(c_id) partition spec. O(batch)
    * work: one map-side assignment pass over the batch plus one Iceberg
    * append; the corpus is never re-read. Retraining (when drift between
    * the stored centroids and the grown corpus warrants it) is a fresh
    * [[build]] into a new indexDir, swapped atomically by the caller.
    * Returns the committed snapshot id. */
  def append(spark: SparkSession, indexDir: String, vectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    // racing a rebuild both ways: (a) PIN the postings base FIRST and
    // check the centroid epoch against the PINNED epoch — a rebuild
    // landing before the pin is seen as a mismatch and retried against
    // the new generation; (b) the publish asserts the pinned base, so a
    // rebuild landing AFTER the pin conflicts (CommitConflictException,
    // the retry contract) instead of landing rows assigned by the stale
    // quantizer inside the new generation's posting lists (silently
    // unsearchable) or being dropped by the rebuild's pinned read.
    val conf = spark.sessionState.newHadoopConf()
    var attempt = 0
    while (true) {
      val committer =
        new graft.iceberg.PinnedFsCommitter(s"$indexDir/postings", conf)
      val postEpoch = committer.currentMetadata().properties.get(EpochProp)
      val centT = IcebergTable(spark, s"$indexDir/centroids")
      if (centT.metadata.properties.get(EpochProp) == postEpoch)
        return IcebergWriter.append(spark, s"$indexDir/postings",
          Similarity.ivfAssign(vectors, centT.toDF(spark), idCol, vecCol),
          committer = Some(committer))
      attempt += 1
      if (attempt >= 5) throw new IllegalStateException(
        s"vector index $indexDir: centroid and postings epochs disagree " +
          s"after $attempt reloads — a rebuild crashed mid-publish; " +
          "re-run rebuild before appending")
      Thread.sleep(100L * attempt)
    }
    sys.error("unreachable")
  }

  /** Bound the small-file debt a stream of [[append]] batches accrues:
    * every append fans out one file per TOUCHED posting partition, so
    * after B batches a hot cell holds up to B small files and probe IO
    * degrades from "one file per probed cell" toward "B files per
    * probed cell". Compaction rewrites each posting list back toward
    * `targetFileBytes`-sized files; identity(c_id) partitioning — and
    * therefore probe routing, pruning, and results — is unchanged (the
    * spec pins files-shrink + tuples-intact + topK row-identical). The
    * centroid table is k rows and never needs it. Returns the rewrite
    * snapshot id. */
  def compact(spark: SparkSession, indexDir: String,
      targetFileBytes: Long = 128L << 20): Long =
    IcebergWriter.compact(spark, s"$indexDir/postings", targetFileBytes)

  /** Incremental vector admission: flag which rows of a NEW batch are
    * exact vector duplicates of the stored corpus or of an earlier batch
    * row — the embedding-side twin of
    * [[Dedup.incrementalAdmissionWithIndex]], and the ingest loop a
    * growing vector corpus runs (probe, drop duplicates, [[append]] the
    * kept rows).
    *
    * Contract (exact, engine-portable): a row is `dup_of_corpus` iff
    * some stored posting row has an IDENTICAL vector, and `batch_dup`
    * iff an earlier (smaller-id) batch row does; `keep` is neither. The
    * index is only the BLOCKING strategy: an identical vector always
    * maps to its twin's argmax centroid cell (the assignment kernel is
    * deterministic, ties broken on centroid id), so the probed candidate
    * set provably contains every exact duplicate for any nProbe >= 1 —
    * recall 1.0 by construction, no probabilistic caveat, and any SQL
    * engine reproduces the output with plain equality tests (the q157
    * oracle does exactly that). Near-duplicate admission by cosine is a
    * different, candidate-recall contract — that is batch
    * [[Similarity.semDedup]] territory, deliberately not folded in here.
    *
    * Scale shape: the batch is assigned map-side against the broadcast
    * stored centroids (no shuffle); the corpus side reads ONLY the
    * posting partitions the batch's cells touch (the same
    * runtime-filtered probe as [[topK]], ≈ cells-touched / nCentroids
    * of the index, correct even when the filter does not fire);
    * candidates are equality-verified on the vector.
    * Batch-internal pairing is blocked by the same cells — quadratic
    * only within a batch cell, bounded by batch size, never corpus.
    * Unlike [[topK]] the q_id = n_id guard is NOT applied: a replayed
    * row (same id, same vector) IS a corpus duplicate. */
  def admit(spark: SparkSession, indexDir: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    admitWithAssignment(spark, indexDir, batch, idCol, vecCol)._1

  /** [[admit]] that ALSO returns the batch's (already-materialized)
    * posting-row assignment — callers that append admitted rows to the
    * index (the streaming ingest sink) filter it to the kept ids instead
    * of re-running the assignment, and the checkpointed rows double as
    * the determinism pin replayed/retried writers rely on. Returns
    * (flags, assignment).
    *
    * `corpusAnchor`: when given (the streaming sink passes the corpus
    * table), a posting row only counts as a corpus duplicate if its id
    * also exists in the anchor — so index rows ORPHANED by a crash
    * between the index and corpus commits (the one window the
    * two-table publish protocol cannot close; see
    * [[graft.streaming.EventStream.icebergVectorAdmissionSink]]) are
    * benign bloat, never a replay-time false rejection that would lose
    * the row from the corpus forever. */
  def admitWithAssignment(spark: SparkSession, indexDir: String,
      batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      corpusAnchor: Option[DataFrame] = None,
      /** Snapshot-pinned postings table (the streaming sink passes the
        * instance its publish will assert), so the probe, the replay
        * hygiene read, and the staged append all see ONE snapshot.
        * None = resolve live. */
      pinnedPostings: Option[IcebergTable] = None,
      /** Snapshot-pinned centroid table. The quantizer is immutable
        * after [[build]], so live resolution is usually fine; a pin
        * removes even that read's raciness. */
      pinnedCentroids: Option[IcebergTable] = None): (DataFrame, DataFrame) = {
    // epoch handshake on EVERY pin combination — admit had none, so a
    // rebuild landing between the live centroid read and the pinned
    // postings probe paired the new quantizer with the old posting
    // lists: every corpus duplicate missed, duplicates admitted forever.
    // Both-None loads the matched pair; a single pin (the streaming
    // sink's shape: postings pinned for its publish assert) resolves the
    // partner live and REFUSES an epoch mismatch loudly.
    val (centroidsTable, postingsTable) = (pinnedCentroids, pinnedPostings) match {
      case (None, None) => loadConsistent(spark, indexDir)
      case (c, p) =>
        val cc = c.getOrElse(IcebergTable(spark, s"$indexDir/centroids"))
        val pp = p.getOrElse(IcebergTable(spark, s"$indexDir/postings"))
        val (ce, pe) = (cc.metadata.properties.get(EpochProp),
          pp.metadata.properties.get(EpochProp))
        if (ce != pe) throw new IllegalStateException(
          s"vector index $indexDir: admission probe would pair centroid " +
            s"epoch $ce with postings epoch $pe — a rebuild landed since " +
            "the pinned snapshot; recompute the batch against the new " +
            "generation (the publish assert would have conflicted anyway)")
        (cc, pp)
    }
    val centRows = centroidsTable.toDF(spark)
    // one map-side assignment pass, reused by both probes AND by the
    // caller-visible flags join (checkpointed: the pin also freezes the
    // admitted set so retried writers see identical flags)
    val asg = Similarity.ivfAssign(batch, centRows, idCol, vecCol)
      .localCheckpoint(true)
    // runtime-filtered probe: the batch's distinct cells broadcast into
    // the postings scan, file-pruned at execution (no driver collect)
    val postings = graft.iceberg.connector.RuntimeProbe
      .prunedByKeys(spark, postingsTable, "c_id", asg.select(col("c_id")))
    // corpus probe: cell-equijoin then exact vector verify. No forced
    // broadcast: the batch side carries full vectors and is unbounded —
    // let the planner pick (small batches broadcast on size anyway;
    // huge bulk re-admissions legitimately shuffle against the pruned
    // posting scan).
    // candidate (batch id, posting id) pairs from the pruned posting
    // read: cell-equijoin then exact vector verify
    val cand = asg
      .select(col("c_id"), col("n_id").as("__bid"),
        col("n_vec").as("__bvec"))
      .join(postings, Seq("c_id"))
      .filter(col("__bvec") <=> col("n_vec"))
      .select(col("__bid"), col("n_id"))
      .localCheckpoint(true) // candidates are read twice under an anchor
    val corpusDups = (corpusAnchor match {
      case None => cand
      case Some(c) =>
        // anchor check is candidate-bounded, never O(corpus): the
        // verified candidate ids (≤ |batch| × dup multiplicity)
        // broadcast-semi-join into the corpus read. When the anchor is
        // a DSv2 read of the pinned corpus table (the streaming sink's
        // shape), the probe rule file-prunes that scan by the candidate
        // ids at runtime — manifest id-bounds, no driver collect. A
        // candidate-free batch (the common ingest case) never touches
        // the anchor at all — cand is checkpointed, so the emptiness
        // check is a metadata peek, not a job.
        if (cand.isEmpty) cand.select(col("__bid"))
        else {
          val anchorIds = c.select(col(idCol).as("n_id"))
          val present = anchorIds.join(
            org.apache.spark.sql.functions.broadcast(
              graft.iceberg.connector.RuntimeProbe.markedKeys(
                spark, cand, "n_id", anchorIds.schema("n_id").dataType)),
            Seq("n_id"), "left_semi")
          cand.join(present, Seq("n_id"), "left_semi")
        }
    }).select(col("__bid").as(idCol)).distinct()
    // batch-internal: earlier id wins — exact equality is transitive, so
    // "has a smaller identical partner" == "not the canonical minimum of
    // its duplicate group". Computed as ONE hash aggregation grouped BY
    // THE VECTOR, not a within-cell pair join: map-side partial combine
    // collapses even an all-identical batch to one row per task (the
    // pair join was quadratic in the hottest cell — a planted
    // 10k-identical batch ran 10^8 comparisons in one task), and the
    // join back on the group key is linear in the batch. Null vectors
    // are excluded on BOTH sides (matching the old pair join, whose
    // null c_id equi key never matched): a null embedding is degenerate
    // input, not a duplicate of another null.
    val nn = asg.filter(col("n_vec").isNotNull)
    val keepers = nn.groupBy(col("n_vec").as("__gvec"))
      .agg(org.apache.spark.sql.functions.min(col("n_id")).as("__gmin"))
    val batchDups = nn.join(keepers,
        col("n_vec") <=> col("__gvec") && col("n_id") > col("__gmin"))
      .select(col("n_id").as(idCol)).distinct()
    val flags = batch
      .join(corpusDups.withColumn("dup_of_corpus", lit(true)),
        Seq(idCol), "left")
      .join(batchDups.withColumn("batch_dup", lit(true)),
        Seq(idCol), "left")
      .na.fill(false, Seq("dup_of_corpus", "batch_dup"))
      .withColumn("keep", !col("dup_of_corpus") && !col("batch_dup"))
    (flags, asg)
  }

  /** Approximate top-k over the stored index: broadcast the centroid
    * table, compute each query's nProbe nearest centroid ids map-side,
    * then scan ONLY those posting-list partitions (In-filter file
    * pruning) and score/rank with the shared IVF kernel.
    *
    * Snapshot consistency: with no pins, both tables load through
    * [[loadConsistent]] — a probe racing a [[rebuild]] sees the old
    * index or the new one, never new centroids routing into old posting
    * lists. Serving paths that already hold pinned tables (the
    * streaming sink, a caller probing under concurrent maintenance)
    * pass them in and skip the epoch handshake. */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      pinnedCentroids: Option[IcebergTable] = None,
      pinnedPostings: Option[IcebergTable] = None): DataFrame = {
    val (centroidsTable, postingsTable) = (pinnedCentroids, pinnedPostings) match {
      case (Some(c), Some(p)) => (c, p)
      case (None, None) => loadConsistent(spark, indexDir)
      case _ => throw new IllegalArgumentException(
        "topK pins both index tables or neither: a single pin would " +
          "skip the epoch handshake and could pair one generation's " +
          "centroids with the other's posting lists (load both via " +
          "loadConsistent and pin the pair)")
    }
    val centRows = centroidsTable.toDF(spark)
    val probes = Similarity.ivfProbes(queries, centRows, nProbe, idCol, vecCol)
      .localCheckpoint(true) // probed ids are reused: once for the
                             // pruning broadcast, once joined for scoring
    val postings = graft.iceberg.connector.RuntimeProbe
      .prunedByKeys(spark, postingsTable, "c_id", probes.select(col("c_id")))
    Similarity.ivfScore(probes, postings, k)
  }

  /** Table property both index tables carry after a [[rebuild]]: equal
    * values mean the pair belongs to one rebuild generation. Tables from
    * the original [[build]] carry none (also a consistent pair). */
  private[graft] val EpochProp = "graft.index.epoch"

  /** Load (centroids, postings) with MATCHING rebuild epochs. A probe
    * landing inside [[rebuild]]'s two-pointer publish window could
    * otherwise route new-quantizer probes into old posting lists —
    * centroid ids would match the wrong lists, silently wrong
    * neighbors. Bounded retry, then loud. */
  def loadConsistent(spark: SparkSession, indexDir: String)
      : (IcebergTable, IcebergTable) = {
    var attempt = 0
    while (true) {
      val c = IcebergTable(spark, s"$indexDir/centroids")
      val p = IcebergTable(spark, s"$indexDir/postings")
      val ce = c.metadata.properties.get(EpochProp)
      val pe = p.metadata.properties.get(EpochProp)
      if (ce == pe) return (c, p)
      attempt += 1
      if (attempt >= 5) throw new IllegalStateException(
        s"vector index $indexDir: centroid epoch $ce != postings epoch " +
          s"$pe after $attempt reloads — a rebuild crashed mid-publish; " +
          "re-run rebuild (or roll the tables back to a matching pair)")
      // a rebuild's two pointers publish sequentially; give an IN-FLIGHT
      // publish time to land its second pointer before concluding it
      // crashed (object-store pointer writes take 100s of ms)
      Thread.sleep(100L * attempt)
    }
    sys.error("unreachable")
  }

  /** Sanctioned quantizer retrain: rebuild BOTH index tables in place as
    * ONE transaction ([[graft.iceberg.Transactions.commitAll]]) — the
    * atomic swap [[build]]'s rebuild-in-place refusal points callers at.
    * Data files for the new generation land before any pointer moves;
    * the two pointers then publish via commitAll's FILESYSTEM path
    * (validate-then-publish with compensation — index tables live at a
    * directory pair, so the committers here are always [[FsCommitter]]s;
    * a crash inside the tiny publish window can leave a torn pair), and
    * both commits stamp a fresh shared [[EpochProp]] so
    * [[loadConsistent]] probes REFUSE a torn pair instead of pairing
    * generations. Old probes holding pinned tables keep reading the old
    * snapshots (files are never vacuumed here).
    *
    * `corpus` defaults to the index's OWN stored posting rows — pure
    * retrain; pass the source table to also refresh membership. Returns
    * (epoch, postingRows). */
  def rebuild(spark: SparkSession, indexDir: String,
      nCentroids: Int = 16, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      corpus: Option[DataFrame] = None): (String, Long) = {
    import graft.iceberg.{FsCommitter, Transactions}
    val conf = spark.sessionState.newHadoopConf()
    // pinned reads: the training/assignment input is one snapshot even
    // while the overwrite below writes new files next to it
    val postingsT = IcebergTable(spark, s"$indexDir/postings")
    val corpusDf = corpus.getOrElse(
      postingsT.toDF(spark).select(col("n_id").as(idCol),
        col("n_vec").as(vecCol)))
    val centRows = Similarity
      .ivfCentroids(corpusDf, nCentroids, trainIters, idCol, vecCol)
      .localCheckpoint(true)
    val postings = Similarity.ivfAssign(corpusDf, centRows, idCol, vecCol)
      .localCheckpoint(true) // row count is returned after the commit
    val epoch = java.util.UUID.randomUUID().toString
    // the epoch rides the SAME commit as each overwrite — two commits
    // per table would reopen the very window this closes
    Transactions.commitAll(Seq(
      stamped(spark, conf, epoch, s"$indexDir/centroids", centRows,
        overwrite = true),
      stamped(spark, conf, epoch, s"$indexDir/postings", postings,
        overwrite = true)))
    (epoch, postings.count())
  }

}
