package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Similarity, TextFunctions}
import graft.operators.{BloomAdmission, Dedup, FuzzyJoin, Multimodal, NgramLm, QualityFilters, TemporalJoins, TfIdf}

/** Training-data-pipeline extensions (SURVEY §2.B north star + the declared
  * Q34–Q36): deduplication, similarity search, text analysis, multimodal
  * plumbing. Queries whose kernels are engine-portable carry a DuckDB
  * oracle; those built on engine-specific hashing (xxhash64 minhash /
  * simhash, LSH bucketing) are declared rows-only.
  */
object Extensions {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- declared Q34–Q36 ------------------------------------------------
    "q34_dedup_group" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(countDistinct(col("text")).as("distinct_docs"),
             count(lit(1)).as("docs"))
        .orderBy(col("lang").asc_nulls_first)),

    "q35_similarity_dot" -> ((s, d) => {
      val a = t(s, d, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id").as("qa"), col("embedding").as("va"))
      val b = t(s, d, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id").as("qb"), col("embedding").as("vb"))
      broadcast(a).join(b, col("qa") < col("qb"))
        .select(col("qa"), col("qb"),
          round(Similarity.dot(col("va"), col("vb")), 4).as("dp"))
        .orderBy(col("qa").asc_nulls_first, col("qb").asc_nulls_first)
    }),

    "q36_wordcount" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc_nulls_last, col("word").asc_nulls_first)
        .limit(20)),

    // Bloom-filter-bounded exact admission: which incoming docs are new
    // to the corpus. The corpus folds into ONE broadcastable bitset;
    // clear Bloom misses are admitted map-side without touching a join;
    // only the "possibly seen" sliver pays the exact anti-join. Output
    // is EXACT (no false negatives), so the oracle is the plain
    // NOT EXISTS — the Bloom tier only changes the PLAN, not the answer.
    "q138_bloom_admission" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val incoming = docs.filter(col("doc_id") % 2 === 0)
      BloomAdmission.admitNew(corpus, incoming, "text",
          numBits = 1 << 16, numHashes = 5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Count-min-sketch heavy hitters: the exact top-15 words gate the
    // result (oracle-able), and the sketch built over the SAME stream is
    // require()d to bound every exact count from above within the CMS
    // error envelope (est >= true always; est <= true + 5N/width here).
    // At 100 TB the sketch answers frequency questions in depth*width*8
    // bytes where the exact aggregate shuffles billions of keys.
    "q139_heavy_hitters" -> ((s, d) => {
      import graft.operators.FrequencySketch
      val words = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      val top = words.groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc_nulls_last, col("word").asc_nulls_first)
        .limit(15)
      val (width, depth) = (4096, 4)
      val counters = FrequencySketch.build(words, col("word"), width, depth)
      val nTotal = counters.take(width).sum // each row of counters sums to N
      val checked = top.withColumn("est",
        FrequencySketch.estimate(col("word"), counters, width, depth))
        .collect()
      checked.foreach { r =>
        val (w, c, e) = (r.getString(0), r.getLong(1), r.getLong(2))
        require(e >= c, s"q139: CMS underestimated '$w': $e < $c")
        require(e <= c + 5L * nTotal / width,
          s"q139: CMS estimate for '$w' outside the error envelope: " +
            s"$e vs exact $c, N=$nTotal")
      }
      top
    }),

    // PageRank centrality over a deterministic event-derived graph —
    // the web-curation quality signal, as 8 integer-arithmetic power
    // iterations (one shuffle + one checkpoint per round, plan kept a
    // leaf). The oracle replays the SAME iterations as unrolled SQL.
    "q141_pagerank" -> ((s, d) => {
      import graft.operators.Centrality
      val edges = t(s, d, "events").filter(col("user_id") < 40)
        .select((col("event_id") % 40).as("src"), col("user_id").as("dst"))
        .filter(col("src") =!= col("dst"))
      Centrality.pageRank(edges, "src", "dst", iterations = 8)
        .orderBy(col("v").asc_nulls_first)
    }),

    // SCD2 apply — Kimball type-2 dimension versioning: changing
    // updates close the current row and open a new version, identical
    // updates are no-ops (no empty versions), new keys insert. One key
    // join + unions; money stays in integer cents so both engines agree
    // bit-for-bit. The oracle reconstructs the same row set set-wise.
    "q142_scd2" -> ((s, d) => {
      import graft.operators.Scd2
      val c = t(s, d, "customer").select(col("c_custkey").as("k"),
        expr("CAST(FLOOR(c_acctbal * 100) AS BIGINT)").as("b"))
      val dim = c.withColumn("valid_from", to_date(lit("1995-01-01")))
        .withColumn("valid_to", lit(null).cast("date"))
      val updates = c.filter(col("k") % 3 === 0)
        .select(col("k"),
          when(col("k") % 6 === 0, col("b")) // identical → no-op
            .otherwise(col("b") + 10000).as("b"),
          to_date(lit("1996-01-01")).as("ts"))
        .unionByName(c.filter(col("k") < 50) // brand-new keys
          .select((col("k") + 1000000).as("k"), lit(0L).as("b"),
            to_date(lit("1996-01-01")).as("ts")))
      Scd2(dim, updates, Seq("k"), Seq("b"), "ts")
        .groupBy(col("valid_to").isNull.as("current"))
        .agg(count(lit(1)).as("n"),
          sum("k").cast("bigint").as("sk"),
          sum("b").cast("bigint").as("sa"))
        .orderBy(col("current").asc_nulls_first)
    }),

    // Bloom semi-join reduction: the fact side is filtered map-side
    // against a bitset of the dim's join keys BEFORE the join shuffle —
    // non-matching lineitem rows never enter the exchange. Result is
    // exactly the plain inner join (no false negatives; FP sliver dies
    // in the real join), which is what the oracle computes.
    "q143_bloom_join" -> ((s, d) => {
      import graft.operators.JoinStrategies
      val li = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"))
      val pt = t(s, d, "part").filter(col("p_size") === 1)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      JoinStrategies.bloomReducedJoin(li, pt, Seq("l_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("l_quantity").cast("bigint").as("sq"))
        .orderBy(col("p_brand").asc_nulls_first)
    }),

    // ---- dedup -----------------------------------------------------------
    "q37_dedup_exact" -> ((s, d) =>
      Dedup.exactKeepFirst(t(s, d, "documents"), "text", "doc_id")
        .agg(count(lit(1)).as("n_unique"),
             sum(col("dup_count")).cast("bigint").as("n_total"))),

    // fingerprint-keyed exact dedup: the corpus-wide shuffle carries
    // (length, xxhash64, id) instead of document bodies; only the
    // duplicate sliver re-verifies on real text. Oracle-equal to the
    // text-keyed form per distinct text (hash column dropped — DuckDB
    // has no xxhash64; text_len + keep decisions pin the semantics).
    "q147_dedup_exact_hash" -> ((s, d) =>
      Dedup.exactKeepFirstByHash(t(s, d, "documents"), "text", "doc_id")
        .select(col("text_len").cast("bigint").as("text_len"),
          col("keep_id"), col("dup_count"))
        .orderBy(col("keep_id").asc_nulls_first)),

    "q40_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
          t(s, d, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", n = 3)
        .orderBy(col("qa").asc_nulls_first, col("qb").asc_nulls_first)),

    // rows-only (xxhash64-based; no portable oracle). The array signature
    // is collapsed to one scalar digest so the driver's sort/hash harness
    // can gate the rows — the array API stays on Dedup.minhashSignatures
    // for library callers.
    "q41_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignatures(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), xxhash64(col("sig")).as("sig_digest"))
        .orderBy(col("doc_id").asc_nulls_first)),

    "q41b_minhash_pairs" -> ((s, d) =>
      Dedup.minhashCandidatePairs(
          t(s, d, "documents"), "doc_id", "text", numHashes = 32, bands = 16)
        .orderBy(col("qa").asc_nulls_first, col("qb").asc_nulls_first)),

    "q42_simhash" -> ((s, d) =>
      Dedup.simhash64(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id").asc_nulls_first)),

    // ---- planted-duplicate recall gates (oracle-checked) -----------------
    // The engine-specific hash internals (xxhash64 minhash/simhash, LSH
    // bucketing) have no portable oracle, but their *retrieval contract*
    // does: a cloned row must rediscover its source — identical input ⇒
    // identical signature/bucket, deterministically. The oracle states the
    // provable answer from first principles, so these gate the full
    // pipeline (tokenize → hash → band/chunk/bucket join → rank) with an
    // exact hash-match.
    "q41c_minhash_clone_recall" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val clones = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.minhashCandidatePairs(
          docs.unionByName(clones), "doc_id", "text", numHashes = 32, bands = 16)
        .filter(col("qb") === col("qa") + 1000000L)
        .agg(count(lit(1)).as("n_found"))
    }),

    "q42b_simhash_dup_parity" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val clones = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.simhashPairs(docs.unionByName(clones), "doc_id", "text", maxHamming = 0)
        .filter(col("qb") === col("qa") + 1000000L)
        .agg(count(lit(1)).as("n_found"))
    }),

    // Duplicate CLUSTERS: the full dedup pipeline — LSH candidates →
    // verification (exact text equality here; a Jaccard threshold in a
    // fuzzy pipeline) → connected components → one canonical per cluster.
    // Two clone sets per source doc make 3-node components whose members
    // met only pairwise in buckets; transitivity is what components add
    // over pairs. Provable answer: every source doc < 100 is the minimum
    // id (= canonical) of exactly one size-3 cluster.
    "q63_dedup_clusters" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val all = docs
        .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(docs.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      val candidates = Dedup.minhashCandidatePairs(
        all, "doc_id", "text", numHashes = 32, bands = 16)
      // verify candidates before clustering (LSH can bucket non-dups; a
      // false positive pair would MERGE two clusters)
      val texts = all.select(col("doc_id"), col("text"))
      val verified = candidates
        .join(texts.select(col("doc_id").as("qa"), col("text").as("ta")), "qa")
        .join(texts.select(col("doc_id").as("qb"), col("text").as("tb")), "qb")
        .filter(col("ta") === col("tb"))
        .select("qa", "qb")
      Dedup.connectedComponents(verified)
        .groupBy(col("comp").as("canonical_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .orderBy(col("canonical_id").asc_nulls_first)
    }),

    "q49b_lsh_clone_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val clones = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.lshTopK(clones, emb, k = 1, nBits = 4, tables = 2)
        .select(col("q_id"), col("n_id"), col("score"))
        .orderBy(col("q_id").asc_nulls_first)
    }),

    // IVF-flat ANN: same provable clone-recall contract as q49b, different
    // index family (coarse quantization instead of hash buckets)
    "q53_ivf_clone_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val clones = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.ivfTopK(clones, emb, k = 1, nCentroids = 16, nProbe = 2)
        .select(col("q_id"), col("n_id"), col("score"))
        .orderBy(col("q_id").asc_nulls_first)
    }),

    // Persisted IVF index AS Iceberg tables (VectorIndex): the same
    // provable clone-recall contract as q53, but the index is built ONCE
    // into lakehouse storage (centroids + identity(c_id)-partitioned
    // posting lists) and the probe reads only the In-pruned posting
    // partitions — the ANN serving shape that survives 100 TB.
    "q156_ivf_index_recall" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val emb = t(s, d, "embeddings")
      val dir = graft.Scratch.dir("q156-index")
      val p = new Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      graft.operators.VectorIndex.build(s, emb, dir, nCentroids = 16)
      val clones = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      graft.operators.VectorIndex.topK(s, dir, clones, k = 1, nProbe = 2)
        .select(col("q_id"), col("n_id"), col("score"))
        .orderBy(col("q_id").asc_nulls_first)
    }),

    // Incremental ANN admission (VectorIndex.admit): a new vector batch
    // is flagged dup_of_corpus / batch_dup / keep against the STORED
    // index — exact-equality contract, probe-blocked through the pruned
    // posting scan, so the oracle is plain SQL equality over the same
    // parquet (the embedding twin of q87's LSH admission).
    "q157_ann_admission" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val emb = t(s, d, "embeddings")
      val dir = graft.Scratch.dir("q157-index")
      val p = new Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      graft.operators.VectorIndex.build(s,
        emb.filter(col("vec_id") >= 200), dir, nCentroids = 16)
      val batch = emb.filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
        .unionByName(emb
          .filter(col("vec_id") >= 200 && col("vec_id") < 230)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        .unionByName(emb.filter(col("vec_id") < 15)
          .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
      graft.operators.VectorIndex.admit(s, dir, batch)
        .select(col("vec_id"), col("dup_of_corpus"), col("batch_dup"),
          col("keep"))
        .orderBy(col("vec_id").asc_nulls_first)
    }),

    // MEASURED recall@10 of the stored IVF index's REAL approximation:
    // topK with nProbe = 2 of the quantizer's cells versus the exact
    // float top-10 over the same corpus — the committed evidence a user
    // tuning nProbe gets (q156 pins clone recall = 1.0 by construction;
    // this pins what the approximation actually recalls). The quantizer
    // is a FIXED, SQL-expressible centroid set (vec_id % 25 = 0 through
    // buildWithCentroids), so the oracle reproduces the probe routing —
    // assignment argmax, per-query probe list, in-cell scoring — in
    // plain SQL, and DuckDB recomputes BOTH sides. BENCH_NOTES carries
    // the nProbe sweep this single point anchors.
    "q158_ivf_approx_recall" -> ((s, d) => {
      import org.apache.hadoop.fs.Path
      val emb = t(s, d, "embeddings")
      val dir = graft.Scratch.dir("q158-index")
      val p = new Path(dir)
      p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
      graft.operators.VectorIndex.buildWithCentroids(s, emb, dir,
        emb.filter(col("vec_id") % 25 === 0))
      val qs = emb.filter(col("vec_id") < 15)
      val approx = graft.operators.VectorIndex
        .topK(s, dir, qs, k = 10, nProbe = 2)
        .select(col("q_id"), col("n_id"))
      val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
        .select(col("q_id"), col("n_id"))
      val overlap = exact.join(approx, Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
      exact.select(col("q_id")).distinct()
        .join(overlap, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("h"), lit(0L)).as("hits"))
        .withColumn("recall", round(col("hits").cast("double") / 10.0, 4))
        .orderBy(col("q_id").asc_nulls_first)
    }),

    // IVF with k-means-TRAINED centroids (Lloyd's, 2 iterations): same
    // clone-recall contract — training moves centroids but assignment
    // stays deterministic on both sides, so exact duplicates still
    // retrieve with probability 1
    "q56_ivf_trained_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val clones = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.ivfTopK(clones, emb, k = 1, nCentroids = 16, nProbe = 2,
          trainIters = 2)
        .select(col("q_id"), col("n_id"), col("score"))
        .orderBy(col("q_id").asc_nulls_first)
    }),

    // approximate distinct (HLL) — engine-specific estimate, rows-only
    "q15b_approx_distinct" -> ((s, d) =>
      t(s, d, "orders")
        .agg(approx_count_distinct(col("o_custkey")).as("n_approx"))),

    // ---- temporal joins --------------------------------------------------
    // click→purchase attribution: most recent click before each purchase
    "q50_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      TemporalJoins.asOfJoin(purchases, clicks,
          on = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
          rightCols = Seq("event_id", "ts"), prefix = "click_")
        .select(col("event_id"), col("user_id"),
          col("click_event_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("us_since_click"))
        .orderBy(col("event_id").asc_nulls_first)
    }),

    // clicks within ±5 minutes of a purchase by the same user
    "q51_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
      TemporalJoins.rangeJoin(purchases, clicks,
          on = Seq("user_id"), tsCol = "ts", toleranceSec = 300L,
          aCols = Seq("event_id"), bCols = Seq("event_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("a_event_id")).as("n_purch"))
    }),

    // ---- similarity search ----------------------------------------------
    "q43_neardup_cosine" -> ((s, d) =>
      Similarity.cosinePairs(t(s, d, "embeddings"), maxId = 60)
        .orderBy(col("cos").desc_nulls_last,
                 col("qa").asc_nulls_first, col("qb").asc_nulls_first)
        .limit(20)),

    "q44_ann_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("q_id").asc_nulls_first, col("rank").asc_nulls_first)
    }),

    // Int8-quantized ANN: the same single-pass broadcast plan as q44 over
    // the 4x-smaller quantized column. The quantization arithmetic is
    // engine-portable (IEEE double + round-half-away), so the oracle
    // reproduces the exact codes AND the exact scores.
    "q85_quant_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.quantizedTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("q_id").asc_nulls_first, col("rank").asc_nulls_first)
    }),

    // Recall of int8-quantized top-10 against the exact float top-10 per
    // query — the quality-vs-memory dial, measured rather than assumed.
    "q85b_quant_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 15)
      val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
        .select(col("q_id"), col("n_id"))
      val quant = Similarity.quantizedTopK(qs, emb, k = 10)
        .select(col("q_id"), col("n_id"))
      // left join from the full query-id list: a query whose quantized
      // top-10 shares NOTHING with the exact top-10 must report recall
      // 0.0, not silently vanish and inflate the mean
      val overlap = exact.join(quant, Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
      exact.select(col("q_id")).distinct()
        .join(overlap, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("h"), lit(0L)).as("hits"))
        .withColumn("recall", round(col("hits").cast("double") / 10.0, 4))
        .orderBy(col("q_id").asc_nulls_first)
    }),

    // rows-only (engine-specific LSH bucketing)
    "q49_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 5), emb, k = 3, nBits = 4)
        .orderBy(col("q_id").asc_nulls_first, col("rank").asc_nulls_first)
    }),

    // ---- context-window chunking + sequence packing ----------------------
    // Chunking: map-side explode into overlapping word windows — the
    // embedding/RAG preprocessing step; no shuffle at any scale.
    "q78_chunking" -> ((s, d) =>
      TextFunctions.chunkDocuments(
          t(s, d, "documents").filter(col("doc_id") < 50),
          "doc_id", "text", chunkWords = 40, overlapWords = 8)
        .orderBy(col("doc_id").asc_nulls_first, col("chunk_idx").asc_nulls_first)),

    // Packing: deterministic greedy fill into 512-token bins via a
    // distributed two-pass prefix sum (range partition + per-partition
    // window + broadcast offsets — never a single-partition window).
    "q79_packing" -> ((s, d) =>
      graft.operators.Packing.packSequences(
          t(s, d, "documents"), "doc_id", "text", windowTokens = 512L)
        .orderBy(col("doc_id").asc_nulls_first)),

    // Deterministic train/valid/test split: membership is a pure function
    // of the id (multiplicative hash vs cumulative thresholds), so it is
    // stable under corpus growth and reproducible by any 64-bit engine —
    // the oracle recomputes the identical arithmetic.
    "q80_split" -> ((s, d) =>
      graft.operators.Sampling.assignSplit(
          t(s, d, "documents"), "doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast("bigint").as("sk"))
        .orderBy(col("split").asc_nulls_first)),

    // Flagship curation pipeline: the corpus-preparation flow end-to-end
    // — language gate → quality floor → exact dedup (min-id canonical) →
    // PII scrub → context-window chunking → deterministic split — every
    // stage a composition of the operators above, the whole thing one
    // declarative plan (one shuffle for the dedup groupBy, one for the
    // final rollup; chunk/split/scrub are map-side).
    "q81_curation" -> ((s, d) => {
      val nw = TextFunctions.wordCount(col("text"))
      val eligible = t(s, d, "documents")
        .filter(col("lang") === "en" && nw >= 30)
      val canonical = eligible.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      val clean = canonical.select(col("doc_id"),
        TextFunctions.redactPII(col("text")).as("text"))
      val chunks = TextFunctions.chunkDocuments(
        clean, "doc_id", "text", chunkWords = 40, overlapWords = 8)
      graft.operators.Sampling.assignSplit(chunks, "doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("n_words")).cast("bigint").as("n_words"))
        .orderBy(col("split").asc_nulls_first)
    }),

    // Benchmark decontamination: flag training documents sharing a word
    // 4-gram with the benchmark set (doc_id % 19 here; real pipelines feed
    // the actual eval suites). Benchmark shingles BROADCAST — the corpus
    // side streams map-side and only matched rows reach the aggregation.
    "q82_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Decontamination.overlapHits(
          docs.filter(col("doc_id") % 19 =!= 0),
          docs.filter(col("doc_id") % 19 === 0),
          "doc_id", "text", n = 4)
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Domain-mixture sampling: per-source keep rates as a pure salted-hash
    // function of the id (deterministic, engine-portable, independent of
    // the q80 split assignment). Map-only predicate; the aggregate here
    // just reports the drawn mixture per source.
    "q83_mixture" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("keep", graft.operators.Sampling.domainSampleFlag(
          col("doc_id"), col("source"),
          Seq("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.25), default = 0.1))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("keep"), 1)).as("n_sampled"),
          coalesce(sum(when(col("keep"), col("doc_id"))), lit(0L))
            .cast("bigint").as("sk"))
        .orderBy(col("source").asc_nulls_first)),

    // Token-budget mixture planning: targets are in TOKENS (how training
    // mixtures are specified), rates derived from the data (one tiny
    // per-source aggregate, broadcast back), membership the deterministic
    // salted hash. Reports available/target/achieved per source —
    // sources whose quantized sample drew nothing still report 0.
    "q86_token_budget" -> ((s, d) => {
      val targets = Seq("src0" -> 20000L, "src1" -> 5000L, "src2" -> 1000L)
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        TextFunctions.wordCount(col("text")).as("tok"))
      val samp = graft.operators.Sampling.sampleToTokenBudget(
        docs, "doc_id", "source", "tok", targets)
      val tgtDf = {
        import s.implicits._
        targets.toDF("source", "target")
      }
      val avail = docs.groupBy(col("source")).agg(sum(col("tok")).as("avail"))
        .join(tgtDf, Seq("source"))
      avail.join(
          samp.groupBy(col("source"))
            .agg(sum(col("tok")).as("ach"), count(lit(1)).as("nd")),
          Seq("source"), "left")
        .select(col("source"),
          col("avail").cast("bigint").as("avail_tokens"),
          col("target").cast("bigint").as("target_tokens"),
          coalesce(col("ach"), lit(0L)).cast("bigint").as("achieved_tokens"),
          coalesce(col("nd"), lit(0L)).cast("bigint").as("n_docs"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // Deterministic global shuffle into training-export shards: per-shard
    // membership and order are pure functions of (id, salt), so DuckDB
    // re-derives the exact shard populations and order-key extrema. The
    // plan is ONE hash exchange + in-partition sort — no RangePartitioner
    // (whose sampled boundaries are not stable across jobs).
    "q89_shuffle_shards" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      graft.operators.Sampling.shuffleIntoShards(docs, "doc_id", 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("bigint").as("id_sum"),
          min(col("__skey")).cast("bigint").as("min_skey"),
          max(col("__skey")).cast("bigint").as("max_skey"))
        .orderBy(col("shard").asc_nulls_first)
    }),

    // Temperature-flattened mixture: sampled token share ∝ avail^alpha
    // under a global budget — the multilingual re-balancing move. Over the
    // skewed `lang` column (en holds ~43% of tokens): alpha=0.5 flattens
    // the head, the per-lang rate/achieved tokens prove it. All arithmetic
    // is IEEE double + pow; DuckDB re-derives rates AND membership.
    "q88_temperature_mix" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        TextFunctions.wordCount(col("text")).as("tok"))
      val samp = graft.operators.Sampling.sampleByTemperature(
        docs, "doc_id", "lang", "tok", alpha = 0.5, budgetTokens = 15000L)
      val avail = docs.groupBy(col("lang")).agg(sum(col("tok")).as("avail"))
      avail.join(
          samp.groupBy(col("lang"))
            .agg(sum(col("tok")).as("ach"), count(lit(1)).as("nd")),
          Seq("lang"), "left")
        .select(col("lang"),
          col("avail").cast("bigint").as("avail_tokens"),
          coalesce(col("ach"), lit(0L)).cast("bigint").as("achieved_tokens"),
          coalesce(col("nd"), lit(0L)).cast("bigint").as("n_docs"))
        .orderBy(col("lang").asc_nulls_first)
    }),

    // Incremental corpus admission: dedupe a NEW batch against the stored
    // LSH index of an EXISTING corpus (never re-processing the corpus) —
    // the daily-ingest shape of a growing training corpus. The batch
    // mixes corpus clones (must drop), fresh docs (must keep), and
    // batch-internal duplicates (keep one canonical). With the default
    // exact verifier the output is provably the equality-join answer
    // (identical texts collide in every band), so DuckDB reproduces it
    // without knowing anything about MinHash.
    "q87_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") < 100)
      val corpusIdx = Dedup.minhashBandIndex(
        corpus, "doc_id", "text", numHashes = 32, bands = 16)
      val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") >= 100 && col("doc_id") < 125)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      Dedup.incrementalAdmission(corpusIdx, corpus, batch,
          "doc_id", "text", numHashes = 32, bands = 16)
        .agg(
          count(lit(1)).as("n_batch"),
          count(when(col("dup_of_corpus"), 1)).as("n_dup_corpus"),
          count(when(col("batch_dup"), 1)).as("n_batch_dup"),
          count(when(col("keep"), 1)).as("n_keep"),
          coalesce(sum(when(col("keep"), col("doc_id"))), lit(0L))
            .cast("bigint").as("keep_id_sum"))
    }),

    // URL canonicalization over planted crawl URLs: scheme/case/www/
    // fragment/tracking-param variants of the same page fold into one
    // canonical key; the registrable domain drives a blocklist filter and
    // the canonical key a URL-level dedup. The URL is built from row data
    // (source, lang, doc_id) so the oracle plants the IDENTICAL urls and
    // runs the IDENTICAL regex chain (q70's oracle contract).
    "q91_url_normalize" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val url = concat(
        when(col("doc_id") % 3 === 0, lit("HTTPS://WWW."))
          .when(col("doc_id") % 3 === 1, lit("http://"))
          .otherwise(lit("https://")),
        upper(substring(col("source"), 1, 1)), substring(col("source"), 2, 100),
        lit(".Example.COM/"), col("lang"), lit("/p"),
        (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 4 === 0, lit("/?utm_source=feed&x=1&utm_campaign=a"))
          .when(col("doc_id") % 4 === 1, lit("?gclid=abc"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
      val canon = docs.select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          TextFunctions.canonicalizeUrl(col("url")).as("canon"),
          TextFunctions.urlHost(col("url")).as("host"),
          TextFunctions.registeredDomain(col("url")).as("domain"))
        .filter(!col("host").isin("src3.example.com", "src7.example.com"))
      // URL-level dedup: one row per canonical key (min doc_id survives)
      canon.groupBy(col("canon"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"),
          min(col("host")).as("host"), min(col("domain")).as("domain"))
        .orderBy(col("canon"))
    }),

    // Quality-aware canonical selection: exact-duplicate clusters keep
    // their HIGHEST-quality member (planted deterministic quality score),
    // not the min id. Pair graph = exact text match (star pairs to the
    // min-id anchor), clusters via connected components, winner via a
    // rank window that runs only over clustered rows.
    "q92_canonical_quality" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"),
          ((col("doc_id") * 37) % 101).as("quality"))
      // duplicate-text grouping on the (length, xxhash64, md5)
      // fingerprint — the exactKeepFirstByHash convention: equality is
      // cryptographic, and the group/join exchanges carry ~60 fixed
      // bytes per row instead of shipping every document text through
      // BOTH the anchor aggregation and the pair join (at corpus scale
      // those two exchanges were ~2x the corpus bytes). NULL text keeps
      // its own group via the null-safe length key, exactly like
      // groupBy(text)'s null bucket.
      val fp = docs.select(col("doc_id"), col("quality"),
        length(col("text")).as("__tl"),
        xxhash64(coalesce(col("text"), lit(""))).as("__th"),
        md5(encode(coalesce(col("text"), lit("")), "UTF-8")).as("__tm"))
      val anchors = fp.groupBy(col("__tl"), col("__th"), col("__tm"))
        .agg(min(col("doc_id")).as("qa"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(col("__tl").as("__tl2"), col("__th").as("__th2"),
          col("__tm").as("__tm2"), col("qa"))
      val pairs = fp.join(anchors,
          col("__tl") <=> col("__tl2") && col("__th") === col("__th2") &&
            col("__tm") === col("__tm2"))
        .filter(col("doc_id") =!= col("qa"))
        .select(col("qa"), col("doc_id").as("qb"))
      Dedup.keepCanonicalBy(docs.select(col("doc_id"), col("quality")),
          "doc_id", col("quality"), pairs)
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // DSIR-style importance selection: score every document by the
    // add-one-smoothed unigram likelihood ratio of target (lang='de')
    // vs the whole corpus, as INTEGER-scaled ratios (order-free integer
    // sums — bit-identical across engines); keep the top 25.
    "q93_dsir_importance" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Selection.selectTopK(
          docs, "doc_id", "text", col("lang") === "de", k = 25)
        .select(col("doc_id"), col("n_words"), col("score"))
    }),

    // Model-scored quality gate: batched-inference plumbing (one model
    // per partition, fixed-size batches, streaming) with the
    // deterministic stub scorer — the oracle reproduces every score
    // bit-for-bit (single fixed-tree IEEE expression).
    "q96_model_score" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.operators.ModelScoring
        .scoreBatched(t(s, d, "documents"), "doc_id", "text", batchSize = 32)
        .toDF()
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .withColumn("keep", col("score") >= 1.1)
        .orderBy(col("doc_id")).limit(200)
    }),

    // Corpus-wide boilerplate stripping (the CCNet/RefinedWeb duplicated-
    // line filter, n-gram form): 3-grams recurring in >= 5 docs (top 30
    // by df desc, gram — a deterministic bounded list) are removed from
    // every document, surrounding text intact. Detection is one gram-
    // space shuffle; the rewrite is purely map-side.
    "q95_boilerplate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Boilerplate
        .removeBoilerplate(docs, "doc_id", "text", n = 3, minDf = 5L, topK = 30)
        .select(col("doc_id"), col("n_removed_words"), col("cleaned"))
        .orderBy(col("doc_id"))
        .limit(200)
    }),

    // Corpus-level exact-substring dedup (Lee et al. 2022 ExactSubstr):
    // any 8-token span appearing more than once in the corpus survives
    // only at its globally-first (doc_id, start); every other copy is
    // stripped in place. Planted: docs with doc_id % 7 == 0 get a
    // derived twin carrying their 12-word prefix + a unique tail, so the
    // prefix's spans dedupe out of the twin. The oracle re-derives the
    // duplicated-span winners and the positional rewrite byte-for-byte.
    "q99_substring_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val derived = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 12),
            lit("uniq"), col("doc_id").cast("string")).as("text"))
      val corpus = docs.unionByName(derived)
      graft.operators.SubstringDedup
        .stripRepeatedSpans(corpus, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("n_removed_words"), col("cleaned"))
        .orderBy(col("doc_id")).limit(300)
    }),

    // SemDeDup: semantic near-duplicate removal — coarse k-means-style
    // clustering bounds the pair search, over-threshold pairs connected-
    // component into groups, min-id canonical survives. The oracle is the
    // retrieval CONTRACT (q53's design): planted exact clones are the
    // only >=0.9999-cosine pairs, so exactly the clones must drop.
    "q94_semdedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") < 50)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      Similarity.semanticDedup(corpus, threshold = 0.9999, nCentroids = 8)
        .orderBy(col("vec_id"))
    }),

    // Gopher-style repetition signals: duplicate-word ratio, top-word
    // fraction (longest run over the sorted word array — one map-side
    // fold, not a per-distinct-word rescan), duplicate-3-gram ratio, and
    // the combined low-quality gate. All map-side, no shuffle.
    "q84_repetition" -> ((s, d) => {
      val txt = col("text")
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.wordCount(txt).as("n_words"),
          TextFunctions.dupWordRatio(txt).as("dup_word_ratio"),
          TextFunctions.topWordFraction(txt).as("top_word_frac"),
          TextFunctions.dupNgramRatio(txt, 3).as("dup_3gram_ratio"))
        .withColumn("low_quality",
          when(col("dup_word_ratio") > 0.6 || col("top_word_frac") > 0.15 ||
               col("dup_3gram_ratio") > 0.03, 1).otherwise(0))
        .orderBy(col("doc_id").asc_nulls_first)
        .limit(200)
    }),

    // ---- text analysis ---------------------------------------------------
    "q38_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.wordCount(col("text")).as("n_words"))
        .orderBy(col("doc_id").asc_nulls_first)
        .limit(200)),

    "q39_quality" -> ((s, d) => {
      val nw = TextFunctions.wordCount(col("text"))
      t(s, d, "documents")
        .select(
          col("doc_id"),
          length(col("text")).cast("bigint").as("n_ch"),
          nw.as("n_words"),
          TextFunctions.stopwordRatio(col("text"), Seq("the", "a"))
            .as("stop_ratio"),
          // single-space-joined words ⇒ word chars = len - (n_words - 1)
          round((length(col("text")) - (nw - 1)).cast("double") /
            nw.cast("double"), 3).as("mean_word_len"))
        .orderBy(col("doc_id").asc_nulls_first)
        .limit(200)
    }),

    "q45_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"), TextFunctions.languageId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("lang").asc_nulls_first, col("predicted").asc_nulls_first)),

    "q46_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id").asc_nulls_first)
        .limit(200)),

    // PII scrubbing: the synthetic corpus carries no PII, so the query
    // PLANTS deterministic shapes (email keyed by doc_id, a phone on
    // even ids, an SSN, an IP) and the oracle plants the identical ones
    // — the hash gate then proves the redaction chain and the audit
    // count byte-for-byte. Pure regexp projection: map-only at 100 TB.
    "q70_pii_redact" -> ((s, d) => {
      val raw = concat(
        col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com"),
        when(col("doc_id") % 2 === 0, lit(" call 555-123-4567"))
          .otherwise(lit("")),
        lit(" ssn 123-45-6789 ip 10.0.0.1"))
      t(s, d, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(
          col("doc_id"),
          TextFunctions.redactPII(col("raw")).as("clean"),
          TextFunctions.piiCount(col("raw")).as("n_pii"))
        .orderBy(col("doc_id").asc_nulls_first)
        .limit(200)
    }),

    // ---- multimodal plumbing --------------------------------------------
    "q47_multimodal_features" -> ((s, d) => {
      implicit val spark: SparkSession = s
      Multimodal.extractFeatures(
          Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("kind"), col("payload_len"))
        .orderBy(col("media_id").asc_nulls_first)
    }),

    "q48_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
          Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text"),
          every = 8)
        .orderBy(col("media_id").asc_nulls_first,
                 col("frame_idx").asc_nulls_first)),

    "q52_resize" -> ((s, d) => {
      implicit val spark: SparkSession = s
      Multimodal.resize(
          Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text"),
          targetW = 32, targetH = 32)
        .toDF()
        .filter(col("kind") === "image")
        .select(col("media_id"), col("width"), col("height"),
          length(col("payload")).cast("bigint").as("payload_len"))
        .orderBy(col("media_id").asc_nulls_first)
    }),

    // REAL-codec twin of q47/q52 (rows-only: DuckDB cannot run ImageIO):
    // deterministic PNGs generated through the real encoder, bilinear
    // resample 16x12 -> 8x8, pixel-exact features from the decoded
    // output. Every stage is the javax.imageio kernel, end to end.
    "q145_image_codec" -> ((s, d) => {
      implicit val spark: SparkSession = s
      val imgs = Multimodal.syntheticImages(
        t(s, d, "documents"), "doc_id", w = 16, h = 12)
      Multimodal.extractImageFeatures(
          Multimodal.resizeImages(imgs.toDF(), targetW = 8, targetH = 8)
            .toDF())
        .toDF()
        .select(col("media_id"), col("payload_len"),
          element_at(col("features"), 1).as("w"),
          element_at(col("features"), 2).as("h"),
          round(element_at(col("features"), 3), 2).as("mean_r"),
          round(element_at(col("features"), 6), 2).as("mean_luma"))
        .orderBy(col("media_id").asc_nulls_first)
    }),

    // Gopher-style quality rule battery: thresholded per-rule flags + the
    // keep decision, all map-side codegen'd Columns. Bounds tightened to
    // this corpus's ranges so flags actually discriminate at sf0.01.
    "q115_gopher_rules" -> ((s, d) =>
      QualityFilters.gopherBattery(
          t(s, d, "documents"), "doc_id", "text",
          QualityFilters.GopherBounds(minWords = 30L, minStopwords = 2L))
        .orderBy(col("doc_id").asc_nulls_first)),

    // Paragraph-level exact dedup over a paragraph-ified corpus (the flat
    // testdata text carries no newlines, so paragraphs are derived by the
    // IDENTICAL literal replace on both engines). Duplicated paragraphs
    // (>= 15 chars) survive only at their globally-first (doc, position).
    "q116_paragraph_dedup" -> ((s, d) => {
      val paraDocs = t(s, d, "documents").select(col("doc_id"),
        expr("replace(text, ' the ', '\n\n')").as("text"))
      Dedup.paragraphDedup(paraDocs, "doc_id", "text",
          sep = "\n\n", minChars = 15)
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Corpus TF-IDF keyword extraction: integer-scaled idf surrogate keeps
    // the per-doc top-k order-free across engines.
    "q117_tfidf" -> ((s, d) =>
      TfIdf.topTerms(t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id").asc_nulls_first, col("rank").asc)),

    // CCNet-style LM quality score: add-one-smoothed bigram model trained
    // on the corpus's own English slice, every doc scored by mean scaled
    // bigram probability (integer space — exactly oracle-reproducible).
    "q118_lm_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      NgramLm.bigramScore(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), "text")
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // CCNet head/middle/tail triage: per-language ntile(3) over the LM
    // score; the gate reports per-(lang, bucket) count + score range.
    "q119_ccnet_buckets" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val scores = NgramLm.bigramScore(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), "text")
      NgramLm.qualityBuckets(
          scores.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
          "doc_id", "lang")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("lm_score")).as("mn"), max(col("lm_score")).as("mx"))
        .orderBy(col("lang").asc_nulls_first, col("bucket").asc)
    }),

    // BPE vocabulary training over the corpus (rows-only: the merge loop
    // is inherently iterative, not SQL-expressible; CurationOpsSpec pins
    // a hand-computed Sennrich run + boundary/tokenize round-trips).
    "q128_bpe_merges" -> ((s, d) => {
      import s.implicits._
      graft.operators.BpeTrainer
        .train(t(s, d, "documents"), "text", numMerges = 12)
        .toDF()
        .select(col("rank").cast("bigint").as("rank"), col("left"),
          col("right"), col("count"))
        .orderBy(col("rank").asc)
    }),

    // Blocked edit-distance linkage over the distinct part-name catalog:
    // pairs within 4 edits, compared only inside same-last-word blocks
    // (the documented blocking trade; the oracle blocks identically).
    "q124_fuzzy_pairs" -> ((s, d) => {
      val names = t(s, d, "part")
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("id"))
      FuzzyJoin.editDistancePairs(names, "id", "p_name",
          maxDist = 4, blockKey = substring_index(col("p_name"), " ", -1))
        .orderBy(col("id_a").asc, col("id_b").asc)
    }),

    // Johnson–Lindenstrauss dimensionality reduction (64 → 16 dims):
    // map-side codegen'd ±1 projection with a deterministic sign family,
    // so the oracle recomputes every output EXACTLY. The gate pins two
    // components and the projected norm per vector.
    "q123_random_projection" -> ((s, d) => {
      val proj = Similarity.randomProjection(col("embedding"), 16)
      t(s, d, "embeddings")
        .select(col("vec_id"), proj.as("p"))
        .select(col("vec_id"),
          round(element_at(col("p"), 1), 4).as("c0"),
          round(element_at(col("p"), 2), 4).as("c1"),
          round(sqrt(Similarity.dot(col("p"), col("p"))), 4).as("nrm"))
        .orderBy(col("vec_id").asc_nulls_first)
    })
  )

  private val langCase: String = {
    // mirror of TextFunctions.languageId: stable argmax over stopword hits
    val score = TextFunctions.stopwords.map { case (lang, stop) =>
      lang -> ("len(list_filter(string_split(text, ' '), w -> w IN (" +
        stop.map(w => s"'$w'").mkString(", ") + ")))")
    }
    val names = score.map(_._1)
    val arms = names.zipWithIndex.map { case (lang, i) =>
      val earlier = names.take(i).map(l => s"s_$l < s_$lang")
      val later = names.drop(i + 1).map(l => s"s_$l <= s_$lang")
      val conds = earlier ++ later :+ s"s_$lang > 0"
      s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
    }
    val scoreDefs = score
      .map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
    s"""WITH scored AS (SELECT lang, $scoreDefs FROM documents)
       |SELECT lang, CASE ${arms.mkString(" ")} ELSE 'en' END AS predicted
       |FROM scored""".stripMargin
  }

  private val cosSql =
    "list_dot_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"
  private def cosExpr(a: String, b: String): String =
    s"${cosSql.format(a, b)} / (sqrt(${cosSql.format(a, a)}) * sqrt(${cosSql.format(b, b)}))"

  /** Int8 quantization CTEs mirroring [[Similarity.quantizeInt8]]: IEEE
    * double `x/m*127` + round-half-away, kept as integral doubles so
    * list_dot_product sums stay exact. */
  private val quantCtes =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |mq AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m
      |       FROM e),
      |qt AS (SELECT vec_id,
      |         CASE WHEN m > 0 THEN list_transform(v, x -> round(x/m*127))
      |              ELSE list_transform(v, x -> CAST(0 AS DOUBLE)) END AS qv
      |       FROM mq)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q138_bloom_admission" ->
      """SELECT i.doc_id, i.lang FROM documents i
        |WHERE i.doc_id % 2 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.doc_id % 3 <> 0 AND c.text = i.text)
        |ORDER BY i.doc_id ASC NULLS FIRST""".stripMargin,
    "q143_bloom_join" ->
      """SELECT p_brand, COUNT(*) AS n,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sq
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1
        |GROUP BY p_brand ORDER BY p_brand ASC NULLS FIRST""".stripMargin,
    "q142_scd2" ->
      """WITH c AS (SELECT c_custkey AS k,
        |                  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS b
        |           FROM customer),
        |changed AS (SELECT k, b FROM c WHERE k % 3 = 0 AND k % 6 <> 0),
        |rows_ AS (
        |  SELECT k, b, FALSE AS cur FROM changed
        |  UNION ALL
        |  SELECT k, b, TRUE FROM c WHERE NOT (k % 3 = 0 AND k % 6 <> 0)
        |  UNION ALL
        |  SELECT k, b + 10000, TRUE FROM changed
        |  UNION ALL
        |  SELECT k + 1000000, CAST(0 AS BIGINT), TRUE FROM c WHERE k < 50
        |)
        |SELECT cur AS current, COUNT(*) AS n,
        |       CAST(SUM(k) AS BIGINT) AS sk, CAST(SUM(b) AS BIGINT) AS sa
        |FROM rows_ GROUP BY cur ORDER BY cur ASC NULLS FIRST""".stripMargin,
    "q141_pagerank" -> graft.operators.Centrality.pageRankOracleSql(
      """SELECT DISTINCT event_id % 40 AS src, user_id AS dst
        |FROM events WHERE user_id < 40 AND event_id % 40 <> user_id"""
        .stripMargin, iterations = 8),
    "q139_heavy_hitters" ->
      """SELECT w AS word, COUNT(*) AS c
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |GROUP BY w
        |ORDER BY c DESC NULLS LAST, word ASC NULLS FIRST LIMIT 15""".stripMargin,
    "q34_dedup_group" ->
      """SELECT lang, COUNT(DISTINCT text) AS distinct_docs, COUNT(*) AS docs
        |FROM documents GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin,
    "q35_similarity_dot" ->
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
        |       ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS dp
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 10 AND b.vec_id < 10
        |ORDER BY qa ASC NULLS FIRST, qb ASC NULLS FIRST""".stripMargin,
    "q36_wordcount" ->
      """SELECT w AS word, COUNT(*) AS c
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |GROUP BY w ORDER BY c DESC NULLS LAST, word ASC NULLS FIRST LIMIT 20""".stripMargin,
    "q37_dedup_exact" ->
      """SELECT COUNT(*) AS n_unique, CAST(SUM(dup_count) AS BIGINT) AS n_total
        |FROM (SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
        |      FROM documents GROUP BY text) g""".stripMargin,
    "q147_dedup_exact_hash" ->
      """SELECT CAST(length(text) AS BIGINT) AS text_len,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY text
        |ORDER BY keep_id ASC NULLS FIRST""".stripMargin,
    "q40_ngram_jaccard" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100),
        |sh AS (SELECT doc_id,
        |         unnest(list_distinct(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
        |                i -> array_to_string(w[i:i+2], ' ')))) AS shingle
        |       FROM docs),
        |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS qa, b.doc_id AS qb, COUNT(*) AS shared
        |           FROM sh a JOIN sh b USING (shingle)
        |           WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT qa, qb, ROUND(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 4) AS j
        |FROM shared JOIN counts ca ON ca.doc_id = qa JOIN counts cb ON cb.doc_id = qb
        |ORDER BY qa ASC NULLS FIRST, qb ASC NULLS FIRST""".stripMargin,
    "q43_neardup_cosine" ->
      s"""SELECT a.vec_id AS qa, b.vec_id AS qb,
         |       ROUND(${cosExpr("a.embedding", "b.embedding")}, 4) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 60 AND b.vec_id < 60
         |ORDER BY cos DESC NULLS LAST, qa ASC NULLS FIRST, qb ASC NULLS FIRST LIMIT 20""".stripMargin,
    "q44_ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
         |scored AS (SELECT q_id, c.vec_id AS n_id,
         |             ROUND(${cosExpr("q_vec", "c.embedding")}, 4) AS score
         |           FROM q, embeddings c WHERE c.vec_id <> q_id),
         |ranked AS (SELECT q_id, n_id, score,
         |             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM scored)
         |SELECT q_id, n_id, score, rank FROM ranked WHERE rank <= 3
         |ORDER BY q_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,
    "q85_quant_ann" ->
      s"""WITH $quantCtes,
         |q AS (SELECT vec_id AS q_id, qv AS q_vec FROM qt WHERE vec_id < 5),
         |scored AS (SELECT q_id, c.vec_id AS n_id,
         |             ROUND(list_dot_product(q_vec, c.qv) /
         |               (sqrt(list_dot_product(q_vec, q_vec)) *
         |                sqrt(list_dot_product(c.qv, c.qv))), 4) AS score
         |           FROM q, qt c WHERE c.vec_id <> q_id),
         |ranked AS (SELECT q_id, n_id, score,
         |             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |               ORDER BY score DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM scored)
         |SELECT q_id, n_id, score, rank FROM ranked WHERE rank <= 3
         |ORDER BY q_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,
    "q85b_quant_recall" ->
      s"""WITH $quantCtes,
         |qx AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 15),
         |sx AS (SELECT q_id, c.vec_id AS n_id,
         |         ROUND(list_dot_product(q_vec, c.v) /
         |           (sqrt(list_dot_product(q_vec, q_vec)) *
         |            sqrt(list_dot_product(c.v, c.v))), 4) AS score
         |       FROM qx, e c WHERE c.vec_id <> q_id),
         |rx AS (SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |         ORDER BY score DESC, n_id ASC) AS rank FROM sx),
         |tx AS (SELECT q_id, n_id FROM rx WHERE rank <= 10),
         |qq AS (SELECT vec_id AS q_id, qv AS q_vec FROM qt WHERE vec_id < 15),
         |sq AS (SELECT q_id, c.vec_id AS n_id,
         |         ROUND(list_dot_product(q_vec, c.qv) /
         |           (sqrt(list_dot_product(q_vec, q_vec)) *
         |            sqrt(list_dot_product(c.qv, c.qv))), 4) AS score
         |       FROM qq, qt c WHERE c.vec_id <> q_id),
         |rq AS (SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |         ORDER BY score DESC, n_id ASC) AS rank FROM sq),
         |tq AS (SELECT q_id, n_id FROM rq WHERE rank <= 10),
         |h AS (SELECT q_id, COUNT(*) AS h FROM tx JOIN tq USING (q_id, n_id)
         |      GROUP BY q_id)
         |SELECT qs.q_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
         |       ROUND(CAST(COALESCE(h.h, 0) AS DOUBLE)/10.0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM tx) qs LEFT JOIN h USING (q_id)
         |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    // chunk starts: 1, 1+stride, ... while start <= max(len - overlap, 1);
    // stride = 40 - 8 = 32. DuckDB list slicing is 1-based inclusive like
    // Spark's slice(w, start, len) with end = start + 39.
    "q78_chunking" ->
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN COALESCE(text, '') = '' THEN CAST([] AS VARCHAR[])
        |                  ELSE string_split(text, ' ') END AS w
        |           FROM documents WHERE doc_id < 50),
        |s AS (SELECT doc_id, w,
        |             CAST(unnest(generate_series(1, GREATEST(len(w) - 8, 1), 32))
        |                  AS BIGINT) AS st
        |      FROM d)
        |SELECT doc_id, CAST((st - 1) / 32 AS BIGINT) AS chunk_idx,
        |       array_to_string(w[st:st+39], ' ') AS chunk,
        |       CAST(LEAST(len(w) - st + 1, 40) AS BIGINT) AS n_words
        |FROM s
        |ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST""".stripMargin,
    "q79_packing" ->
      """WITH toks AS (SELECT doc_id,
        |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |              FROM documents)
        |SELECT doc_id, tokens,
        |       CAST(FLOOR(COALESCE(SUM(tokens) OVER (
        |              ORDER BY tokens DESC, doc_id ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            / 512.0) AS BIGINT) AS bin
        |FROM toks ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q81_curation" ->
      """WITH eligible AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE lang = 'en' AND len(string_split(text, ' ')) >= 30),
        |canon AS (SELECT MIN(doc_id) AS doc_id, text FROM eligible GROUP BY text),
        |clean AS (
        |  SELECT doc_id,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |           '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
        |           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS text
        |  FROM canon),
        |d AS (SELECT doc_id,
        |             CASE WHEN COALESCE(text, '') = '' THEN CAST([] AS VARCHAR[])
        |                  ELSE string_split(text, ' ') END AS w
        |      FROM clean),
        |s AS (SELECT doc_id, w,
        |             CAST(unnest(generate_series(1, GREATEST(len(w) - 8, 1), 32))
        |                  AS BIGINT) AS st
        |      FROM d),
        |ch AS (SELECT doc_id, LEAST(len(w) - st + 1, 40) AS n_words FROM s),
        |sp AS (SELECT doc_id, n_words,
        |              CASE WHEN (doc_id * 2654435761) % 10000 < 8000 THEN 'train'
        |                   WHEN (doc_id * 2654435761) % 10000 < 9000 THEN 'valid'
        |                   ELSE 'test' END AS split
        |       FROM ch)
        |SELECT split, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
        |       CAST(SUM(n_words) AS BIGINT) AS n_words
        |FROM sp GROUP BY split ORDER BY split ASC NULLS FIRST""".stripMargin,
    "q82_decontam" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         generate_series(1, len(w)-3),
        |         i -> array_to_string(w[i:i+3], ' ')))) AS sh FROM w),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 19 = 0),
        |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 19 <> 0)
        |SELECT t.doc_id, COUNT(DISTINCT t.sh) AS n_hits
        |FROM train t JOIN bench b USING (sh)
        |GROUP BY t.doc_id ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q83_mixture" ->
      """WITH f AS (SELECT source, doc_id,
        |  ((doc_id + 7919) * 2654435761) % 10000 <
        |    CASE source WHEN 'src0' THEN 9000 WHEN 'src1' THEN 5000
        |                WHEN 'src2' THEN 2500 ELSE 1000 END AS keep
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total,
        |       COUNT(CASE WHEN keep THEN 1 END) AS n_sampled,
        |       CAST(COALESCE(SUM(CASE WHEN keep THEN doc_id END), 0) AS BIGINT) AS sk
        |FROM f GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin,
    // identical planted URLs, identical regex chain ('g' = replace-all,
    // matching Spark's regexp_replace semantics)
    "q91_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS://WWW.'
        |                     WHEN 1 THEN 'http://' ELSE 'https://' END)
        |    || upper(substr(source,1,1)) || substr(source,2)
        |    || '.Example.COM/' || lang || '/p' || CAST(doc_id % 40 AS VARCHAR)
        |    || (CASE doc_id % 4
        |          WHEN 0 THEN '/?utm_source=feed&x=1&utm_campaign=a'
        |          WHEN 1 THEN '?gclid=abc' ELSE '' END)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |nsf AS (SELECT doc_id, url,
        |    regexp_replace(regexp_replace(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://', '', 'g'), '#.*$', '', 'g') AS b
        |  FROM u),
        |parts AS (SELECT doc_id, url,
        |    regexp_replace(lower(regexp_extract(b, '^([^/?]+)', 1)),
        |      '^www\.', '', 'g') AS host,
        |    regexp_replace(b, '^[^/?]+', '', 'g') AS rest
        |  FROM nsf),
        |canon AS (SELECT doc_id, host,
        |    regexp_extract(host, '([A-Za-z0-9-]+\.[A-Za-z0-9-]+)$', 1) AS domain,
        |    host || regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(rest, '\?', '?&', 'g'),
        |        '&(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*', '', 'g'),
        |      '\?&', '?', 'g'), '\?$', '', 'g'),
        |      '^([^?]*)/$', '\1', 'g') AS canon
        |  FROM parts
        |  WHERE host NOT IN ('src3.example.com', 'src7.example.com'))
        |SELECT canon, MIN(doc_id) AS keep_id, COUNT(*) AS n_variants,
        |       MIN(host) AS host, MIN(domain) AS domain
        |FROM canon GROUP BY canon ORDER BY canon""".stripMargin,
    "q92_canonical_quality" ->
      """WITH q AS (SELECT doc_id, text, (doc_id * 37) % 101 AS quality
        |           FROM documents),
        |r AS (SELECT doc_id, quality,
        |        ROW_NUMBER() OVER (PARTITION BY text
        |                           ORDER BY quality DESC, doc_id) AS rk
        |      FROM q)
        |SELECT doc_id, quality FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "q96_model_score" ->
      """WITH f AS (SELECT doc_id,
        |    len(list_filter(string_split(text,' '), w -> len(w) > 0)) AS n,
        |    len(list_distinct(list_filter(string_split(text,' '),
        |        w -> len(w) > 0))) AS d,
        |    length(text) AS c
        |  FROM documents)
        |SELECT doc_id,
        |  ROUND((2.0*d + 1.0)/(n + 1.0) + c/4096.0, 4) AS score,
        |  ROUND((2.0*d + 1.0)/(n + 1.0) + c/4096.0, 4) >= 1.1 AS keep
        |FROM f ORDER BY doc_id LIMIT 200""".stripMargin,
    "q95_boilerplate" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |starts AS (SELECT doc_id, i, array_to_string(ws[i:i+2], ' ') AS gram
        |           FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i) t
        |           WHERE len(ws) >= 3),
        |dfq AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM starts GROUP BY gram),
        |bl AS (SELECT gram FROM dfq WHERE df >= 5 ORDER BY df DESC, gram LIMIT 30),
        |cov AS (SELECT DISTINCT s.doc_id, q.p
        |        FROM starts s JOIN bl USING (gram),
        |        LATERAL (SELECT unnest(generate_series(s.i, s.i+2)) AS p) q),
        |pos AS (SELECT doc_id, i, ws[i] AS word FROM w,
        |        LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
        |kept AS (SELECT pos.doc_id, pos.i, pos.word
        |         FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.i = cov.p
        |         WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
        |               string_agg(word, ' ' ORDER BY i) AS cleaned
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(CASE WHEN d.text IS NULL THEN 0
        |            ELSE len(string_split(d.text,' ')) - COALESCE(agg.n_kept, 0)
        |            END AS BIGINT) AS n_removed_words,
        |       CASE WHEN d.text IS NULL THEN NULL
        |            ELSE COALESCE(agg.cleaned, '') END AS cleaned
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id LIMIT 200""".stripMargin,
    "q99_substring_dedup" ->
      """WITH der AS (SELECT doc_id + 500000 AS doc_id,
        |         array_to_string(string_split(text,' ')[1:12], ' ')
        |           || ' uniq ' || CAST(doc_id AS VARCHAR) AS text
        |       FROM documents WHERE doc_id % 7 = 0),
        |corpus AS (SELECT doc_id, text FROM documents
        |           UNION ALL SELECT doc_id, text FROM der),
        |w AS (SELECT doc_id, string_split(text,' ') AS ws FROM corpus),
        |sh AS (SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS g
        |       FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-7)) AS i) t
        |       WHERE len(ws) >= 8),
        |fr AS (SELECT doc_id, i,
        |         COUNT(*) OVER (PARTITION BY g) AS n,
        |         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn
        |       FROM sh),
        |cov0 AS (SELECT DISTINCT doc_id, p
        |         FROM (SELECT doc_id, i FROM fr WHERE n >= 2 AND rn > 1) nf,
        |         LATERAL (SELECT unnest(generate_series(i, i+7)) AS p) q),
        |prot AS (SELECT DISTINCT doc_id, p
        |         FROM (SELECT doc_id, i FROM fr WHERE n >= 2 AND rn = 1) ff,
        |         LATERAL (SELECT unnest(generate_series(i, i+7)) AS p) q),
        |cov AS (SELECT cov0.doc_id, cov0.p FROM cov0
        |        LEFT JOIN prot ON cov0.doc_id = prot.doc_id AND cov0.p = prot.p
        |        WHERE prot.p IS NULL),
        |pos AS (SELECT doc_id, i, ws[i] AS word FROM w,
        |        LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
        |kept AS (SELECT pos.doc_id, pos.i, pos.word FROM pos
        |         LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.i = cov.p
        |         WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, COUNT(*) AS nk,
        |               string_agg(word, ' ' ORDER BY i) AS cleaned
        |        FROM kept GROUP BY doc_id)
        |SELECT c.doc_id,
        |       CAST(CASE WHEN c.text IS NULL THEN 0
        |            ELSE len(string_split(c.text,' ')) - COALESCE(agg.nk, 0)
        |            END AS BIGINT) AS n_removed_words,
        |       CASE WHEN c.text IS NULL THEN NULL
        |            ELSE COALESCE(agg.cleaned, '') END AS cleaned
        |FROM corpus c LEFT JOIN agg USING (doc_id)
        |ORDER BY c.doc_id LIMIT 300""".stripMargin,
    "q94_semdedup" ->
      """WITH corpus AS (SELECT vec_id FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 FROM embeddings WHERE vec_id < 50)
        |SELECT vec_id, vec_id < 100000 AS keep
        |FROM corpus ORDER BY vec_id""".stripMargin,
    "q93_dsir_importance" ->
      """WITH w AS (SELECT doc_id, lang = 'de' AS tgt,
        |         unnest(string_split(text, ' ')) AS w
        |       FROM documents),
        |w2 AS (SELECT * FROM w WHERE len(w) > 0),
        |v AS (SELECT w, COUNT(*) AS cs,
        |        SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        |      FROM w2 GROUP BY w),
        |r AS (SELECT w, (1000000 * (ct + 1)) // (cs + 1) AS r FROM v),
        |sc AS (SELECT doc_id, COUNT(*) AS n_words, SUM(r) AS score
        |       FROM w2 JOIN r USING (w) GROUP BY doc_id)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |       CAST(score AS BIGINT) AS score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    "q86_token_budget" ->
      """WITH toks AS (SELECT doc_id, source,
        |         CAST(len(string_split(text,' ')) AS BIGINT) AS tok
        |       FROM documents),
        |tgt AS (SELECT * FROM (VALUES ('src0', 20000), ('src1', 5000),
        |                              ('src2', 1000)) t(source, target)),
        |r AS (SELECT toks.source, SUM(tok) AS avail, ANY_VALUE(target) AS target,
        |        LEAST(1.0, CAST(ANY_VALUE(target) AS DOUBLE)/SUM(tok)) AS rate
        |      FROM toks JOIN tgt USING (source) GROUP BY toks.source),
        |samp AS (SELECT t.doc_id, t.source, t.tok
        |         FROM toks t JOIN r USING (source)
        |         WHERE ((t.doc_id + 7919) * 2654435761) % 10000 < rate * 10000),
        |agg AS (SELECT source, SUM(tok) AS ach, COUNT(*) AS nd
        |        FROM samp GROUP BY source)
        |SELECT r.source, CAST(r.avail AS BIGINT) AS avail_tokens,
        |       CAST(r.target AS BIGINT) AS target_tokens,
        |       CAST(COALESCE(agg.ach, 0) AS BIGINT) AS achieved_tokens,
        |       CAST(COALESCE(agg.nd, 0) AS BIGINT) AS n_docs
        |FROM r LEFT JOIN agg USING (source)
        |ORDER BY source ASC NULLS FIRST""".stripMargin,
    "q89_shuffle_shards" ->
      """WITH k AS (SELECT doc_id,
        |         ((doc_id + 104729) * 2654435761) % 1000000007 AS skey
        |       FROM documents),
        |s AS (SELECT doc_id, skey, skey % 8 AS shard FROM k)
        |SELECT shard, COUNT(*) AS n_docs,
        |       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |       CAST(MIN(skey) AS BIGINT) AS min_skey,
        |       CAST(MAX(skey) AS BIGINT) AS max_skey
        |FROM s GROUP BY shard ORDER BY shard ASC NULLS FIRST""".stripMargin,
    "q88_temperature_mix" ->
      """WITH toks AS (SELECT doc_id, lang,
        |         CAST(len(string_split(text,' ')) AS BIGINT) AS tok
        |       FROM documents),
        |t AS (SELECT lang, CAST(SUM(tok) AS DOUBLE) AS avail
        |      FROM toks GROUP BY lang),
        |r AS (SELECT lang, avail,
        |        LEAST(1.0, 15000 * pow(avail, 0.5)
        |                   / SUM(pow(avail, 0.5)) OVER () / avail) AS rate
        |      FROM t),
        |samp AS (SELECT toks.doc_id, toks.lang, toks.tok
        |         FROM toks JOIN r USING (lang)
        |         WHERE ((toks.doc_id + 7919) * 2654435761) % 10000 < rate * 10000),
        |agg AS (SELECT lang, SUM(tok) AS ach, COUNT(*) AS nd
        |        FROM samp GROUP BY lang)
        |SELECT r.lang, CAST(r.avail AS BIGINT) AS avail_tokens,
        |       CAST(COALESCE(agg.ach, 0) AS BIGINT) AS achieved_tokens,
        |       CAST(COALESCE(agg.nd, 0) AS BIGINT) AS n_docs
        |FROM r LEFT JOIN agg USING (lang)
        |ORDER BY lang ASC NULLS FIRST""".stripMargin,
    "q87_incremental_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |b AS (
        |  SELECT doc_id + 2000000 AS doc_id, text FROM documents
        |    WHERE doc_id >= 100 AND doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents
        |    WHERE doc_id >= 100 AND doc_id < 125),
        |f AS (SELECT doc_id,
        |        EXISTS(SELECT 1 FROM corpus c
        |               WHERE c.text IS NOT DISTINCT FROM b.text) AS dup_c,
        |        doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS dup_b
        |      FROM b)
        |SELECT COUNT(*) AS n_batch,
        |  COUNT(CASE WHEN dup_c THEN 1 END) AS n_dup_corpus,
        |  COUNT(CASE WHEN dup_b THEN 1 END) AS n_batch_dup,
        |  COUNT(CASE WHEN NOT dup_c AND NOT dup_b THEN 1 END) AS n_keep,
        |  CAST(COALESCE(SUM(CASE WHEN NOT dup_c AND NOT dup_b THEN doc_id END),
        |       0) AS BIGINT) AS keep_id_sum
        |FROM f""".stripMargin,
    "q84_repetition" ->
      """WITH b AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |r AS (
        | SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |   ROUND(1 - CAST(len(list_distinct(w)) AS DOUBLE)/len(w), 4)
        |     AS dup_word_ratio,
        |   ROUND(CAST(list_max(list_transform(list_distinct(w),
        |       d -> len(list_filter(w, x -> x = d)))) AS DOUBLE)/len(w), 4)
        |     AS top_word_frac,
        |   CASE WHEN len(w) - 2 > 0 THEN
        |     ROUND(1 - CAST(len(list_distinct(list_transform(
        |       generate_series(1, len(w)-2),
        |       i -> array_to_string(w[i:i+2], ' ')))) AS DOUBLE)/(len(w)-2), 4)
        |   ELSE 0.0 END AS dup_3gram_ratio
        | FROM b)
        |SELECT doc_id, n_words, dup_word_ratio, top_word_frac, dup_3gram_ratio,
        |  CASE WHEN dup_word_ratio > 0.6 OR top_word_frac > 0.15
        |            OR dup_3gram_ratio > 0.03 THEN 1 ELSE 0 END AS low_quality
        |FROM r ORDER BY doc_id ASC NULLS FIRST LIMIT 200""".stripMargin,
    "q80_split" ->
      """WITH b AS (SELECT doc_id, (doc_id * 2654435761) % 10000 AS bucket
        |           FROM documents),
        |s AS (SELECT doc_id,
        |             CASE WHEN bucket < 8000 THEN 'train'
        |                  WHEN bucket < 9000 THEN 'valid'
        |                  ELSE 'test' END AS split
        |      FROM b)
        |SELECT split, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sk
        |FROM s GROUP BY split ORDER BY split ASC NULLS FIRST""".stripMargin,
    "q38_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |FROM documents ORDER BY doc_id ASC NULLS FIRST LIMIT 200""".stripMargin,
    "q39_quality" ->
      """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_ch,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |       ROUND(CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
        |             / len(string_split(text, ' ')), 4) AS stop_ratio,
        |       ROUND(CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |             / len(string_split(text, ' ')), 3) AS mean_word_len
        |FROM documents ORDER BY doc_id ASC NULLS FIRST LIMIT 200""".stripMargin,
    "q45_lang_id" ->
      s"""WITH pred AS ($langCase)
         |SELECT lang, predicted, COUNT(*) AS c FROM pred
         |GROUP BY lang, predicted
         |ORDER BY lang ASC NULLS FIRST, predicted ASC NULLS FIRST""".stripMargin,
    "q46_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(text, ' '),
        |           w -> CAST(ascii(w) AS BIGINT) * 31 + length(w))),
        |         (acc, v) -> (acc * 131 + v) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id ASC NULLS FIRST LIMIT 200""".stripMargin,
    "q70_pii_redact" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |         '@example.com' ||
        |         CASE WHEN doc_id % 2 = 0 THEN ' call 555-123-4567' ELSE '' END ||
        |         ' ssn 123-45-6789 ip 10.0.0.1' AS raw
        |  FROM documents)
        |SELECT doc_id,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |         '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
        |         '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS clean,
        |       CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |          + len(regexp_extract_all(raw, '\b\d{3}-\d{2}-\d{4}\b'))
        |          + len(regexp_extract_all(raw, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
        |          + len(regexp_extract_all(raw, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))
        |         AS BIGINT) AS n_pii
        |FROM raw ORDER BY doc_id ASC NULLS FIRST LIMIT 200""".stripMargin,
    "q41c_minhash_clone_recall" ->
      """SELECT COUNT(*) AS n_found FROM documents WHERE doc_id < 100""",
    "q42b_simhash_dup_parity" ->
      """SELECT COUNT(*) AS n_found FROM documents WHERE doc_id < 100""",
    "q63_dedup_clusters" ->
      """SELECT doc_id AS canonical_id, CAST(3 AS BIGINT) AS cluster_size
        |FROM documents WHERE doc_id < 100
        |ORDER BY canonical_id ASC NULLS FIRST""".stripMargin,
    "q49b_lsh_clone_recall" ->
      """SELECT vec_id + 100000 AS q_id, vec_id AS n_id, CAST(1.0 AS DOUBLE) AS score
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q53_ivf_clone_recall" ->
      """SELECT vec_id + 100000 AS q_id, vec_id AS n_id, CAST(1.0 AS DOUBLE) AS score
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q56_ivf_trained_recall" ->
      """SELECT vec_id + 100000 AS q_id, vec_id AS n_id, CAST(1.0 AS DOUBLE) AS score
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q156_ivf_index_recall" ->
      """SELECT vec_id + 100000 AS q_id, vec_id AS n_id, CAST(1.0 AS DOUBLE) AS score
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q158_ivf_approx_recall" -> {
      def dotD(a: String, b: String) =
        s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
      def cosD(a: String, b: String) =
        s"${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)}))"
      s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec
         |               FROM embeddings WHERE vec_id % 25 = 0),
         |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
         |      WHERE vec_id < 15),
         |asgr AS (SELECT e.vec_id AS n_id, e.embedding AS n_vec, c.c_id,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosD("e.embedding", "c.c_vec")} DESC,
         |                      c.c_id ASC) AS rn
         |         FROM embeddings e, cents c),
         |asg AS (SELECT n_id, n_vec, c_id FROM asgr WHERE rn = 1),
         |prr AS (SELECT q_id, q_vec, c.c_id,
         |          ROW_NUMBER() OVER (PARTITION BY q_id
         |            ORDER BY ${cosD("q_vec", "c.c_vec")} DESC,
         |                     c.c_id ASC) AS rn
         |        FROM q, cents c),
         |pr AS (SELECT q_id, q_vec, c_id FROM prr WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.n_id,
         |           ROUND(${cosD("p.q_vec", "a.n_vec")}, 4) AS score
         |         FROM pr p JOIN asg a ON a.c_id = p.c_id
         |         WHERE a.n_id <> p.q_id),
         |apx AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |            ORDER BY score DESC, n_id ASC) AS rank FROM cand)
         |        WHERE rank <= 10),
         |exs AS (SELECT q_id, c.vec_id AS n_id,
         |          ROUND(${cosD("q_vec", "c.embedding")}, 4) AS score
         |        FROM q, embeddings c WHERE c.vec_id <> q_id),
         |exr AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |            ORDER BY score DESC, n_id ASC) AS rank FROM exs)
         |        WHERE rank <= 10),
         |h AS (SELECT q_id, COUNT(*) AS h FROM exr JOIN apx
         |      USING (q_id, n_id) GROUP BY q_id)
         |SELECT qs.q_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
         |       ROUND(CAST(COALESCE(h.h, 0) AS DOUBLE) / 10.0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM q) qs LEFT JOIN h USING (q_id)
         |ORDER BY q_id ASC NULLS FIRST""".stripMargin
    },
    "q157_ann_admission" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 200),
        |batch AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id >= 200 AND vec_id < 230
        |  UNION ALL
        |  SELECT vec_id + 200000 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id < 15)
        |SELECT b.vec_id,
        |  EXISTS(SELECT 1 FROM corpus c
        |         WHERE c.embedding = b.embedding) AS dup_of_corpus,
        |  EXISTS(SELECT 1 FROM batch b2
        |         WHERE b2.vec_id < b.vec_id
        |           AND b2.embedding = b.embedding) AS batch_dup,
        |  NOT EXISTS(SELECT 1 FROM corpus c
        |             WHERE c.embedding = b.embedding)
        |    AND NOT EXISTS(SELECT 1 FROM batch b2
        |                   WHERE b2.vec_id < b.vec_id
        |                     AND b2.embedding = b.embedding) AS keep
        |FROM batch b ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "q50_asof_join" ->
      """SELECT l.event_id, l.user_id,
        |  (SELECT r.event_id FROM events r
        |   WHERE r.event_type = 'click' AND r.user_id = l.user_id AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS click_id,
        |  CAST(epoch_us(l.ts) - (SELECT epoch_us(r.ts) FROM events r
        |   WHERE r.event_type = 'click' AND r.user_id = l.user_id AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS BIGINT) AS us_since_click
        |FROM events l WHERE l.event_type = 'purchase'
        |ORDER BY l.event_id ASC NULLS FIRST""".stripMargin,
    "q51_range_join" ->
      """SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT l.event_id) AS n_purch
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND l.event_type = 'purchase' AND r.event_type = 'click'
        | AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 300000000""".stripMargin,
    "q47_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |       -- octet_length(encode(..)): byte count, matching Spark's
        |       -- length(payload) on the UTF-8-encoded binary payload
        |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
        |FROM documents ORDER BY media_id ASC NULLS FIRST""".stripMargin,
    "q48_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(doc_id % 32 + 1 AS INTEGER) AS n_frames,
        |       CAST(unnest(range(0, doc_id % 32 + 1, 8)) AS INTEGER) AS frame_idx
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY media_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin,
    "q52_resize" ->
      """SELECT doc_id AS media_id, CAST(32 AS INTEGER) AS width,
        |       CAST(32 AS INTEGER) AS height,
        |       CAST(least(octet_length(encode(text)),
        |                  CAST(ceil(octet_length(encode(text)) * 0.25) AS BIGINT))
        |            AS BIGINT) AS payload_len
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY media_id ASC NULLS FIRST""".stripMargin,
    "q115_gopher_rules" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    ROUND(CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |          / len(string_split(text, ' ')), 3) AS mean_word_len,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> x IN ('the','a','of','to','and','in','is','that'))) AS BIGINT) AS n_stop,
        |    ROUND(CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
        |          / len(string_split(text, ' ')), 4) AS symbol_ratio,
        |    ROUND(CAST(len(regexp_extract_all(text, '[^ ]*[A-Za-z][^ ]*')) AS DOUBLE)
        |          / len(string_split(text, ' ')), 4) AS alpha_ratio,
        |    CASE WHEN len(string_split(text, ' ')) > 2 THEN
        |      ROUND(1.0 - CAST(len(list_distinct(list_transform(
        |            range(1, len(string_split(text, ' ')) - 1),
        |            i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS DOUBLE)
        |          / (len(string_split(text, ' ')) - 2), 4)
        |    ELSE 0.0 END AS dup_3gram_ratio
        |  FROM documents)
        |SELECT doc_id, n_words, mean_word_len, n_stop, symbol_ratio, alpha_ratio,
        |       dup_3gram_ratio,
        |       n_words BETWEEN 30 AND 100000 AS r_word_count,
        |       mean_word_len BETWEEN 3.0 AND 10.0 AS r_mean_len,
        |       n_stop >= 2 AS r_stopwords,
        |       symbol_ratio <= 0.1 AS r_symbols,
        |       alpha_ratio >= 0.8 AS r_alpha,
        |       dup_3gram_ratio <= 0.2 AS r_dup_ngram,
        |       (n_words BETWEEN 30 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |         AND n_stop >= 2 AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
        |         AND dup_3gram_ratio <= 0.2 AS keep
        |FROM m ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q116_paragraph_dedup" ->
      """WITH pd AS (SELECT doc_id, replace(text, ' the ', chr(10)||chr(10)) AS text
        |            FROM documents),
        |paras AS (SELECT doc_id, generate_subscripts(ps, 1) AS idx, unnest(ps) AS para
        |          FROM (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps FROM pd)),
        |ranked AS (SELECT doc_id, idx, para,
        |           ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
        |           FROM paras),
        |kept AS (SELECT doc_id, idx, para FROM ranked
        |         WHERE length(para) < 15 OR rn = 1)
        |SELECT d.doc_id,
        |       COALESCE(k.text, '') AS text
        |FROM documents d
        |LEFT JOIN (SELECT doc_id,
        |                  string_agg(para, chr(10)||chr(10) ORDER BY idx) AS text
        |           FROM kept GROUP BY doc_id) k USING (doc_id)
        |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin,
    "q117_tfidf" ->
      """WITH tf AS (SELECT doc_id, word AS term, COUNT(*) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |                  FROM documents)
        |            GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |scored AS (SELECT doc_id, term, tf, df, tf * 1000000 // df AS score
        |           FROM tf JOIN dfreq USING (term)),
        |ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |             ORDER BY score DESC, term ASC) AS BIGINT) AS rank
        |           FROM scored)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |       CAST(score AS BIGINT) AS score, rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY doc_id ASC NULLS FIRST, rank ASC""".stripMargin,
    "q118_lm_score" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |pairs AS (SELECT doc_id, lang,
        |                 unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |          FROM tok),
        |uni AS (SELECT w1, COUNT(*) AS c1
        |        FROM (SELECT unnest(w) AS w1 FROM tok WHERE lang = 'en') GROUP BY w1),
        |vs AS (SELECT COUNT(*) AS v FROM uni),
        |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs WHERE lang = 'en'
        |       GROUP BY w1, w2),
        |p AS (SELECT doc_id,
        |             (COALESCE(c2, 0) + 1) * 1000000000
        |               // (COALESCE(c1, 0) + (SELECT v FROM vs)) AS ps
        |      FROM pairs LEFT JOIN bi USING (w1, w2)
        |      LEFT JOIN uni ON pairs.w1 = uni.w1)
        |SELECT d.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(s.lm_score AS BIGINT) AS lm_score
        |FROM documents d
        |LEFT JOIN (SELECT doc_id, COUNT(*) AS n_bigrams,
        |                  SUM(ps) // COUNT(*) AS lm_score
        |           FROM p GROUP BY doc_id) s USING (doc_id)
        |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin,
    "q119_ccnet_buckets" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |pairs AS (SELECT doc_id, lang,
        |                 unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |          FROM tok),
        |uni AS (SELECT w1, COUNT(*) AS c1
        |        FROM (SELECT unnest(w) AS w1 FROM tok WHERE lang = 'en') GROUP BY w1),
        |vs AS (SELECT COUNT(*) AS v FROM uni),
        |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs WHERE lang = 'en'
        |       GROUP BY w1, w2),
        |p AS (SELECT doc_id,
        |             (COALESCE(c2, 0) + 1) * 1000000000
        |               // (COALESCE(c1, 0) + (SELECT v FROM vs)) AS ps
        |      FROM pairs LEFT JOIN bi USING (w1, w2)
        |      LEFT JOIN uni ON pairs.w1 = uni.w1),
        |-- LEFT JOIN from documents: a sub-2-word doc has no bigram rows
        |-- but MUST still be bucketed (NULL score, NULLS LAST) exactly as
        |-- the Spark side's bigramScore left-join keeps it
        |scores AS (SELECT d2.doc_id, s.lm_score
        |           FROM documents d2
        |           LEFT JOIN (SELECT doc_id, SUM(ps) // COUNT(*) AS lm_score
        |                      FROM p GROUP BY doc_id) s USING (doc_id))
        |SELECT lang, bucket, COUNT(*) AS n,
        |       CAST(MIN(lm_score) AS BIGINT) AS mn,
        |       CAST(MAX(lm_score) AS BIGINT) AS mx
        |FROM (SELECT d.lang, s.doc_id, s.lm_score,
        |             CAST(NTILE(3) OVER (PARTITION BY d.lang
        |               ORDER BY s.lm_score DESC NULLS LAST, s.doc_id ASC)
        |               AS BIGINT) AS bucket
        |      FROM scores s JOIN documents d USING (doc_id))
        |GROUP BY lang, bucket
        |ORDER BY lang ASC NULLS FIRST, bucket ASC""".stripMargin,
    "q124_fuzzy_pairs" ->
      """WITH names AS (SELECT p_name, MIN(p_partkey) AS id FROM part
        |               GROUP BY p_name),
        |blocked AS (SELECT id, p_name,
        |                   regexp_extract(p_name, '[^ ]+$') AS block
        |            FROM names)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       a.p_name AS p_name_a, b.p_name AS p_name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM blocked a JOIN blocked b
        |  ON a.block = b.block AND a.id < b.id
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY id_a ASC, id_b ASC""".stripMargin,
    "q123_random_projection" ->
      """WITH p AS (SELECT vec_id,
        |             list_transform(range(0, 16), j ->
        |               list_sum(list_transform(range(0, len(embedding)), i ->
        |                 CAST(embedding[i+1] AS DOUBLE) *
        |                 CASE WHEN ((31*i*i + 17*i*j + 13*j*j + 57*i + 23*j)
        |                            % 97) % 2 = 0
        |                      THEN 1 ELSE -1 END)) / sqrt(16)) AS proj
        |           FROM embeddings)
        |SELECT vec_id, ROUND(proj[1], 4) AS c0, ROUND(proj[2], 4) AS c1,
        |       ROUND(sqrt(list_sum(list_transform(proj, x -> x*x))), 4) AS nrm
        |FROM p ORDER BY vec_id ASC NULLS FIRST""".stripMargin
  )
}
