package graft

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.iceberg.IcebergTable
import graft.operators.VectorIndex

/** The persisted IVF index (two Iceberg tables) must (a) reproduce the
  * in-memory [[Similarity.ivfTopK]] results exactly, (b) actually prune
  * the postings scan to the probed partitions, and (c) keep the planted-
  * clone recall contract the live path pins (q53/q56). */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/repo/target/test-vector-index"

  private def emb = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select(col("q_id"), col("n_id"), col("score"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq

  test("stored-index topK equals the live ivfTopK row-for-row " +
      "(k-means-trained centroids round-trip through the table)") {
    FileUtils.deleteQuietly(new File(dir))
    VectorIndex.build(spark, emb, dir, nCentroids = 8, trainIters = 2)
    val queries = emb.filter(col("vec_id") < 6)
    val stored = rows(VectorIndex.topK(spark, dir, queries, k = 5, nProbe = 2))
    val live = rows(Similarity.ivfTopK(queries, emb, k = 5,
      nCentroids = 8, nProbe = 2, trainIters = 2))
    assert(stored == live, "persisted index must reproduce the live path")
    assert(stored.nonEmpty)

    // with runtime pruning off (the probe's join still enforces the key
    // filter) results are identical — pruning changes IO, never rows
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")
    try {
      val fallback = rows(VectorIndex.topK(spark, dir, queries, k = 5,
        nProbe = 2))
      assert(fallback == stored, "unpruned probe changes IO, never results")
    } finally spark.conf.unset(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled")
  }

  test("the steady probe is RUNTIME-FILTERED: a dynamic pruning subquery " +
      "lands on the postings scan, files prune at execution, and no " +
      "driver collect runs in the probe path") {
    if (!new File(s"$dir/postings/metadata").exists())
      VectorIndex.build(spark, emb, dir, nCentroids = 8, trainIters = 2)
    val queries = emb.filter(col("vec_id") < 4)
    val df = VectorIndex.topK(spark, dir, queries, k = 3, nProbe = 2)
    df.collect() // materialize THIS execution (AQE finalizes in place)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q) ++ allNodes(q.plan) ++ q.subqueries.flatMap(allNodes)
      case other => Seq(other) ++ other.children.flatMap(allNodes) ++
        other.subqueries.flatMap(allNodes)
    }
    val scans = allNodes(df.queryExecution.executedPlan)
      .collect {
        // the postings read is the only DSv2 batch scan in a topK plan
        // (queries and centroids arrive as parquet / local reads)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[graft.iceberg.connector.GraftBatchScan] => b
      }
    assert(scans.nonEmpty, "postings must plan as a native DSv2 batch scan")
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "the probe must carry a dynamic-pruning runtime filter:\n" +
        df.queryExecution.executedPlan)
    val g = scans.find(_.runtimeFilters.nonEmpty).get.scan
      .asInstanceOf[graft.iceberg.connector.GraftBatchScan]
    val staticFiles = IcebergTable(spark, s"$dir/postings").planFiles().size
    assert(g.currentFiles.size < staticFiles,
      s"runtime filter must file-prune the postings scan: " +
        s"${g.currentFiles.size} of $staticFiles files survived")
  }

  test("probing scans only the touched posting-list partitions") {
    // index from the previous test (build is deterministic; rebuild if
    // this test ever runs alone)
    if (!new File(s"$dir/postings/metadata").exists())
      VectorIndex.build(spark, emb, dir, nCentroids = 8, trainIters = 2)
    val t = IcebergTable(spark, s"$dir/postings")
    val all = t.planFiles()
    assert(all.size >= 8, s"identity(c_id) fanout should write >=1 file " +
      s"per non-empty posting list, got ${all.size}")
    assert(all.forall(_.partition.nonEmpty),
      "every postings file carries its c_id partition tuple")
    val oneCid = all.head.partition.head._2
    val pruned = t.planFiles(Seq(
      org.apache.spark.sql.sources.In("c_id", Array(oneCid))))
    assert(pruned.size < all.size,
      s"identity-partition pruning must bite: ${pruned.size} of ${all.size}")
  }

  test("append routes new vectors through the STORED centroids and they " +
      "retrieve immediately; appended files carry partition tuples") {
    val adir = s"$dir-append"
    FileUtils.deleteQuietly(new File(adir))
    val seed = emb.filter(col("vec_id") < 300)
    val late = emb.filter(col("vec_id") >= 300)
    VectorIndex.build(spark, seed, adir, nCentroids = 8)
    VectorIndex.append(spark, adir, late)
    val t = IcebergTable(spark, s"$adir/postings")
    assert(t.toDF(spark).count() == emb.count(),
      "postings must cover seed + appended vectors exactly once")
    assert(t.planFiles().forall(_.partition.nonEmpty),
      "appended posting files carry their c_id partition tuple too")
    // a clone of an APPENDED vector retrieves at score 1.0: the batch
    // was assigned with the stored quantizer, so probe routing agrees
    val lateId = late.select(min(col("vec_id"))).as[Long].head()
    val clone = emb.filter(col("vec_id") === lateId)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val got = VectorIndex.topK(spark, adir, clone, k = 1, nProbe = 1)
      .select(col("n_id"), col("score")).as[(Long, Double)].collect().toSeq
    assert(got == Seq((lateId, 1.0)), s"appended clone must hit: $got")
  }

  test("admit flags corpus dups / batch dups / keeps exactly, and the " +
      "admit->append ingest loop rejects a replayed row next batch") {
    val adir = s"$dir-admit"
    FileUtils.deleteQuietly(new File(adir))
    VectorIndex.build(spark, emb.filter(col("vec_id") >= 200), adir,
      nCentroids = 8)
    // batch1: 10 new rows, 5 clones of corpus rows, 3 clones of the new
    // rows (larger ids) -> keep / dup_of_corpus / batch_dup respectively
    val batch1 = emb.filter(col("vec_id") < 10)
      .unionByName(emb.filter(col("vec_id") >= 200 && col("vec_id") < 205)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      .unionByName(emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
    val adm1 = VectorIndex.admit(spark, adir, batch1)
      .select(col("vec_id"), col("dup_of_corpus"), col("batch_dup"),
        col("keep"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().sorted.toSeq
    assert(adm1 ==
      (0L until 10L).map((_, false, false, true)) ++
      (100200L until 100205L).map((_, true, false, false)) ++
      (200000L until 200003L).map((_, false, true, false)),
      s"batch1 flags: $adm1")
    // the ingest loop: append ONLY the kept rows, then a clone of a
    // batch1-kept row (and a literal replay, same id) both flag
    // dup_of_corpus in batch2 — the cap fallback path agrees
    VectorIndex.append(spark, adir,
      VectorIndex.admit(spark, adir, batch1).filter(col("keep"))
        .drop("dup_of_corpus", "batch_dup", "keep"))
    val batch2 = emb.filter(col("vec_id") === 5)
      .select((col("vec_id") + 300000L).as("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") === 7))
      .unionByName(emb.filter(col("vec_id") === 50))
    val adm2 = VectorIndex.admit(spark, adir, batch2)
      .select(col("vec_id"), col("dup_of_corpus"), col("keep"))
      .as[(Long, Boolean, Boolean)].collect().sorted.toSeq
    assert(adm2 == Seq((7L, true, false), (50L, false, true),
      (300005L, true, false)), s"batch2 flags: $adm2")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")
    try {
      val adm2Fallback = VectorIndex.admit(spark, adir, batch2)
        .select(col("vec_id"), col("dup_of_corpus"), col("keep"))
        .as[(Long, Boolean, Boolean)].collect().sorted.toSeq
      assert(adm2Fallback == adm2, "unpruned probe changes IO, never flags")
    } finally spark.conf.unset(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled")
  }

  test("compact collapses per-append posting files; partition tuples, " +
      "pruning, and topK results are unchanged") {
    val cdir = s"$dir-compact"
    FileUtils.deleteQuietly(new File(cdir))
    VectorIndex.build(spark, emb.filter(col("vec_id") < 100), cdir,
      nCentroids = 4)
    for (b <- 1 to 4)
      VectorIndex.append(spark, cdir,
        emb.filter(col("vec_id") >= b * 100 && col("vec_id") < (b + 1) * 100))
    val t0 = IcebergTable(spark, s"$cdir/postings")
    val before = t0.planFiles()
    assert(before.size > 4, s"5 appends over 4 cells must leave >4 files")
    val queries = emb.filter(col("vec_id") < 6)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val wantTop = rows(VectorIndex.topK(spark, cdir, queries, k = 3,
      nProbe = 2))
    VectorIndex.compact(spark, cdir)
    val t1 = IcebergTable(spark, s"$cdir/postings")
    val after = t1.planFiles()
    assert(after.size < before.size,
      s"compaction must shrink files: ${before.size} -> ${after.size}")
    assert(after.forall(_.partition.nonEmpty),
      "compacted posting files keep their c_id partition tuple")
    val oneCid = after.head.partition.head._2
    assert(t1.planFiles(Seq(
        org.apache.spark.sql.sources.In("c_id", Array(oneCid)))).size
      < after.size, "pruning still bites after compaction")
    assert(rows(VectorIndex.topK(spark, cdir, queries, k = 3, nProbe = 2))
      == wantTop, "compaction must not change probe results")
    assert(t1.toDF(spark).count() == 500L, "row count preserved")
  }

  test("corpusAnchor drops orphan posting rows: a twin of an index row " +
      "whose id is absent from the anchored corpus is NOT a corpus dup") {
    val odir = s"$dir-orphan"
    FileUtils.deleteQuietly(new File(odir))
    VectorIndex.build(spark, emb.filter(col("vec_id") < 50), odir,
      nCentroids = 4)
    // the crash-window shape: posting rows exist for vec 45, but the
    // corpus the sink committed only reaches vec 40
    val corpus = emb.filter(col("vec_id") < 40)
    val twin = emb.filter(col("vec_id") === 45)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val unanchored = VectorIndex.admit(spark, odir, twin)
      .select(col("dup_of_corpus")).as[Boolean].head()
    assert(unanchored, "without an anchor the orphan posting row flags")
    val (anchored, _) = VectorIndex.admitWithAssignment(spark, odir, twin,
      corpusAnchor = Some(corpus))
    assert(!anchored.select(col("dup_of_corpus")).as[Boolean].head(),
      "with the corpus anchor the orphan is benign and the twin is kept")
    // a NON-orphan twin still flags through the anchor
    val twin2 = emb.filter(col("vec_id") === 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val (a2, _) = VectorIndex.admitWithAssignment(spark, odir, twin2,
      corpusAnchor = Some(corpus))
    assert(a2.select(col("dup_of_corpus")).as[Boolean].head(),
      "anchored admit still rejects real corpus duplicates")
  }

  test("a planted ALL-IDENTICAL batch admits through a linear plan: " +
      "grouped-min batch pairing, no quadratic pair join, exact flags") {
    val hdir = s"$dir-hotcell"
    FileUtils.deleteQuietly(new File(hdir))
    VectorIndex.build(spark, emb.filter(col("vec_id") < 50), hdir,
      nCentroids = 4)
    // 2000 copies of ONE vector, all landing in one cell — the shape
    // that made the within-cell pair join quadratic in a single task
    val one = emb.filter(col("vec_id") === 7).select(col("embedding"))
      .crossJoin(spark.range(500000L, 502000L).toDF("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true) // the fixture's own crossJoin must not
                             // show up in the admit plan under test
    val adm = VectorIndex.admit(spark, hdir, one)
    val plan = adm.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"batch pairing must stay an equi plan:\n$plan")
    val rows = adm.select(col("vec_id"), col("dup_of_corpus"),
        col("batch_dup"), col("keep"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 2000)
    // vec 7 IS in the corpus: every copy is a corpus dup; and all but
    // the smallest id are batch dups of the canonical minimum
    assert(rows.forall(_._2), "identical-to-corpus rows all flag")
    assert(!rows.head._3 && rows.tail.forall(_._3),
      "exactly the non-minimum ids are batch dups")
    assert(rows.forall(!_._4), "nothing admits")
  }

  test("null-embedding batch rows are degenerate input, not duplicates: " +
      "they admit (keep) and never flag each other as batch dups") {
    val ndir = s"$dir-nulls"
    FileUtils.deleteQuietly(new File(ndir))
    VectorIndex.build(spark, emb.filter(col("vec_id") < 30), ndir,
      nCentroids = 4)
    val batch = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      .unionByName(spark.range(900100L, 900102L).toDF("vec_id")
        .select(col("vec_id"),
          lit(null).cast("array<float>").as("embedding")))
    val rows = VectorIndex.admit(spark, ndir, batch)
      .select(col("vec_id"), col("dup_of_corpus"), col("batch_dup"),
        col("keep"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows.head == ((900003L, true, false, false)),
      s"the real twin flags as corpus dup: ${rows.head}")
    assert(rows.tail.forall(r => !r._2 && !r._3 && r._4),
      s"null-embedding rows keep (matching the pre-r14 pair-join " +
        s"semantics): ${rows.tail.toSeq}")
  }

  test("over-threshold query batches lose the FORCED broadcast: the " +
      "scoring join shuffles (or distributes the cartesian) and results " +
      "are unchanged") {
    if (!new File(s"$dir/postings/metadata").exists())
      VectorIndex.build(spark, emb, dir, nCentroids = 8, trainIters = 2)
    val qs = emb.filter(col("vec_id") < 6)
    val wantIvf = rows(VectorIndex.topK(spark, dir, qs, k = 5, nProbe = 2))
    val wantBf = Similarity.bruteForceTopK(qs, emb, k = 5)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().sorted.toSeq
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ivfDf = VectorIndex.topK(spark, dir, qs, k = 5, nProbe = 2)
      val gotIvf = rows(ivfDf)
      assert(gotIvf == wantIvf, "join strategy must not change results")
      val plan = ivfDf.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
        s"with broadcasts off the scoring join must shuffle:\n$plan")
      val bfDf = Similarity.bruteForceTopK(qs, emb, k = 5)
      val gotBf = bfDf.select(col("q_id"), col("n_id"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(gotBf == wantBf)
      // the non-equi all-pairs scoring distributes as a cartesian, the
      // sound over-threshold plan (a FORCED broadcast of an unbounded
      // batch was the OOM path)
      assert(bfDf.queryExecution.executedPlan.toString
        .contains("CartesianProduct"),
        "brute force without broadcast distributes the cartesian")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("build refuses an indexDir that already holds an index") {
    val bdir = s"$dir-rebuild"
    FileUtils.deleteQuietly(new File(bdir))
    VectorIndex.build(spark, emb.filter(col("vec_id") < 50), bdir,
      nCentroids = 4)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.build(spark, emb, bdir, nCentroids = 4)
    }
    assert(e.getMessage.contains("already holds Iceberg table metadata"),
      s"rebuild-in-place must be refused loudly: ${e.getMessage}")
  }

  test("planted exact clones retrieve through the stored index with " +
      "probability 1 (the q53 contract, now over lakehouse storage)") {
    if (!new File(s"$dir/postings/metadata").exists())
      VectorIndex.build(spark, emb, dir, nCentroids = 8, trainIters = 2)
    val clones = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val got = VectorIndex.topK(spark, dir, clones, k = 1, nProbe = 1)
      .select(col("q_id"), col("n_id"), col("score"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got == (0L until 20L).map(i => (i + 100000L, i, 1.0)),
      s"every clone must hit its source at score 1.0: $got")
  }

  test("rebuild retrains in place as ONE transaction: both tables flip " +
      "together, epochs match, results reproduce a fresh build, and a " +
      "torn pair is refused by loadConsistent") {
    val rdir = s"$dir-retrain"
    FileUtils.deleteQuietly(new File(rdir))
    val corpus = emb.filter(col("vec_id") < 120)
    VectorIndex.build(spark, corpus, rdir, nCentroids = 4, trainIters = 1)
    val queries = corpus.filter(col("vec_id") < 5)
    // a probe that loaded the PRE-rebuild pair keeps serving it
    val (oldC, oldP) = VectorIndex.loadConsistent(spark, rdir)
    val before = rows(VectorIndex.topK(spark, rdir, queries, k = 3,
      nProbe = 4, pinnedCentroids = Some(oldC), pinnedPostings = Some(oldP)))

    // CALL surface: retrain with MORE centroids, one transaction
    spark.conf.set("spark.sql.catalog.vixcat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vixcat.warehouse",
      graft.Scratch.dir("vix-cat-wh"))
    val r = spark.sql("CALL vixcat.system.rebuild_vector_index(" +
      s"index => '$rdir', n_centroids => 8, train_iters => 2)").collect()(0)
    assert(r.getLong(1) == 120L, s"rebuilt postings count: $r")

    // both tables carry the SAME fresh epoch; loadConsistent serves them
    val (c2, p2) = VectorIndex.loadConsistent(spark, rdir)
    val ce = c2.metadata.properties(VectorIndex.EpochProp)
    assert(ce == r.getString(0) &&
      p2.metadata.properties(VectorIndex.EpochProp) == ce)
    // the rebuilt index reproduces a from-scratch build with the same
    // quantizer parameters (shared deterministic kernels)
    val fdir = s"$dir-retrain-fresh"
    FileUtils.deleteQuietly(new File(fdir))
    VectorIndex.build(spark, corpus, fdir, nCentroids = 8, trainIters = 2)
    val rebuilt = rows(VectorIndex.topK(spark, rdir, queries, k = 3, nProbe = 4))
    assert(rebuilt == rows(VectorIndex.topK(spark, fdir, queries, k = 3,
      nProbe = 4)), "rebuild must equal a fresh build, row for row")
    // the pinned pre-rebuild probe still answers from the OLD snapshots
    assert(rows(VectorIndex.topK(spark, rdir, queries, k = 3, nProbe = 4,
      pinnedCentroids = Some(oldC), pinnedPostings = Some(oldP))) == before,
      "pinned probes must keep serving the pre-rebuild generation")

    // a TORN pair (epoch moved on one table only — the crash window) is
    // refused loudly instead of pairing generations
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val cmtr = new graft.iceberg.FsCommitter(
      s"$rdir/centroids", spark.sessionState.newHadoopConf())
    val upd = mapper.createObjectNode()
    upd.put("action", "set-properties")
    upd.putObject("updates").put(VectorIndex.EpochProp, "torn-epoch")
    cmtr.commit(Nil, Seq(upd))
    val e = intercept[IllegalStateException](
      VectorIndex.loadConsistent(spark, rdir))
    assert(e.getMessage.contains("rebuild crashed mid-publish"),
      e.getMessage)
  }
}
