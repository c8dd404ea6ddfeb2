package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.operators.TemporalJoins

/** Plan-shape guards for the 100 TB contracts the round-2 audit flagged:
  * these assert the OPTIMIZED plan's operator inventory so a future edit
  * reintroducing a corpus-side window/exchange or flipping a broadcast
  * side fails loudly, not silently at scale.
  */
class PlanShapeSpec extends SparkSpec {

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("ivfTopK: no Window anywhere and exactly one top-k window's worth of plan") {
    val df = Similarity.ivfTopK(
      emb.filter(col("vec_id") < 5), emb, k = 3, nCentroids = 8, nProbe = 2)
    val plan = optimized(df)
    // round 2's regression: corpus × centroids join + Window.partitionBy(n_id)
    // over the whole corpus. The only Window allowed is the final per-QUERY
    // top-k (partition key q_id).
    val windows = "Window ".r.findAllIn(plan).length
    assert(windows == 1, s"expected exactly the rank-top-k window, got $windows:\n$plan")
    assert(!plan.contains("partitionBy(n_id)") && plan.contains("q_id"),
      "the surviving window must partition by the query id, not the corpus id")
  }

  test("bruteForceTopK broadcasts the query side, never the corpus") {
    val df = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
    val plan = physical(df)
    assert(plan.contains("Broadcast"), s"expected a broadcast join:\n$plan")
    // the corpus side feeds the streamed/probe side: its filter-free scan
    // must NOT sit under a BroadcastExchange. Heuristic: the broadcast
    // subtree contains the vec_id < 5 filter (query side).
    val broadcastIdx = plan.indexOf("BroadcastExchange")
    assert(broadcastIdx >= 0)
    val after = plan.substring(broadcastIdx)
    assert(after.contains("vec_id") && (after.contains("< 5") || after.contains("5)")),
      s"broadcast subtree should be the filtered query side:\n$plan")
  }

  test("budget samplers broadcast the rates side; resharding is one hash exchange") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.wordCount(col("text")).as("tok"))
    // the #domains-row rates frame must come back as a BroadcastHashJoin —
    // a shuffle join here would re-shuffle the CORPUS to join 5 rows
    for (df <- Seq(
        Sampling.sampleToTokenBudget(docs, "doc_id", "source", "tok",
          Seq("src0" -> 100L)),
        Sampling.sampleByTemperature(docs, "doc_id", "source", "tok",
          alpha = 0.5, budgetTokens = 1000L))) {
      val plan = physical(df)
      assert(plan.contains("BroadcastHashJoin"),
        s"rates must broadcast-join back onto the corpus:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"no corpus re-shuffle for a #domains-row join:\n$plan")
    }
    // resharding: exactly ONE exchange, and it is hash (deterministic
    // placement), never range (sampled, job-dependent boundaries)
    val sh = Sampling.shuffleIntoShards(docs.select("doc_id"), "doc_id", 8)
    val plan = physical(sh)
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
    assert(plan.contains("hashpartitioning") &&
      !plan.contains("rangepartitioning"), plan)
  }

  test("DSIR vocab joins broadcast; boilerplate rewrite is map-side") {
    val docs = Tables.load(spark, sf, "documents")
    // the vocab (aggregated, bounded by distinct tokens) must broadcast
    // back onto the exploded corpus — a sort-merge join would shuffle
    // the token stream of the whole corpus
    val sel = graft.operators.Selection.importanceScores(
      docs, "doc_id", "text", col("lang") === "de")
    val selPlan = physical(sel)
    assert(selPlan.contains("BroadcastHashJoin"),
      s"vocab must broadcast:\n$selPlan")
    assert(!selPlan.contains("SortMergeJoin"), selPlan)
    // boilerplate pass 2 (the rewrite over a known gram list) is purely
    // map-side: no exchange, no join — the corpus never moves
    val rw = graft.operators.Boilerplate.removeNgrams(
      docs.select(col("doc_id"), col("text")), "text",
      Seq("a b c", "x y z"), n = 3)
    val rwPlan = physical(rw)
    assert(!rwPlan.contains("Exchange") && !rwPlan.contains("Join"),
      s"rewrite must be map-side:\n$rwPlan")
    // URL canonicalization is likewise a pure projection
    val url = docs.select(col("doc_id"),
      graft.functions.TextFunctions.canonicalizeUrl(col("text")).as("c"))
    val urlPlan = physical(url)
    assert(!urlPlan.contains("Exchange"), urlPlan)
  }

  test("asOfJoin plans one window pass and no join node for the matching") {
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val df = TemporalJoins.asOfJoin(purchases, clicks,
      on = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
      rightCols = Seq("event_id"), prefix = "c_")
    val plan = optimized(df)
    assert(!plan.contains("Join Inner") && !plan.contains("Join LeftOuter"),
      s"as-of matching must be the union+window formulation, not a join:\n$plan")
    assert("Window ".r.findAllIn(plan).length == 1,
      s"exactly one window pass expected:\n$plan")
  }

  test("similarity kernels stay out of CodegenFallback (no HOF lambdas)") {
    val df = Similarity.cosinePairs(emb, maxId = 20)
    val plan = optimized(df)
    // the interpreted formulation showed up as aggregate/zip_with lambda
    // calls in the plan; the codegen'd kernel prints as dotproduct(...)
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      s"higher-order functions crept back into the similarity kernel:\n$plan")
    assert(plan.toLowerCase.contains("dotproduct"),
      s"expected the native DotProduct expression:\n$plan")
  }

  test("k-means result is driver-resident: no corpus lineage to re-run downstream") {
    val cents = Similarity.kmeansCentroids(emb, nCentroids = 4, iters = 1)
    val plan = physical(cents)
    // each Lloyd's step runs exactly one corpus aggregation and collects
    // ≤ k rows; the returned centroids must be a local table, not a
    // lineage that re-scans and re-assigns the corpus every time a
    // consumer (ivfTopK, the next iteration) evaluates it
    assert(plan.contains("LocalTableScan"),
      s"centroids should be local rows:\n$plan")
    assert(!plan.contains("FileScan"),
      s"no corpus lineage may hide behind the centroid result:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Exchange"),
      s"consuming centroids must cost no shuffle:\n$plan")
  }

  test("partitioned-write projection keeps IcebergTransform inside codegen") {
    import graft.iceberg.IcebergTransform
    import org.apache.spark.sql.GraftColumnShim
    val ev = Tables.load(spark, sf, "events")
    val df = ev.withColumn("__gp_0", GraftColumnShim.column(
      IcebergTransform("day", GraftColumnShim.expression(col("ts")))))
    val plan = physical(df)
    // `*(n)` marks a WholeStageCodegen stage; if IcebergTransform's
    // generated code failed to compile, Spark would fall back and print
    // the projection unstarred
    val projLine = plan.linesIterator.find(_.contains("icebergtransform")).getOrElse(
      fail(s"expected an icebergtransform projection:\n$plan"))
    assert(projLine.trim.startsWith("*("),
      s"the write projection must stay in whole-stage codegen:\n$plan")
  }

  test("COUNT(*) is answered from metadata: LocalTableScan, no file scan") {
    val wh = "/root/repo/target/test-countpd-warehouse"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set("spark.sql.catalog.cpd",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cpd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cpd.ns")
    spark.sql("CREATE TABLE cpd.ns.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO cpd.ns.t SELECT id, concat('c', id % 3) FROM range(0, 1000)")

    val counted = spark.sql("SELECT COUNT(*) FROM cpd.ns.t")
    val plan = physical(counted)
    assert(plan.contains("LocalTableScan"),
      s"COUNT(*) must be metadata-answered:\n$plan")
    assert(!plan.contains("BatchScan") && !plan.contains("FileScan"),
      s"COUNT(*) must not plan a file scan:\n$plan")
    assert(counted.collect()(0).getLong(0) == 1000L)

    // MIN/MAX on fixed-width types come from per-file bounds, same plan
    val mm = spark.sql("SELECT MIN(k), MAX(k), COUNT(*) FROM cpd.ns.t")
    assert(physical(mm).contains("LocalTableScan"),
      s"MIN/MAX must be metadata-answered:\n${physical(mm)}")
    val r = mm.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 999L, 1000L)))
    // strings are NOT eligible (the spec allows truncated bounds)
    val ms = spark.sql("SELECT MAX(cat) FROM cpd.ns.t")
    assert(!physical(ms).contains("LocalTableScan"))
    assert(ms.collect()(0).getString(0) == "c2")

    // a residual filter disqualifies the shortcut (ours re-apply above
    // the scan — a pushed count row would be re-filtered into garbage)
    val filtered = spark.sql("SELECT COUNT(*) FROM cpd.ns.t WHERE cat = 'c0'")
    assert(!physical(filtered).contains("LocalTableScan"))
    assert(filtered.collect()(0).getLong(0) == 334L)

    // merge-on-read deletes disqualify it: manifest counts don't see the
    // anti-joined rows
    spark.sql("ALTER TABLE cpd.ns.t SET TBLPROPERTIES " +
      "('write.delete.mode' = 'merge-on-read')")
    spark.sql("DELETE FROM cpd.ns.t WHERE k < 10")
    val afterDelete = spark.sql("SELECT COUNT(*) FROM cpd.ns.t")
    assert(!physical(afterDelete).contains("LocalTableScan"),
      "a delete-bearing snapshot must not metadata-answer COUNT(*)")
    assert(afterDelete.collect()(0).getLong(0) == 990L)

    // time travel stays eligible: the pinned snapshot's manifests count
    val v1 = graft.iceberg.TableMetadata.load(s"$wh/ns/t",
      spark.sessionState.newHadoopConf()).snapshotLineage.head
    val tt = spark.sql(s"SELECT COUNT(*) FROM cpd.ns.t VERSION AS OF $v1")
    assert(physical(tt).contains("LocalTableScan"))
    assert(tt.collect()(0).getLong(0) == 1000L)
  }

  test("MIN/MAX metadata answers are gated on the exact-bounds marker") {
    val wh = "/root/repo/target/test-exactb-warehouse"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set("spark.sql.catalog.exb",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.exb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS exb.ns")
    spark.sql("CREATE TABLE exb.ns.t (k BIGINT, cat STRING)")
    spark.sql("INSERT INTO exb.ns.t SELECT id, concat('c', id % 3) FROM range(0, 100)")

    // our creation path stamps graft.exact-bounds=true ⇒ eligible
    val mm = spark.sql("SELECT MIN(k), MAX(k) FROM exb.ns.t")
    assert(physical(mm).contains("LocalTableScan"),
      s"our own tables must metadata-answer MIN/MAX:\n${physical(mm)}")
    assert(mm.collect()(0) == org.apache.spark.sql.Row(0L, 99L))

    // a table NOT asserting exact bounds (the Iceberg spec only requires
    // conservative bounds — a foreign writer may store loose ones) must
    // fall back to a real scan for MIN/MAX; COUNT(*) stays eligible
    // (record_count is exact by spec)
    spark.sql("ALTER TABLE exb.ns.t SET TBLPROPERTIES " +
      "('graft.exact-bounds' = 'false')")
    val mmForeign = spark.sql("SELECT MIN(k), MAX(k) FROM exb.ns.t")
    assert(!physical(mmForeign).contains("LocalTableScan"),
      s"conservative bounds must not metadata-answer MIN/MAX:\n${physical(mmForeign)}")
    assert(mmForeign.collect()(0) == org.apache.spark.sql.Row(0L, 99L))
    val cnt = spark.sql("SELECT COUNT(*) FROM exb.ns.t")
    assert(physical(cnt).contains("LocalTableScan"))
    assert(cnt.collect()(0).getLong(0) == 100L)
  }

  test("q109's EXISTS/NOT EXISTS decorrelate to one semi and one anti join") {
    val plan = physical(
      graft.SparkEntry.queries("q109_exists_anti")(spark, sf))
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$plan")
    // the l_returnflag = 'R' filter pushes to the outer AND anti scans
    assert("EqualTo\\(l_returnflag,R\\)".r.findAllIn(plan).length >= 2,
      s"returnflag filter must push into the scans:\n$plan")
  }

  test("q113's recursion carries a counter: no per-iteration orders subquery") {
    val plan = physical(
      graft.SparkEntry.queries("q113_recursive_cte")(spark, sf))
    assert(plan.contains("UnionLoop"), s"recursive CTE must plan a UnionLoop:\n$plan")
    // the 14.5 s regression: a scalar subquery in the recursion's stop
    // condition re-scanned orders every iteration. The recursive step must
    // reference NO file scan (pure arithmetic on the carried counter).
    val loopIdx = plan.indexOf("UnionLoopRef")
    assert(loopIdx >= 0, s"plan has no UnionLoopRef:\n$plan")
    val step = plan.substring(loopIdx,
      math.min(plan.length, loopIdx + 400))
    assert(!step.contains("FileScan") && !step.contains("Subquery"),
      s"recursive step must not rescan data:\n$step")
  }

  test("q121's stream-static enrichment broadcasts the dim, not the events") {
    val plan = physical(
      graft.SparkEntry.queries("q121_stream_enrich")(spark, sf))
    val bIdx = plan.indexOf("BroadcastExchange")
    assert(bIdx >= 0, s"expected a broadcast join:\n$plan")
    assert(plan.indexOf("customer.parquet", bIdx) >= 0,
      s"the broadcast subtree must be the customer dim:\n$plan")
  }

  test("paragraph dedup shuffles digests, not a window over paragraph text") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val plan = physical(
      graft.operators.Dedup.paragraphDedup(docs, "doc_id", "text"))
    assert(!plan.contains("Window"),
      s"winner election must be an aggregate, not a window:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_first") ||
      plan.contains("HashAggregate"),
      s"winner election must partial-aggregate before the exchange:\n$plan")
  }

  test("bloom admission: the clear-miss path is join-free and shuffle-free") {
    import graft.operators.BloomAdmission
    val docs = Tables.load(spark, sf, "documents")
    val corpus = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val bits = BloomAdmission.buildBits(corpus,
      org.apache.spark.sql.functions.col("text"), 1 << 16, 5)
    // the fresh path — rows the filter clears — must be a pure scan +
    // filter: no join, no exchange (this is the leg that carries ~all
    // of a 100 TB incoming batch)
    val fresh = physical(incoming.filter(
      !BloomAdmission.mightContain(
        org.apache.spark.sql.functions.col("text"), bits, 1 << 16, 5)))
    assert(!fresh.contains("Join") && !fresh.contains("Exchange"),
      s"the clear-miss path must not join or shuffle:\n$fresh")
    // and the full admitNew plan pays exactly ONE join (the anti-join
    // on the maybe sliver)
    val full = physical(BloomAdmission.admitNew(corpus, incoming, "text",
      numBits = 1 << 16, numHashes = 5))
    assert(full.contains("LeftAnti"),
      s"the maybe sliver must anti-join the corpus:\n$full")
  }

  test("pagerank result is a checkpoint leaf: no per-round lineage downstream") {
    import graft.operators.Centrality
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Centrality.pageRank(edges, iterations = 4)
    val plan = physical(pr)
    assert(!plan.contains("Join"),
      s"downstream consumers must see the materialized leaf, not 4 rounds " +
        s"of joins:\n$plan")
  }
}
