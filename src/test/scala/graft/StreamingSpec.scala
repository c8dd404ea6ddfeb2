package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured-Streaming parity: the streaming hourly aggregation must
  * produce exactly the batch result when fed the same files (SURVEY §2.B
  * "Streaming": streaming checked against its own batch run).
  */
class StreamingSpec extends SparkSpec {

  private def canon(rows: Array[org.apache.spark.sql.Row]): Set[String] =
    rows.map(_.mkString("\t")).toSet

  test("streaming hourly agg equals batch hourly agg") {
    val batch = EventStream.hourlyAgg(Tables.load(spark, sf, "events"))
      .collect()

    val stream = EventStream.hourlyAggStream(
      EventStream.readEventStream(spark, sf))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_out").collect()
      assert(canon(got) == canon(batch))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join emits the same pairs as batch") {
    val batch = EventStream.clickPurchaseJoin(Tables.load(spark, sf, "events"))
      .collect()
    val stream = EventStream.clickPurchaseJoin(
      EventStream.readEventStream(spark, sf))
    // inner stream-stream joins emit eagerly; append mode is the only
    // supported output mode for them
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sj_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("sj_out").collect()
      assert(canon(got) == canon(batch))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    val sessions = EventStream.sessionAgg(Tables.load(spark, sf, "events"))
    val rows = sessions.collect()
    assert(rows.nonEmpty)
    // session end >= start for every row, counts positive
    assert(rows.forall(r =>
      !r.getTimestamp(1).before(r.getTimestamp(0)) && r.getLong(3) > 0))
  }

  test("streaming dedup collapses replayed events within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.dedupEvents(df, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData((1L, t, 1.0), (2L, t, 2.0), (1L, t, 1.0)) // in-batch dup
      q.processAllAvailable()
      input.addData((2L, t, 2.0), (3L, t, 3.0)) // cross-batch replay
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("stream-static enrichment matches the batch join, keeps unmatched events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B")).toDF("k", "segment")
    val input = MemoryStream[(Long, Long, Double)](spark)
    val df = input.toDF().toDF("event_id", "user_id", "value")
    val q = EventStream.enrichWithDim(df, dim, "user_id", "k")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      input.addData((10L, 1L, 1.0), (11L, 2L, 2.0), (12L, 99L, 3.0))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("event_id", "segment")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(10L -> Some("SEG_A"), 11L -> Some("SEG_B"),
        12L -> None), s"got $got")
      // identical rows from the batch face of the same expression
      val batch = EventStream.enrichWithDim(
          Seq((10L, 1L, 1.0), (11L, 2L, 2.0), (12L, 99L, 3.0))
            .toDF("event_id", "user_id", "value"),
          dim, "user_id", "k")
        .select("event_id", "segment")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("sliding windows produce ~4x the tumbling rows") {
    val sliding = EventStream.slidingAgg(Tables.load(spark, sf, "events"))
      .count()
    val tumbling = EventStream.hourlyAgg(Tables.load(spark, sf, "events"))
      .count()
    assert(sliding > tumbling)
  }

  test("streaming sink commits one Iceberg append snapshot per micro-batch") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergTable
    val dir = "/root/repo/target/test-stream-sink"
    FileUtils.deleteQuietly(new File(dir))
    import spark.implicits._
    val seed = Seq((0L, "init")).toDF("event_id", "tag")
    graft.iceberg.IcebergWriter.seedTable(spark, dir, seed.schema)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("event_id", "tag")
    val q = EventStream.icebergSink(stream, dir)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val t = IcebergTable(spark, dir)
    assert(t.metadata.snapshots.size == 2,
      s"one snapshot per non-empty micro-batch, got ${t.metadata.snapshots.size}")
    assert(t.toDF(spark).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(t.atSnapshot(1L).rowCount() == 2L, "first batch alone in snapshot 1")
  }

  test("sink auto-compaction bounds the file count; ledger and rows survive") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergTable
    val dir = "/root/repo/target/test-stream-autocompact"
    FileUtils.deleteQuietly(new File(dir))
    import spark.implicits._
    val seed = Seq((0L, "init")).toDF("event_id", "payload")
    graft.iceberg.IcebergWriter.seedTable(spark, dir, seed.schema)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("event_id", "payload")
    val q = EventStream.icebergSink(stream, dir, autoCompactMinFiles = 3)
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      (1 to 6).foreach { i =>
        mem.addData((i.toLong, s"p$i"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val t = IcebergTable(spark, dir)
    assert(t.planFiles().size < 6,
      s"6 single-file batches must have been folded, got ${t.planFiles().size}")
    assert(t.metadata.currentSnapshot.get.summary("operation") == "replace" ||
      t.planFiles().size <= 3, "compaction snapshots interleave the appends")
    assert(t.toDF(spark).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 6L), "every batch's rows exactly once")
    // the batch-id ledger survives compaction: a replayed batch still no-ops
    val qid = t.metadata.snapshots.flatMap(_.summary.get(EventStream.QueryIdKey))
      .headOption.getOrElse("")
    val replay = Seq((99L, "dup")).toDF("event_id", "payload")
    assert(!EventStream.commitBatchIfNew(replay, dir, 0L, qid),
      "batch 0 is in the ledger — replay must no-op")
    // WAP branches refuse in-stream compaction loudly
    intercept[IllegalArgumentException](
      EventStream.icebergSink(stream, dir, branch = "audit",
        autoCompactMinFiles = 2))
  }

  test("upsert sink MERGEs each micro-batch; in-batch versions collapse to the latest") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    val wh = "/root/repo/target/test-upsert-wh"
    FileUtils.deleteQuietly(new File(wh))
    FileUtils.deleteQuietly(new File("/root/repo/target/test-upsert-ckpt"))
    spark.conf.set("spark.sql.catalog.upcat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.upcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS upcat.ns")
    spark.sql("CREATE TABLE upcat.ns.docs (k BIGINT, v STRING, ver BIGINT)")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val stream = mem.toDF.toDF("k", "v", "ver")
    val q = EventStream.icebergUpsertSink(stream, "upcat.ns.docs",
      keys = Seq("k"), versionCol = Some("ver"))
      .option("checkpointLocation", "/root/repo/target/test-upsert-ckpt")
      .start()
    try {
      // batch 1: fresh keys, plus TWO versions of key 4 — latest must win
      mem.addData((1L, "a", 1L), (2L, "b", 1L), (4L, "x", 1L), (4L, "y", 2L))
      q.processAllAvailable()
      // batch 2: update one key, insert another
      mem.addData((2L, "B", 2L), (3L, "c", 1L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql("SELECT k, v FROM upcat.ns.docs ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "y")),
      s"upsert state wrong: $got")
  }

  test("upsert sink defaults its keys from the table's declared " +
      "identifier fields") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    val wh = graft.Scratch.dir("test-upsert-idf-wh")
    val ckpt = graft.Scratch.dir("test-upsert-idf-ckpt")
    FileUtils.deleteQuietly(new File(wh))
    FileUtils.deleteQuietly(new File(ckpt))
    spark.conf.set("spark.sql.catalog.upidcat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.upidcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS upidcat.ns")
    spark.sql("CREATE TABLE upidcat.ns.docs (k BIGINT NOT NULL, v STRING)")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("k", "v")
    // no identifier fields declared: the keyless sink refuses, naming
    // the DDL that fixes it
    val e = intercept[IllegalArgumentException](
      EventStream.icebergUpsertSink(stream, "upidcat.ns.docs"))
    assert(e.getMessage.contains("SET IDENTIFIER"))
    spark.sql("ALTER TABLE upidcat.ns.docs SET IDENTIFIER FIELDS k")
    val q = EventStream.icebergUpsertSink(stream, "upidcat.ns.docs")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT k, v FROM upidcat.ns.docs ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")),
      s"identifier-keyed upsert state wrong: $got")
  }

  test("MV sink keeps a stored rollup equal to a full recompute; replay no-ops") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.operators.IncrementalView
    val wh = "/root/repo/target/test-mv-wh"
    FileUtils.deleteQuietly(new File(wh))
    FileUtils.deleteQuietly(new File("/root/repo/target/test-mv-ckpt"))
    spark.conf.set("spark.sql.catalog.mvcat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mvcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvcat.ns")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val keys = Seq("k")
    val sums = Seq("v" -> "sv")
    // seed: the aggregate of the pre-stream data
    val seedData = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v")
    IncrementalView.aggregateState(seedData, keys, sums)
      .createOrReplaceTempView("mv_seed")
    spark.sql("CREATE TABLE mvcat.ns.mv AS SELECT * FROM mv_seed")
    val mvDir = s"$wh/ns/mv"

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = EventStream.icebergMvSink(mem.toDF.toDF("k", "v"), mvDir, keys, sums)
      .option("checkpointLocation", "/root/repo/target/test-mv-ckpt")
      .start()
    val streamed = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    try {
      mem.addData(("a", 3L), ("c", 7L))            // grow a group, new group
      streamed ++= Seq(("a", 3L), ("c", 7L))
      q.processAllAvailable()
      mem.addData(("c", 1L), ("b", 5L))
      streamed ++= Seq(("c", 1L), ("b", 5L))
      q.processAllAvailable()
    } finally q.stop()

    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "cnt", "sv", "sv_nn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val want = rollup(IncrementalView.aggregateState(
      seedData.unionByName(streamed.toSeq.toDF("k", "v")), keys, sums))
    val got = rollup(spark.sql("SELECT * FROM mvcat.ns.mv"))
    assert(got == want, s"MV $got != recompute $want")

    // every refresh is a snapshot (seed + 2 batches) and the ledger
    // records both batch ids — a replayed fold would double-count
    val t = new graft.iceberg.IcebergTable(mvDir,
      spark.sessionState.newHadoopConf())
    assert(t.metadata.snapshots.size == 3, s"${t.metadata.snapshots.size}")
    val qid = t.metadata.snapshots.flatMap(_.summary.get("graft.streaming.query-id"))
      .distinct.filter(_.nonEmpty)
    assert(qid.size == 1)
    assert(EventStream.lastCommittedBatchId(t.metadata, qid.head).contains(1L))
    // REAL replay: drive the per-batch body again with batch 1's id and
    // rows — the ledger gate must refuse the fold (double-counted sums
    // otherwise) and the stored rollup must not move
    val before = rollup(spark.sql("SELECT * FROM mvcat.ns.mv"))
    val replayed = EventStream.foldBatchIfNew(
      Seq(("c", 1L), ("b", 5L)).toDF("k", "v"), mvDir, keys, sums,
      batchId = 1L, queryId = qid.head)
    assert(!replayed, "replayed batch id must no-op")
    assert(rollup(spark.sql("SELECT * FROM mvcat.ns.mv")) == before)
    // a NEW batch id through the same body DOES fold
    assert(EventStream.foldBatchIfNew(Seq(("a", 1L)).toDF("k", "v"),
      mvDir, keys, sums, batchId = 2L, queryId = qid.head))
    assert(rollup(spark.sql("SELECT * FROM mvcat.ns.mv")) != before)
    // a CDC-shaped frame is refused, not silently relabeled
    val e = intercept[IllegalArgumentException] {
      EventStream.foldBatchIfNew(
        Seq(("a", 1L, "delete")).toDF("k", "v", "_change_type"),
        mvDir, keys, sums, batchId = 3L, queryId = qid.head)
    }
    assert(e.getMessage.contains("_change_type"))
  }

  test("streaming sink is exactly-once: replayed batches do not double-append") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergTable
    val dir = "/root/repo/target/test-stream-replay"
    FileUtils.deleteQuietly(new File(dir))
    import spark.implicits._
    val seed = Seq((0L, "init")).toDF("event_id", "tag")
    graft.iceberg.IcebergWriter.seedTable(spark, dir, seed.schema)

    val b0 = Seq((1L, "a")).toDF("event_id", "tag")
    assert(EventStream.commitBatchIfNew(b0, dir, 0L, "q1"), "first delivery commits")
    assert(!EventStream.commitBatchIfNew(b0, dir, 0L, "q1"),
      "replay of batch 0 must no-op")
    assert(EventStream.commitBatchIfNew(
      Seq((2L, "b")).toDF("event_id", "tag"), dir, 1L, "q1"), "next batch commits")
    assert(EventStream.commitBatchIfNew(
      Seq((3L, "c")).toDF("event_id", "tag"), dir, 0L, "q2"),
      "a fresh checkpoint (new query id) restarts batch numbering and still commits")

    val t = IcebergTable(spark, dir)
    assert(t.metadata.snapshots.size == 3, s"got ${t.metadata.snapshots.size}")
    assert(t.toDF(spark).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("admission sink: batches dedupe against the live corpus+index, atomically") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.operators.Dedup
    val cDir = "/root/repo/target/test-admission-corpus"
    val iDir = "/root/repo/target/test-admission-index"
    Seq(cDir, iDir).foreach(d => FileUtils.deleteQuietly(new File(d)))
    import spark.implicits._
    val corpusSeed = Seq(
      (1L, "the seed corpus carries this first document body"),
      (2L, "and a second unrelated body about table formats")
    ).toDF("doc_id", "text")
    val indexSeed = Dedup.minhashBandIndex(corpusSeed, "doc_id", "text",
      numHashes = 32, bands = 16)
    for ((d, sch) <- Seq(cDir -> corpusSeed.schema, iDir -> indexSeed.schema))
      graft.iceberg.IcebergWriter.seedTable(spark, d, sch)
    IcebergWriter.append(spark, cDir, corpusSeed)
    IcebergWriter.append(spark, iDir, indexSeed)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    val q = EventStream.icebergAdmissionSink(stream, cDir, iDir,
        "doc_id", "text", numHashes = 32, bands = 16)
      .option("checkpointLocation", s"$cDir/_ckpt")
      .start()
    try {
      // batch 0: a clone of seed doc 1 (reject) + a fresh doc (admit)
      mem.addData(
        (10L, "the seed corpus carries this first document body"),
        (11L, "a genuinely novel document arriving in batch zero"))
      q.processAllAvailable()
      // batch 1: a clone of the doc batch 0 admitted — the probe must see
      // it through the index rows batch 0 appended (the loop feeds
      // itself); plus a fresh doc and its in-batch duplicate
      mem.addData(
        (12L, "a genuinely novel document arriving in batch zero"),
        (13L, "fresh material for batch one and nothing else"),
        (14L, "fresh material for batch one and nothing else"))
      q.processAllAvailable()
    } finally q.stop()

    val ids = IcebergTable(spark, cDir).toDF(spark)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 11L, 13L),
      s"corpus = seed + one admit per batch, got $ids")
    // index rows track the corpus exactly: bands per admitted doc —
    // the atomic pair means neither table can lead the other
    val idx = IcebergTable(spark, iDir).toDF(spark)
    assert(idx.count() == 4 * 16, s"index rows = 4 docs x 16 bands")
    assert(idx.select("doc_id").distinct().as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 11L, 13L))
    // one snapshot per table per non-empty admission (seed + 2 batches)
    assert(IcebergTable(spark, cDir).metadata.snapshots.size == 3)
    assert(IcebergTable(spark, iDir).metadata.snapshots.size == 3)
  }

  test("vector admission sink: batches dedupe against the live corpus " +
      "through the stored IVF index, atomically") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.operators.VectorIndex
    val cDir = "/root/repo/target/test-vadmission-corpus"
    val iDir = "/root/repo/target/test-vadmission-index"
    Seq(cDir, iDir).foreach(d => FileUtils.deleteQuietly(new File(d)))
    import spark.implicits._
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    val corpusSeed = emb.filter(col("vec_id") >= 200)
    IcebergWriter.seedTable(spark, cDir, corpusSeed.schema)
    IcebergWriter.append(spark, cDir, corpusSeed)
    VectorIndex.build(spark, corpusSeed, iDir, nCentroids = 8)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF.toDF("vec_id", "embedding")
    val q = EventStream.icebergVectorAdmissionSink(stream, cDir, iDir)
      .option("checkpointLocation", s"$cDir/_ckpt")
      .start()
    try {
      // batch 0: a clone of corpus vec 200 (reject) + fresh vec 10 (admit)
      mem.addData((900L, vecs(200L)), (10L, vecs(10L)))
      q.processAllAvailable()
      // batch 1: a clone of the vec batch 0 admitted — the probe must see
      // it through the posting rows batch 0 appended (the loop feeds
      // itself); plus a fresh vec and its in-batch duplicate
      mem.addData((901L, vecs(10L)), (20L, vecs(20L)), (21L, vecs(20L)))
      q.processAllAvailable()
    } finally q.stop()

    val ids = IcebergTable(spark, cDir).toDF(spark)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids == ((10L +: 20L +: (200L until 500L)).sorted),
      s"corpus = seed + one admit per batch, got ${ids.size} ids")
    // posting rows track the corpus exactly — the atomic pair means
    // neither table can lead the other
    val postings = IcebergTable(spark, s"$iDir/postings").toDF(spark)
    assert(postings.count() == 302, "one posting row per corpus vector")
    assert(postings.select("n_id").distinct().as[Long].collect().sorted.toSeq
      == ids, "posting ids == corpus ids")
    // one snapshot per table per non-empty admission (seed/build + 2)
    assert(IcebergTable(spark, cDir).metadata.snapshots.size == 3)
    assert(IcebergTable(spark, s"$iDir/postings")
      .metadata.snapshots.size == 3)
  }

  test("LSH admission sink heals the crash window: an orphaned index " +
      "row is not duplicated on replay and its doc still admits") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.operators.Dedup
    val cDir = "/root/repo/target/test-admission-orphan-corpus"
    val iDir = "/root/repo/target/test-admission-orphan-index"
    Seq(cDir, iDir).foreach(d => FileUtils.deleteQuietly(new File(d)))
    import spark.implicits._
    val corpusSeed = Seq(
      (1L, "the seed corpus carries this first document body")
    ).toDF("doc_id", "text")
    def bands16(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandIndex(df, "doc_id", "text",
        numHashes = 32, bands = 16)
    val indexSeed = bands16(corpusSeed)
    IcebergWriter.seedTable(spark, cDir, corpusSeed.schema)
    IcebergWriter.seedTable(spark, iDir, indexSeed.schema)
    IcebergWriter.append(spark, cDir, corpusSeed)
    IcebergWriter.append(spark, iDir, indexSeed)
    // the crash window of a prior attempt at THIS batch: index rows for
    // doc 7 were published, the ledgered corpus append never happened
    val orphanDoc = Seq((7L, "a document whose first attempt crashed"))
      .toDF("doc_id", "text")
    IcebergWriter.append(spark, iDir, bands16(orphanDoc))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    val q = EventStream.icebergAdmissionSink(stream, cDir, iDir,
        "doc_id", "text", numHashes = 32, bands = 16)
      .option("checkpointLocation", s"$cDir/_ckpt")
      .start()
    try {
      mem.addData((7L, "a document whose first attempt crashed"))
      q.processAllAvailable()
    } finally q.stop()

    val corpusIds = IcebergTable(spark, cDir).toDF(spark)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpusIds == Seq(1L, 7L),
      s"the orphan must not reject its own replay: $corpusIds")
    val n7 = IcebergTable(spark, iDir).toDF(spark)
      .filter(col("doc_id") === 7).count()
    assert(n7 == 16, s"index rows for the healed doc = bands exactly " +
      s"once, got $n7")
  }

  test("vector admission sink heals the crash window: an orphaned " +
      "posting row neither rejects its twin nor gets duplicated") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.operators.VectorIndex
    import graft.functions.Similarity
    val cDir = "/root/repo/target/test-vadmission-orphan-corpus"
    val iDir = "/root/repo/target/test-vadmission-orphan-index"
    Seq(cDir, iDir).foreach(d => FileUtils.deleteQuietly(new File(d)))
    import spark.implicits._
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    val corpusSeed = emb.filter(col("vec_id") >= 400)
    IcebergWriter.seedTable(spark, cDir, corpusSeed.schema)
    IcebergWriter.append(spark, cDir, corpusSeed)
    VectorIndex.build(spark, corpusSeed, iDir, nCentroids = 4)
    // simulate the crash window of a previous attempt at THIS batch:
    // its posting rows were published, the ledgered corpus append never
    // happened — vec 33 is in the index but not the corpus
    val orphan = emb.filter(col("vec_id") === 33)
    val cents = IcebergTable(spark, s"$iDir/centroids").toDF(spark)
    IcebergWriter.append(spark, s"$iDir/postings",
      Similarity.ivfAssign(orphan, cents))
    val postingsBefore = IcebergTable(spark, s"$iDir/postings")
      .toDF(spark).filter(col("n_id") === 33).count()
    assert(postingsBefore == 1)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF.toDF("vec_id", "embedding")
    val q = EventStream.icebergVectorAdmissionSink(stream, cDir, iDir)
      .option("checkpointLocation", s"$cDir/_ckpt")
      .start()
    try {
      // the replayed batch: the orphaned row itself + a fresh row
      mem.addData((33L, vecs(33L)), (44L, vecs(44L)))
      q.processAllAvailable()
    } finally q.stop()

    val corpusIds = IcebergTable(spark, cDir).toDF(spark)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(corpusIds.contains(33L),
      "the orphan must NOT reject its own replay — that would lose the " +
        s"row from the corpus forever: $corpusIds")
    assert(corpusIds.contains(44L))
    val p33 = IcebergTable(spark, s"$iDir/postings").toDF(spark)
      .filter(col("n_id") === 33).count()
    assert(p33 == 1,
      s"replay must not duplicate the orphan's posting row, got $p33")
    val p44 = IcebergTable(spark, s"$iDir/postings").toDF(spark)
      .filter(col("n_id") === 44).count()
    assert(p44 == 1)
    // and a later clone of the healed row is rejected normally
    val adm = VectorIndex.admit(spark, iDir,
      emb.filter(col("vec_id") === 33)
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")))
    assert(adm.select(col("dup_of_corpus")).as[Boolean].head())
  }

  test("admission sink over a bucket-partitioned index: identical " +
      "admissions, and the probe's In pushdown actually prunes files") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.operators.Dedup
    val cDir = "/root/repo/target/test-admission-part-corpus"
    val iDir = "/root/repo/target/test-admission-part-index"
    Seq(cDir, iDir).foreach(d => FileUtils.deleteQuietly(new File(d)))
    import spark.implicits._
    val corpusSeed = (0L until 40L).map(i =>
      (i, s"seed corpus document number $i with distinct body text"))
      .toDF("doc_id", "text")
    val indexSeed = Dedup.minhashBandIndex(corpusSeed, "doc_id", "text",
      numHashes = 32, bands = 16)
    for ((d, sch, parts) <- Seq(
        (cDir, corpusSeed.schema, Seq.empty[(String, String)]),
        (iDir, indexSeed.schema, Seq("band_hash" -> "bucket[8]"))))
      graft.iceberg.IcebergWriter.seedTable(spark, d, sch, parts)
    IcebergWriter.append(spark, cDir, corpusSeed)
    IcebergWriter.append(spark, iDir, indexSeed)
    // the partitioned seed write fans out one file per touched bucket —
    // a single-key In filter must prune to a strict subset
    val t0 = IcebergTable(spark, iDir)
    val allFiles = t0.planFiles().size
    assert(allFiles >= 4, s"bucketed seed should span several files: $allFiles")
    val oneKey = IcebergTable(spark, iDir).toDF(spark).limit(1)
      .select("band_hash").as[Long].head()
    val pruned = t0.planFiles(Seq(
      org.apache.spark.sql.sources.In("band_hash", Array(Long.box(oneKey))))).size
    assert(pruned < allFiles,
      s"bucket pruning must bite: $pruned of $allFiles files kept")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    val q = EventStream.icebergAdmissionSink(stream, cDir, iDir,
        "doc_id", "text", numHashes = 32, bands = 16)
      .option("checkpointLocation", s"$cDir/_ckpt")
      .start()
    try {
      mem.addData(
        (100L, "seed corpus document number 7 with distinct body text"), // clone: reject
        (101L, "a brand new admission-worthy document body"))            // admit
      q.processAllAvailable()
      mem.addData(
        (102L, "a brand new admission-worthy document body"), // clone of 101: reject
        (103L, "yet another novel body for the second batch"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = IcebergTable(spark, cDir).toDF(spark)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 40L) ++ Seq(101L, 103L)).sorted,
      s"admissions over the partitioned index must match the exact semantics: " +
        s"${ids.filter(_ >= 100L)}")
    // index appends from the sink land under the bucket spec too
    val idxT = IcebergTable(spark, iDir)
    assert(idxT.toDF(spark).select("doc_id").distinct().count() == 42)
    assert(idxT.planFiles().forall(_.partition.nonEmpty),
      "every index data file (seed AND sink appends) carries its bucket tuple")
  }

  test("admission sink: checkpoint replay after a post-commit crash is a no-op") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    import graft.operators.Dedup
    val cDir = "/root/repo/target/test-admission-replay-corpus"
    val iDir = "/root/repo/target/test-admission-replay-index"
    Seq(cDir, iDir).foreach(d => FileUtils.deleteQuietly(new File(d)))
    import spark.implicits._
    val corpusSeed = Seq((1L, "replay seed document body")).toDF("doc_id", "text")
    val indexSeed = Dedup.minhashBandIndex(corpusSeed, "doc_id", "text",
      numHashes = 32, bands = 16)
    for ((d, sch) <- Seq(cDir -> corpusSeed.schema, iDir -> indexSeed.schema))
      graft.iceberg.IcebergWriter.seedTable(spark, d, sch)
    IcebergWriter.append(spark, cDir, corpusSeed)
    IcebergWriter.append(spark, iDir, indexSeed)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    def run(): Unit = {
      val q = EventStream.icebergAdmissionSink(stream, cDir, iDir,
          "doc_id", "text", numHashes = 32, bands = 16)
        .option("checkpointLocation", s"$cDir/_ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    mem.addData((10L, "a fresh admitted document"))
    run()
    // crash AFTER the atomic pair committed but BEFORE Spark recorded the
    // batch: drop the commit marker -> restart replays batch 0; the
    // corpus-table ledger must make the replay a no-op on BOTH tables
    val marker = new File(s"$cDir/_ckpt/commits/0")
    assert(marker.exists, "expected checkpoint commit marker for batch 0")
    assert(marker.delete())
    new File(s"$cDir/_ckpt/commits/.0.crc").delete()
    run()

    assert(IcebergTable(spark, cDir).metadata.snapshots.size == 2,
      "replay must not re-append the corpus (seed + one batch)")
    assert(IcebergTable(spark, iDir).metadata.snapshots.size == 2,
      "replay must not re-append the index either (atomic pair + ledger)")
    assert(IcebergTable(spark, cDir).toDF(spark).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 10L))
    assert(IcebergTable(spark, iDir).toDF(spark).count() == 2 * 16)

    // the first contact pinned the LSH params in the index table's
    // properties; a sink configured differently must refuse loudly
    assert(graft.iceberg.TableMetadata.load(iDir,
        spark.sessionState.newHadoopConf())
      .properties.get("graft.lsh.bands").contains("16"))
    val bad = EventStream.icebergAdmissionSink(stream, cDir, iDir,
        "doc_id", "text", numHashes = 32, bands = 8)
      .option("checkpointLocation", s"$cDir/_ckpt_bad")
      .start()
    mem.addData((20L, "another document for the mismatched sink"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try bad.processAllAvailable() finally bad.stop()
    }
    assert(e.getMessage.contains("pinned") ||
      Option(e.getCause).exists(_.getMessage.contains("pinned")),
      s"expected the LSH-pin refusal, got: ${e.getMessage}")
  }

  test("restart from checkpoint replays the last batch without duplicate rows") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.IcebergTable
    val dir = "/root/repo/target/test-stream-ckpt-replay"
    FileUtils.deleteQuietly(new File(dir))
    import spark.implicits._
    val seed = Seq((0L, "init")).toDF("event_id", "tag")
    graft.iceberg.IcebergWriter.seedTable(spark, dir, seed.schema)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("event_id", "tag")
    def run(): Unit = {
      val q = EventStream.icebergSink(stream, dir)
        .option("checkpointLocation", s"$dir/_ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    mem.addData((1L, "a"), (2L, "b"))
    run()
    // simulate a crash AFTER the sink committed but BEFORE Spark recorded
    // the batch completion: drop the commit marker → restart replays batch 0
    val marker = new File(s"$dir/_ckpt/commits/0")
    assert(marker.exists, "expected checkpoint commit marker for batch 0")
    assert(marker.delete())
    new File(s"$dir/_ckpt/commits/.0.crc").delete() // checksum shadow too
    run()

    val t = IcebergTable(spark, dir)
    assert(t.metadata.snapshots.size == 1,
      s"replayed batch must not commit a second snapshot, got ${t.metadata.snapshots.size}")
    assert(t.toDF(spark).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L), "no duplicate rows after replay")
  }

  test("compaction collapses small files and materializes deletes") {
    import java.io.File
    import org.apache.commons.io.FileUtils
    import graft.iceberg.{IcebergTable, IcebergWriter}
    val dir = "/root/repo/target/test-compact"
    FileUtils.deleteQuietly(new File(dir))
    import spark.implicits._
    val df0 = Seq((0L, "seed")).toDF("id", "tag")
    graft.iceberg.IcebergWriter.seedTable(spark, dir, df0.schema)
    // 5 tiny append snapshots → ≥5 files, then one equality delete
    (1L to 5L).foreach(i =>
      IcebergWriter.append(spark, dir, Seq((i, s"row$i")).toDF("id", "tag")))
    IcebergWriter.deleteWhere(spark, dir,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 3L)))
    val before = IcebergTable(spark, dir)
    assert(before.planFiles().size >= 5 && before.hasDeletes)

    IcebergWriter.compact(spark, dir)
    val after = IcebergTable(spark, dir)
    assert(after.planFiles().size < before.planFiles().size,
      s"compaction must shrink the file count: ${after.planFiles().size}")
    assert(!after.hasDeletes, "deletes must be materialized away")
    assert(after.toDF(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 4L, 5L))
    // history is intact: the pre-compaction snapshot still reads 5 rows
    assert(before.pinnedSnapshotId.isEmpty)
    assert(after.atSnapshot(5L).rowCount() == 5L)
  }
}
