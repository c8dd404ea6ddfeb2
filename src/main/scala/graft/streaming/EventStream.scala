package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming surface over the `events` table. The reference has
  * no streaming engine at all (SURVEY §2.B "Streaming"); this is the
  * Spark-native extension: the same hourly aggregation is defined once and
  * applied to either a batch or a streaming DataFrame, so correctness of
  * the streaming path is checked against the batch run (and the batch run
  * against the DuckDB oracle, q33).
  */
object EventStream {

  /** Replica-sink batch-pin bound (rows): at or above this change
    * volume the micro-batch localCheckpoints once and the sink's 2-3
    * downstream passes read pinned blocks instead of re-executing the
    * window's scans through the RDD bridge; below it the pin job costs
    * more than the re-scans (measured at bench scale). */
  private[graft] val ReplicaPinMinRows = 1000000L

  /** Hourly tumbling-window counts + value sums per event type.
    * Works on both batch and streaming inputs (`window()` is supported in
    * both); in streaming mode pair with [[withWatermark]].
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("sv"))
      .select(col("w.start").as("h"), col("event_type"), col("c"), col("sv"))

  /** Streaming variant: 2h watermark bounds state for late data. */
  def hourlyAggStream(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))

  /** Sliding-window (1h window, 15m slide) value sums. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("c"))

  /** Session windows per user with a 30-minute gap. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("sv"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("user_id"), col("c"), col("sv"))

  /** Exact-once dedup for late/replayed events. Streaming inputs use
    * `dropDuplicatesWithinWatermark` so state is O(events inside the
    * watermark window), not O(stream); batch inputs (where Spark rejects
    * the watermark-bounded variant) use plain `dropDuplicates`, which has
    * identical semantics when the whole input is one "batch".
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream INTERVAL join: each purchase pairs with the same
    * user's clicks in the preceding `within` window (attribution's
    * lookback join). On streaming inputs, watermarks on BOTH sides plus
    * the event-time range condition are what let Spark bound the join
    * state to the watermark horizon — without them a stream-stream join
    * buffers both sides forever, the unbounded-input analogue of the
    * 100 TB failure mode. Inner-join output is eager (the watermark only
    * gates state eviction), so a finite replay emits every pair. The
    * same expression evaluates on batch frames — q105's oracle gate.
    */
  def clickPurchaseJoin(events: DataFrame,
                        within: String = "30 minutes",
                        watermark: String = "2 hours"): DataFrame = {
    def side(tpe: String) = {
      val wm = if (events.isStreaming) events.withWatermark("ts", watermark)
        else events
      wm.filter(col("event_type") === tpe)
    }
    val clicks = side("click").select(col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("event_id").as("click_id"))
    val purchases = side("purchase").select(col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("event_id").as("purchase_id"),
      col("value"))
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $within"))
  }

  /** Stream-static enrichment: join each event against a STATIC
    * dimension table. On a stream Spark re-plans the static side every
    * micro-batch (so a slowly-changing dim refreshes for free) and the
    * explicit broadcast ships it to executors — the event stream itself
    * NEVER shuffles, which is the only sustainable shape when the stream
    * is the 100 TB side. LEFT join: an event must not be dropped because
    * the dimension lags behind (the nulls are the monitoring signal).
    * Same expression evaluates on batch frames — q121's oracle gate.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Snapshot-summary keys recording which micro-batch a streaming-sink
    * snapshot committed — the idempotence ledger replay is checked
    * against. Query id (stable across restarts from one checkpoint, per
    * batch-id numbering scope) disambiguates two different streams
    * feeding one table. */
  private[graft] val BatchIdKey = "graft.streaming.batch-id"
  private[graft] val QueryIdKey = "graft.streaming.query-id"

  /** Commit one micro-batch as an append snapshot IF this (queryId,
    * batchId) has not already committed; returns whether a snapshot was
    * written. `foreachBatch` is at-least-once under failure — Spark
    * replays an interrupted batch after restart-from-checkpoint — so
    * exactly-once requires the sink to be idempotent per batch id: the
    * batch id is recorded in the snapshot summary, and a replay whose id
    * is ≤ the last committed one for the same query is a no-op. (Batch
    * ids are scoped to a checkpoint; the query id in the summary keeps a
    * FRESH checkpoint writing to an existing table from being swallowed
    * by the old checkpoint's ledger.) */
  /** The exactly-once ledger convention, in ONE place: the highest batch
    * id this query ever committed to the table. Scans ALL snapshots
    * (branch commits live in the same snapshot list), so a replay is
    * caught regardless of target ref. */
  private[graft] def lastCommittedBatchId(
      meta: graft.iceberg.TableMetadata, queryId: String): Option[Long] = {
    val qid = Option(queryId).getOrElse("")
    meta.snapshots
      .filter(_.summary.getOrElse(QueryIdKey, "") == qid)
      .flatMap(_.summary.get(BatchIdKey).flatMap(_.toLongOption))
      .maxOption
  }

  private[graft] def commitBatchIfNew(
      batch: DataFrame, tableDir: String, batchId: Long, queryId: String,
      branch: String = "main"): Boolean = {
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val meta = graft.iceberg.TableMetadata.load(tableDir, conf)
    val qid = Option(queryId).getOrElse("")
    if (lastCommittedBatchId(meta, qid).exists(_ >= batchId)) false // replay
    else if (batch.isEmpty) false
    else {
      graft.iceberg.IcebergWriter.append(batch.sparkSession, tableDir, batch.toDF,
        summary = Map(BatchIdKey -> batchId.toString, QueryIdKey -> qid),
        branch = branch)
      true
    }
  }

  /** Stream → Iceberg table: each micro-batch commits ONE append snapshot
    * through the same [[graft.iceberg.IcebergWriter]] protocol batch
    * writes use, so downstream readers get snapshot-isolated, time-
    * travelable increments (and partitioned tables cluster each batch's
    * files by partition value). `foreachBatch` is the idiomatic bridge
    * for a sink whose commit is driver-side metadata around a distributed
    * file write; it is at-least-once on its own, so EXACTLY-ONCE comes
    * from [[commitBatchIfNew]]'s batch-id ledger in the snapshot
    * summaries — a replayed batch finds its id already committed and
    * no-ops instead of double-appending.
    *
    * Caller starts the returned query (`.start()` is NOT called here) so
    * tests/users control trigger and checkpoint placement.
    */
  def icebergSink(stream: DataFrame, tableDir: String,
                  /** Target ref — a WAP staging branch makes the stream's
                    * commits invisible to `main` readers until a
                    * fastForward publishes them (audit-then-publish for
                    * CONTINUOUS ingestion, same convention as batch). */
                  branch: String = "main",
                  /** Fold small-file debt as part of the stream: when a
                    * commit leaves the live data-file count at or above
                    * this, a compaction (`replace`) snapshot follows the
                    * append. A continuous sink writes ≥1 file per batch
                    * forever — without in-stream folding, per-file costs
                    * (footers, task scheduling, manifest entries) grow
                    * without bound. The exactly-once ledger survives
                    * compaction (prior snapshots and their batch-id
                    * summaries stay in the snapshot list), and a rival
                    * commit racing the compaction just wins — the sink
                    * retries on a later batch rather than failing the
                    * stream. 0 = off. */
                  autoCompactMinFiles: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(autoCompactMinFiles == 0 || branch == "main",
      "autoCompactMinFiles compacts the MAIN head — a WAP staging branch " +
        "stays append-only until published; compact after fastForward")
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // foreachBatch runs on the stream-execution thread, where Spark
        // sets the query id as a local property
        val qid = batch.sparkSession.sparkContext.getLocalProperty("sql.streaming.queryId")
        val committed = commitBatchIfNew(batch.toDF, tableDir, batchId, qid, branch)
        if (committed && autoCompactMinFiles > 0) {
          val conf = batch.sparkSession.sessionState.newHadoopConf()
          val t = new graft.iceberg.IcebergTable(tableDir, conf)
          if (t.planFiles().size >= autoCompactMinFiles)
            try { graft.iceberg.IcebergWriter.compact(batch.sparkSession, tableDir); () }
            catch { case _: graft.iceberg.CommitConflictException => () }
        }
        ()
    }
  }

  /** Stream → continuously-fresh MATERIALIZED VIEW: each micro-batch of
    * appended rows folds into a stored Iceberg rollup via
    * [[graft.operators.IncrementalView.refresh]] — the streaming face of
    * the q90 maintenance algebra. The MV table holds
    * `IncrementalView.aggregateState`'s schema (keys, `cnt`, per-sum
    * value + `_nn` non-null count) and is seeded by the caller (CTAS of
    * `aggregateState` over the initial data, or an empty aggregate).
    *
    * Per batch: the delta aggregate folds into the CURRENT stored state
    * (one #groups-sized read — rollups are bounded by group cardinality,
    * not corpus size) and the result commits as ONE overwrite snapshot,
    * so readers only ever see a complete, consistent rollup and time
    * travel addresses every refresh. The arithmetic fold is NOT
    * idempotent, so replay safety cannot ride on MERGE idempotence the
    * way [[icebergUpsertSink]]'s does: EXACTLY-ONCE comes from the same
    * batch-id ledger as [[icebergSink]] (summaries survive overwrites —
    * prior snapshots stay in the list), and a replayed batch no-ops.
    *
    * This pairs with the streaming Iceberg SOURCE: source table appends →
    * micro-batches → this sink, and a 100 TB fact table's rollup stays
    * seconds-fresh for the price of each batch's delta — the full
    * recompute never runs again. (High-cardinality states that make a
    * per-batch overwrite too heavy belong on the MERGE path instead —
    * at the cost of hand-building the arithmetic update.)
    */
  /** The MV sink's per-batch body, factored out so the exactly-once gate
    * is directly testable (the [[icebergSink]]/[[commitBatchIfNew]]
    * discipline): fold `batch` (append rows) into the stored rollup and
    * commit ONE ledgered overwrite snapshot — unless the ledger already
    * records this (queryId, batchId), in which case NOTHING runs (the
    * arithmetic fold is not idempotent; a replayed fold would
    * double-count). Returns whether a commit happened. */
  private[graft] def foldBatchIfNew(
      batch: DataFrame, mvDir: String, keys: Seq[String],
      sums: Seq[(String, String)], batchId: Long, queryId: String): Boolean = {
    // a stream of appends has no change-type column; one that DOES carry
    // _change_type (a changesBetween-shaped CDC feed) must not have its
    // deletes silently relabeled as inserts
    require(!batch.columns.contains("_change_type"),
      "MV sink folds APPEND streams; a _change_type-carrying CDC feed " +
        "would have its deletes relabeled as inserts — fold it with " +
        "IncrementalView.refresh directly")
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val qid = Option(queryId).getOrElse("")
    if (batch.isEmpty) return false
    // A rival commit to the MV table (concurrent compaction, a second
    // stream) conflicts at publish time: reload metadata, re-check the
    // ledger, recompute the fold from the MOVED state, and retry — the
    // same availability discipline as the admission sink below. Bounded
    // attempts, then fail the batch LOUDLY (foreachBatch marks the batch
    // done on return, so a swallowed conflict would silently drop it;
    // the ledger + replay keep correctness either way, this loop keeps
    // the query alive through benign maintenance races).
    val maxAttempts = 3
    var attempt = 0
    while (true) {
      attempt += 1
      val meta = graft.iceberg.TableMetadata.load(mvDir, conf)
      if (lastCommittedBatchId(meta, qid).exists(_ >= batchId)) return false
      val changes = batch.withColumn("_change_type", lit("insert"))
      val state = new graft.iceberg.IcebergTable(mvDir, conf).toDF(spark)
      val next = graft.operators.IncrementalView
        .refresh(state, changes, keys, sums)
      try {
        graft.iceberg.IcebergWriter.overwrite(spark, mvDir, next,
          summary = Map(BatchIdKey -> batchId.toString, QueryIdKey -> qid))
        return true
      } catch {
        case e: graft.iceberg.CommitConflictException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    false // unreachable
  }

  def icebergMvSink(stream: DataFrame, mvDir: String, keys: Seq[String],
                    sums: Seq[(String, String)])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keys.nonEmpty, "MV sink needs at least one group key")
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val qid = batch.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId")
        foldBatchIfNew(batch.toDF, mvDir, keys, sums, batchId, qid)
        ()
    }
  }

  /** Stream → Iceberg UPSERT: each micro-batch MERGEs into the table on
    * `keys` (update matched rows, insert new ones) — the CDC-ingestion
    * sink a training-data pipeline uses to keep a corpus table current
    * from a change feed. Rows are deduplicated per key WITHIN the batch
    * first (latest `versionCol` wins; arbitrary survivor without one) —
    * MERGE refuses multiple source matches per target row, and a change
    * feed routinely carries several versions of one key per batch.
    *
    * The MERGE runs through the same row-level machinery as SQL (group
    * rewrite or merge-on-read delta per `write.merge.mode`), so
    * merge-on-read keeps per-batch write amplification ∝ changed rows.
    * Replay safety is by IDEMPOTENCE, not a ledger: re-merging the same
    * deduplicated batch reproduces the same table state (pure upserts
    * have no order-dependent effects), so at-least-once foreachBatch
    * delivery yields exactly-once table contents.
    *
    * `keys = Nil` (the default) resolves the key set from the target
    * table's declared `identifier-field-ids` (`ALTER TABLE t SET
    * IDENTIFIER FIELDS ...`) — the schema's own statement of row
    * identity, so the CDC feed and the table cannot disagree on it.
    */
  def icebergUpsertSink(stream: DataFrame, tableName: String,
                        keys: Seq[String] = Nil,
                        versionCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    upsertSinkWithKeys(stream, tableName,
      resolveSinkKeys(stream.sparkSession, tableName, keys, "upsert sink"),
      versionCol)
  }

  /** Key resolution shared by the CDC sinks: explicit `keys` win;
    * otherwise the target table's declared identifier fields — the
    * schema's own statement of row identity. */
  private def resolveSinkKeys(spark: SparkSession, tableName: String,
      keys: Seq[String], sinkName: String): Seq[String] =
    if (keys.nonEmpty) keys else {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(tableName)
      val (_, _, t) = graft.iceberg.connector.GraftSqlParser.resolveTable(spark, parts)
      val ids = t.table.metadata.identifierFieldNames
      require(ids.nonEmpty,
        s"$sinkName: no keys given and $tableName declares no identifier " +
          "fields — pass keys explicitly or ALTER TABLE ... SET IDENTIFIER " +
          "FIELDS")
      ids
    }

  /** CDC REPLICATION: apply a changelog stream (`spark.readStream.table
    * ("cat.ns.src.changes")` — insert/delete rows, update halves as
    * their delete+insert pair) to a REPLICA table, keyed on the
    * replica's identifier fields (or explicit `keys`). After every
    * micro-batch the replica equals the source as of the batch's
    * snapshot frontier — offsets are commit-aligned, so batch
    * boundaries never split a commit.
    *
    * Per batch, the NET effect per key is computed first (last change
    * wins: commits ascend by `_change_ordinal`; within one commit the
    * insert half of an update supersedes its delete half), then applied
    * as ONE MERGE: matched+delete → DELETE, matched → UPDATE, unmatched
    * non-delete → INSERT. Replay-safe by idempotence like the upsert
    * sink: net-upserts re-apply to the same state, a net-delete of an
    * absent key is a no-op. `update_before`/`update_after` types (a
    * changesWithUpdates-shaped feed) are honored as delete/insert.
    *
    * 100 TB shape: per-batch work ∝ the window's change volume (one
    * key-partitioned window over the batch + one MERGE through the
    * row-level machinery — merge-on-read keeps write amplification at
    * changed rows); the replica is never rescanned.
    */
  def icebergReplicaSink(changes: DataFrame, tableName: String,
                         keys: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val keysResolved = resolveSinkKeys(changes.sparkSession, tableName, keys,
      "replica sink")
    // _row_id: a changesWithUpdates-shaped feed on a v3 table carries
    // the lineage column — change metadata, never a replica column
    val metaCols = Set("_change_type", "_commit_snapshot_id",
      "_change_ordinal", "_row_id")
    val dataCols = changes.columns.filterNot(metaCols.contains).toSeq
    require(keysResolved.forall(dataCols.contains),
      s"replica sink keys (${keysResolved.mkString(", ")}) must be columns " +
        s"of the change stream (${dataCols.mkString(", ")})")
    changes.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // ONE pass answers both pre-flight questions (emptiness + NULL
        // keys) — these were two separate driver jobs per micro-batch
        val pre = batch.toDF.agg(count(lit(1)),
          count(when(keysResolved.map(col(_).isNull).reduce(_ || _), 1)))
          .collect()(0)
        // PIN large batches once (r21): the carryover group + anti-join,
        // the net-change window, and the MERGE's source each re-execute
        // the window's scans through the RDD bridge — 2-3 window
        // executions per batch (guide §5: cache when reused and
        // recompute is expensive). Below the row bound the pin job costs
        // more than the re-scans (measured at bench scale: the pin
        // regressed q163 ~8%), so tiny windows skip it; at change
        // volumes where the re-scan actually hurts, the count the
        // pre-flight already collected flips the trade. Released in the
        // finally — foreachBatch completes the batch on return.
        val pinned =
          if (pre.getLong(0) >= EventStream.ReplicaPinMinRows)
            Some(batch.toDF.localCheckpoint(true))
          else None
        try {
        if (pre.getLong(0) > 0L) {
          import org.apache.spark.sql.expressions.Window
          val spark = batch.sparkSession
          val isInsert = col("_change_type").isin("insert", "update_after")
          // a NULL key can neither pair nor MERGE-match (NULL never
          // equals NULL): silently keeping an arbitrary one per batch
          // would diverge the replica — fail LOUDLY instead (identifier
          // fields are required per spec; this catches explicit keys on
          // nullable columns and imports violating the declaration)
          if (pre.getLong(1) > 0L) throw new IllegalStateException(
            s"replica sink: batch $batchId carries NULL values in key " +
              s"column(s) ${keysResolved.mkString(", ")} — a NULL key " +
              "cannot be replicated by MERGE; repair the feed or key on " +
              "non-null columns")
          // drop CARRYOVERS first (a delete+insert of IDENTICAL content
          // in the SAME commit — copy-on-write rewrites emit them for
          // every untouched row of a rewritten file): without this the
          // MERGE re-upserts whole rewritten files, making replica write
          // amplification ∝ rewritten files instead of changed rows.
          // Same-content rows with NULLs don't match the using-join and
          // survive as redundant-but-harmless upserts. Map/variant
          // columns cannot be grouping keys, so they compare through a
          // to_json proxy — deterministic for the binary-identical
          // values a rewrite emits on both sides (a false "match" needs
          // every other column equal AND identical JSON rendering, i.e.
          // identical content — dropping it is still correct).
          val bschema = batch.schema
          val proxied = dataCols.filter(c => graft.iceberg.IcebergTable
            .hasUncomparable(bschema(c).dataType))
          val withProxies = proxied.foldLeft(pinned.getOrElse(batch.toDF))(
            (df, c) => df.withColumn(s"__g_cmp_$c", to_json(col(c))))
          val carryKey = Seq("_change_ordinal") ++ dataCols.map(c =>
            if (proxied.contains(c)) s"__g_cmp_$c" else c)
          val carry = withProxies
            .groupBy(carryKey.map(col): _*)
            .agg(org.apache.spark.sql.functions
              .countDistinct(when(isInsert, 1).otherwise(0)).as("__g_nt"))
            .filter(col("__g_nt") === 2).drop("__g_nt")
          val cleaned = withProxies.join(carry, carryKey, "left_anti")
            .drop(proxied.map(c => s"__g_cmp_$c"): _*)
          val net = cleaned
            .withColumn("__g_rn", row_number().over(
              Window.partitionBy(keysResolved.map(col): _*)
                .orderBy(col("_change_ordinal").desc,
                  when(isInsert, 1).otherwise(0).desc)))
            .filter(col("__g_rn") === 1)
            .withColumn("__g_del", !isInsert)
            .select((dataCols.map(col) :+ col("__g_del")): _*)
          val view = "__graft_replica_" + batchId + "_" +
            java.util.UUID.randomUUID().toString.replace("-", "")
          net.createOrReplaceTempView(view)
          try {
            val on = keysResolved.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
            val sets = dataCols.map(c => s"t.`$c` = s.`$c`").mkString(", ")
            val cols = dataCols.map(c => s"`$c`").mkString(", ")
            val vals = dataCols.map(c => s"s.`$c`").mkString(", ")
            spark.sql(
              s"""MERGE INTO $tableName t USING $view s ON $on
                 |WHEN MATCHED AND s.__g_del THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET $sets
                 |WHEN NOT MATCHED AND NOT s.__g_del
                 |  THEN INSERT ($cols) VALUES ($vals)""".stripMargin)
            ()
          } finally { spark.catalog.dropTempView(view); () }
        }
        } finally pinned.foreach(
          graft.iceberg.IcebergTable.unpinLocalCheckpoint)
    }
  }

  private def upsertSinkWithKeys(stream: DataFrame, tableName: String,
                        keys: Seq[String], versionCol: Option[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keys.nonEmpty, "upsert sink needs at least one key column")
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val deduped = versionCol match {
            case Some(v) =>
              import org.apache.spark.sql.expressions.Window
              batch.toDF
                .withColumn("__g_rn", row_number().over(
                  Window.partitionBy(keys.map(col): _*)
                    .orderBy(col(v).desc)))
                .filter(col("__g_rn") === 1).drop("__g_rn")
            case None => batch.toDF.dropDuplicates(keys)
          }
          // Globally unique view name: temp views are SESSION-scoped, so
          // batchId + a table-name hash is not enough — two concurrent
          // upsert streams on one table (or colliding hashes; note
          // math.abs(Int.MinValue) < 0) could clobber each other's view
          // mid-MERGE via createOrReplaceTempView. A per-batch UUID
          // cannot collide across streams.
          val view = "__graft_upsert_" + batchId + "_" +
            java.util.UUID.randomUUID().toString.replace("-", "")
          deduped.createOrReplaceTempView(view)
          try {
            val on = keys.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
            deduped.sparkSession.sql(
              s"""MERGE INTO $tableName t USING $view s ON $on
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
            ()
          } finally {
            deduped.sparkSession.catalog.dropTempView(view); ()
          }
        }
    }
  }

  /** Shared exactly-once two-table publish loop of the admission sinks
    * (LSH and vector): per attempt, check the batch-id ledger, PIN both
    * tables ([[graft.iceberg.PinnedFsCommitter]] — every staged
    * requirement then asserts the snapshot the probe read, so a rival
    * commit landing anywhere between the probe and the publish forces a
    * conflict→recompute instead of being silently built upon, closing
    * the probe-to-publish duplicate-admission race), run `admitFn`
    * against the pinned corpus and index table (returns (kept rows,
    * their index rows), or None when the whole batch was rejected),
    * stage the INDEX append then the ledgered corpus append on the SAME
    * pinned committers, and [[graft.iceberg.Transactions.commitAll]].
    * Empty index-row sets (a full crash-window replay: every posting
    * row already published) stage only the corpus change. Conflicts
    * recompute against fresh pins, bounded, then rethrow LOUDLY —
    * foreachBatch would otherwise mark a swallowed batch done. */
  private def publishAdmitted(s: SparkSession, corpusDir: String,
      indexTableDir: String, batchId: Long, qid: String,
      /** Probe + admission against the two PINNED table instances
        * (corpus, index) — every read inside must go through them so the
        * staged publish's assert-refs verify exactly the snapshots the
        * probe saw. */
      admitFn: (graft.iceberg.IcebergTable, graft.iceberg.IcebergTable) =>
        Option[(DataFrame, DataFrame)]): Unit = {
    val conf = s.sessionState.newHadoopConf()
    val maxAttempts = 3
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val corpusPin = new graft.iceberg.PinnedFsCommitter(corpusDir, conf)
      val indexPin =
        new graft.iceberg.PinnedFsCommitter(indexTableDir, conf)
      val corpusMeta = corpusPin.currentMetadata()
      if (lastCommittedBatchId(corpusMeta, qid).exists(_ >= batchId)) {
        done = true // replayed batch: already committed
      } else {
        val corpusTable = graft.iceberg.IcebergTable
          .fromMetadata(corpusDir, conf, corpusMeta)
        val idxTable = graft.iceberg.IcebergTable
          .fromMetadata(indexTableDir, conf, indexPin.currentMetadata())
        admitFn(corpusTable, idxTable) match {
          case None => done = true // all rejected: nothing to publish
          case Some((kept, idxRows)) =>
            val summary =
              Map(BatchIdKey -> batchId.toString, QueryIdKey -> qid)
            // INDEX first, ledgered corpus last — see the sink scaladocs
            val cIdx =
              if (idxRows.isEmpty) None
              else Some(graft.iceberg.Transactions.stage(indexPin) { c =>
                graft.iceberg.IcebergWriter.append(s, indexTableDir,
                  idxRows, committer = Some(c)); ()
              })
            val cCorpus = graft.iceberg.Transactions.stage(corpusPin) { c =>
              graft.iceberg.IcebergWriter.append(s, corpusDir, kept,
                summary = summary, committer = Some(c)); ()
            }
            try {
              graft.iceberg.Transactions.commitAll(cIdx.toSeq :+ cCorpus)
              done = true
            } catch {
              case e: graft.iceberg.CommitConflictException =>
                // rival moved a table: recompute against fresh pins
                // (never swallow — foreachBatch would mark the batch
                // done and the admissions would be silently lost)
                if (attempt >= maxAttempts) throw e
            }
        }
      }
    }
  }

  /** Streaming corpus ingest with incremental dedup — the complete ingest
    * loop of a growing training corpus: each micro-batch is admitted
    * against the LIVE corpus through its STORED LSH band index
    * ([[graft.operators.Dedup.incrementalAdmission]] — the corpus text is
    * never re-shingled), and the admitted rows plus THEIR index rows
    * publish as ONE multi-table transaction
    * ([[graft.iceberg.Transactions.commitAll]]). Atomicity is load-bearing,
    * not cosmetic: with two separate appends, a crash in between leaves
    * corpus docs with no index rows — permanently invisible to every
    * future probe, i.e. silent duplicate admission from then on.
    *
    * Exactly-once: the batch-id ledger rides the CORPUS table's snapshot
    * summaries (same convention as [[icebergSink]]). The publish ORDER
    * is part of the protocol: the INDEX change is listed first, the
    * ledger-carrying corpus last, so the one crash window the
    * filesystem committer cannot close (between the two pointer moves —
    * see [[graft.iceberg.Transactions.commitAll]]) strands benign
    * orphan INDEX rows: the replay finds no corpus ledger entry,
    * recomputes the same (deterministic) admission, and re-commits —
    * orphan index rows point at ids absent from the corpus, so every
    * future probe's verify join drops them (never a correctness loss),
    * and the replayed publish HEALS them back to one copy (its index
    * append anti-joins ids already present in the batch's own buckets),
    * so crashes do not accrete bloat either. The reverse order would
    * instead strand ledgered corpus rows WITHOUT index rows — docs
    * invisible to all future probes, i.e. permanent duplicate
    * admission. A batch whose rows are ALL rejected publishes nothing —
    * a replay recomputes the same admission and rejects again.
    *
    * A rival commit on either table (maintenance compaction, a second
    * admission stream) conflicts at publish time — and because both
    * tables are PINNED before the probe ([[publishAdmitted]]'s
    * [[graft.iceberg.PinnedFsCommitter]]s), a rival landing even
    * BETWEEN the probe and the publish conflicts too, so an admission
    * computed against pre-rival state can never land (the
    * probe-to-publish duplicate-admission race). The sink then re-pins,
    * recomputes against the fresh state, and re-stages — a bounded
    * number of times, then fails the stream LOUDLY. It never swallows
    * the conflict: `foreachBatch` marks the batch done once this
    * returns, so a swallowed conflict would not be retried — it would
    * silently drop the batch's admissions.
    *
    * The LSH parameters are PINNED in the index table's properties
    * (`graft.lsh.*`): recorded on first contact, refused loudly on any
    * later mismatch — the durable version of the DataFrame-level
    * field-metadata check, which Iceberg schemas cannot carry across a
    * table round-trip.
    */
  def icebergAdmissionSink(stream: DataFrame, corpusDir: String,
                           indexDir: String, idCol: String, textCol: String,
                           numHashes: Int = 32, bands: Int = 8,
                           shingleSize: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val qid = Option(
            s.sparkContext.getLocalProperty("sql.streaming.queryId")).getOrElse("")
          val conf = s.sessionState.newHadoopConf()
          // Durable LSH-parameter pinning: Iceberg schemas cannot carry
          // the DataFrame-level field-metadata self-description across a
          // table round-trip, so the params are pinned in the index
          // table's PROPERTIES — recorded on first contact, REFUSED on
          // mismatch ever after (a mismatched probe silently admits
          // every duplicate; see Dedup.incrementalAdmission).
          val lshProps = Map(
            "graft.lsh.num-hashes" -> numHashes.toString,
            "graft.lsh.bands" -> bands.toString,
            "graft.lsh.shingle-size" -> shingleSize.toString)
          val iMeta = graft.iceberg.TableMetadata.load(indexDir, conf)
          if (iMeta.properties.contains("graft.lsh.bands")) {
            require(lshProps.forall { case (k, v) =>
                iMeta.properties.get(k).contains(v) },
              s"index table $indexDir is pinned to " +
                lshProps.keys.map(k =>
                  s"$k=${iMeta.properties.getOrElse(k, "?")}").mkString(", ") +
                " but the sink was configured with " +
                lshProps.map { case (k, v) => s"$k=$v" }.mkString(", ") +
                " — a mismatched probe would silently admit every duplicate")
          } else {
            val m = new com.fasterxml.jackson.databind.ObjectMapper()
            val upd = m.createObjectNode()
            upd.put("action", "set-properties")
            val u = upd.putObject("updates")
            lshProps.foreach { case (k, v) => u.put(k, v) }
            // racing streams write identical values; a loser just
            // validates against the winner's pin on its next batch
            try new graft.iceberg.FsCommitter(indexDir, conf).commit(
              Seq(graft.iceberg.MetadataCommit.assertRefSnapshotId(m, "main",
                iMeta.currentSnapshotId.filter(_ != -1L))),
              Seq(upd))
            catch { case _: graft.iceberg.CommitConflictException => () }
          }
          publishAdmitted(s, corpusDir, indexDir, batchId, qid,
            (corpusTable, idxTable) => {
              // ONE pinned table instance serves both the full-index DF
              // and the pruned probe: both reads resolve the SAME
              // snapshot, and the staged publish asserts it.
              val corpus = graft.iceberg.connector.RuntimeProbe
                .dsv2Read(s, corpusTable)
              val index = idxTable.toDF(s)
              // Storage-pruned probe: the batch's band_hash keys feed a
              // runtime filter on the index scan, so an index table
              // partitioned by bucket[N](band_hash) file-prunes the
              // per-batch read (IO ∝ batch, not corpus) with no driver
              // key collect. Unpartitioned indexes just skip pruning —
              // the probe's semi-join keeps results identical either way.
              val prunedIndex = (keys: DataFrame) =>
                graft.iceberg.connector.RuntimeProbe
                  .prunedByKeys(s, idxTable, "band_hash", keys)
              // the admitted set is pinned (checkpointed band index +
              // deterministic flags), so both appends see the IDENTICAL
              // result; the batch band index is reused for the index
              // append instead of re-running the minhash pipeline
              val (adm, bIdx) = graft.operators.Dedup
                .incrementalAdmissionWithIndex(
                  index, corpus, batch.toDF, idCol, textCol,
                  numHashes, bands, shingleSize,
                  prunedCorpusIndex = Some(prunedIndex))
              val kept = adm.filter(col("keep"))
                .drop("dup_of_corpus", "batch_dup", "keep")
                .localCheckpoint(true)
              if (kept.isEmpty) None
              else {
                val keptIdx = bIdx.join(
                  kept.select(col(idCol)), Seq(idCol), "left_semi")
                // Replay hygiene (crash window, same shape as the vector
                // sink): a crashed prior attempt may have published these
                // index rows already — duplicates are correctness-benign
                // here (candidate pairs are distinct()-ed before verify)
                // but bloat the index once per crash. Identical text →
                // identical band hashes, so the pruned read of the
                // batch's own buckets sees any orphan twin; drop ids
                // already indexed (same-id rows can only be that orphan
                // under the stream's id-uniqueness contract).
                val existing = prunedIndex(keptIdx.select(col("band_hash")))
                Some((kept, keptIdx.join(
                  existing.select(col(idCol)), Seq(idCol), "left_anti")))
              }
            })
        }
    }

  /** Streaming VECTOR corpus ingest with incremental ANN dedup — the
    * embedding twin of [[icebergAdmissionSink]]: each micro-batch of
    * (id, vector) rows is admitted against the LIVE corpus through its
    * STORED IVF index ([[graft.operators.VectorIndex.admit]] — map-side
    * assignment vs the broadcast stored centroids, corpus read = the
    * runtime-filter-pruned posting partitions the batch touches), and the admitted
    * rows plus THEIR posting rows publish as ONE multi-table transaction
    * ([[graft.iceberg.Transactions.commitAll]]).
    *
    * Same publish protocol as the LSH sink, same reasoning: INDEX
    * first, ledger-carrying corpus last, so the one crash window the
    * filesystem committer cannot close strands benign orphan POSTING
    * rows. For vectors that benignity is NOT free — [[VectorIndex.admit]]
    * verifies candidates against the posting row's own stored vector,
    * so an orphan WOULD falsely reject its twin on replay (losing the
    * row from the corpus forever). The sink therefore passes the corpus
    * table as `corpusAnchor`: a posting row only counts as a duplicate
    * if its id exists in the corpus (a candidate-bounded In-pruned
    * check, never an O(corpus) join), which makes orphans exactly as
    * benign as the LSH sink's text-verify join makes its own. The
    * replayed publish then SKIPS re-appending posting rows whose ids
    * already exist in the batch's own cells, so an orphan is healed
    * into the normal one-copy state rather than duplicated — topK ranks
    * every posting row, so duplicate rows would surface as duplicate
    * ranks.
    *
    * No parameter pinning is needed (unlike the LSH sink's
    * `graft.lsh.*` properties): the stored centroid table IS the
    * quantizer — every probe and every append reads it, so batch and
    * corpus can never disagree on routing.
    *
    * Exactly-once and rival-commit handling come from the shared
    * [[publishAdmitted]] loop: batch-id ledger in the CORPUS table's
    * snapshot summaries, both tables PINNED before the probe so a rival
    * landing anywhere before the publish forces a recompute (bounded,
    * then a LOUD stream failure — never a swallowed conflict). */
  def icebergVectorAdmissionSink(stream: DataFrame, corpusDir: String,
                                 indexDir: String,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val qid = Option(
            s.sparkContext.getLocalProperty("sql.streaming.queryId")).getOrElse("")
          publishAdmitted(s, corpusDir, s"$indexDir/postings", batchId, qid,
            (corpusTable, postingsTable) => {
              // the admitted set is pinned (checkpointed assignment +
              // deterministic flags), so both appends see the IDENTICAL
              // result; the assignment is reused for the posting append
              // instead of re-running it. The PINNED postings table is
              // threaded into the probe (and the anchor is a DSv2 read
              // of the pinned corpus, so the candidate-id check is
              // runtime-file-pruned): probe, anchor, replay hygiene and
              // staged append all see the snapshots the publish asserts.
              val (adm, asg) = graft.operators.VectorIndex
                .admitWithAssignment(s, indexDir, batch.toDF, idCol, vecCol,
                  corpusAnchor = Some(graft.iceberg.connector.RuntimeProbe
                    .dsv2Read(s, corpusTable)),
                  pinnedPostings = Some(postingsTable))
              val kept = adm.filter(col("keep"))
                .drop("dup_of_corpus", "batch_dup", "keep")
                .localCheckpoint(true)
              if (kept.isEmpty) None
              else {
                val keptAsg = asg.join(
                  kept.select(col(idCol).as("n_id")), Seq("n_id"), "left_semi")
                // Replay hygiene: a crashed prior attempt may have
                // PUBLISHED these very posting rows (the orphans the
                // anchor just neutralized) — appending again would leave
                // permanent duplicate posting rows, and topK ranks each
                // copy (no per-id dedup in the kernel). An identical
                // vector assigns to the identical cell, so the In-pruned
                // read of the batch's own cells sees any orphan twin;
                // drop ids that already have posting rows. Under the
                // stream's id-uniqueness contract a same-id posting row
                // can only be that orphan.
                val existing = graft.iceberg.connector.RuntimeProbe
                  .prunedByKeys(s, postingsTable, "c_id",
                    keptAsg.select(col("c_id")))
                Some((kept, keptAsg.join(existing.select(col("n_id")),
                  Seq("n_id"), "left_anti")))
              }
            })
        }
    }

  /** Read the events parquet directory as a stream (file source), with the
    * same nanos→micros ts normalization as the batch loader.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema =
      try spark.read.parquet(s"$dir/events.parquet").schema
      catch {
        case e: Exception if Option(e.getMessage)
            .exists(_.contains("PARQUET_TYPE_ILLEGAL")) =>
          throw new IllegalArgumentException(
            "events.parquet carries TIMESTAMP(NANOS): set " +
              "spark.sql.legacy.parquet.nanosAsLong=true on the " +
              "SparkSession builder", e)
      }
    // FileStreamSource requires a directory or glob; `[e]` makes the path a
    // glob matching exactly events.parquet, with basePath = the directory.
    val raw = spark.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
