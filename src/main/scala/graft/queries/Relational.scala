package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The declared relational surface (SURVEY.md §2.B, Q1–Q33): everything the
  * reference exposes through its embedded DataFusion SQL engine, re-expressed
  * with the Spark DataFrame API so Catalyst owns pushdown / join selection /
  * whole-stage codegen. Small dimension tables (region, nation, supplier at
  * these scale factors) are explicitly broadcast — at 100 TB the fact tables
  * shuffle on their join keys and the dims ship to every executor.
  *
  * Every query fixes a total output order (all columns or a unique key, with
  * explicit NULLS FIRST/LAST) and rounds double aggregates, per SURVEY §5.3,
  * so results hash-match the DuckDB oracle.
  */
object Relational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / sources ------------------------------------------------
    "q1_scan_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))),

    "q3_view" -> ((s, d) => {
      // SQL-view-as-source (reference table.rs:102-112): register the view,
      // then query it; Spark's analyzer inlines the view plan so outer
      // filters/projections push through, same as the reference's re-plan.
      t(s, d, "orders")
        .filter(col("o_totalprice") > 100000)
        .select(col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView("big_orders")
      s.table("big_orders").agg(
        count(lit(1)).as("n"),
        min(col("o_custkey")).as("mn"),
        max(col("o_custkey")).as("mx"))
    }),

    // ---- projection / filter / predicates -------------------------------
    "q4_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey").asc_nulls_first,
                 col("l_linenumber").asc_nulls_first)
        .limit(100)),

    "q5_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 25)
        .agg(count(lit(1)).as("n"))),

    "q6_predicates" -> ((s, d) =>
      t(s, d, "orders")
        .filter((col("o_orderstatus") === "F" || col("o_orderstatus") === "O")
          && col("o_orderkey").between(100, 900)
          && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_custkey").isNotNull
          && col("o_orderpriority").like("%H%"))
        .agg(count(lit(1)).as("n"))),

    // ---- joins -----------------------------------------------------------
    "q7_join_inner" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("c"))
        .orderBy(col("n_name").asc_nulls_first)),

    "q8_join_multiway" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("c"))
        .orderBy(col("r_name").asc_nulls_first)),

    "q9_join_left" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("c"))
        .orderBy(col("c_custkey").asc_nulls_first)
        .limit(50)),

    "q10_join_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))),

    "q11_join_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),

    "q12_join_cross" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .agg(count(lit(1)).as("n"))),

    "q13_join_theta" -> ((s, d) => {
      val sup = t(s, d, "supplier")
      val cus = t(s, d, "customer")
      // Non-equi conjunct rides on the equi key, so Catalyst still plans a
      // hash join (equi keys) with the inequality as a post-join condition —
      // no O(n*m) nested loop at scale.
      sup.join(cus, sup("s_nationkey") === cus("c_nationkey")
          && sup("s_acctbal") > cus("c_acctbal"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- aggregations ----------------------------------------------------
    "q14_agg_tpch1" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("bigint")).as("sq"),
          count(lit(1)).as("c"),
          round(sum(col("l_extendedprice")), 2).as("sep"),
          round(avg(col("l_discount")), 6).as("ad"),
          min(col("l_orderkey")).as("mn"),
          max(col("l_orderkey")).as("mx"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    "q15_count_distinct" -> ((s, d) =>
      t(s, d, "orders").agg(countDistinct(col("o_custkey")).as("n"))),

    "q16_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first,
                 col("c").asc_nulls_first)),

    "q17_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first,
                 col("c").asc_nulls_first)),

    "q18_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
        .orderBy(col("o_custkey").asc_nulls_first)),

    // ---- window functions ------------------------------------------------
    "q19_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 2)
        .orderBy(col("o_custkey").asc_nulls_first, col("rn").asc_nulls_first)
    }),

    "q20_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
                lag(col("o_orderkey"), 1).over(w).as("prev_ok"))
        .orderBy(col("o_custkey").asc_nulls_first,
                 col("o_orderkey").asc_nulls_first)
        .limit(100)
    }),

    "q21_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"),
                round(sum(col("o_totalprice")).over(w), 2).as("w"))
        .orderBy(col("o_orderkey").asc_nulls_first)
        .limit(100)
    }),

    // ---- sort / limit / top-k -------------------------------------------
    "q22_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc_nulls_last,
                 col("o_orderkey").asc_nulls_first)
        .limit(25)),

    // ---- set operations --------------------------------------------------
    "q23_union" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy(col("k").asc_nulls_first)),

    "q24_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k").asc_nulls_first)),

    "q25_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k").asc_nulls_first)),

    // ---- scalar functions ------------------------------------------------
    "q26_strings" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("u"),
          substring(col("c_name"), 1, 8).as("s8"),
          length(col("c_name")).cast("bigint").as("ln"),
          regexp_replace(col("c_mktsegment"), "A", "_").as("rp"))
        .orderBy(col("c_custkey").asc_nulls_first)
        .limit(50)),

    "q27_datetime_extract" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("bigint").as("y"),
                 month(col("o_orderdate")).cast("bigint").as("m"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("y").asc_nulls_first, col("m").asc_nulls_first)),

    "q28_date_trunc" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("mo"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("mo").asc_nulls_first)),

    "q29_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_orderkey").asc_nulls_first,
                 col("l_linenumber").asc_nulls_first)
        .limit(100)
        .select(
          col("l_orderkey"),
          (abs(col("l_discount") - 0.05) > 0.001).as("far"),
          round(col("l_extendedprice") / (lit(1.0) + col("l_tax")), 2)
            .as("net"),
          floor(col("l_quantity")).as("fq"),
          (col("l_orderkey") % 7).as("m7"))),

    "q30_conditional" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 150000, "big")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("F")), lit("final"))
            .as("st"))
        .orderBy(col("o_orderkey").asc_nulls_first)
        .limit(100)),

    // ---- array / json ----------------------------------------------------
    "q31_array_size" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), size(col("embedding")).cast("bigint").as("d"))
        .orderBy(col("vec_id").asc_nulls_first)
        .limit(20)),

    "q32_json" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("k").asc_nulls_first)),

    // ---- events hourly (batch form of the streaming pipeline) -----------
    "q33_events_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("sv"))
        .orderBy(col("h").asc_nulls_first,
                 col("event_type").asc_nulls_first)),

    // Batch face of the stream-stream interval join (EventStream
    // .clickPurchaseJoin): purchases attributed to the same user's
    // clicks in the preceding 30 minutes. StreamingSpec proves the
    // streaming plan (watermarked both sides, state bounded) emits the
    // identical pairs; this gate proves the pairs themselves.
    "q105_interval_join" -> ((s, d) => {
      graft.streaming.EventStream.clickPurchaseJoin(t(s, d, "events"))
        .groupBy(col("p_user").as("user_id"))
        .agg(count(lit(1)).as("pairs"), round(sum(col("value")), 2).as("sv"))
        .select(col("user_id"), col("pairs"), col("sv"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // Batch face of stream-static enrichment (EventStream.enrichWithDim):
    // events broadcast-join a dimension keyed on the user; unmatched
    // events keep a null segment (LEFT — the stream must not lose
    // events when the dim lags). StreamingSpec proves the streaming
    // plan emits the identical enriched rows.
    "q121_stream_enrich" -> ((s, d) => {
      graft.streaming.EventStream.enrichWithDim(
          t(s, d, "events"),
          t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
          "user_id", "c_custkey")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .orderBy(col("segment").asc_nulls_first)
    }),

    // Ordered funnel (view → click → purchase, each stage strictly after
    // the previous): three grouped aggregates chained by per-user
    // timestamps — every stage is one partial-merged pass over events,
    // never a per-user subquery. The product-analytics staple.
    "q125_funnel" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("e_q125")
      s.sql(
        """WITH u AS (SELECT user_id,
          |             MIN(CASE WHEN event_type = 'view' THEN ts END) AS v
          |           FROM e_q125 GROUP BY user_id),
          |c AS (SELECT e.user_id, MIN(e.ts) AS c
          |      FROM e_q125 e JOIN u ON e.user_id = u.user_id
          |      WHERE e.event_type = 'click' AND e.ts > u.v
          |      GROUP BY e.user_id),
          |p AS (SELECT e.user_id, MIN(e.ts) AS p
          |      FROM e_q125 e JOIN c ON e.user_id = c.user_id
          |      WHERE e.event_type = 'purchase' AND e.ts > c.c
          |      GROUP BY e.user_id)
          |SELECT (SELECT COUNT(*) FROM u WHERE v IS NOT NULL) AS n_view,
          |       (SELECT COUNT(*) FROM c) AS n_click,
          |       (SELECT COUNT(*) FROM p) AS n_purchase""".stripMargin)
    }),

    // Cohort retention: users grouped by first-seen week, distinct
    // activity counted per (cohort, week offset) — the other analytics
    // staple. Two aggregates + one join; offsets derive from
    // week-truncated timestamps so the arithmetic is exact.
    "q126_cohorts" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("e_q126")
      s.sql(
        """WITH fs AS (SELECT user_id,
          |              CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort
          |            FROM e_q126 GROUP BY user_id)
          |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
          |       CAST(DATEDIFF(CAST(DATE_TRUNC('week', e.ts) AS DATE),
          |                     f.cohort) / 7 AS BIGINT) AS wk,
          |       COUNT(DISTINCT e.user_id) AS active_users
          |FROM e_q126 e JOIN fs f ON e.user_id = f.user_id
          |GROUP BY f.cohort, wk
          |ORDER BY cohort, wk""".stripMargin)
    }),

    // Window navigation family: first/last/nth_value + IGNORE NULLS
    // (the "carry the last known good value" idiom). One window
    // exchange; last_value needs the full-partition frame explicitly —
    // the default frame's "last" is just the current row.
    "q127_window_nav" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("o_q127")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
          |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderkey
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |    AS last_ok,
          |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ok,
          |  FIRST_VALUE(CASE WHEN o_totalprice > 150000 THEN o_orderkey END)
          |    IGNORE NULLS OVER w AS first_big
          |FROM o_q127
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
          |ORDER BY o_custkey, o_orderkey LIMIT 300""".stripMargin)
    }),

    // Spark 4 VARIANT: semi-structured values parsed ONCE into the
    // binary variant encoding, then typed paths extracted without
    // re-parsing — the modern replacement for per-access JSON string
    // parsing (q32's shape). At 100 TB the parse happens a single time
    // per row instead of once per extracted field.
    "q131_variant" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("e_q131")
      s.sql(
        """SELECT k, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
          |FROM (SELECT CAST(variant_get(parse_json(props), '$.k', 'int')
          |             AS BIGINT) AS k, value
          |      FROM e_q131)
          |GROUP BY k ORDER BY k ASC NULLS FIRST""".stripMargin)
    }),

    // One-pass column profiling (operators/Profiler): every per-column
    // metric from ONE aggregate over the table — never a job per column.
    "q129_profile" -> ((s, d) =>
      graft.operators.Profiler.profile(
          t(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"))
        .orderBy(col("col_name").asc)),

    // Per-group z-score outlier counts: two chained aggregates (moments,
    // then the 3-sigma gate) — the monitoring primitive over a metric
    // stream.
    "q130_outliers" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("e_q130")
      // m/sd ROUNDED before the gate: the engines' partial-aggregated
      // moments differ in the last ulps, so an unrounded 3-sigma
      // comparison could flip a boundary event between engines. With
      // identical (rounded) m and sd on both sides, the per-row
      // comparison arithmetic is bit-identical IEEE — the float-ulp
      // discipline every gate in this file follows.
      s.sql(
        """WITH s AS (SELECT event_type, ROUND(AVG(value), 4) AS m,
          |                  ROUND(STDDEV_POP(value), 4) AS sd
          |           FROM e_q130 GROUP BY event_type)
          |SELECT e.event_type, COUNT(*) AS n,
          |       COUNT_IF(ABS(e.value - s.m) > 3 * s.sd) AS n_outliers
          |FROM e_q130 e JOIN s ON e.event_type = s.event_type
          |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
    }),

    // Modern aggregate surface: count_if / bool_and / bool_or / mode /
    // max_by — all partial-mergeable single-pass aggregates (the same
    // 100 TB plan class as SUM). mode and max_by are deterministic on
    // this data (unique winners, pinned by the oracle hash).
    "q122_agg_extras" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("o_q122")
      // top_prio is a DETERMINISTIC mode: engines break mode() ties
      // arbitrarily (Spark picked '4-NOT SPECIFIED', DuckDB '2-HIGH' on
      // a tied group at sf0.001), so the winner is encoded as
      // max(zero-padded count || value) — highest count, ties to the
      // lexicographically greatest value, identical in any engine and
      // still one partial-mergeable aggregate over the count rollup.
      s.sql(
        """WITH pc AS (
          |  SELECT o_orderstatus, o_orderpriority AS p, COUNT(*) AS c
          |  FROM o_q122 GROUP BY o_orderstatus, o_orderpriority
          |), m AS (
          |  SELECT o_orderstatus,
          |         SUBSTR(MAX(LPAD(CAST(c AS STRING), 10, '0') || p), 11)
          |           AS top_prio
          |  FROM pc GROUP BY o_orderstatus
          |)
          |SELECT a.o_orderstatus, a.n_big, a.all_pos, a.any_urgent,
          |       m.top_prio, a.key_of_max
          |FROM (SELECT o_orderstatus,
          |             COUNT_IF(o_totalprice > 100000) AS n_big,
          |             BOOL_AND(o_totalprice > 0) AS all_pos,
          |             BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
          |             MAX_BY(o_orderkey, o_totalprice) AS key_of_max
          |      FROM o_q122 GROUP BY o_orderstatus) a
          |JOIN m ON a.o_orderstatus = m.o_orderstatus
          |ORDER BY a.o_orderstatus""".stripMargin)
    }),

    // GROUP BY ALL / ORDER BY ALL — the modern shorthand both engines
    // resolve to every non-aggregate select item; same plan as spelling
    // the keys out (one partial-merged aggregate, one exchange)
    "q133_groupby_all" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("o_q133")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |       CAST(SUM(o_custkey) AS BIGINT) AS sc
          |FROM o_q133 WHERE o_totalprice > 150000
          |GROUP BY ALL ORDER BY ALL""".stripMargin)
    }),

    // EXCEPT ALL / INTERSECT ALL — bag semantics (multiplicities
    // subtract / take the min), which DISTINCT set ops destroy; Spark
    // plans both as a single hash aggregate over tagged counts, no join
    "q134_setops_all" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("o_q134")
      s.sql(
        """WITH a AS (SELECT o_custkey AS k FROM o_q134
          |           WHERE o_totalprice > 120000),
          |     b AS (SELECT o_custkey AS k FROM o_q134
          |           WHERE o_orderstatus = 'F')
          |SELECT op, k, COUNT(*) AS n FROM (
          |  SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT ALL
          |                                 SELECT k FROM b)
          |  UNION ALL
          |  SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT ALL
          |                                    SELECT k FROM b)
          |) GROUP BY op, k ORDER BY op, k""".stripMargin)
    }),

    // array higher-order functions over the embedding column — transform
    // / filter / sort / element access, all map-side. Values go through
    // FLOOR(double * 1000) integer space: float→double widening is
    // exact and floor has no round-half ambiguity, so both engines agree
    // bit-for-bit (same discipline as DSIR/TF-IDF integer scoring).
    "q135_array_hof" -> ((s, d) => {
      t(s, d, "embeddings").createOrReplaceTempView("e_q135")
      s.sql(
        """SELECT vec_id,
          |  CAST(aggregate(
          |    transform(embedding,
          |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
          |    0L, (a, x) -> a + x) AS BIGINT) AS s_scaled,
          |  size(filter(embedding, x -> x > 0)) AS n_pos,
          |  element_at(array_sort(transform(embedding,
          |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))), 1)
          |    AS mn_scaled
          |FROM e_q135 WHERE vec_id < 500 ORDER BY vec_id""".stripMargin)
    }),

    // ordered string aggregation (listagg WITHIN GROUP) — the canonical
    // "names per group" report; explicit ORDER BY inside the aggregate
    // keeps it deterministic across engines and partitionings
    "q136_listagg" -> ((s, d) => {
      t(s, d, "nation").createOrReplaceTempView("n_q136")
      s.sql(
        """SELECT n_regionkey,
          |       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
          |         AS names
          |FROM n_q136 GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // regexp family over document text — extract-all counts and group
    // capture, map-side codegen'd; the shapes every text pipeline's
    // structure mining starts from
    "q137_regexp" -> ((s, d) => {
      t(s, d, "documents").createOrReplaceTempView("d_q137")
      s.sql(
        """SELECT doc_id,
          |  size(regexp_extract_all(text, '[A-Za-z]+', 0)) AS n_words,
          |  size(regexp_extract_all(text, '[0-9]+', 0)) AS n_nums,
          |  regexp_extract(text, '([A-Za-z]{6,})', 1) AS first_long_word
          |FROM d_q137 WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)
    }),

    // time-series gap fill: per-user daily counts over a generated date
    // spine (missing days materialize as zeros) plus last-observation-
    // carried-forward via LAST_VALUE IGNORE NULLS. The spine is
    // sequence+explode over driver-bounded min/max dates — row count =
    // users × days, never a data-sized blowup; the join against real
    // observations is the only shuffle.
    "q140_gapfill" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("e_q140")
      s.sql(
        """WITH daily AS (
          |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n,
          |         CAST(FLOOR(MAX(value) * 100) AS BIGINT) AS mx
          |  FROM e_q140 WHERE user_id < 20
          |  GROUP BY user_id, CAST(ts AS DATE)
          |), bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
          |spine AS (
          |  SELECT u.user_id, s.dd AS d
          |  FROM (SELECT DISTINCT user_id FROM daily) u
          |  CROSS JOIN (SELECT explode(sequence(lo, hi, interval 1 day)) AS dd
          |              FROM bounds) s
          |)
          |SELECT s.user_id, s.d, COALESCE(daily.n, 0) AS n,
          |       LAST_VALUE(daily.mx) IGNORE NULLS OVER (
          |         PARTITION BY s.user_id ORDER BY s.d
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
          |FROM spine s
          |LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
          |ORDER BY s.user_id, s.d""".stripMargin)
    }),

    // ---- classic TPC-H multi-join shapes (the read-heavy benchmark
    // plans: selective dim filters + fact-fact joins + top-k). At scale
    // the plan is what matters: segment/date filters push to the scans,
    // the aggregate is partial before the final shuffle, and the top-k
    // is a TakeOrdered, never a global sort.
    "q76_tpch3" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") < to_timestamp(lit("1997-06-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem")
            .filter(col("l_shipdate") > to_timestamp(lit("1997-06-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc_nulls_first,
          col("l_orderkey").asc_nulls_first)
        .limit(10)),

    "q77_tpch5" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc_nulls_first)),

    // TPC-H Q6 (forecast revenue change): the purest scan-heavy shape —
    // all three predicates push to the parquet scan, the aggregate is
    // one partial-merged pass, zero joins, zero wide shuffles. Money in
    // per-row integer cents for engine-exact sums.
    "q148_tpch6" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 100)
            .cast("bigint")).as("revenue_cents"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q14 (promotion effect): lineitem ⋈ part with a conditional
    // aggregate — part is the broadcast side. The promotion ratio is
    // emitted as integer basis points via integer division (DIV) so the
    // output carries no floating-point column at all: both sums are
    // positive, so truncating DIV matches DuckDB's // floor division.
    "q149_tpch14" -> ((s, d) => {
      val disc = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100).cast("bigint")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-10-01")))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0L)))
            .as("promo_cents"),
          sum(disc).as("total_cents"))
        .selectExpr("promo_cents", "total_cents",
          "CAST(promo_cents * 10000 DIV total_cents AS BIGINT) AS promo_bp")
    }),

    // TPC-H Q19 (discounted revenue): the classic OR-of-brackets join
    // predicate — Catalyst pushes the common l_partkey = p_partkey
    // equi-condition into the join key and evaluates the bracket
    // disjunction as a post-join filter; part stays broadcast.
    "q150_tpch19" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val pt = t(s, d, "part")
      val bracket =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .filter(bracket)
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("bigint")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q10 (returned-item reporting): three-way join + top-20 by
    // revenue — the shuffle lands on the customer grouping, nation rides
    // broadcast, and the top-k is a TakeOrdered, not a full sort.
    "q151_tpch10" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1996-07-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("bigint")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey").asc_nulls_first)
        .limit(20)),

    // TPC-H Q7 (volume shipping): supplier-nation × customer-nation
    // pairs across a year split — two broadcast nation joins under
    // DIFFERENT aliases, grouped by (n1, n2, year).
    "q152_tpch7" -> ((s, d) => {
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, d, "supplier")
        .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("bigint")).as("volume_cents"))
        .orderBy(col("supp_nation").asc_nulls_first,
          col("cust_nation").asc_nulls_first, col("l_year").asc_nulls_first)
    }),

    // Correlated SCALAR subquery (TPC-H Q17 shape): per-part average
    // quantity threshold. Catalyst decorrelates the inner aggregate into
    // a grouped join (`RewriteCorrelatedScalarSubquery`) — at 100 TB the
    // plan is one partial-aggregated pass over lineitem plus a broadcast
    // of the filtered part side, never a per-row re-scan.
    "q101_subquery_scalar" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_q101")
      t(s, d, "part").createOrReplaceTempView("p_q101")
      s.sql(
        """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
          |FROM li_q101 JOIN p_q101 ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#23' AND p_size < 10
          |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
          |                    FROM li_q101 l2
          |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
    }),

    // Correlated EXISTS with an extra inner predicate (TPC-H Q4 shape):
    // decorrelates to a left-semi join on the order key.
    "q102_subquery_exists" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("o_q102")
      t(s, d, "lineitem").createOrReplaceTempView("li_q102")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM o_q102
          |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          |  AND o_orderdate < TIMESTAMP '1996-10-01'
          |  AND EXISTS (SELECT 1 FROM li_q102
          |              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // GROUPING SETS with GROUPING() disambiguation — the general form
    // rollup/cube (Q16/Q17) are sugar for; one Expand + one aggregate.
    "q103_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_q103")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g1,
          |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
          |       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
          |FROM li_q103
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_returnflag), ())
          |ORDER BY g1, g2, l_returnflag NULLS FIRST,
          |         l_linestatus NULLS FIRST""".stripMargin)
    }),

    // UNPIVOT: wide measure columns to (metric, value) rows — the
    // relational transpose a metrics store needs before a generic
    // per-metric aggregate; stays a single-pass Expand, no shuffle
    // beyond the final aggregate.
    "q104_unpivot" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_q104")
      s.sql(
        """SELECT metric, COUNT(*) AS n, ROUND(SUM(val), 2) AS total
          |FROM li_q104
          |UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
          |GROUP BY metric ORDER BY metric""".stripMargin)
    }),

    // PIVOT (the UNPIVOT inverse): one categorical column fans out to
    // one count column per pinned value. Explicit value list keeps the
    // output schema static — the dynamic form would need a driver-side
    // distinct pass over 100 TB before planning could even start.
    "q107_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .select(col("o_orderpriority"), col("F").as("st_f"),
                col("O").as("st_o"), col("P").as("st_p"))
        .orderBy(col("o_orderpriority").asc_nulls_first)),

    // IN-subquery over a grouped HAVING (TPC-H Q18, large-volume
    // customer): Catalyst plans the inner aggregate once and
    // left-semi-joins it against orders — one extra pass over lineitem,
    // not a per-row membership probe.
    "q108_tpch18" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("c_q108")
      t(s, d, "orders").createOrReplaceTempView("o_q108")
      t(s, d, "lineitem").createOrReplaceTempView("li_q108")
      s.sql(
        """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
          |       ROUND(SUM(l_quantity), 2) AS total_qty
          |FROM c_q108
          |JOIN o_q108 ON c_custkey = o_custkey
          |JOIN li_q108 ON o_orderkey = l_orderkey
          |WHERE o_orderkey IN (SELECT l_orderkey FROM li_q108
          |                     GROUP BY l_orderkey
          |                     HAVING SUM(l_quantity) > 250)
          |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
    }),

    // Correlated EXISTS + NOT EXISTS on the same relation (TPC-H Q21
    // shape, adapted to this schema: 'R' lines stand in for late
    // receipts): both decorrelate — a left-semi and a left-anti join on
    // the order key — so lineitem is scanned a bounded number of times
    // regardless of row count.
    "q109_exists_anti" -> ((s, d) => {
      t(s, d, "supplier").createOrReplaceTempView("s_q109")
      t(s, d, "orders").createOrReplaceTempView("o_q109")
      t(s, d, "lineitem").createOrReplaceTempView("li_q109")
      s.sql(
        """SELECT s_name, COUNT(*) AS numwait
          |FROM s_q109
          |JOIN li_q109 l1 ON s_suppkey = l1.l_suppkey
          |JOIN o_q109 ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM li_q109 l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM li_q109 l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name LIMIT 50""".stripMargin)
    }),

    // LATERAL correlated subquery: a per-outer-row derived table.
    // Catalyst decorrelates the aggregate into a grouped join under
    // the hood (DecorrelateInnerQuery) — nation is tiny and broadcasts;
    // the customer side aggregates once, never once per nation.
    "q110_lateral" -> ((s, d) => {
      t(s, d, "nation").createOrReplaceTempView("n_q110")
      t(s, d, "customer").createOrReplaceTempView("c_q110")
      s.sql(
        """SELECT n_name, ROUND(t.mx_bal, 2) AS mx_bal, t.n_cust
          |FROM n_q110,
          |LATERAL (SELECT MAX(c_acctbal) AS mx_bal, COUNT(*) AS n_cust
          |         FROM c_q110 WHERE c_nationkey = n_nationkey) t
          |ORDER BY n_name ASC NULLS FIRST""".stripMargin)
    }),

    // Rank-family windows beyond row_number: ntile quartiles,
    // percent_rank, cume_dist — one window exchange serves all three
    // (same partitioning + ordering), deterministic via the unique
    // (acctbal, custkey) sort.
    "q111_window_stats" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("c_q111")
      s.sql(
        """SELECT c_custkey, c_nationkey,
          |       CAST(NTILE(4) OVER w AS BIGINT) AS q4,
          |       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
          |       ROUND(CUME_DIST() OVER w, 6) AS cd
          |FROM c_q111
          |WINDOW w AS (PARTITION BY c_nationkey
          |             ORDER BY c_acctbal, c_custkey)
          |ORDER BY c_nationkey, c_custkey LIMIT 200""".stripMargin)
    }),

    // Statistical aggregates (corr / covariance / stddev / variance):
    // all single-pass partial-mergeable moments — the 100 TB plan is
    // the same partial/final hash aggregate as a SUM.
    "q112_stat_aggs" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_q112")
      s.sql(
        """SELECT l_returnflag,
          |       ROUND(CORR(l_extendedprice, l_quantity), 6) AS r,
          |       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS cs,
          |       ROUND(COVAR_POP(l_extendedprice, l_quantity), 2) AS cp,
          |       ROUND(STDDEV_SAMP(l_discount), 6) AS sd,
          |       ROUND(VAR_POP(l_discount), 6) AS vp
          |FROM li_q112 GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // Recursive CTE: gap-filled month spine between the corpus's first
    // and last order month, LEFT JOINed to per-month counts — the
    // canonical "report every month even the empty ones" series. The
    // ANCHOR computes both the start month and the step count in ONE
    // aggregate pass; each recursion step is then pure arithmetic on the
    // carried counter. (The natural `WHERE mo < (SELECT MAX(...))` stop
    // condition re-executes its scalar subquery — a full orders scan —
    // on EVERY UnionLoop iteration: measured 14.5 s vs 1.8 s for this
    // form at sf0.1. On 100 TB that's the difference between one scan
    // and eighty.)
    "q113_recursive_cte" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("o_q113")
      s.sql(
        """WITH RECURSIVE months(mo, steps_left) AS (
          |  SELECT CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS TIMESTAMP),
          |         CAST(MONTHS_BETWEEN(DATE_TRUNC('month', MAX(o_orderdate)),
          |                             DATE_TRUNC('month', MIN(o_orderdate)))
          |              AS INT)
          |  FROM o_q113
          |  UNION ALL
          |  SELECT mo + INTERVAL 1 MONTH, steps_left - 1 FROM months
          |  WHERE steps_left > 0
          |)
          |SELECT m.mo, COUNT(o.o_orderkey) AS n
          |FROM months m
          |LEFT JOIN o_q113 o
          |  ON CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP) = m.mo
          |GROUP BY m.mo ORDER BY m.mo""".stripMargin)
    }),

    // Exact percentiles (median / p90, linear interpolation) — the
    // exact twins of approx_percentile, grouped so each group's sort
    // is partition-local after the hash exchange.
    "q114_percentiles" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_q114")
      s.sql(
        """SELECT l_returnflag,
          |       ROUND(MEDIAN(l_extendedprice), 4) AS med,
          |       ROUND(PERCENTILE(l_extendedprice, 0.9), 4) AS p90
          |FROM li_q114 GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    })
  )

  /** DuckDB-dialect oracle for every query above. Aggregate outputs are cast
    * so DuckDB's wider result types (HUGEINT sums, BIGINT extract/length)
    * line up with Spark's. Semantic-equivalent SQL is permitted where
    * dialects diverge (SURVEY §5.3).
    */
  val oracles: Map[String, String] = Map(
    "q1_scan_count" -> "SELECT COUNT(*) AS n FROM lineitem",
    "q3_view" ->
      """WITH big_orders AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000)
        |SELECT COUNT(*) AS n, MIN(o_custkey) AS mn, MAX(o_custkey) AS mx FROM big_orders""".stripMargin,
    "q4_project" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST LIMIT 100",
    "q5_filter" ->
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 25",
    "q6_predicates" ->
      """SELECT COUNT(*) AS n FROM orders
        |WHERE (o_orderstatus = 'F' OR o_orderstatus = 'O')
        |  AND o_orderkey BETWEEN 100 AND 900
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_custkey IS NOT NULL
        |  AND o_orderpriority LIKE '%H%'""".stripMargin,
    "q7_join_inner" ->
      """SELECT n_name, COUNT(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name ASC NULLS FIRST""".stripMargin,
    "q8_join_multiway" ->
      """SELECT r_name, COUNT(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name ASC NULLS FIRST""".stripMargin,
    "q9_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS c FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey ASC NULLS FIRST LIMIT 50""".stripMargin,
    "q10_join_semi" ->
      "SELECT COUNT(*) AS n FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    "q11_join_anti" ->
      "SELECT COUNT(*) AS n FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q12_join_cross" ->
      "SELECT COUNT(*) AS n FROM region CROSS JOIN nation",
    "q13_join_theta" ->
      """SELECT COUNT(*) AS n FROM supplier s JOIN customer c
        |ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal""".stripMargin,
    "q14_agg_tpch1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |  COUNT(*) AS c,
        |  ROUND(SUM(l_extendedprice), 2) AS sep,
        |  ROUND(AVG(l_discount), 6) AS ad,
        |  MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q15_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders",
    "q16_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, c ASC NULLS FIRST""".stripMargin,
    "q17_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, c ASC NULLS FIRST""".stripMargin,
    "q18_having" ->
      """SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 3 ORDER BY o_custkey ASC NULLS FIRST""".stripMargin,
    "q19_window_topk" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,
    "q20_window_lag" ->
      """SELECT o_orderkey, o_custkey,
        |       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_ok
        |FROM orders ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST LIMIT 100""".stripMargin,
    "q21_window_frame" ->
      """SELECT o_orderkey,
        |       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS w
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST LIMIT 100""".stripMargin,
    "q22_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST LIMIT 25""".stripMargin,
    "q23_union" ->
      """SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q24_intersect" ->
      """SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q25_except" ->
      """SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q26_strings" ->
      """SELECT c_custkey, UPPER(c_mktsegment) AS u, SUBSTRING(c_name, 1, 8) AS s8,
        |       CAST(LENGTH(c_name) AS BIGINT) AS ln, REPLACE(c_mktsegment, 'A', '_') AS rp
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST LIMIT 50""".stripMargin,
    "q27_datetime_extract" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
        |       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m, COUNT(*) AS c
        |FROM orders GROUP BY 1, 2 ORDER BY y ASC NULLS FIRST, m ASC NULLS FIRST""".stripMargin,
    "q28_date_trunc" ->
      """SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS mo, COUNT(*) AS c
        |FROM lineitem GROUP BY 1 ORDER BY mo ASC NULLS FIRST""".stripMargin,
    "q29_math" ->
      """SELECT l_orderkey, ABS(l_discount - 0.05) > 0.001 AS far,
        |       ROUND(l_extendedprice / (1.0 + l_tax), 2) AS net,
        |       CAST(FLOOR(l_quantity) AS BIGINT) AS fq,
        |       CAST(MOD(l_orderkey, 7) AS BIGINT) AS m7
        |FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST LIMIT 100""".stripMargin,
    "q30_conditional" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 150000 THEN 'big'
        |            WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
        |       COALESCE(NULLIF(o_orderstatus, 'F'), 'final') AS st
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST LIMIT 100""".stripMargin,
    "q31_array_size" ->
      """SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS d FROM embeddings
        |ORDER BY vec_id ASC NULLS FIRST LIMIT 20""".stripMargin,
    "q32_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS c
        |FROM events GROUP BY 1 ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q33_events_hourly" ->
      """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h, event_type, COUNT(*) AS c,
        |       ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY h ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "q76_tpch3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate ASC NULLS FIRST,
        |         l_orderkey ASC NULLS FIRST
        |LIMIT 10""".stripMargin,
    "q105_interval_join" ->
      """SELECT p.user_id, COUNT(*) AS pairs, ROUND(SUM(p.value), 2) AS sv
        |FROM events p JOIN events c ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
    "q121_stream_enrich" ->
      """SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
        |       ROUND(SUM(e.value), 2) AS sv
        |FROM events e
        |LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY segment ORDER BY segment ASC NULLS FIRST""".stripMargin,
    "q131_variant" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |       COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY k ORDER BY k ASC NULLS FIRST""".stripMargin,
    "q129_profile" ->
      """SELECT col_name, n, n_nulls, n_distinct, min_s, max_s FROM (
        |  SELECT 'o_orderkey' AS col_name, COUNT(o_orderkey) AS n,
        |         COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |         COUNT(DISTINCT o_orderkey) AS n_distinct,
        |         CAST(ROUND(CAST(MIN(o_orderkey) AS DOUBLE), 4) AS VARCHAR) AS min_s,
        |         CAST(ROUND(CAST(MAX(o_orderkey) AS DOUBLE), 4) AS VARCHAR) AS max_s
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(o_custkey), COUNT(*) - COUNT(o_custkey),
        |         COUNT(DISTINCT o_custkey),
        |         CAST(ROUND(CAST(MIN(o_custkey) AS DOUBLE), 4) AS VARCHAR),
        |         CAST(ROUND(CAST(MAX(o_custkey) AS DOUBLE), 4) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(o_orderstatus),
        |         COUNT(*) - COUNT(o_orderstatus),
        |         COUNT(DISTINCT o_orderstatus),
        |         MIN(o_orderstatus), MAX(o_orderstatus)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(o_totalprice),
        |         COUNT(*) - COUNT(o_totalprice),
        |         COUNT(DISTINCT o_totalprice),
        |         CAST(ROUND(MIN(o_totalprice), 4) AS VARCHAR),
        |         CAST(ROUND(MAX(o_totalprice), 4) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(o_orderpriority),
        |         COUNT(*) - COUNT(o_orderpriority),
        |         COUNT(DISTINCT o_orderpriority),
        |         MIN(o_orderpriority), MAX(o_orderpriority)
        |  FROM orders)
        |ORDER BY col_name ASC""".stripMargin,
    "q130_outliers" ->
      """WITH s AS (SELECT event_type, ROUND(AVG(value), 4) AS m,
        |                  ROUND(STDDEV_POP(value), 4) AS sd
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n,
        |       CAST(count_if(ABS(e.value - s.m) > 3 * s.sd) AS BIGINT)
        |         AS n_outliers
        |FROM events e JOIN s ON e.event_type = s.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q127_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok,
        |  first_value(CASE WHEN o_totalprice > 150000 THEN o_orderkey END
        |              IGNORE NULLS) OVER w AS first_big
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey LIMIT 300""".stripMargin,
    "q125_funnel" ->
      """WITH u AS (SELECT user_id,
        |             MIN(CASE WHEN event_type = 'view' THEN ts END) AS v
        |           FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c
        |      FROM events e JOIN u ON e.user_id = u.user_id
        |      WHERE e.event_type = 'click' AND e.ts > u.v
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c
        |      GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM u WHERE v IS NOT NULL) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_click,
        |       (SELECT COUNT(*) FROM p) AS n_purchase""".stripMargin,
    "q126_cohorts" ->
      """WITH fs AS (SELECT user_id,
        |              CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort
        |            FROM events GROUP BY user_id)
        |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
        |       CAST(datediff('day', f.cohort,
        |                     CAST(DATE_TRUNC('week', e.ts) AS DATE)) / 7
        |            AS BIGINT) AS wk,
        |       COUNT(DISTINCT e.user_id) AS active_users
        |FROM events e JOIN fs f ON e.user_id = f.user_id
        |GROUP BY f.cohort, wk
        |ORDER BY cohort, wk""".stripMargin,
    "q122_agg_extras" ->
      """WITH pc AS (
        |  SELECT o_orderstatus, o_orderpriority AS p, COUNT(*) AS c
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority
        |), m AS (
        |  SELECT o_orderstatus,
        |         SUBSTR(MAX(LPAD(CAST(c AS VARCHAR), 10, '0') || p), 11)
        |           AS top_prio
        |  FROM pc GROUP BY o_orderstatus
        |)
        |SELECT a.o_orderstatus, a.n_big, a.all_pos, a.any_urgent,
        |       m.top_prio, a.key_of_max
        |FROM (SELECT o_orderstatus,
        |             CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
        |             bool_and(o_totalprice > 0) AS all_pos,
        |             bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |             arg_max(o_orderkey, o_totalprice) AS key_of_max
        |      FROM orders GROUP BY o_orderstatus) a
        |JOIN m ON a.o_orderstatus = m.o_orderstatus
        |ORDER BY a.o_orderstatus""".stripMargin,
    "q133_groupby_all" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sc
        |FROM orders WHERE o_totalprice > 150000
        |GROUP BY ALL ORDER BY ALL""".stripMargin,
    "q134_setops_all" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders
        |           WHERE o_totalprice > 120000),
        |     b AS (SELECT o_custkey AS k FROM orders
        |           WHERE o_orderstatus = 'F')
        |SELECT op, k, COUNT(*) AS n FROM (
        |  SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT ALL
        |                                 SELECT k FROM b)
        |  UNION ALL
        |  SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT ALL
        |                                    SELECT k FROM b)
        |) GROUP BY op, k ORDER BY op, k""".stripMargin,
    "q135_array_hof" ->
      """SELECT vec_id,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
        |    AS BIGINT) AS s_scaled,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  list_sort(list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)))[1]
        |    AS mn_scaled
        |FROM embeddings WHERE vec_id < 500 ORDER BY vec_id""".stripMargin,
    "q136_listagg" ->
      """SELECT n_regionkey,
        |       string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q137_regexp" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_nums,
        |  regexp_extract(text, '([A-Za-z]{6,})', 1) AS first_long_word
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q140_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |         CAST(FLOOR(MAX(value) * 100) AS BIGINT) AS mx
        |  FROM events WHERE user_id < 20
        |  GROUP BY user_id, CAST(ts AS DATE)
        |), bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
        |spine AS (
        |  SELECT u.user_id, CAST(s.dd AS DATE) AS d
        |  FROM (SELECT DISTINCT user_id FROM daily) u
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi,
        |                            INTERVAL 1 DAY)) AS dd
        |              FROM bounds) s
        |)
        |SELECT s.user_id, s.d, COALESCE(daily.n, 0) AS n,
        |       LAST_VALUE(daily.mx IGNORE NULLS) OVER (
        |         PARTITION BY s.user_id ORDER BY s.d
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
        |FROM spine s
        |LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
        |ORDER BY s.user_id, s.d""".stripMargin,
    "q101_subquery_scalar" ->
      """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23' AND p_size < 10
        |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q102_subquery_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q103_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g1,
        |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
        |       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY g1, g2, l_returnflag NULLS FIRST,
        |         l_linestatus NULLS FIRST""".stripMargin,
    "q104_unpivot" ->
      """SELECT metric, COUNT(*) AS n, ROUND(SUM(val), 2) AS total
        |FROM (SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |      UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |WHERE val IS NOT NULL -- Spark UNPIVOT excludes NULL measures
        |GROUP BY metric ORDER BY metric""".stripMargin,
    "q107_pivot" ->
      """SELECT o_orderpriority,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS st_f,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS st_o,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS st_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q108_tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
        |       ROUND(SUM(l_quantity), 2) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(l_quantity) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q109_exists_anti" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 50""".stripMargin,
    "q110_lateral" ->
      """SELECT n_name, ROUND(t.mx_bal, 2) AS mx_bal, t.n_cust
        |FROM nation,
        |LATERAL (SELECT MAX(c_acctbal) AS mx_bal, COUNT(*) AS n_cust
        |         FROM customer WHERE c_nationkey = n_nationkey) t
        |ORDER BY n_name ASC NULLS FIRST""".stripMargin,
    "q111_window_stats" ->
      """SELECT c_custkey, c_nationkey,
        |       CAST(NTILE(4) OVER w AS BIGINT) AS q4,
        |       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |       ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey LIMIT 200""".stripMargin,
    "q112_stat_aggs" ->
      """SELECT l_returnflag,
        |       ROUND(CORR(l_extendedprice, l_quantity), 6) AS r,
        |       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS cs,
        |       ROUND(COVAR_POP(l_extendedprice, l_quantity), 2) AS cp,
        |       ROUND(STDDEV_SAMP(l_discount), 6) AS sd,
        |       ROUND(VAR_POP(l_discount), 6) AS vp
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q113_recursive_cte" ->
      """WITH RECURSIVE months(mo, steps_left) AS (
        |  SELECT CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS TIMESTAMP),
        |         CAST(datediff('month', DATE_TRUNC('month', MIN(o_orderdate)),
        |                       DATE_TRUNC('month', MAX(o_orderdate))) AS INT)
        |  FROM orders
        |  UNION ALL
        |  SELECT mo + INTERVAL 1 MONTH, steps_left - 1 FROM months
        |  WHERE steps_left > 0
        |)
        |SELECT m.mo, COUNT(o.o_orderkey) AS n
        |FROM months m
        |LEFT JOIN orders o
        |  ON CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP) = m.mo
        |GROUP BY m.mo ORDER BY m.mo""".stripMargin,
    "q114_percentiles" ->
      """SELECT l_returnflag,
        |       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med,
        |       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q77_tpch5" ->
      """SELECT n_name,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC NULLS FIRST""".stripMargin,
    "q148_tpch6" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
        |                    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q149_tpch14" ->
      """WITH j AS (
        |  SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |              AS BIGINT) AS disc, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01'),
        |a AS (
        |  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE 0 END)
        |              AS BIGINT) AS promo_cents,
        |         CAST(SUM(disc) AS BIGINT) AS total_cents
        |  FROM j)
        |SELECT promo_cents, total_cents,
        |       CAST((promo_cents * 10000) // total_cents AS BIGINT) AS promo_bp
        |FROM a""".stripMargin,
    "q150_tpch19" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |                    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q151_tpch10" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |                    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey ASC NULLS FIRST
        |LIMIT 20""".stripMargin,
    "q152_tpch7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |                    AS BIGINT)) AS BIGINT) AS volume_cents
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation ASC NULLS FIRST, cust_nation ASC NULLS FIRST,
        |         l_year ASC NULLS FIRST""".stripMargin
  )
}
