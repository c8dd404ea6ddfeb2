package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalView

/** Incremental materialized-view maintenance: `refresh(state, changes)`
  * must equal a full recompute of `aggregateState` over the final data —
  * including NULL groups, NULL measure values, vanishing groups, and
  * brand-new groups. The changelog here is hand-built (the Iceberg-backed
  * end-to-end path is gated by q90's oracle).
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val sums = Seq("v" -> "sv")

  private def sorted(df: DataFrame): Seq[(Option[String], Long, Option[Long], Long)] =
    df.select(col("k"), col("cnt"), col("sv").cast("long"), col("sv_nn"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .sortBy(t => t._1.getOrElse(""))
      .toSeq

  test("refresh equals full recompute across inserts, deletes, null keys/values") {
    val base = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)),
      (Some("b"), Some(10L)),
      (None: Option[String], Some(100L)),
      (Some("n"), None: Option[Long])
    ).toDF("k", "v")
    val state0 = IncrementalView.aggregateState(base, keys, sums)

    // changes: new group "c"; grow "a"; delete the whole "b" group;
    // delete the null-key row and re-add another; add a null value to "n"
    val changes = Seq(
      ("c", Some(7L), "insert"),
      ("a", Some(3L), "insert"),
      ("b", Some(10L), "delete"),
      (null, Some(100L), "delete"),
      (null, Some(200L), "insert"),
      ("n", None: Option[Long], "insert")
    ).toDF("k", "v", "_change_type")

    val finalData = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)), (Some("a"), Some(3L)),
      (None: Option[String], Some(200L)),
      (Some("n"), None: Option[Long]), (Some("n"), None: Option[Long]),
      (Some("c"), Some(7L))
    ).toDF("k", "v")

    val got = IncrementalView.refresh(state0, changes, keys, sums)
    val want = IncrementalView.aggregateState(finalData, keys, sums)
    assert(sorted(got) == sorted(want))
    // "b" vanished entirely; "n" still reports a NULL sum (not 0)
    assert(!sorted(got).exists(_._1.contains("b")))
    assert(sorted(got).find(_._1.contains("n")).get._3.isEmpty)
  }

  test("deleting the last non-null value turns the sum NULL, not 0") {
    val base = Seq(("g", Some(5L)), ("g", None: Option[Long])).toDF("k", "v")
    val state0 = IncrementalView.aggregateState(base, keys, sums)
    val changes = Seq(("g", Some(5L), "delete")).toDF("k", "v", "_change_type")
    val got = sorted(IncrementalView.refresh(state0, changes, keys, sums))
    assert(got == Seq((Some("g"), 1L, None, 0L)))
  }

  test("unknown change type fails loudly") {
    val base = Seq(("g", Some(1L))).toDF("k", "v")
    val state0 = IncrementalView.aggregateState(base, keys, sums)
    val changes = Seq(("g", Some(1L), "update_preimage"))
      .toDF("k", "v", "_change_type")
    val e = intercept[Exception] {
      IncrementalView.refresh(state0, changes, keys, sums).collect()
    }
    assert(e.getMessage.contains("unknown _change_type")
      || Option(e.getCause).exists(_.getMessage.contains("unknown _change_type")))
  }

  test("empty changelog is a no-op") {
    val base = Seq(("a", Some(1L)), ("b", Some(2L))).toDF("k", "v")
    val state0 = IncrementalView.aggregateState(base, keys, sums)
    val changes = Seq.empty[(String, Option[Long], String)]
      .toDF("k", "v", "_change_type")
    val got = IncrementalView.refresh(state0, changes, keys, sums)
    assert(sorted(got) == sorted(state0))
  }
}
