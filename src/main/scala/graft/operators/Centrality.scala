package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality as a corpus-quality signal — PageRank (Page et al.
  * 1999) is the classic web-curation score (Common Crawl ranks hosts by
  * centrality before content filters ever run).
  *
  * Spark shape: power iteration as a DataFrame loop — per round ONE
  * shuffle (contributions grouped by destination) and ONE
  * `localCheckpoint` so the plan stays a leaf (the connected-components
  * lesson: without lineage truncation an iterative plan doubles per
  * round and planning cost explodes long before data does). Edges and
  * out-degrees are computed once and persisted; rounds touch only the
  * (node, score) table, so per-round cost is O(|E|) shuffle bytes with
  * no driver-side data.
  *
  * Arithmetic is INTEGER throughout (scores scaled by `scale`,
  * contributions via integer division) — the same order-free determinism
  * discipline as DSIR/TF-IDF: a fixed iteration count then yields
  * bit-identical scores in any engine, which is what lets a DuckDB
  * oracle replay the iterations as unrolled SQL.
  *
  * Semantics notes (shared by the oracle): damping 0.85 as the integer
  * formula `(15*scale)/100 + (85*sum(contrib)) div 100`; dangling-node
  * mass is NOT redistributed (nodes with no out-edges absorb score —
  * the common simplification); scores are per-node absolute (init =
  * `scale`, i.e. 1.0), not normalized to sum 1.
  */
object Centrality {

  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 8,
               scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64], got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val ewd = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = 15L * scale / 100L
    var scores = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .withColumn("s", lit(scale)).localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      // `scores` IS the node set (initialized from it, preserved by
      // every round), so the zero-fill for contribution-less nodes rides
      // the SAME aggregation as the contribution sum — one zero row per
      // node unioned in — instead of a second per-round join against a
      // cached node table (one join + exchange fewer per round; measured
      // 2.75 -> 1.56 s on the q141 graph, 8 rounds). Integer formula
      // unchanged: SUM over {0} ∪ contribs ≡ COALESCE(SUM(contribs), 0).
      val contrib = ewd
        .join(scores.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("s div d").as("c"))
      val prev = scores
      scores = scores.select(col("v"), lit(0L).as("c"))
        .union(contrib)
        .groupBy("v").agg(sum("c").as("m"))
        .select(col("v"),
          expr(s"CAST($base + (85 * m) div 100 AS BIGINT)").as("s"))
        .localCheckpoint(true)
      // free the previous round's checkpoint blocks (unpersist is a
      // no-op on a localCheckpoint'd frame)
      graft.iceberg.IcebergTable.unpinLocalCheckpoint(prev)
      i += 1
    }
    ewd.unpersist()
    scores
  }

  /** The unrolled-SQL twin of [[pageRank]] for oracle engines without a
    * DataFrame loop: chained CTEs `it0 … itN`, one per iteration, with
    * the IDENTICAL integer formula. `edgesSql` must yield (src, dst)
    * distinct BIGINT rows. */
  def pageRankOracleSql(edgesSql: String, iterations: Int,
                        scale: Long = 1000000L): String = {
    val base = 15L * scale / 100L
    val its = (1 to iterations).map { i =>
      s"""it$i AS (
         |  SELECT n.v, CAST($base + (85 * COALESCE(c.m, 0)) // 100
         |              AS BIGINT) AS s
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS v, SUM(p.s // d.d) AS m
         |    FROM edges e
         |    JOIN it${i - 1} p ON p.v = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.v = n.v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
       |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
       |nodes AS (SELECT src AS v FROM edges
       |          UNION SELECT dst FROM edges),
       |it0 AS (SELECT v, CAST($scale AS BIGINT) AS s FROM nodes),
       |$its
       |SELECT v, s FROM it$iterations ORDER BY v ASC NULLS FIRST""".stripMargin
  }
}
