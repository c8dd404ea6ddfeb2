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

    // the uncapped fallback (probe wider than maxProbeCentroids -> full
    // postings scan) is identical too
    val fallback = rows(VectorIndex.topK(spark, dir, queries, k = 5,
      nProbe = 2, maxProbeCentroids = 0))
    assert(fallback == stored, "cap fallback changes IO, never results")
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
}
