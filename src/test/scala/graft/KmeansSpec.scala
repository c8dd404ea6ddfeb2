package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Lloyd's k-means ([[Similarity.kmeansCentroids]]). Assignment ranks by
  * cosine, so this is SPHERICAL k-means: the synthetic clusters are
  * direction bundles (position offsets would be meaningless), and
  * convergence is judged by cosine alignment + quantization improvement.
  */
class KmeansSpec extends SparkSpec {

  import spark.implicits._

  private val dirs = Seq(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0),
    Array(0.0, 0.0, 0.0, 1.0))

  /** 4 direction bundles × 25 vectors, deterministic small angular jitter,
    * varying magnitudes (cosine must ignore them). */
  private lazy val blobs = {
    val pts = for {
      (dir, b) <- dirs.zipWithIndex
      i <- 0 until 25
    } yield {
      val scale = 1.0 + (i % 5) * 0.5
      val v = dir.indices.map { d =>
        // jitter up to 0.5: big enough that same-bundle pairs don't round
        // to cosine 1.0000 (only the exact clone ties at 1.0)
        val jitter = (((i * 2654435761L + b * 7 + d * 13) % 1000) / 1000.0) * 0.5
        (dir(d) + jitter) * scale
      }.toArray
      (b * 25L + i, v)
    }
    pts.toDF("vec_id", "embedding")
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private def collectCents(df: org.apache.spark.sql.DataFrame): Array[Seq[Double]] =
    df.collect().map(_.getAs[scala.collection.Seq[Double]]("c_vec").toSeq)

  test("training aligns one centroid per direction bundle and improves quantization") {
    val init = collectCents(
      Similarity.kmeansCentroids(blobs, nCentroids = 4, iters = 0))
    val trained = collectCents(
      Similarity.kmeansCentroids(blobs, nCentroids = 4, iters = 4))
    assert(trained.length == 4, "k must stay fixed")
    dirs.foreach { d =>
      val aligned = trained.count(c => cos(c, d.toSeq) > 0.9)
      assert(aligned == 1,
        s"expected exactly one centroid aligned with ${d.toSeq}, got $aligned " +
          s"(alignments: ${trained.map(c => cos(c, d.toSeq)).sorted.reverse.toSeq})")
    }
    // quantization: mean best-cosine over all points must not degrade
    val points = blobs.collect().map(_.getAs[scala.collection.Seq[Double]]("embedding").toSeq)
    def meanBestCos(cents: Array[Seq[Double]]): Double =
      points.map(p => cents.map(c => cos(p, c)).max).sum / points.length
    assert(meanBestCos(trained) >= meanBestCos(init) - 1e-9,
      s"training must not degrade quantization: ${meanBestCos(trained)} vs ${meanBestCos(init)}")
  }

  test("k stays fixed when a centroid loses all members") {
    // 2 direction bundles but k = 3: some centroid ends up empty; the
    // left-anti union must keep k = 3 regardless
    val two = blobs.filter(col("vec_id") < 50)
    val cents = Similarity.kmeansCentroids(two, nCentroids = 3, iters = 3).collect()
    assert(cents.length == 3, s"k must stay fixed at 3, got ${cents.length}")
  }

  test("trained IVF still retrieves exact duplicates (serving contract)") {
    val clones = blobs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val hits = Similarity.ivfTopK(clones, blobs, k = 1,
        nCentroids = 4, nProbe = 1, trainIters = 3)
      .filter(col("n_id") === col("q_id") - 1000L)
      .count()
    assert(hits == 10L, s"all 10 clones must retrieve their originals, got $hits")
  }
}
