package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.Extensions

/** Gates for the planted-duplicate recall queries (q41c/q42b/q49b) and the
  * guard-rail contracts added to the dedup operators.
  */
class ExtensionGatesSpec extends SparkSpec {

  lazy val docsUnder100: Long =
    Tables.load(spark, sf, "documents").filter(col("doc_id") < 100).count()

  test("q41c: minhash finds every planted clone pair") {
    val n = Extensions.queries("q41c_minhash_clone_recall")(spark, sf)
      .collect()(0).getLong(0)
    assert(n == docsUnder100 && n > 0)
  }

  test("q42b: simhash pairs every clone with its source at hamming 0") {
    val n = Extensions.queries("q42b_simhash_dup_parity")(spark, sf)
      .collect()(0).getLong(0)
    assert(n == docsUnder100 && n > 0)
  }

  test("q49b: LSH retrieves each cloned vector's source at score 1.0") {
    val rows = Extensions.queries("q49b_lsh_clone_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 100000L)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("q53: IVF retrieves each cloned vector's source at score 1.0") {
    val rows = Extensions.queries("q53_ivf_clone_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 100000L)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("q41 digest output is one scalar per document") {
    val df = Extensions.queries("q41_minhash_sig")(spark, sf)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "sig_digest"))
    assert(df.schema("sig_digest").dataType.typeName == "long")
  }

  test("minhash signatures cover documents shorter than the shingle size") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, "a much longer document text here"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8, shingleSize = 3)
    assert(sig.count() == 3, "short docs must not vanish from the signature table")
    val sigs = sig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical short docs share a signature")
    assert(sigs(1L) != sigs(3L))
  }

  test("minhash signatures cover null and empty text documents") {
    import spark.implicits._
    val docs = Seq((1L, null), (2L, null), (3L, ""), (4L, "real text content words"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
    assert(sig.count() == 4, "null-text docs must not vanish")
    val sigs = sig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "two null-text docs are dedup candidates")
  }

  test("guard rails: bad band split and unsafe hamming threshold are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
    assertThrows[IllegalArgumentException](Dedup.lshBands(sig, "doc_id", 8, 3))
    assertThrows[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4))
  }

  test("ngram jaccard: df cap drops ultra-common shingles from the index") {
    import spark.implicits._
    // 3 docs share 'x y z'; with cap 2 the shared shingle is dropped so no
    // pair survives; with the default cap all 3 pairs appear
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y z")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3).count() == 3)
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, maxShingleDf = 2).count() == 0)
  }
}
