package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Packing

/** Context-window chunking + sequence packing edge cases (the q78/q79
  * oracles gate the bulk behavior; these pin the corners). */
class ChunkPackSpec extends SparkSpec {

  import spark.implicits._

  test("chunking covers the tail, overlaps correctly, never emits a contained chunk") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val chunks = TextFunctions.chunkDocuments(df, "doc_id", "text", 40, 8)
      .orderBy("chunk_idx").collect()
    // stride 32: starts 1, 33, 65 (97 > 100 - 8 = 92 ⇒ stop)
    assert(chunks.length == 3)
    assert(chunks.map(_.getAs[Long]("n_words")).toSeq == Seq(40L, 40L, 36L))
    val c0 = chunks(0).getAs[String]("chunk").split(" ")
    val c1 = chunks(1).getAs[String]("chunk").split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq, "8-word overlap")
    assert(chunks(2).getAs[String]("chunk").split(" ").last == "w100",
      "tail covered")
  }

  test("chunking: short, single-word, and NULL-text documents each yield one chunk") {
    val df = Seq((1L, "only"), (2L, (1 to 10).map("w" + _).mkString(" ")),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val chunks = TextFunctions.chunkDocuments(df, "doc_id", "text", 40, 8)
    assert(chunks.count() == 3, "a NULL-text document must not vanish")
    assert(chunks.filter(col("doc_id") === 1).head.getAs[Long]("n_words") == 1L)
    val nullRow = chunks.filter(col("doc_id") === 3).head
    assert(nullRow.getAs[String]("chunk") == "")
    assert(nullRow.getAs[Long]("n_words") == 0L,
      "an empty document carries zero words, not a phantom one")
  }

  test("chunking: zero overlap partitions the words exactly") {
    val df = Seq((1L, (1 to 90).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val chunks = TextFunctions.chunkDocuments(df, "doc_id", "text", 30, 0)
      .orderBy("chunk_idx").collect()
    assert(chunks.length == 3)
    assert(chunks.map(_.getAs[Long]("n_words")).sum == 90L, "no word duplicated")
  }

  test("packing matches the sequential greedy-fill reference on a skewed corpus") {
    // skewed sizes force multi-document bins AND straddlers
    val docs = (1 to 200).map(i => (i.toLong, ("w " * (i * 7 % 97 + 1)).trim))
    val df = docs.toDF("doc_id", "text")
    val got = Packing.packSequences(df, "doc_id", "text", windowTokens = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // sequential reference: same (tokens desc, id) order, same rule
    val ordered = docs.map { case (id, t) => (id, t.split(" ").length.toLong) }
      .sortBy { case (id, n) => (-n, id) }
    var acc = 0L
    val expected = ordered.map { case (id, n) =>
      val bin = acc / 100L; acc += n; id -> bin
    }.toMap
    assert(got == expected)
    // fill invariant: every bin deviates from the window by less than
    // the largest single document (straddlers shift both boundaries)
    val binTotals = ordered.map { case (id, n) => expected(id) -> n }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = ordered.map(_._2).max
    val lastBin = binTotals.keys.max
    binTotals.foreach { case (b, t) =>
      if (b != lastBin)
        assert(t > 100L - maxDoc && t < 100L + maxDoc,
          s"bin $b fill $t outside (${100 - maxDoc}, ${100 + maxDoc})")
    }
  }

  test("packing is exact across many partitions (offsets compose)") {
    val docs = (1 to 500).map(i => (i.toLong, ("w " * (i % 37 + 1)).trim))
    val df = docs.toDF("doc_id", "text")
    val p2 = Packing.packSequences(df, "doc_id", "text", 64L, partitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p16 = Packing.packSequences(df, "doc_id", "text", 64L, partitions = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(p2 == p16, "bin assignment must not depend on partition count")
  }
}
