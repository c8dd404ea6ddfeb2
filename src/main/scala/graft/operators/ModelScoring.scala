package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Model-scored quality filtering — the batched-inference plumbing behind
  * the model-based stage every modern curation pipeline runs (fastText
  * quality classifiers, perplexity filters, reward-model scoring).
  *
  * The Spark-side mechanics are the real design and the point of the
  * operator: one model INSTANTIATION per partition (not per row — real
  * model loads cost seconds), fixed-size BATCHES through the scorer (the
  * shape every inference runtime wants), streaming iterators end to end
  * (a partition is never materialized), score appended as a column. At
  * cluster scale the [[DocScorer]] is swapped for an ONNX/JNI/served
  * model and nothing else changes.
  *
  * The container ships no ML runtime (same contract as
  * [[Multimodal.FakeDecoder]]), so the default scorer is a clearly-marked
  * deterministic stand-in: a fixed-weight linear model over closed-form
  * text features, chosen so the DuckDB oracle reproduces every score
  * bit-for-bit (single-expression IEEE arithmetic, no reduction-order
  * ambiguity).
  */
object ModelScoring {

  /** The inference contract: load once per partition, score in batches. */
  trait DocScorer extends Serializable {
    /** Called once per partition-local instantiation. */
    def load(): Unit = ()
    def scoreBatch(texts: Array[String]): Array[Double]
  }

  /** STUB model: fixed weights over (words, distinct words, code points).
    * The expression is one fixed tree of exactly-rounded IEEE ops, so any
    * 64-bit engine reproduces it — `c` counts CODE POINTS (what SQL
    * `length()` counts), not UTF-16 units, so an astral-plane character
    * (routine in web crawls) scores identically on both sides. */
  final class StubLinearScorer extends DocScorer {
    override def scoreBatch(texts: Array[String]): Array[Double] =
      texts.map { t =>
        val words = t.split(" ").filter(_.nonEmpty)
        val n = words.length.toDouble
        val d = words.distinct.length.toDouble
        val c = t.codePointCount(0, t.length).toDouble
        (2.0 * d + 1.0) / (n + 1.0) + c / 4096.0
      }
  }

  case class Scored(doc_id: Option[Long], score: Option[Double])

  /** Score every document: `batchSize` rows per scorer call, one scorer
    * per partition, streaming (grouped iterator, no partition
    * materialization). NULL texts pass through with a NULL score (SQL
    * semantics — a model is never called on them); NULL ids are carried,
    * not crashed on. Returns (idCol, score). */
  def scoreBatched(docs: DataFrame, idCol: String, textCol: String,
                   batchSize: Int = 64,
                   scorer: () => DocScorer = () => new StubLinearScorer)(
      implicit spark: SparkSession): Dataset[Scored] = {
    require(batchSize >= 1)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Option[Long], Option[String])]
      .mapPartitions { it =>
        val model = scorer()
        model.load()
        it.grouped(batchSize).flatMap { group =>
          val scorable = group.collect { case (_, Some(t)) => t }
          val scores = model.scoreBatch(scorable.toArray)
          require(scores.length == scorable.length,
            s"scorer returned ${scores.length} scores for ${scorable.length} docs")
          val scoreIt = scores.iterator
          group.iterator.map {
            case (id, Some(_)) => Scored(id, Some(scoreIt.next()))
            case (id, None) => Scored(id, None)
          }
        }
      }
  }
}
