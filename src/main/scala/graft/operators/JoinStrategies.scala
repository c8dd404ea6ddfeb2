package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape tools for skewed and co-located workloads — the remaining
  * dials from the 100 TB playbook next to `broadcast()` and AQE:
  * key salting (spread one hot key over many reducers) and bucketing
  * (pre-shuffle once, join shuffle-free forever after).
  */
object JoinStrategies {

  /** Equi join with the build side replicated over `saltBuckets` salts:
    * each fact row gets a deterministic salt (hash of its hashable
    * columns), the dimension is replicated once per salt, and the join key
    * becomes (key, salt). A hot key's rows now land on `saltBuckets`
    * reducers instead of one.
    *
    * The salt MUST be a pure function of row content: a position-derived
    * salt (`monotonically_increasing_id`) is not replay-safe when `fact`
    * is shuffle output (re-fetched map tasks can renumber rows, losing or
    * duplicating join rows under retries), and `rand()` is worse. The
    * content hash's known limitation is the dual: rows that are FULLY
    * identical across all hashable columns share a salt and are not
    * spread — if duplicate-row skew is the problem, de-duplicate with a
    * count first or rely on AQE's skew-join splitting. Map-typed columns
    * (unhashable in Spark) are excluded from the salt.
    *
    * Result-identical to `fact.join(dim, keys)`: every fact row matches
    * exactly the one dim replica carrying its salt. Worth it only when a
    * key is genuinely hot and the dim side is small enough to replicate
    * `saltBuckets`×; otherwise prefer AQE's skew-join splitting.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already contain a _salt column")
    val hashable = fact.schema.fields.toSeq
      .filterNot(f => hasMapType(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty, "fact has no hashable columns to salt by")
    val factSalted = fact.withColumn("_salt",
      pmod(xxhash64(struct(hashable: _*)), lit(saltBuckets.toLong)))
    val dimSalted = dim.withColumn("_salt",
      explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
    factSalted.join(dimSalted, keys :+ "_salt").drop("_salt")
  }

  /** Bloom semi-join reduction (the classic distributed-DB "bloom
    * join"): before the fact side pays the join shuffle, it is filtered
    * MAP-SIDE against a Bloom bitset of the dimension's join keys —
    * [[BloomAdmission.buildBits]] folds the dim keys into one bounded
    * value, and the probe rides whole-stage codegen inside the fact
    * scan. Rows that cannot match never enter the exchange.
    *
    * Result-identical to `fact.join(dim, keys)` (INNER): the filter only
    * drops fact rows with no dim partner (no false negatives), and the
    * false-positive sliver is eliminated by the real join. The win
    * condition at 100 TB: the dim is SELECTIVE relative to the fact's
    * key domain but too large to broadcast — shuffle bytes drop by the
    * non-match fraction for the cost of one aggregate over the dim.
    * (Spark's own InjectRuntimeFilter does this automatically in narrow
    * cases; this form works on any DataFrame pair and composite keys.)
    */
  def bloomReducedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    require(keys.nonEmpty, "bloomReducedJoin needs at least one key column")
    // xxhash64 hashes IntegerType and LongType values DIFFERENTLY while
    // the equi-join below coerces them to one type — hashing the raw
    // columns would Bloom-drop every INT-vs-BIGINT match map-side (a
    // silent false negative, the one thing a Bloom pre-filter must never
    // produce). Both sides therefore hash through the join's own coerced
    // type; keys with no coercion are rejected rather than corrupted.
    val hashTypes = keys.map { k =>
      val (ft, dt) = (fact.schema(k).dataType, dim.schema(k).dataType)
      k -> BloomAdmission.commonHashType(ft, dt).getOrElse(throw
        new IllegalArgumentException(
          s"bloomReducedJoin: key '$k' types $ft vs $dt have no common " +
          "join type — the Bloom probe would silently drop matches"))
    }.toMap
    def keyCol(df: DataFrame): Column = {
      val cs = keys.map(k => col(k).cast(hashTypes(k)))
      if (cs.size == 1) cs.head else struct(cs: _*)
    }
    val bits = BloomAdmission.buildBits(dim, keyCol(dim), numBits, numHashes)
    fact.filter(
        BloomAdmission.mightContain(keyCol(fact), bits, numBits, numHashes))
      .join(dim, keys)
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMapType(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
    case _ => false
  }

  /** Write both sides bucketed by the join key so subsequent joins between
    * them are shuffle-free (`SortMergeJoin` over pre-sorted buckets, no
    * Exchange): the one-off shuffle cost is paid at write time, amortized
    * over every later join — the right trade for fact tables joined on
    * the same key query after query. Returns the saved table names.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): String = {
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    table
  }
}
