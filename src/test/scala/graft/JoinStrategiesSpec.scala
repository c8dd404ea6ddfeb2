package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinStrategies

/** Skew-salting result equivalence and bucketed-join shuffle elimination
  * (plan-level assertions: the point of bucketing is the absent Exchange).
  */
class JoinStrategiesSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name").collect().map(_.mkString("|")).sorted
    val salted = JoinStrategies.saltedJoin(orders, customer, Seq("o_custkey"), 8)
      .select("o_orderkey", "c_name").collect().map(_.mkString("|")).sorted
    assert(plain.nonEmpty && (plain sameElements salted))
  }

  test("salted join spreads a hot key across salt buckets") {
    import spark.implicits._
    // one key carries 1000 of 1001 rows
    val fact = ((1 to 1000).map(i => (1L, i.toLong)) :+ ((2L, 0L))).toDF("k", "x")
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val out = JoinStrategies.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8)
    assert(out.count() == 1001)
    // the salting column is derived deterministically: same input -> same result
    assert(JoinStrategies.saltedJoin(fact, dim, Seq("k"), 8).count() == 1001)
  }

  test("bucketed tables join without an exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      JoinStrategies.writeBucketed(
        Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        "b_orders", Seq("o_custkey"), 8)
      JoinStrategies.writeBucketed(
        Tables.load(spark, sf, "customer").select("c_custkey", "c_name")
          .withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", Seq("o_custkey"), 8)
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      joined.count() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      val unbucketed = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
        .join(Tables.load(spark, sf, "customer").select("c_custkey", "c_name")
          .withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "sanity: the same join without buckets does shuffle")
      assert(joined.count() == unbucketed.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bloomReducedJoin: result-identical to the plain join, probe below it") {
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity")
    val pt = Tables.load(spark, sf, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val reduced = JoinStrategies.bloomReducedJoin(li, pt, Seq("l_partkey"))
    val plain = li.join(pt, "l_partkey")
    assert(reduced.count() == plain.count(),
      "the bloom pre-filter must not change the join result")
    // the probe (xxhash64 bit test) must sit on the fact side BELOW the
    // join — that is the map-side shuffle reduction
    val plan = reduced.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"),
      s"fact side must carry the bloom probe filter:\n$plan")
    // and a composite key round-trips through the struct hash
    val li2 = li.withColumn("k2", col("l_partkey") % 7)
    val pt2 = pt.withColumn("k2", col("l_partkey") % 7)
    val both = JoinStrategies.bloomReducedJoin(li2, pt2,
      Seq("l_partkey", "k2"))
    assert(both.count() == li2.join(pt2, Seq("l_partkey", "k2")).count())
  }

  test("bloomReducedJoin: mismatched INT/BIGINT key types hash through " +
      "the coerced type (no silent false negatives)") {
    import org.apache.spark.sql.functions.col
    // fact keys INT, dim keys BIGINT: xxhash64(int) != xxhash64(long)
    // for equal values, so an uncoerced probe would drop EVERY match
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey").cast("int").as("l_partkey"), col("l_quantity"))
    val pt = Tables.load(spark, sf, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey").cast("bigint").as("l_partkey"), col("p_brand"))
    val plain = li.join(pt, "l_partkey").count()
    assert(plain > 0, "sanity: the join must have matches")
    assert(JoinStrategies.bloomReducedJoin(li, pt, Seq("l_partkey")).count()
      == plain, "coerced-type hashing must preserve every match")
    // same guarantee on the admission-control twin
    val corpus = pt.select(col("l_partkey").as("k"))
    val incoming = li.select(col("l_partkey").as("k")).distinct()
    val admitted = graft.operators.BloomAdmission
      .admitNew(corpus, incoming, "k").count()
    val exact = incoming.join(corpus.distinct(), Seq("k"), "left_anti").count()
    assert(admitted == exact,
      s"admitNew with INT-vs-BIGINT keys must equal the plain anti-join " +
        s"($admitted vs $exact)")
  }
}
