package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-factor synthesizer: replicate an sf directory N× with
  * key remapping so the full query set can be timed above the largest
  * driver-provided scale (the round-9 verdict's sf1.0 spot run). TPC-H
  * semantics are preserved: `region`/`nation` are CONSTANT across scale
  * factors (copied as-is), fact/dimension tables replicate with their
  * join keys offset per replica (referential integrity holds within a
  * replica), `documents` text is word-salted and `embeddings` vectors
  * sign-flipped per replica — the same "N independent shards" linear
  * null as BenchScale, so dedup/similarity operators see realistic
  * structure instead of N× artificial clones.
  *
  * Usage: `runMain graft.SfGen <srcDir> <dstDir> <replicas>`. Output is
  * a directory per table named `<table>.parquet` (Spark and pyarrow read
  * those interchangeably with single files).
  */
object SfGen {

  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse(graft.Scratch.dir("sf1.0-synth"))
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sessionState.newHadoopConf()
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    dstPath.getFileSystem(conf).delete(dstPath, true)

    def rep(t: String, keyCols: Seq[String])(
        salt: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = Tables.load(spark, src, t)
      val all = (0 until replicas).map { i =>
        if (i == 0) base
        else salt(keyCols.foldLeft(base)((d, c) =>
          d.withColumn(c, col(c) + lit(i * Off))), i)
      }.reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[sfgen] $t x$replicas")
    }
    def copy(t: String): Unit = {
      Tables.load(spark, src, t).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
      println(s"[sfgen] $t copied (constant across SF)")
    }

    copy("region")
    copy("nation")
    rep("customer", Seq("c_custkey"))()
    rep("supplier", Seq("s_suppkey"))()
    rep("part", Seq("p_partkey"))()
    rep("orders", Seq("o_orderkey", "o_custkey"))()
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))()
    rep("events", Seq("event_id", "user_id"))()
    rep("documents", Seq("doc_id")) { (d, i) =>
      // every 3rd word salted: every 3-shingle crosses a salt, so
      // cross-replica near-dup similarity collapses while within-replica
      // duplicate structure is preserved exactly
      d.withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "),
          (w, j) => when(j % 3 === 0, concat(w, lit(s"_r$i"))).otherwise(w))))
    }
    rep("embeddings", Seq("vec_id")) { (d, i) =>
      // per-(dim, replica) ±1 mask: within-replica inner products exact,
      // cross-replica cosines collapse
      d.withColumn("embedding", transform(col("embedding"),
        (x, j) => when(pmod(xxhash64(j, lit(i)), lit(2)) === 0, x)
          .otherwise(x * lit(-1.0f))).cast("array<float>"))
    }
    spark.stop()
  }
}
