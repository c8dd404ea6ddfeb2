package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata tables (TESTDATA.md): one parquet file
  * per table under `/root/testdata/sf*`. At cluster scale these would be
  * directories of many files; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * nanosecond long (legacy conf) and floor-truncate to a microsecond
    * TimestampType — the same truncation DuckDB's µs timestamps apply.
    *
    * The nanosAsLong conf belongs in the session builder (Verify, Bench
    * and the test harness all set it); mutating session-global conf from
    * a loader surprised callers, so an unset conf now fails fast with the
    * fix spelled out instead of being silently flipped.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet carries TIMESTAMP(NANOS): set " +
        "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession builder")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      // integer division — Double division would lose precision at 1e18 ns
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Register every table as a temp view named exactly as the table, so
    * `spark.sql` queries and the DuckDB oracle see the same relations.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
