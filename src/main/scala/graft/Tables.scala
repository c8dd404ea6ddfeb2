package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` has been generated two ways across driver rounds:
    * Parquet TIMESTAMP(NANOS) — which Spark 4 rejects outright
    * ([PARQUET_TYPE_ILLEGAL]) unless read as a raw nanosecond long via the
    * legacy conf — and TIMESTAMP(MICROS, isAdjustedToUTC=false), which
    * Spark reads as TIMESTAMP_NTZ. Both normalize to a session-TZ
    * microsecond TimestampType here (sessions pin UTC, so the NTZ cast
    * preserves the wall clock, and the ns→µs floor-truncation matches
    * DuckDB's µs timestamps).
    *
    * The nanosAsLong conf belongs in the session builder (Verify, Bench
    * and the test harness all set it); an unresolvable nanos file fails
    * fast with the fix spelled out instead of the conf being silently
    * flipped from inside a loader.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw =
      try spark.read.parquet(s"$dir/events.parquet")
      catch {
        case e: Exception if Option(e.getMessage)
            .exists(_.contains("PARQUET_TYPE_ILLEGAL")) =>
          throw new IllegalArgumentException(
            "events.parquet carries TIMESTAMP(NANOS): set " +
              "spark.sql.legacy.parquet.nanosAsLong=true on the " +
              "SparkSession builder", e)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division — Double division would lose precision at 1e18 ns
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Register every table as a temp view named exactly as the table, so
    * `spark.sql` queries and the DuckDB oracle see the same relations.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
