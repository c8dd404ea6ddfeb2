package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder().master("local[32]").appName("qbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // same session shape as Bench/Verify: queries using CALL / graft
      // DDL need the parser extension
      .config("spark.sql.extensions",
        classOf[graft.iceberg.connector.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm
      fn(spark, sfDir).collect()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).collect(); (System.nanoTime()-t0)/1e9
      }
      println(f"QBENCH $n min=${times.min}%.3f runs=${times.map(t=>f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
