package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for the named
  * queries (or a default set) at the given sf dir — the
  * `.explain("formatted")` feedback loop for pushdown/broadcast/codegen
  * review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_star_join_agg",
        "q07_fingerprint_pipeline", "q15_map_update_fact", "t06_ann_brute")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries.getOrElse(n, DataQueries.benchOnly(n))(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
