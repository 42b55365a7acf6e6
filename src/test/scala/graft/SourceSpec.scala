package graft

import org.apache.spark.sql.functions._
import graft.etl.{Tables => T}

/** Non-parquet O1 sources: schema-explicit CSV / JSON-lines readers and
  * the fixture re-materialization used by q48/q49. */
class SourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv: header + explicit schema round-trips types, quotes, nulls") {
    val dir = tmp("graft_csv")
    Seq((1L, "plain", 1.5), (2L, "comma, quoted \"x\"", -2.25),
        (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "s", "v")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val back = T.csv(spark, dir, "id BIGINT, s STRING, v DOUBLE")
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(1).getString(1) == "comma, quoted \"x\"")
    assert(back(1).getDouble(2) == -2.25)
    assert(back(2).isNullAt(1))
  }

  test("jsonLines: dates serialize as ISO strings and parse back typed") {
    val dir = tmp("graft_json")
    Seq((1L, "1996-01-02", 100.25), (2L, "1997-12-31", -0.5))
      .toDF("id", "d", "v").withColumn("d", col("d").cast("date"))
      .coalesce(1).write.mode("overwrite").json(dir)
    val back = T.jsonLines(spark, dir, "id BIGINT, d DATE, v DOUBLE")
      .orderBy("id").collect()
    assert(back(0).getDate(1).toString == "1996-01-02")
    assert(back(1).getDouble(2) == -0.5)
  }

  test("exportedCopy: one write per fixture version, stable path on re-ask") {
    val d = "/root/testdata/sf0.001"
    val p1 = T.exportedCopy(spark, d, "nation", "csv",
      Seq("n_nationkey", "n_name"))
    val p2 = T.exportedCopy(spark, d, "nation", "csv",
      Seq("n_nationkey", "n_name"))
    assert(p1 == p2)
    val back = T.csv(spark, p1, "n_nationkey BIGINT, n_name STRING")
    assert(back.count() == 25)
  }

  test("q48/q49 source queries equal the parquet-side formulation") {
    val d = "/root/testdata/sf0.001"
    val viaCsv = CoreQueries.q48CsvSource(spark, d).collect()
    val viaParquet = T.customer(spark, d)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("sum_bal"),
        min(col("c_custkey")).as("min_key"))
      .orderBy(col("c_mktsegment")).collect()
    assert(viaCsv.toSeq == viaParquet.toSeq)

    val viaJson = CoreQueries.q49JsonSource(spark, d).collect()
    val ordersParquet = T.orders(spark, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_total"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy(col("order_month")).collect()
    assert(viaJson.toSeq == ordersParquet.toSeq)
  }
}
