package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in [[CoreQueries]] (reference-parity operators, SURVEY §2)
  * and [[DataQueries]] (training-data pipeline operators); DuckDB oracle SQL
  * in [[Oracles]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The S1 fingerprint pipeline — detail⋈header join, canonical hash,
    * fingerprint-dimension lookup, grouped aggregate. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q07FingerprintPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ DataQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/simhash candidate generation, media stubs) → rows-only check. */
  def oracleSql: Map[String, String] = Oracles.all
}
