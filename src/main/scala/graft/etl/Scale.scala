package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB posture: skew mitigation, approximate
  * variants, partitioned fact layout.
  *
  * AQE (on by default in Spark 4) already handles moderate skew at
  * runtime; these helpers are for the pathological keys the reference
  * workload exhibits — e.g. the 'MC' client carrying most fingerprints
  * (S1:97) and the ~9M-patron Undefined backfill (Seg:211).
  */
object Scale {

  /** Two-phase salted aggregation for heavily skewed group keys: group on
    * (key, salt) first (spreads one hot key over `salts` reducers), then
    * re-aggregate per key. `aggs` must be decomposable (sum/count/min/max —
    * merge(agg) == agg); pass the partial->final merge exprs. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Skew-aware join: replicate the (small) right side `salts` times and
    * salt the left side, so one hot left key fans across `salts` tasks
    * instead of one straggler. Equivalent rows to a plain inner equi-join. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }

  /** Opt-in approximate distinct for 100 TB rollups — the reference's
    * COUNT(DISTINCT ...) is exact (S1:79, Seg:420) and stays the default;
    * HLL gives a single-pass, mergeable alternative at scale. */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     rsd: Double = 0.01): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd)
        .as(s"approx_distinct_$valueCol"))

  /** Month-partitioned fact layout: writes with a yyyyMM partition column
    * so the reference's DateKey-window predicates (O16) become partition
    * pruning, not scans. Repartitions on the partition column first —
    * without it every task writes a file into every month directory
    * (tasks × months small files; at 1000 executors over a decade of
    * months that is ~10^5 files per write). One giant month can instead
    * be spread with `repartition(n, col, salt)` at the call site — the
    * partitionBy layout is unaffected by extra split files within a
    * month. Returns the partition column name used. */
  def writeFactByMonth(fact: DataFrame, dateKeyCol: String,
                       path: String): String = {
    fact.withColumn("date_month", (col(dateKeyCol) / 100).cast("int"))
      .repartition(col("date_month"))
      .write.mode("overwrite")
      .partitionBy("date_month")
      .parquet(path)
    "date_month"
  }

  /** Bucketed table layout for co-located joins: both sides written with
    * `bucketBy` on the join key (same bucket count) sort-merge join with
    * NO exchange on either side — the repeated fact<->dim mapping passes
    * (O7, ~15 occurrences in the reference) re-join the same keys every
    * month, so paying the shuffle once at write time amortizes it across
    * every subsequent run. Optional `sortBy` also removes the join-time
    * sort. Bucket metadata lives in the session catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}
