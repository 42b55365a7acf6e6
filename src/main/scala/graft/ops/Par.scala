package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared fan-out parallelism guard — the ENGINE.md "fanOutReady
  * stats-floor" operator-library contract, promoted from TextOps in
  * round 15 when the Profile sweep found the same one-task pathology
  * on the NON-text per-row kernel scans (t80's two brute-force cosine
  * passes, t56's MinHash signature build/probe: ~1.2 s of CPU each on
  * one core with 31 idle at sf0.1).
  *
  * A per-row amplifying stage — a tokenize/explode (~100x rows) or a
  * heavy per-row kernel (k cosines, b*r MinHash lanes) — inherits its
  * input's scan parallelism, and a sub-split-size parquet file scans
  * as ONE task. This guard round-robins such inputs to
  * `defaultParallelism` BEFORE the amplifier, under the contract
  * PlanSpec pins on both edges:
  *
  *   - probe via OPTIMIZER STATS, never `Dataset.rdd` (under AQE,
  *     `.rdd` eagerly re-executes every upstream shuffle stage just to
  *     read a partition count, and throws on a streaming frame);
  *     streaming frames skip outright;
  *   - floor 128 KB: a streaming microbatch (~75 KB part file) must
  *     not pay the exchange every trigger — its serial amplifier was
  *     never the bottleneck (round-14 s12 trend catch). 128 KB because
  *     the stats are COLUMN-PRUNED estimates, not raw file size;
  *   - ceiling defaultParallelism x 16 MB: anything estimated past it
  *     is already split-parallel at scan time — every real table at
  *     100 TB — so the production path never pays the exchange;
  *   - results must be partition-independent (per-row computation,
  *     order-free aggregates), so every oracle replays unchanged.
  */
private[graft] object Par {
  def fanOutReady(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= 128L * 1024 &&
        bytes < BigInt(want) * 16L * 1024 * 1024) df.repartition(want)
    else df
  }
}
