package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line per
  * completed pass PLUS a final min-of-N line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Survivability protocol (round-4 post-mortem: a 43-minute run on a
  * degraded host died of executor-heartbeat timeout and, because the one
  * JSON line printed only after ALL passes, the round's entire bench
  * signal was lost):
  *   - each completed pass prints its own JSON line immediately
  *     ({"metric":"pass","pass":N,...} — same shape as the total line),
  *     so killing the process at any point after pass 1 still leaves a
  *     parseable result in the log tail;
  *   - every query runs under a watchdog (SPARK_GRAFT_BENCH_CAP seconds,
  *     default 120): on timeout its Spark job group is cancelled and the
  *     query records -1 for the pass;
  *   - a query that throws records -1 (previously its elapsed-to-failure
  *     time was silently folded into the total);
  *   - -1 entries are excluded from every total; a query that never
  *     succeeded appears as -1 in "queries" so breakage is visible;
  *   - reps auto-downshift: if a completed pass exceeds
  *     SPARK_GRAFT_BENCH_BUDGET wall seconds (default 300), remaining
  *     passes are skipped — a 10-50x-degraded host yields one honest
  *     pass instead of a dead process.
  *
  * Timing protocol (round-3 verdict: identical code swung 3-8x between
  * rounds, so single-shot numbers are JIT/GC noise): one untimed warm-up
  * (scan-agg-join round trip + the q48/q49/q50 fixture exports, so no
  * pass pays one-time materialization I/O), then up to
  * SPARK_GRAFT_BENCH_REPS (default 2) full passes, reporting the
  * per-query MIN across passes. The staging memos (t03/t14 verified
  * pairs, Seg-family ratios) are cleared before each pass so every pass
  * pays each staging fill exactly once; the Seg fill itself is timed as
  * its own "seg_staging" entry (inside the gated total — the work is
  * real) so q34/q41/q43/q44 time only their incremental cost.
  *
  * `value` sums the mins of the oracle-verified queries only — directly
  * comparable to BASELINE.md and earlier rounds. The xxhash64 scale-path
  * variants (DataQueries.benchOnly) are timed the same way but reported
  * under the separate "scale_queries" key: same pipeline shapes, the
  * hash family a cluster would actually run (Verify can't check them —
  * DuckDB cannot recompute xxhash64 — so they must not inflate or
  * deflate the gated total).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val capSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "120").toDouble
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "300").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JIT/codegen round trip, then the three export-backed
    // queries so the one-time CSV/JSON/partitioned fixture materialization
    // happens outside every timed region (the export memo persists across
    // passes; only the staging memos are cleared per pass).
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count().count()
      SparkEntry.queries.view
        .filterKeys(k => k.startsWith("q48") || k.startsWith("q49") ||
          k.startsWith("q50"))
        .foreach { case (_, fn) => fn(spark, sfDir).count() }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }

    /** Run one action under a watchdog: elapsed seconds on success, -1 on
      * throw or on exceeding the cap (the query's job group is cancelled
      * so a hung query can't also poison the next one). Job groups are
      * thread-local, so the group is set inside the worker thread. */
    def timed(name: String)(action: => Unit): Double = {
      val t0 = System.nanoTime()
      @volatile var failed: Option[String] = None
      val worker = new Thread(() => {
        try {
          spark.sparkContext
            .setJobGroup(s"bench-$name", name, interruptOnCancel = true)
          action
        } catch { case e: Throwable => failed = Some(String.valueOf(e)) }
      }, s"bench-$name")
      worker.setDaemon(true)
      worker.start()
      worker.join((capSec * 1000).toLong)
      if (worker.isAlive) {
        spark.sparkContext.cancelJobGroup(s"bench-$name")
        worker.join(15000)
        System.err.println(s"[bench] $name exceeded ${capSec}s cap, cancelled")
        -1.0
      } else if (failed.isDefined) {
        System.err.println(s"[bench] $name failed: ${failed.get}")
        -1.0
      } else (System.nanoTime() - t0) / 1e9
    }

    def timePass(qs: Seq[(String, (SparkSession, String) => DataFrame)])
        : Seq[(String, Double)] =
      qs.map { case (name, fn) =>
        name -> timed(name) { fn(spark, sfDir).count(); () }
      }

    val main = ("seg_staging" ->
      ((s: SparkSession, d: String) => {
        CoreQueries.warmSegStaging(s, d)
        s.emptyDataFrame
      })) +: SparkEntry.queries.toSeq.sortBy(_._1)
    val scale = DataQueries.benchOnly.toSeq.sortBy(_._1)

    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def sumOk(rs: Seq[(String, Double)]): Double =
      rs.collect { case (_, v) if v >= 0 => v }.sum

    var passes = Vector.empty[(Seq[(String, Double)], Seq[(String, Double)])]
    var pass = 0
    var continue = true
    while (continue && pass < reps) {
      pass += 1
      val w0 = System.nanoTime()
      // cold staging per pass: drop the t03/t14 verified-pairs checkpoint
      // AND every persisted frame (segStaging etc.), so each pass pays
      // each staging fill exactly once — the same work profile as the
      // earlier single-pass rounds
      DataQueries.clearStagingCache()
      CoreQueries.clearStagingCache()
      spark.catalog.clearCache()
      val p = (timePass(main), timePass(scale))
      passes :+= p
      val wall = (System.nanoTime() - w0) / 1e9
      println(s"""{"metric":"pass","pass":$pass,"value":${sumOk(p._1)},""" +
        s""""unit":"sec","wall":$wall,"queries":${jsonMap(p._1)},""" +
        s""""scale_queries":${jsonMap(p._2)},"sf":"$sfDir"}""")
      if (wall > budgetSec && pass < reps) {
        System.err.println(
          s"[bench] pass $pass took ${wall}s > ${budgetSec}s budget; " +
            s"downshifting from $reps to $pass passes")
        continue = false
      }
    }

    // per-query min over passes, ignoring failed (-1) passes; a query that
    // never succeeded stays -1 and is excluded from the total
    def minOver(per: Seq[Seq[(String, Double)]]): Seq[(String, Double)] =
      per.flatten.groupBy(_._1).map { case (k, vs) =>
        val ok = vs.map(_._2).filter(_ >= 0)
        k -> (if (ok.nonEmpty) ok.min else -1.0)
      }.toSeq.sortBy(_._1)
    val results = minOver(passes.map(_._1))
    val scaleResults = minOver(passes.map(_._2))
    println(s"""{"metric":"total","value":${sumOk(results)},"unit":"sec",""" +
      s""""reps":${passes.size},"queries":${jsonMap(results)},""" +
      s""""scale_queries":${jsonMap(scaleResults)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
