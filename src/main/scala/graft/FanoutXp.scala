package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only experiment (the Profile discipline): measure the
  * fanOutReady ABOVE-CEILING regime — a corpus big enough to pass the
  * guard untouched still scans as size/maxPartitionBytes tasks, which
  * may under-parallelize the ~100x tokenize explode behind bm25Index.
  * Candidate remedies compared head to head on a synthetic corpus
  * (sf0.1 documents replicated with salted ids/text, ~2.5M docs):
  *
  *   scan128  — stock: maxPartitionBytes 128 MB (narrow scan)
  *   scan32   — the deployment knob: maxPartitionBytes 32 MB
  *   scan16   — knob harder: 16 MB
  *   rr32     — stock scan + forced round-robin repartition(32)
  *              (what widening the guard's ceiling would do)
  *
  * Each variant builds the full BM25 index (tokenize -> tf -> dl/df/N
  * joins -> postings projection) through the noop sink, twice; the
  * second run is reported (JIT/page-cache warm). Results feed the
  * ENGINE.md "above-ceiling regime" note and ROADMAP round-16 item 6.
  *
  * Usage: sbt "runMain graft.FanoutXp [replicas]" (default 250).
  */
object FanoutXp {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(250)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusPath = s"/tmp/fanoutxp_docs_$replicas.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath))) {
      val base = graft.etl.Tables.documents(spark, "/root/testdata/sf0.1")
        .select(col("doc_id"), col("text"))
      base.crossJoin(spark.range(replicas).select(col("id").as("__r")))
        .select((col("doc_id") * replicas + col("__r")).as("doc_id"),
          concat(col("text"), lit(" xp"),
            (col("doc_id") * replicas + col("__r")).cast("string"))
            .as("text"))
        // one wide write so the FILE layout, not this job, sets the
        // scan width under test (coalesce(4) -> ~4 big part files)
        .coalesce(4)
        .write.mode("overwrite").parquet(corpusPath)
      println(s"[xp] corpus written: $corpusPath")
    }
    val walk = java.nio.file.Files.walk(
      java.nio.file.Paths.get(corpusPath))
    val bytes =
      try walk.toArray
        .map(p => p.asInstanceOf[java.nio.file.Path].toFile)
        .filter(_.isFile).map(_.length).sum
      finally walk.close()
    println(f"[xp] corpus bytes on disk: ${bytes / 1e6}%.0f MB, " +
      s"replicas=$replicas")

    def build(label: String, mpb: Long, rr: Boolean): Unit = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
      (1 to 2).foreach { rep =>
        val corpus0 = spark.read.parquet(corpusPath)
        val corpus = if (rr) corpus0.repartition(32) else corpus0
        val scanParts = corpus0.rdd.getNumPartitions
        val t0 = System.nanoTime()
        graft.ops.TextOps.bm25Index(corpus)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[xp] $label rep$rep: $s%.1f s  (scan parts " +
          s"$scanParts${if (rr) " -> rr 32" else ""})")
      }
    }
    if (args.length > 1 && args(1) == "ab") {
      // alternating A/B at stock split settings: natural 8-task scan
      // vs forced 32-way round-robin, interleaved so host drift hits
      // both arms equally
      (1 to 3).foreach { _ =>
        build("scan128", 128L << 20, rr = false)
        build("rr32", 128L << 20, rr = true)
      }
    } else {
      build("scan128", 128L << 20, rr = false)
      build("scan32", 32L << 20, rr = false)
      build("scan16", 16L << 20, rr = false)
      build("rr32", 128L << 20, rr = true)
    }
    spark.stop()
  }
}
