package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Tables => T}
import graft.ops.{Dedup, Multimodal, Similarity, Stats, Temporal, TextOps}

/** Training-data pipeline operators over the `documents` / `embeddings` /
  * `events` fixtures: text analysis, dedup (exact / MinHash-LSH / SimHash /
  * Jaccard), similarity search, multimodal plumbing, streaming-shaped aggs.
  *
  * The fixtures contain no genuine near-duplicates (500 distinct random
  * texts), so the near-dup queries union each document with a deterministic
  * perturbed copy (id + 100000, first token dropped) — the operators then
  * must find exactly those planted pairs.
  */
object DataQueries {

  type Q = (SparkSession, String) => DataFrame

  /** docs ∪ perturbed-copy-of-docs (id+100000, first token dropped).
    * The fixture parquet is a single row group (1-2 input splits), while
    * the sketch kernels downstream are CPU-dense — repartition to the
    * session's parallelism so they use every core. At production scale
    * inputs arrive pre-split and this spread costs one cheap shuffle. */
  private def withPlantedDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val perturbed = base.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 2, 1000000)).as("text"))
    base.unionByName(perturbed)
  }

  /** Text analysis: token counts (whitespace + BPE-ish), quality score,
    * language ID, content fingerprint. */
  val t01DocStats: Q = (s, d) =>
    TextOps.documentStats(T.documents(s, d))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_bpe_tokens").cast("long").as("n_bpe_tokens"),
        col("n_chars_measured").cast("long").as("n_chars_measured"),
        col("quality"), col("lang_pred"), col("fingerprint"))
      .orderBy(col("doc_id"))

  /** Exact-dedup clusters keyed on a 2-token-prefix fingerprint (the full
    * corpus has no identical texts; the prefix key demonstrates the
    * hash-groupBy dedup on real collisions). */
  val t02ExactDedup: Q = (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), md5(concat_ws(" ",
        slice(split(lower(trim(col("text"))), "\\s+"), 1, 2))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("fp"))

  /** LSH-candidate pairs (md5 MinHash family, 8x4 bands) with exact
    * Jaccard >= 0.5 — must recover the planted (i, i+100000) pairs; the
    * DuckDB oracle recomputes identical signatures, bands and pairs.
    * Memoized per (session, dir) as a checkpointed staging frame — the
    * in-process analog of the reference's staging-table materialization
    * (S1:5 TRUNCATE+INSERT): t03 reports the pairs, t14 clusters them,
    * and the expensive sketch pipeline runs once per corpus, not per
    * query. (Plan-equality cache reuse can't serve this case: the
    * pipeline's lambda-bearing plans never compare equal across separate
    * builds.) */
  private val pairsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long), DataFrame]

  /** Staleness guard for the memo: the fixture's on-disk version. A
    * regenerated documents.parquet gets a new mtime → new memo key, so a
    * stale checkpoint is never served (it was previously keyed on
    * (session, dir) only and pinned forever). */
  private def fixtureVersion(d: String): Long = {
    val f = new java.io.File(s"$d/documents.parquet")
    val nested = Option(f.listFiles()).getOrElse(Array.empty)
    (f.lastModified() +: nested.map(_.lastModified())).max
  }

  /** Drop every memoized staging frame, eagerly unpersisting the
    * checkpointed blocks (CoreQueries.releaseStaging) instead of waiting
    * for GC + ContextCleaner; benches and tests call this for a
    * deterministic cold start. */
  def clearStagingCache(): Unit = {
    pairsMemo.values.foreach(CoreQueries.releaseStaging)
    pairsMemo.clear()
  }

  private def plantedVerifiedPairs(s: SparkSession, d: String): DataFrame = {
    val key = (s, d, fixtureVersion(d))
    pairsMemo.getOrElseUpdate(key, {
      // evict superseded versions of the same (session, dir) and entries
      // whose session has been stopped (they would pin blocks forever)
      pairsMemo.keys
        .filter(k => (k._1 == s && k._2 == d && k != key) ||
          k._1.sparkContext.isStopped)
        .foreach(k => pairsMemo.remove(k).foreach(CoreQueries.releaseStaging))
      val docs = withPlantedDups(T.documents(s, d))
      val cands = Dedup.minHashLshCandidatesMd5(docs, bands = 8,
        rowsPerBand = 4, shingleSize = 3)
      Dedup.jaccardVerify(cands, docs, threshold = 0.5).localCheckpoint()
    })
  }

  val t03MinHashLsh: Q = (s, d) =>
    plantedVerifiedPairs(s, d).orderBy(col("id_a"), col("id_b"))

  /** Near-dup CLUSTERS: the t03 pair pipeline (md5 MinHash-LSH candidates,
    * Jaccard >= 0.5) closed under transitivity via distributed min-label
    * connected components — one canonical doc (the cluster-min id) per
    * group. The DuckDB oracle recomputes the identical clusters with a
    * recursive CTE over the same edge set. */
  val t14NearDupClusters: Q = (s, d) => {
    val pairs = plantedVerifiedPairs(s, d).select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .select(col("id").cast("long").as("doc_id"),
        col("comp").cast("long").as("cluster_id"),
        (col("id") === col("comp")).cast("long").as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide exact line dedup (C4-style boilerplate removal) over
    * synthetic multi-line docs: a shared promo header and copyright footer
    * (one global survivor each), the per-doc body (always kept), a blank
    * separator (passes through), and the doc's first token as a line
    * (collides across docs sharing it — variable-size groups). */
  private def multiLineDocs(s: SparkSession, d: String) =
    T.documents(s, d).select(col("doc_id"),
      concat_ws("\n", lit("promo: subscribe now"), col("text"), lit(""),
        lit("copyright footer"),
        element_at(split(trim(col("text")), "\\s+"), 1)).as("text"))

  val t15LineDedup: Q = (s, d) => {
    TextOps.lineDedup(multiLineDocs(s, d))
      .select(col("doc_id"), col("clean_text"),
        col("n_kept").cast("long").as("n_kept"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified hash sampling: quality-mix construction
    * where long docs keep rate 0.75 and short docs 0.25, reproducibly
    * (md5-threshold decision — same selection on every engine and run;
    * dyadic rates make rate*2^32 integer-exact for the oracle compare). */
  val t16HashSample: Q = (s, d) => {
    val docs = T.documents(s, d)
    val rate = when(length(col("text")) >= 300, 0.75).otherwise(0.25)
    TextOps.hashSample(docs, col("doc_id"), rate, salt = "mix1")
      .select(col("doc_id"),
        when(length(col("text")) >= 300, "long").otherwise("short").as("band"))
      .orderBy(col("doc_id"))
  }

  /** Exact n-gram Jaccard on the deterministic planted pairs — the
    * oracle-checkable core of near-dup verification. */
  val t04JaccardPairs: Q = (s, d) => {
    val docs = withPlantedDups(T.documents(s, d))
    val pairs = T.documents(s, d).select(col("doc_id").as("id_a"),
      (col("doc_id") + 100000L).as("id_b"))
    Dedup.jaccardVerify(pairs, docs, shingleSize = 3, threshold = 0.0)
      .orderBy(col("id_a"))
  }

  /** SimHash near-dup candidates over planted dups: 64-bit simhash, 4-block
    * bucketing, Hamming <= 6. Uses the md5-derived sketch so the DuckDB
    * oracle recomputes identical hashes, blocks and distances. */
  val t05SimHash: Q = (s, d) =>
    Dedup.simHashCandidatesMd5(withPlantedDups(T.documents(s, d)),
        blocks = 4, maxHamming = 6)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("id_a"), col("id_b"))

  /** Brute-force cosine top-k ANN baseline: 8 query vectors vs the corpus. */
  val t06AnnBrute: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed ANN (random hyperplanes, multi-probe): the 100 TB scale
    * path — each query scans ~corpus/2^bits instead of everything. */
  val t07AnnLsh: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5, bits = 4)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Two-sided knn-join where queries = the whole corpus (every embedding
    * row asks for its 3 nearest): the large×large path [[Similarity
    * .knnJoin]] packages — no broadcast anywhere, both sides bucket-joined
    * on the 8-bit RHP key with multi-probe. PlanSpec guards the no-
    * broadcast shape; the oracle recomputes buckets from the inlined
    * hyperplane constants. */
  val t29KnnJoin: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Similarity.knnJoin(emb, emb, k = 3, bits = 8)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Adaptive-probe knn-join over the whole corpus: queries whose
    * Hamming-1 candidate census falls under k re-probe at Hamming-2; the
    * oracle mirrors the integer census and the split exactly, so a wrong
    * starvation decision on even one query breaks the hash. */
  val t30KnnAdaptive: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Similarity.knnJoinAdaptive(emb, emb, k = 5, bits = 8)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Graded probe-budget knn-join: every query takes the shallowest
    * probe set whose integer census covers k — own bucket only / Hamming-1
    * / Hamming-2. bits=8/k=8 over the fixture puts real population in
    * every tier (9/489/2 measured); the oracle recomputes both censuses
    * and the tier CASE exactly, so one query probing at the wrong depth
    * breaks the hash. */
  val t32KnnBudget: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Similarity.knnJoinBudget(emb, emb, k = 8, bits = 8)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Disjoint-corpora knn-join (`selfJoin = false`): the low-id half of
    * the embedding frame queries the high-id half RE-KEYED into the same
    * id range — every query id collides with a right-side id that names a
    * DIFFERENT vector, so the self-exclusion semantics are load-bearing:
    * the default self-join filter would silently drop those neighbors and
    * the census would undercount by one. The oracle mirrors the no-filter,
    * no-minus-one form exactly — a wrong selfJoin default breaks the hash. */
  val t31KnnDisjoint: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val left = emb.filter(col("vec_id") < 250)
    val right = emb.filter(col("vec_id") >= 250)
      .withColumn("vec_id", col("vec_id") - 250)
    Similarity.knnJoin(left, right, k = 3, bits = 8, selfJoin = false)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Multimodal plumbing: documents wrapped as binary media assets, decoded
    * partition-wise through the (stubbed) codec into typed metadata. */
  val t08MediaMeta: Q = (s, d) =>
    Multimodal.extractMeta(Multimodal.asAssets(T.documents(s, d)))
      .toDF()
      .select(col("asset_id"), col("modality"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("duration_ms").cast("long").as("duration_ms"))
      .orderBy(col("asset_id"))

  /** Frame-sampling plan for the video assets (1 frame/s, max 32) — over
    * the pure-expression metadata path (metadata-only consumer: stays
    * codegen'd, no mapPartitions boundary). */
  val t09FramePlan: Q = (s, d) =>
    Multimodal.frameSamplePlan(
        Multimodal.extractMetaExpr(Multimodal.asAssets(T.documents(s, d))))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("ts_ms").cast("long").as("ts_ms"))
      .orderBy(col("asset_id"), col("frame_idx"))

  /** Resize plan for the visual assets: fit-to-256 preserving aspect
    * ratio, no upscaling; resized payload represented by the md5-derived
    * stub hash (both recomputable by the oracle). */
  val t17MediaResize: Q = (s, d) =>
    Multimodal.resizePlan(
        Multimodal.extractMetaExpr(Multimodal.asAssets(T.documents(s, d))))
      .orderBy(col("asset_id"))

  /** The skew path end to end: two-phase salted aggregation over a
    * decimal measure must equal the plain GROUP BY (decimal addition is
    * associative, so the salt split is value-invisible) — the rollup a
    * hot-key fact table needs at 100 TB, oracle-checked against the
    * single-phase formulation. */
  val t18SaltedRollup: Q = (s, d) =>
    graft.etl.Scale.saltedSum(
        T.lineitem(s, d).select(col("l_returnflag"),
          col("l_extendedprice").cast("decimal(18,4)").as("rev")),
        Seq("l_returnflag"), "rev")
      .select(col("l_returnflag"), col("sum_rev").cast("double").as("sum_rev"))
      .orderBy(col("l_returnflag"))

  /** Sequence packing: documents into 2000-token bins across 8 parallel
    * buckets — deterministic hash-bucketed running-sum packing. */
  val t19DocPacking: Q = (s, d) =>
    TextOps.packDocuments(T.documents(s, d), capacity = 2000, buckets = 8)
      .orderBy(col("doc_id"))

  /** Hourly event rollup — the batch twin of the Structured Streaming
    * pipeline in graft.streaming.Streams (same grouping, same results). */
  val t10EventHourly: Q = (s, d) =>
    T.events(s, d)
      // group on the native timestamp truncation; render the hour string
      // only on the (tiny) aggregated output, not per input row. Assumes
      // the session timezone is DST-free (all mains pin UTC): under a DST
      // fall-back two truncated hours can render to one label
      .groupBy(date_trunc("HOUR", col("ts")).as("__h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(date_format(col("__h"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Session-window rollup over the event log — the batch twin of
    * graft.streaming.Streams.sessionRollup (30-min inactivity gap);
    * bounds as epoch micros for exact cross-engine comparison. */
  val t13Sessions: Q = (s, d) =>
    graft.streaming.Streams.sessionRollup(T.events(s, d))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Click->purchase attribution — the batch twin of the state-bounded
    * stream-stream interval join (graft.streaming.Streams.attributionJoin):
    * each purchase joined to same-user clicks in the preceding hour, then
    * the latest such click wins; n_candidates counts the window. Bounds as
    * epoch micros for exact cross-engine compare. */
  val t20ClickAttribution: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    val ev = T.events(s, d)
    graft.streaming.Streams.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), "1 hour")
      .withColumn("n_candidates",
        count(lit(1)).over(w.partitionBy(col("purchase_id"))))
      .withColumn("__rn", row_number().over(w.partitionBy(col("purchase_id"))
        .orderBy(col("click_ts").desc, col("click_id").desc)))
      .filter(col("__rn") === 1)
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("click_id").as("attributed_click"),
        unix_micros(col("click_ts")).as("click_us"),
        col("n_candidates").cast("long").as("n_candidates"))
      .orderBy(col("purchase_id"))
  }

  /** t20's left-outer form: EVERY purchase appears, unattributed ones with
    * NULL click columns — the batch twin of the streaming left-outer
    * interval join, whose NULL rows emit on watermark expiry. */
  val t21AttributionOuter: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    val ev = T.events(s, d)
    graft.streaming.Streams.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), "1 hour",
        joinType = "left_outer")
      .withColumn("n_candidates",
        count(col("click_id")).over(w.partitionBy(col("purchase_id"))))
      .withColumn("__rn", row_number().over(w.partitionBy(col("purchase_id"))
        .orderBy(col("click_ts").desc_nulls_last,
          col("click_id").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("click_id").as("attributed_click"),
        unix_micros(col("click_ts")).as("click_us"),
        col("n_candidates").cast("long").as("n_candidates"))
      .orderBy(col("purchase_id"))
  }

  /** IVF-style ANN: coarse-quantize the corpus against a deterministic
    * centroid set (every 250th vector), then search only matching lists.
    * The 100 TB shape: one broadcast assign pass + per-list scans. */
  val t11AnnIvf: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val centroids = emb.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val assigned = Similarity.ivfAssign(emb, centroids)
    val queries = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qv"),
        col("centroid_id"))
    queries.join(assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv"), col("centroid_id")), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** End-to-end IVF SEARCH — the consumer that makes the trained index
    * (t22/t28) usable the way t07's LSH path is: a deterministic
    * every-50th-vector centroid set (10 lists over the fixture corpus),
    * the whole corpus coarse-quantized once, then each query probes its
    * nprobe=3 nearest lists and ranks the union of their members. The
    * oracle recomputes assignment AND probe ranking from the ONE
    * centroid-distance CTE (same -cosine/centroid_id ordering rule), so
    * one query probing a wrong list breaks the hash. */
  val t33IvfTopK: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), centroids,
        k = 5, nprobe = 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One spherical-k-means training step over the embedding corpus from
    * the deterministic every-250th init — closes the "centroid training
    * out of scope" gap of the IVF index; exploded to (centroid, dim)
    * rows so the DuckDB oracle recomputes the identical assignment and
    * decimal-accumulated means. */
  val t22KmeansStep: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    Similarity.kmeansStep(emb, cents)
      .select(col("centroid_id"), posexplode(col("cvec")))
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("pos").cast("long").as("pos"), round(col("col"), 6).as("val"))
      .orderBy(col("centroid_id"), col("pos"))
  }

  /** TWO Lloyd iterations through [[Similarity.kmeansCentroids]] — pins
    * the training LOOP, not just one step: the round-2 re-assignment runs
    * against derived double means re-aligned to the corpus float element
    * type (Similarity.scala:147), a path a single-step oracle never
    * exercises. The DuckDB oracle unrolls both iterations term-for-term,
    * including the decimal-exact means and the double→float→double
    * round-trip of the alignment cast. */
  val t28KmeansTrain: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Similarity.kmeansCentroids(emb, initEvery = 250, iters = 2)
      .select(col("centroid_id"), posexplode(col("cvec")))
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("pos").cast("long").as("pos"), round(col("col"), 6).as("val"))
      .orderBy(col("centroid_id"), col("pos"))
  }

  /** Embedding-cosine near-duplicate detection: the corpus is unioned with
    * slightly-perturbed copies (id+100000, one component nudged); RHP-LSH
    * bucketing proposes candidates and the exact cosine >= 0.99 confirms.
    * Must recover the planted near-identical pairs. */
  val t12EmbeddingNearDup: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val all = emb.unionByName(perturbed)
    // Explicit-width bucket shuffle (round-16 profile, the x95
    // pattern): the self-join's shuffle is bytes-tiny, AQE coalesced
    // its reduce to ONE partition and the within-bucket cosine verify
    // ran serial (~1.6 s, 31 cores idle). REPARTITION_BY_NUM on the
    // join key is left alone by the coalescer and satisfies both join
    // legs, so no second exchange appears.
    val bucketed = all.withColumn("bucket",
      Similarity.rhpBucket(col("embedding"), 8))
      .repartition(s.sparkContext.defaultParallelism, col("bucket"))
    val l = bucketed.alias("l")
    val r = bucketed.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", Similarity.cosine(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= 0.99)
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Corpus profiling — exact token-count percentiles per length band
    * (the screening summary a training mix is tuned with); Spark's exact
    * `percentile` matches DuckDB `quantile_cont` linear interpolation. */
  val t23TokenQuantiles: Q = (s, d) => {
    val docs = T.documents(s, d).select(
      when(length(col("text")) >= 300, "long").otherwise("short").as("band"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    graft.ops.Stats.percentilesBy(docs, Seq(col("band")), "n_tokens",
        Seq(0.25, 0.5, 0.9))
      .select(col("band"), round(col("p_25"), 6).as("p_25"),
        round(col("p_50"), 6).as("p_50"), round(col("p_90"), 6).as("p_90"),
        col("n"))
      .orderBy(col("band"))
  }

  /** Value-distribution histogram over order totals (skew screening): 20
    * equal-width buckets over the observed [min, max], arithmetic mirrored
    * term-for-term by the oracle. */
  val t24Histogram: Q = (s, d) =>
    graft.ops.Stats.histogram(
        T.orders(s, d).select(col("o_totalprice")), col("o_totalprice"), 20)
      .select(col("bucket"), col("n").as("n_orders"))
      .orderBy(col("bucket"))

  /** TF-IDF keyword extraction: top-3 terms per document over the
    * fixture corpus, exact tf * ln(N/df) scoring mirrored by the oracle. */
  val t25Tfidf: Q = (s, d) =>
    TextOps.tfIdfTopTerms(T.documents(s, d), k = 3)
      .select(col("doc_id"), col("term_rank").cast("long").as("term_rank"),
        col("term"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"), col("term_rank"))

  /** Per-month z-score of order totals — decimal-exact moments, double
    * normalization, mirrored term-for-term by the oracle. */
  val t26Zscore: Q = (s, d) =>
    graft.ops.Stats.zscoreBy(
        T.orders(s, d).select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month")),
        Seq(col("month")), col("o_totalprice"))
      .select(col("o_orderkey").cast("long").as("o_orderkey"), col("month"),
        round(col("zscore"), 6).as("zscore"))
      .orderBy(col("o_orderkey"))

  /** Eval-set decontamination over a constructed training corpus: the
    * perturbed copies must flag as n-gram-contaminated, the verbatim
    * copies additionally as exact duplicates, and the synthetic clean
    * docs as neither. */
  val t27Decontaminate: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 2, 1000000))
        .as("text"))
    val exactCopies = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val clean = docs.select((col("doc_id") + 300000L).as("doc_id"),
      concat(lit("zzq "), col("doc_id").cast("string"),
        lit(" alpha beta gamma delta")).as("text"))
    val train = perturbed.unionByName(exactCopies).unionByName(clean)
    Dedup.decontaminate(train, docs, shingleSize = 5)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("exact_dup"), col("ngram_contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Synthetic repetition corpus for t34: each doc becomes four lines —
    * the body, its first-4-token prefix TWICE (one guaranteed within-doc
    * duplicate line), and a unique footer. Deterministic and mirrored
    * line-for-line by the oracle. */
  private def repDocs(s: SparkSession, d: String) = {
    val prefix = concat_ws(" ",
      slice(split(trim(col("text")), "\\s+"), 1, 4))
    T.documents(s, d).select(col("doc_id"),
      concat_ws("\n", col("text"), prefix, prefix,
        concat(lit("footer "), col("doc_id").cast("string"))).as("text"))
  }

  /** Gopher-style repetition screens over the planted-repetition corpus:
    * duplicate-line fraction / duplicate-line char fraction (pure
    * map-side array expressions) and the modal-bigram occurrence
    * fraction (one doc-keyed aggregate). */
  val t34RepetitionStats: Q = (s, d) =>
    TextOps.repetitionStats(repDocs(s, d))
      .orderBy(col("doc_id"))

  /** Per-source document cap (domain-balancing): at most 20 docs per
    * source, selected by the deterministic md5-order sample — the
    * training-mix construction that stops one domain dominating. */
  val t35CapPerSource: Q = (s, d) =>
    TextOps.capPerGroup(
        T.documents(s, d).select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), n = 20, salt = "cap1")
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
      .orderBy(col("doc_id"))

  /** Corpus heavy hitters: exact top-20 word bigrams with counts —
    * the boilerplate/vocabulary screen. The fixture parquet is a single
    * row group (1 input split) while the bigram explode is CPU-dense, so
    * spread to the session's parallelism first (same rationale as
    * [[withPlantedDups]]; profiled: the un-spread form ran its whole
    * explode+count in ONE task). */
  val t36TopNgrams: Q = (s, d) =>
    TextOps.topNgrams(
        T.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism),
        n = 2, k = 20)
      .orderBy(col("rk"))

  /** PII scrub over a planted-PII corpus: every doc gets a deterministic
    * e-mail and phone appended, every third doc a card number; the scrub
    * must mask exactly those and count them. */
  val t37PiiScrub: Q = (s, d) => {
    val planted = T.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"),
        lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        when(col("doc_id") % 3 === 0, lit(" card 4111111111111111"))
          .otherwise(lit(""))).as("text"))
    TextOps.scrubPii(planted)
      .orderBy(col("doc_id"))
  }

  /** PQ encode of the embedding corpus: m=4 subspaces over the 64-dim
    * vectors, codebooks sampled every 25th vector — each vector becomes
    * 4 small codes (decimal-exact argmin, code_id tiebreak). */
  val t38PqEncode: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val cb = Similarity.pqCodebooksFromSample(emb, m = 4, every = 25)
    Similarity.pqEncode(emb, cb, m = 4)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("subspace").cast("long").as("subspace"),
        col("code_id").cast("long").as("code_id"))
      .orderBy(col("vec_id"), col("subspace"))
  }

  /** PQ asymmetric-distance search: full-precision queries (vec_id < 8)
    * against the code-space corpus, top-5 by the decimal-exact ADC sum. */
  val t39PqAdc: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val cb = Similarity.pqCodebooksFromSample(emb, m = 4, every = 25)
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 8), cb, m = 4, k = 5)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"), col("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ composition: the t33 coarse quantizer (vec_id % 50 centroid
    * lists, nprobe=3) restricts candidates, the t38/t39 PQ codebooks
    * score them in code space — the compressed-probed-scan shape a
    * 100 TB index actually runs. The oracle recomputes assignment,
    * probe set, codes and the decimal ADC sum from the same CTEs. */
  val t40IvfPq: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebooksFromSample(emb, m = 4, every = 25)
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8), centroids,
        cb, m = 4, k = 5, nprobe = 3)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"), col("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One L2-Lloyd refinement of the t38 PQ codebooks, exploded to
    * (subspace, code_id, pos, val) rows (t22's output discipline) — the
    * oracle recomputes assignment and the decimal-accumulated means
    * term-for-term. */
  val t41PqKmeans: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Similarity.pqCodebooksKmeans(emb, m = 4, every = 25, iters = 1)
      .select(col("subspace").cast("long").as("subspace"), col("code_id"),
        posexplode(col("w")))
      .select(col("subspace"), col("code_id"),
        col("pos").cast("long").as("pos"), round(col("col"), 6).as("val"))
      .orderBy(col("subspace"), col("code_id"), col("pos"))
  }

  /** Training-mix egress: per-source cap (30) -> banded hash sample
    * (long docs 0.75, short 0.25, dyadic so the threshold is
    * integer-exact) -> sequence packing -> bucket-partitioned parquet,
    * read back through partition discovery. The materialization is paid
    * INSIDE the query (q54's discipline), so the write path is under
    * the oracle: dropped rows, mangled partition values or a
    * nondeterministic sample all break the hash. */
  val t42TrainingMix: Q = (s, d) => {
    val path = graft.etl.Tables.scratchDir("training_mix")
    TextOps.writeTrainingMix(T.documents(s, d), path,
        capPerSource = 30,
        rate = when(length(col("text")) >= 300, 0.75).otherwise(0.25),
        salt = "mix2", capacity = 2000, buckets = 8)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("bucket").cast("long").as("bucket"),
        col("bin").cast("long").as("bin"),
        col("n_tokens").cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Packed-sequence payloads: t19's packing plan materialized — member
    * docs of every (bucket, bin) concatenated in id order with an EOS
    * separator; the oracle rebuilds each sequence byte-for-byte with an
    * ordered string_agg. */
  val t43PackedSequences: Q = (s, d) => {
    val docs = T.documents(s, d)
    val packed = TextOps.packDocuments(docs, capacity = 2000, buckets = 8)
    TextOps.materializeSequences(docs, packed)
      .select(col("bucket").cast("long").as("bucket"),
        col("bin").cast("long").as("bin"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"), col("seq_text"))
      .orderBy(col("bucket"), col("bin"))
  }

  /** SemDeDup-style semantic dedup: the t12 perturbed-twin corpus (every
    * vector + a +0.001 first-dim copy at id+100000) partitioned by the
    * t33 coarse quantizer (every-50th-vector centroids), then the
    * lower-id dominance screen at cosine >= 0.99 WITHIN clusters only.
    * Every twin must flag as a dup of its original (same cluster, cosine
    * ~1) and originals must survive; the oracle recomputes the
    * assignment AND the within-cluster pair screen, so a vector flagged
    * from outside its cluster — or a twin assigned to a different list
    * than its original — breaks the hash. */
  val t44SemanticDedup: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val all = emb.unionByName(perturbed)
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    Dedup.semanticDedup(all, centroids, tau = 0.99)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("centroid_id").cast("long").as("centroid_id"),
        col("is_semantic_dup"))
      .orderBy(col("vec_id"))
  }

  /** Residual-encoded IVF-PQ (the FAISS IVFPQ composition): t40's coarse
    * quantizer and probe rule, but PQ codes taken over (vector − assigned
    * centroid) and the query distance table built per probed list
    * against the query's residual in THAT list's frame. Codebooks =
    * every-25th residual (trained on the residual space). The oracle
    * recomputes assignment, residuals, codes, the per-list query tables
    * and the decimal ADC sum — a candidate scored against the wrong
    * list's query residual breaks the hash. */
  val t45IvfPqResidual: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val cb = Similarity.ivfPqResidualCodebooks(emb, centroids,
      m = 4, every = 25)
    Similarity.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < 8),
        centroids, cb, m = 4, k = 5, nprobe = 3)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"), col("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Near-dup ingest gate, batch parity shape: the t03 twin corpus
    * (first word dropped, id+100000) screened against the md5 band index
    * of the ORIGINAL documents — one flag row per incoming doc, 1 iff
    * any MinHash band collides with the static index. The oracle
    * recomputes the signature, banding, index membership and the
    * unshingleable-doc passthrough exactly; the streaming runner applies
    * the same gate per microbatch (StreamingSpec pins paced == batch,
    * benched as s05). */
  val t46NearDupGate: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val incoming = docs.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ",
        slice(split(trim(col("text")), "\\s+"), 2, 1000000)).as("text"))
    Dedup.nearDupFlagMd5(incoming, Dedup.nearDupIndexMd5(docs))
      .select(col("doc_id").cast("long").as("doc_id"), col("is_near_dup"))
      .orderBy(col("doc_id"))
  }

  /** Cross-document repeated-substring removal on planted boilerplate:
    * a 13-token license sentence is grafted onto two thirds of the
    * corpus — as a PREFIX SEPARATED BY A NEWLINE on doc_id%3==0 (the
    * span crosses a line boundary, which line dedup cannot see) and as
    * a suffix on doc_id%3==1; doc_id%3==2 is the untouched control.
    * Every boilerplate token must be excised (all its 5-gram windows
    * recur corpus-wide). The fixture vocabulary is deliberately tiny,
    * so ORGANIC 5-gram recurrences across >= 3 docs flag too — the
    * corpus-frequency machinery is exercised on real collisions, not
    * only the plant; the oracle replays the construction, shingle
    * document-frequencies, run coverage and reassembly
    * token-for-token (the surgical-excision demonstration on crafted
    * text lives in TextDedupSpec). */
  val t54RepeatedSubstring: Q = (s, d) => {
    val boiler = "this software is provided as is without any express " +
      "or implied warranty of merchantability"
    val docs = T.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
          concat(lit(boiler), lit("\n"), col("text")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" "), lit(boiler)))
        .otherwise(col("text")).as("text"))
    TextOps.repeatedNgramRemovalMd5(docs, n = 5, minDocs = 3)
      .select(col("doc_id").cast("long").as("doc_id"), col("clean_text"),
        col("n_kept"), col("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** t54's machinery under the DEDUP contract (`keepFirst = true`): the
    * corpus's NATURAL cross-doc 5-gram duplication (no planted
    * boilerplate, minDocs = 2), with exactly one copy of every
    * duplicated span surviving — the min (doc_id, pos) canonical
    * occurrence. The oracle independently re-derives the canonical
    * pick (row_number over (dg, doc, pos)) and the canonical-coverage
    * save, so a single span cut in the wrong document breaks the
    * hash. */
  val t122KeepFirstDedup: Q = (s, d) =>
    TextOps.repeatedNgramRemovalMd5(T.documents(s, d), n = 5,
        minDocs = 2, keepFirst = true)
      .select(col("doc_id").cast("long").as("doc_id"), col("clean_text"),
        col("n_kept"), col("n_removed"))
      .orderBy(col("doc_id"))

  /** Duplicated-span audit report ([[TextOps.duplicateSpansMd5]]): the
    * maximal cross-doc duplicated token runs per document, BEFORE any
    * removal — where the duplication sits and how big it is. The
    * oracle replays the interval merge (running covered-end window +
    * break-flag running sum) span for span. */
  val t123DupSpans: Q = (s, d) =>
    TextOps.duplicateSpansMd5(T.documents(s, d), n = 5, minDocs = 2)
      .orderBy(col("doc_id"), col("span_start"))

  /** Deterministic shard-shuffle of the corpus into 8 equal shards:
    * global salted-md5 order, integer-exact contiguous cuts — the
    * oracle replays the permutation rank, every cut boundary and the
    * within-shard position, so one row in the wrong shard or position
    * breaks the hash. */
  val t55ShardShuffle: Q = (s, d) =>
    TextOps.shardShuffle(
        T.documents(s, d).select(col("doc_id"), col("source")), shards = 8)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("shard").cast("long").as("shard"),
        col("pos_in_shard").cast("long").as("pos_in_shard"))
      .orderBy(col("doc_id"))

  /** The t46 gate through the Bloom pre-filter, md5 family end to end:
    * the corpus band index is summarized into an m=2^16, k=3 bit
    * vector; incoming bands probe the broadcast vector map-side and
    * only surviving bands reach the exact band-keyed semi-join. The
    * oracle replays the bloom POSITION SET, the all-k-positions probe
    * and the exact join — so a drifted position function, a dropped
    * probe or a pre-filter that eats true positives all break the
    * hash. Flags must equal t46's exactly (a Bloom filter has no false
    * negatives; false positives only admit extra bands to the exact
    * join). */
  val t56NearDupGateBloom: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val incoming = docs.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ",
        slice(split(trim(col("text")), "\\s+"), 2, 1000000)).as("text"))
    val idx = Dedup.nearDupIndexMd5(docs)
    val bloom = Dedup.nearDupIndexBloomMd5(idx, m = 1 << 16, k = 3)
    Dedup.nearDupFlagBloomedMd5(incoming, idx, bloom, m = 1 << 16, k = 3)
      .select(col("doc_id").cast("long").as("doc_id"), col("is_near_dup"))
      .orderBy(col("doc_id"))
  }

  /** Exact-proportion stratified train/val/test split: per-source salted
    * md5 permutation cut at dyadic cumulative boundaries (0.75/0.875) —
    * the oracle recomputes rank, stratum size and the floor arithmetic,
    * so one row in the wrong split breaks the hash. */
  val t47StratifiedSplit: Q = (s, d) =>
    TextOps.stratifiedSplit(T.documents(s, d),
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("split"))
      .orderBy(col("doc_id"))

  /** Bigram-LM quality score (CCNet-style perplexity filter): the corpus
    * trains its own add-one-smoothed bigram model and every doc gets the
    * mean log-probability of its bigrams. The oracle replays counts,
    * vocabulary, every ln() term and the decimal accumulation. */
  val t48LmScore: Q = (s, d) => {
    val docs = T.documents(s, d)
    TextOps.lmScore(docs, docs)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_bigrams"), col("avg_logp"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup retention policy: the t14 clusters (t03 pairs closed under
    * transitivity) with keep-the-longest survivorship — one doc per
    * cluster by (token count desc, id). Unpaired docs survive as their
    * own cluster. The oracle recomputes clusters with the recursive CTE
    * and the rank with the same token rule, so a wrong survivor — or a
    * dropped unpaired doc — breaks the hash. */
  val t49RetainBest: Q = (s, d) => {
    val docs = withPlantedDups(T.documents(s, d))
    val pairs = plantedVerifiedPairs(s, d).select(col("id_a"), col("id_b"))
    val scores = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("score"))
    Dedup.retainBest(docs, pairs, scores)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("cluster_id").cast("long").as("cluster_id"), col("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** Distribution-drift monitor, batch parity shape: the reference
    * profile is frozen over the even-id half of the corpus and the full
    * corpus is monitored against it with tight tolerances — sources
    * whose odd-id docs pull the rounded means more than the tolerance
    * drift; the oracle replays the per-doc quality, both profiles and
    * the flag comparison exactly. The streaming runner is the same
    * aggregate in complete mode (s06; StreamingSpec pins paced ==
    * batch). */
  val t50DriftMonitor: Q = (s, d) => {
    val docs = T.documents(s, d)
    val profile = graft.streaming.Streams.referenceProfile(
      docs.filter(col("doc_id") % 2 === 0))
    graft.streaming.Streams.driftMonitor(docs, profile,
        qualityTol = 0.005, tokensTol = 1.0)
      .orderBy(col("source"))
  }

  /** Per-language bigram-LM score (CCNet's actual per-language form):
    * one model per `lang`, every count table and the vocabulary keyed by
    * it — the oracle replays each language's counts and every ln()
    * term. */
  val t51LmScoreByLang: Q = (s, d) => {
    val docs = T.documents(s, d)
    TextOps.lmScoreByLang(docs, docs)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("n_bigrams"), col("avg_logp"))
      .orderBy(col("doc_id"))
  }

  /** UniMax epoch allocation: per-source token sums, the capped
    * budget/tokens epoch ratio, integer replication + the deterministic
    * fractional pick — the oracle replays sums, division, floor and the
    * md5 threshold (t16's floor-then-cast rule). */
  val t52EpochAllocation: Q = (s, d) =>
    TextOps.epochAllocation(T.documents(s, d), budgetTokens = 5000L,
        maxEpochs = 4.0)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("n_tokens").cast("long").as("n_tokens"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Temperature-scaled mix allocation at T=2 (sqrt flattening): the
    * oracle replays the per-source token sums, the pow() shares, the
    * decimal-accumulated normalizer and the same epoch/threshold tail as
    * t52. */
  val t53TemperatureAllocation: Q = (s, d) =>
    TextOps.temperatureAllocation(T.documents(s, d),
        totalBudgetTokens = 20000L, temperature = 2.0, maxEpochs = 4.0)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("n_tokens").cast("long").as("n_tokens"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Semantic ingest gate, batch parity shape (the s07 stream's
    * per-microbatch screen): the frozen index is the corpus assigned to
    * the t33/t44 coarse quantizer (every-50th-vector centroids); the
    * incoming batch mixes the t44 perturbed twins (+0.001 on dim 0 at
    * id+100000 — same cluster as their original, cosine ~1, must flag 1)
    * with NEGATED vectors at id+200000 (cosine −1 to their original and
    * far from every list mate — must flag 0 unless a genuine >= tau mate
    * exists, which the oracle decides). The oracle recomputes BOTH
    * assignment passes and the within-list cosine screen, so a flag
    * sourced from outside the incoming vector's list — or an incoming
    * vector probing a different list than the gate assigns — breaks the
    * hash. */
  val t57SemanticGate: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val index = Dedup.semanticIndex(emb, centroids)
    val twins = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x))
        .as("embedding"))
    val negated = emb.select((col("vec_id") + 200000L).as("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    Dedup.semanticDupFlag(twins.unionByName(negated), index, centroids,
        tau = 0.99)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("is_semantic_dup"))
      .orderBy(col("vec_id"))
  }

  /** The t57 gate's recall knob exercised on a PLANTED boundary corpus
    * where probe depth visibly changes the answer (t57's twins
    * co-assign with their originals, so any probe depth gives the same
    * flags there — useless for pinning the probe machinery): each
    * incoming vector is its corpus original pulled toward centroid 0
    * (m = o + 0.75·c0, float arithmetic both engines replay exactly).
    * m's NEAREST list is c0's, where nothing reaches tau (cos(m, c0) ≈
    * 0.6 < 0.75); its >= tau mate o sits in whatever list ranks
    * SECOND, so the flag is decided by the probe ranking itself — on
    * this fixture 50 vectors flag at nprobe=1, 317 at nprobe=2, 401 at
    * nprobe=3, with every compare cosine >= 0.0034 from the threshold.
    * The oracle replays the blend, both assignment rankings (rn <= 2)
    * and the within-probed-list screen — one probe too many or too
    * few, or a wrong tiebreak, moves dozens of flags and breaks the
    * hash. SimilaritySpec pins the hand-built boundary-twin case and
    * nprobe monotonicity. */
  val t58SemanticGateProbed: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val index = Dedup.semanticIndex(emb, centroids)
    val c0 = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("__d"))
    val incoming = emb.crossJoin(broadcast(c0))
      .select((col("vec_id") + 300000L).as("vec_id"),
        zip_with(col("embedding"), col("__d"),
          (x, y) => x + lit(0.75f) * y).as("embedding"))
    Dedup.semanticDupFlagProbed(incoming, index, centroids,
        tau = 0.75, nprobe = 2)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("is_semantic_dup"))
      .orderBy(col("vec_id"))
  }

  /** C4 line-rule cleaning on a planted multi-line corpus: every doc
    * gets an unpunctuated header (dropped: terminal-punctuation rule),
    * its own text as a period-terminated body (kept iff >= 5 words —
    * the fixture's length spread exercises both outcomes), a
    * too-short line (dropped: word floor), a javascript line (dropped:
    * blocklist) and a surviving closer; doc_id%7==0 docs also carry a
    * "lorem ipsum {" line, tripping BOTH page screens (the line itself
    * dies on the punctuation rule). The oracle replays the
    * construction and all three line rules plus the page screens
    * character-for-character. */
  val t59C4LineFilter: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"),
      concat(
        lit("Shared promo header with no terminal punctuation\n"),
        trim(col("text")), lit(".\n"),
        lit("too short.\n"),
        lit("This line mentions javascript so the blocklist must " +
          "drop it.\n"),
        when(col("doc_id") % 7 === 0, lit("lorem ipsum {\n"))
          .otherwise(lit("")),
        lit("A final good line with enough words to survive the filter."))
        .as("text"))
    TextOps.c4LineFilter(docs, minWords = 5)
      .select(col("doc_id").cast("long").as("doc_id"), col("clean_text"),
        col("n_kept"), col("n_removed"),
        col("page_ok").cast("long").as("page_ok"))
      .orderBy(col("doc_id"))
  }

  /** Per-source head-of-distribution quality pruning: keep the top 3/4
    * of every source by (quality desc, doc_id). Quality is the t01
    * score (4-decimal-rounded — rank ties resolve identically in both
    * engines); the oracle replays the score, the per-source rank, the
    * group size and the integer rank·4 <= n·3 cut, so one row on the
    * wrong side of any source's boundary breaks the hash. */
  val t60QualityPrune: Q = (s, d) => {
    // score ONCE: the window sort key and the output column are
    // different Projects, and Catalyst does not CSE across them — the
    // 3-regex qualityScore battery ran twice per row (round-17)
    val docs = T.documents(s, d)
      .withColumn("quality", TextOps.qualityScore(col("text")))
    TextOps.keepTopFraction(docs, col("source"),
        col("quality"), col("doc_id"),
        num = 3, den = 4)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("quality"),
        col("grp_rank").cast("long").as("grp_rank"),
        col("grp_n"), col("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** t27's planted train corpus scored as overlap FRACTIONS: the
    * drop-first-word twins are near-fully contaminated (every surviving
    * 5-gram also occurs in the original), the exact copies sit at
    * overlap 1.0, and the zzq-prefixed fresh docs at 0.0 (6 tokens →
    * two 5-grams, each carrying the unique "zzq <id>" prefix, so
    * neither occurs in the eval set). The oracle replays the construction,
    * per-doc DISTINCT gram counts, the eval membership counts and the
    * exact long/long division. */
  val t61DecontaminationReport: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val perturbed = docs.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 2, 1000000))
        .as("text"))
    val exactCopies = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val clean = docs.select((col("doc_id") + 300000L).as("doc_id"),
      concat(lit("zzq "), col("doc_id").cast("string"),
        lit(" alpha beta gamma delta")).as("text"))
    // the mixed class: the original's first 8 tokens + a 6-token fresh
    // tail — only windows fully inside the copied prefix are
    // contaminated, so overlap lands at genuine fractions
    val mixed = docs.select((col("doc_id") + 400000L).as("doc_id"),
      concat(
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 8)),
        lit(" zzq mixa mixb mixc mixd mixe")).as("text"))
    val train = perturbed.unionByName(exactCopies).unionByName(clean)
      .unionByName(mixed)
    Dedup.decontaminationReport(train, docs, shingleSize = 5)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_grams"), col("n_contaminated"), col("overlap_frac"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-space drift, batch parity shape (t50's discipline on
    * the embedding modality): the frozen per-list profile comes from
    * the even-id half of the corpus and the FULL corpus is monitored
    * against it at a tight tolerance — lists whose odd-id members pull
    * the rounded mean cosine more than 0.012 drift; the oracle replays
    * the assignment (cosine kept), both decimal-accumulated means and
    * the flag comparison exactly. The streaming runner is the same
    * aggregate in complete mode (s08; StreamingSpec pins paced ==
    * batch). */
  val t62EmbeddingDrift: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val profile = Similarity.embeddingProfile(
      emb.filter(col("vec_id") % 2 === 0), cents)
    Similarity.embeddingDriftMonitor(emb, cents, profile, cosTol = 0.012)
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("n_vecs"), col("mean_cos"), col("drift"))
      .orderBy(col("centroid_id"))
  }

  /** SQ8 search over the embedding corpus — t06's brute-force contract
    * on int8 codes: per-vector max-abs symmetric encode (one exact
    * double division + integer rounding per element), then the
    * standard top-k rank on cosine(query, codes). The oracle replays
    * every code and the full ranking — one element rounded the other
    * way anywhere in the corpus moves a cosine and breaks the hash. */
  val t63SqTopK: Q = (s, d) => {
    // fanOutReady at the CALL SITE, not inside sqEncode (round-16 A/B):
    // here the corpus is a one-task scan and the encode feeds the
    // cosine amplifier — the guard took t63 0.89 -> 0.47 s; but inside
    // sqEncode it also fired on x63/x65's ALREADY-WIDE warm statics
    // (stats can't see width) and regressed them ~1.3-1.4x, so the
    // operator stays guard-free and narrow call sites opt in.
    val emb = graft.ops.Par.fanOutReady(
      T.embeddings(s, d).select(col("vec_id"), col("embedding")))
    Similarity.sqTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
      .select(col("query_id").cast("long").as("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Context-length chunking at maxTokens=40 / overlap=8 over the
    * corpus: the fixture's token-count spread produces single-chunk
    * short docs, exact-fit docs and multi-chunk long ones with a short
    * tail. The oracle replays the token split, the ceil boundary
    * arithmetic, every slice and the per-chunk token counts — one cut
    * off by one anywhere breaks the hash. */
  val t64ChunkDocuments: Q = (s, d) =>
    TextOps.chunkDocuments(T.documents(s, d), maxTokens = 40,
        overlap = 8)
      .select(col("doc_id").cast("long").as("doc_id"), col("chunk_no"),
        col("chunk_text"), col("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_no"))

  /** Binary-quantization search over the corpus: sign-bit codes,
    * Hamming shortlist of 20, exact-cosine rerank to top-5 for the
    * same 8-query slate as t63. The oracle recomputes every Hamming
    * count straight from the sign definition (count of dimensions
    * whose signs differ) — independent of the packed-word
    * representation the Spark path flows — then replays the shortlist
    * rank, the rerank and the round-4 cosines. */
  val t65BqTopK: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Similarity.bqTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
        shortlist = 20)
      .select(col("query_id").cast("long").as("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        col("hamming"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DSIR importance weights for the full corpus against the English
    * slice as the target distribution: word bigrams hashed into 512
    * buckets, add-one smoothed ratio, per-doc decimal-accumulated
    * log-weight sum rounded to 6. The oracle replays the bigram
    * construction, the md5 bucket of every gram, both count tables,
    * the totals and every ln() term. */
  val t66DsirWeights: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("lang"),
      col("text"))
    TextOps.dsirWeights(docs, docs.filter(col("lang") === "en"),
        n = 2, buckets = 512)
      .select(col("doc_id").cast("long").as("doc_id"), col("n_grams"),
        col("log_weight"))
      .orderBy(col("doc_id"))
  }

  /** DSIR scoring against a FROZEN profile built from different
    * corpora than the scored frame (raw model: even-id docs; target
    * model: English odd-id docs) — the build-once/score-forever seam
    * the streaming gate runs on. Scoring the full corpus exercises
    * the unseen-bucket path (grams the profile corpora never saw take
    * the pure smoothing ratio). The oracle rebuilds both count
    * tables from their sub-corpora and replays every term. */
  val t67DsirScoreFrozen: Q = (s, d) => {
    val docs = T.documents(s, d).select(col("doc_id"), col("lang"),
      col("text"))
    val prof = TextOps.dsirProfile(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("lang") === "en" && col("doc_id") % 2 === 1),
      n = 2, buckets = 512)
    TextOps.dsirScore(docs, prof, n = 2, buckets = 512)
      .select(col("doc_id").cast("long").as("doc_id"), col("n_grams"),
        col("log_weight"))
      .orderBy(col("doc_id"))
  }

  /** kNN label propagation over the embeddings fixture's label column:
    * the 8-query slate classified by the majority label of their 5
    * exact-cosine nearest neighbors, winner by (votes desc, label asc).
    * The oracle replays the ranking, the label join, every vote count
    * and the tiebreak. */
  val t68KnnPredict: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"),
      col("label"))
    Similarity.knnPredict(emb, emb.filter(col("vec_id") < 8), k = 5)
      .select(col("query_id").cast("long").as("query_id"),
        col("predicted_label").cast("long").as("predicted_label"),
        col("votes"))
      .orderBy(col("query_id"))
  }

  /** Graph-ANN beam search over the exact degree-4 neighbor graph
    * (corpus capped at the first 1024 vectors so the all-pairs graph
    * build stays oracle-cheap at any sf — x69 carries the bucketed
    * 16k regime with build and search timed separately): the FIXED
    * 10-node md5-order entry sample (round-10 fix — round-0 cost no
    * longer scales with the corpus), beam 4, TWO expansion rounds,
    * top-4. The oracle unrolls both rounds — graph edges, the md5
    * entry ranking, each round's expand/rescore/re-rank and the final
    * contract replayed join-for-join. */
  val t69GraphSearch: Q = (s, d) => {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 1024)
    // NO call-site spread (round-17 A/B): fanOutReady on the build
    // input read t69 1.09 adj vs same-run calibration — the 0.96 s
    // serial cosine stage sits inside the edge checkpoint's broadcast
    // path where the exchange only adds cost. Reverted, matching the
    // round-15 t80 brute-family conclusion.
    val graph = Similarity.knnGraphExact(emb, degree = 4)
    Similarity.graphSearch(emb, graph, emb.filter(col("vec_id") < 8),
        k = 4, beam = 4, rounds = 2, entryCount = 10)
      .select(col("query_id").cast("long").as("query_id"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id").cast("long").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Backward as-of join over the event log: each purchase enriched
    * with the latest same-user view at or before it (ties on view ts
    * broken by highest view id), unmatched purchases kept with nulls —
    * the price-as-of-trade / last-profile-before-event shape. The plan
    * contains NO join operator: one tagged union, one hash exchange on
    * user_id, one running-window carry (TemporalSpec pins that shape).
    * The oracle replays it as the classic range-join + top-1 — two
    * independent formulations, one result. */
  val t70AsofJoin: Q = (s, d) => {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    Temporal.asofJoin(purchases, views, Seq("user_id"), "ts", "view_ts",
        payload = Seq("view_id", "view_ts", "view_value"), tie = "view_id")
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"), col("view_id"),
        unix_micros(col("view_ts")).as("view_us"),
        round(col("view_value"), 4).as("view_value"))
      .orderBy(col("purchase_id"))
  }

  /** KMV bottom-k distinct sketch: approximate distinct users per
    * event type through [[graft.functions.KMinValues]] (k = 64; the
    * fixture's 150 true distincts per type keep every group on the
    * estimator branch at sf0.01). kth_min and the estimate are exact
    * functions of the md5-derived hash set, so DuckDB replays the
    * sketch by sorting the same hashes — an approximate operator with
    * an exact oracle. */
  val t71KmvDistinct: Q = (s, d) =>
    Stats.kmvDistinctBy(T.events(s, d), Seq("event_type"),
        col("user_id").cast("string"), k = 64)
      .orderBy(col("event_type"))

  /** Forward as-of with tolerance: each error event joined to the NEXT
    * same-user click within 30 minutes (earliest wins; ties broken by
    * lowest click id) — the alert-to-reaction shape, exercising the
    * forward direction and the tolerance void in the oracle, not just
    * the spec. */
  val t72AsofForward: Q = (s, d) => {
    val ev = T.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    Temporal.asofJoin(errors, clicks, Seq("user_id"), "ts", "click_ts",
        payload = Seq("click_id", "click_ts"), tie = "click_id",
        tolerance = Some("30 minutes"), forward = true)
      .select(col("error_id"), col("user_id"),
        unix_micros(col("ts")).as("error_us"), col("click_id"),
        unix_micros(col("click_ts")).as("click_us"))
      .orderBy(col("error_id"))
  }

  /** Priority sampling: a 5-per-source token-weighted sample of the
    * corpus — long docs win proportionally more often, short docs
    * still can. The md5-derived u and the division-only priority make
    * the SAMPLE itself (not just its size) engine-replayable. */
  val t73PrioritySample: Q = (s, d) =>
    TextOps.prioritySample(
        T.documents(s, d).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).as("n_tokens")),
        col("source"), col("n_tokens"), col("doc_id"), k = 5)
      .select(col("source"), col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(col("priority"), 4).as("priority"))
      .orderBy(col("source"), col("doc_id"))

  /** Nucleus (top-p) selection: per source, keep the highest-quality
    * docs until half the source's token mass is covered — every row
    * flagged, integer-exact boundary. */
  val t74TopPMass: Q = (s, d) =>
    TextOps.topPByMass(
        T.documents(s, d).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.qualityScore(col("text")).as("quality")),
        col("source"), col("quality"), col("n_tokens"), col("doc_id"),
        num = 1, den = 2)
      .select(col("doc_id"), col("source"),
        col("n_tokens").cast("long").as("n_tokens"), col("quality"),
        col("is_kept"))
      .orderBy(col("doc_id"))

  /** KMV set algebra: cross-language vocabulary overlap estimated from
    * the per-language bigram sketches ALONE (k = 64 longs per
    * language) — union, Jaccard and intersection per language pair
    * without ever joining the underlying gram rows. Exact function of
    * the hash sets, so DuckDB replays every estimate. */
  val t75KmvOverlap: Q = (s, d) =>
    Stats.kmvOverlap(
      Stats.kmvSketchBy(
        TextOps.ngramRows(T.documents(s, d), 2, keep = Seq("lang")),
        Seq("lang"), col("ngram"), k = 64),
      "lang", k = 64)
      .orderBy(col("g_a"), col("g_b"))

  /** Nearest-either-direction as-of: each signup joined to the
    * same-user click closest in time within 2 hours, equal distances
    * resolved backward — both carries over ONE exchange, no join
    * operator. */
  val t76AsofNearest: Q = (s, d) => {
    val ev = T.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    Temporal.asofNearest(signups, clicks, Seq("user_id"), "ts",
        "click_ts", payload = Seq("click_id", "click_ts"),
        tie = "click_id", tolerance = Some("2 hours"))
      .select(col("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("signup_us"), col("click_id"),
        unix_micros(col("click_ts")).as("click_us"), col("matched_dir"))
      .orderBy(col("signup_id"))
  }

  /** Sparse lexical similarity: top-3 nearest documents by tf-idf
    * cosine through the inverted-index join, df cap at 1/10 of the
    * corpus (the fixture's vocabulary is 29 stop-words + the planted
    * "dup" marker at 5% df — exactly the regime the prune exists for:
    * shared stop-terms contribute nothing, the rare term everything,
    * at any sf). */
  val t77SparseCosine: Q = (s, d) =>
    TextOps.sparseCosineTopK(T.documents(s, d), k = 3, maxDfNum = 1,
        maxDfDen = 10)
      .orderBy(col("query_id"), col("rank"))

  /** BM25 retrieval: every 50th document queries the full corpus
    * (self included — on a near-dup-planted fixture the self hit
    * ranking first is the sanity signal), k1/b at the classic
    * 1.2/0.75, exact (no df cap): the fixture's stop-term-heavy
    * vocabulary is precisely the regime the idf saturation exists
    * for, and exact keeps every term oracle-replayable. Queries are
    * additionally capped at doc_id < 1250 (a no-op at sf0.01, 25 of
    * 100 at sf0.1): with NO df prune every query's postings fan-out
    * is ~the full corpus on this stop-term-dense fixture, and the
    * exact decimal pair-accumulator pays BigDecimal boxing on every
    * row — the uncapped full-width regime is benched by x78 on the
    * production double-sum path instead (the t03/x03 family split). */
  val t78Bm25: Q = (s, d) => {
    val docs = T.documents(s, d)
    TextOps.bm25TopK(docs.filter(col("doc_id") % 50 === 0 &&
        col("doc_id") < 1250), docs, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hybrid dense+sparse retrieval: the fixture's embeddings and
    * documents share an id space, so every 50th id queries BOTH
    * modalities — brute cosine over the vectors (self excluded, the
    * t06 contract) and BM25 over the text (self included — it ranking
    * first is the lexical sanity signal) — and the two top-10 lists
    * fuse by reciprocal rank (k0=60). Incomparable score scales never
    * meet: only ranks do. */
  val t79HybridRrf: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val docs = T.documents(s, d)
    val dense = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1250),
      k = 10)
    val sparse = TextOps.bm25TopK(docs.filter(col("doc_id") % 50 === 0 &&
        col("doc_id") < 1250), docs, k = 10)
      .withColumnRenamed("doc_id", "neighbor_id")
    Similarity.rrfFuse(Seq(dense, sparse), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Margin-based bitext mining over a deterministic two-"language"
    * split of the embedding fixture (even ids vs odd ids — disjoint
    * frames, so selfJoin=false): brute-force k=4 neighbor lists in
    * both directions feed the ratio-margin scorer; every candidate
    * pair comes back with its margin, both ranks and the mutual-best
    * mining flag. */
  val t80MarginMine: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    Similarity.marginMine(
        Similarity.bruteForceTopK(tgt, src, k = 4, selfJoin = false),
        Similarity.bruteForceTopK(src, tgt, k = 4, selfJoin = false))
      .orderBy(col("src_id"), col("tgt_id"))
  }

  /** Retrieval eval in-engine: every 50th embedding queries the
    * corpus through the LSH path (bits=4, Hamming-1 probes) and is
    * scored per-query — recall@5, MRR@5, nDCG@5 — against the exact
    * brute-force top-5. Sparse-bucket queries that come back short
    * (or empty) are exactly what the metrics exist to expose. */
  val t81RankingMetrics: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val q = emb.filter(col("vec_id") % 50 === 0)
    Similarity.rankingMetrics(
        Similarity.lshTopK(emb, q, k = 5, bits = 4),
        Similarity.bruteForceTopK(emb, q, k = 5), k = 5)
      .orderBy(col("query_id"))
  }

  /** Ranking agreement without a truth set: how closely the LSH
    * retriever's top-5 tracks the exact brute-force top-5, per query,
    * as prefix RBO at p=9/10 — t81's cousin with the truth replaced
    * by a second system. Sparse-bucket queries with no overlap score
    * an explicit 0. */
  val t82Rbo: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    val q = emb.filter(col("vec_id") % 50 === 0)
    Similarity.rboSimilarity(
        Similarity.lshTopK(emb, q, k = 5, bits = 4),
        Similarity.bruteForceTopK(emb, q, k = 5), k = 5)
      .orderBy(col("query_id"))
  }

  /** Per-row grace-window as-of: each purchase carries ITS OWN
    * staleness budget (user tier -> 15 min / 1 h / 2 h), and the
    * latest prior view is kept only inside that row's budget — the
    * t70 operator with `toleranceCol` instead of one global interval.
    * Backward distance grows monotonically, so the oracle's
    * filter-then-top-1 range join is exactly void-after-pick. */
  val t83AsofGraced: Q = (s, d) => {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts"))
      .withColumn("grace_s",
        when(col("user_id") % 3 === 0, 900L)
          .when(col("user_id") % 3 === 1, 3600L)
          .otherwise(7200L))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    Temporal.asofJoin(purchases, views, Seq("user_id"), "ts",
        "view_ts", payload = Seq("view_id", "view_ts"),
        tie = "view_id", toleranceCol = Some("grace_s"))
      .select(col("purchase_id"), col("user_id"), col("grace_s"),
        unix_micros(col("ts")).as("purchase_us"), col("view_id"),
        unix_micros(col("view_ts")).as("view_us"))
      .orderBy(col("purchase_id"))
  }

  /** Decontamination-by-retrieval: every 5th document (capped at
    * doc_id < 2500 — the t78 fan-out discipline, a no-op at sf0.01)
    * screened against a frozen BM25 index of the every-10th-doc
    * "benchmark" subset; a top score >= 9.0 flags. The threshold sits
    * above the fixture's stop-term-similarity mass (p90 of tops
    * ~8.8 at sf0.01) so only verbatim/near-twin hits flag — measured:
    * 5 of 100, the 3 benchmark self-hits plus their 2 planted
    * near-dups. Benchmark members screen against themselves and flag
    * via their own self hit: the gate is deliberately
    * membership-blind. */
  val t84Bm25Gate: Q = (s, d) => {
    val docs = T.documents(s, d)
    TextOps.bm25ScreenFlag(
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") < 2500),
        TextOps.bm25Index(docs.filter(col("doc_id") % 10 === 0)),
        tau = 9.0)
      .select(col("doc_id"), col("bm25_top"), col("is_contaminated"))
      .orderBy(col("doc_id"))
  }

  /** HyperLogLog distinct counts per event type: users (~150 true
    * distincts per type → the linear-counting branch) and event ids
    * (~2000 per type → the raw harmonic-estimator branch), both from
    * one p=9 sketch pass each. The exported `*_s` harmonic sums and
    * `*_v` zero-register counts are EXACT integers the DuckDB oracle
    * rebuilds from the same md5-derived hashes, so an approximate
    * operator again gets an exact cross-engine check — and both
    * estimator branches are pinned by the same query. */
  val t85HllDistinct: Q = (s, d) => {
    val ev = T.events(s, d)
    val users = Stats.hllDistinctBy(ev, Seq("event_type"),
        col("user_id").cast("string"), p = 9)
      .select(col("event_type"), col("n_rows"),
        col("hll_v").as("users_v"), col("hll_s").as("users_s"),
        col("est_distinct").as("est_users"))
    val ids = Stats.hllDistinctBy(ev, Seq("event_type"),
        col("event_id").cast("string"), p = 9)
      .select(col("event_type"),
        col("hll_v").as("events_v"), col("hll_s").as("events_s"),
        col("est_distinct").as("est_events"))
    users.join(broadcast(ids), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  /** Morton z-values over (partkey, suppkey) buckets — the clustering
    * key behind [[graft.ops.Layout.writeZOrdered]]'s multi-dimensional
    * file-skipping layout. Pure bit arithmetic, replayed shift-for-
    * shift by the oracle; the layout pay-off itself (per-file min-max
    * tightness on BOTH dimensions at once) is pinned in ScaleSpec. */
  val t86ZValue: Q = (s, d) =>
    T.lineitem(s, d).filter(col("l_orderkey") < 600)
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(256L)).as("x"),
        pmod(col("l_suppkey"), lit(256L)).as("y"))
      .withColumn("zvalue",
        graft.ops.Layout.zValue(Seq(col("x"), col("y")), 8))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Johnson–Lindenstrauss sign projection 64 → 16 dims: the
    * dimensionality cut applied before ANN indexing at scale. The ±1
    * signs derive from md5(seed:i:j), so the oracle rebuilds the same
    * matrix and replays every projected coordinate through DuckDB's
    * sequential list_dot_product (the t06 float-fold discipline); the
    * distance-preservation and recall story is pinned in
    * SimilaritySpec/ScaleSpec, with x87 benching the projected-search
    * path at the 16k regime. */
  val t87RandomProjection: Q = (s, d) =>
    Similarity.randomProject(
        T.embeddings(s, d).filter(col("vec_id") < 100), 64, 16)
      .select(col("vec_id"), posexplode(col("proj")))
      .select(col("vec_id"), col("pos").as("j"),
        round(col("col"), 4).as("proj_value"))
      .orderBy(col("vec_id"), col("j"))

  /** Funnel analysis over the event log: per user the first
    * signup → view-after-signup → purchase-after-view →
    * error-after-purchase chain, each stage strictly after the
    * previous. One hash exchange total (TemporalSpec pins the plan);
    * the oracle replays the chain as four correlated min-joins. */
  val t88Funnel: Q = (s, d) =>
    Temporal.funnel(T.events(s, d), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase", "error"))
      .filter(col("stage0_ts").isNotNull)
      .select(col("user_id"),
        unix_micros(col("stage0_ts")).as("signup_us"),
        unix_micros(col("stage1_ts")).as("view_us"),
        unix_micros(col("stage2_ts")).as("purchase_us"),
        unix_micros(col("stage3_ts")).as("error_us"),
        col("stages_reached"))
      .orderBy(col("user_id"))

  /** Sampled quantiles per event type: the bounded-state percentile
    * path — a deterministic bottom-128-by-hash row sample per group,
    * exact interpolation on the sample. The oracle rebuilds the exact
    * same sample from the same md5 hashes and replays quantile_cont
    * on it — an approximate operator with an exact cross-engine
    * check (the t71/t85 discipline applied to quantiles). */
  val t89SampleQuantiles: Q = (s, d) =>
    Stats.sampleQuantilesBy(T.events(s, d), Seq("event_type"),
        col("value"), col("event_id").cast("string"),
        ps = Seq(0.25, 0.5, 0.9), k = 128)
      .orderBy(col("event_type"))

  /** CUBE aggregate: all four grouping combinations of
    * (returnflag, linestatus) in one pass — Spark plans cube as a
    * single expanded aggregate (one exchange), not four scans.
    * grouping_id disambiguates aggregation nulls from data nulls;
    * Spark and DuckDB both put the FIRST cube column in the most
    * significant bit (verified empirically, not assumed). */
  val t90CubeAgg: Q = (s, d) =>
    T.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("gid"), col("n"), round(col("sum_qty"), 4).as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** The analytic-window surface beyond rank: row_number / ntile /
    * percent_rank / cume_dist / lag / lead / first_value over one
    * (partition, order) — ONE exchange and one sort serve all seven
    * (they share the window frame). Deterministic under the
    * (ts, event_id) total order. */
  val t91WindowSurface: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    T.events(s, d).filter(col("user_id") <= 3)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("tile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        round(lag(col("value"), 1).over(w), 4).as("prev_value"),
        round(lead(col("value"), 1).over(w), 4).as("next_value"),
        round(first(col("value")).over(w), 4).as("first_value"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** PIVOT: per-user spend matrix, event types to columns — Spark's
    * pivot with an EXPLICIT value list compiles to one conditional
    * aggregate (one exchange, no second pass to discover keys — the
    * form that scales; an implicit pivot pays a distinct-scan first).
    * Decimal-accumulated sums so the matrix replays exactly. */
  val t92Pivot: Q = (s, d) =>
    T.events(s, d).filter(col("user_id") <= 30)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup",
        "view"))
      .agg(sum(col("value").cast("decimal(18,4)")))
      .select(col("user_id") +: Seq("click", "error", "purchase",
        "signup", "view").map(c =>
          round(col(c).cast("double"), 4).as(c)): _*)
      .orderBy(col("user_id"))

  /** Calendar gap-fill + forward fill: daily per-type revenue joined
    * onto the dense date grid (sequence/explode — no driver-side
    * calendar), missing days carry the last observed value via a
    * running last(ignoreNulls). The time-series densification every
    * monitoring export needs; grid and dimension frames are
    * aggregate-sized, the fill shares the grid's partitioning. */
  val t93GapFill: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = T.events(s, d).filter(col("user_id") <= 3)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double")
        .as("rev"))
    val cal = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val types = daily.select(col("event_type")).distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(col("rev"), 4).as("rev"),
        round(last(col("rev"), ignoreNulls = true).over(w), 4)
          .as("rev_filled"))
      .orderBy(col("event_type"), col("day"))
  }

  /** UNPIVOT — the inverse of t92: the spend matrix melts back to
    * (user, type, spend) rows via `stack` (a pure projection + filter,
    * no shuffle), and the round trip must hash-equal the DIRECT
    * two-key aggregate — pivot∘unpivot = groupBy, proven by the
    * oracle being exactly that aggregate. */
  val t94Unpivot: Q = (s, d) =>
    t92Pivot(s, d)
      .select(col("user_id"), expr(
        "stack(5, 'click', click, 'error', error, 'purchase', purchase," +
          " 'signup', signup, 'view', view) as (event_type, spend)"))
      .filter(col("spend").isNotNull)
      .orderBy(col("user_id"), col("event_type"))

  /** Blocked edit-distance fuzzy join ([[Dedup.editDistancePairs]]) —
    * entity resolution without the all-pairs cartesian: candidates are
    * generated over DISTINCT names only (the round-10 fix that kills
    * the quadratic — a bare prefix block over TPC-H's fixed color
    * vocabulary is constant-cardinality, so with repeating names pair
    * volume grew with data²; distinct-name blocking is
    * replication-flat, ScaleSpec-proven), inside a composite (3-char
    * prefix, length-bucket) block with adjacent-bucket probing, then
    * exact levenshtein <= 2 keeps real near-names and id pairs come
    * back by two id-list joins. The fixture plants a 1-edit twin per
    * part name (4th char dropped, prefix preserved), which blocking
    * must retain. dist >= 1 because exact-duplicate pairs are t02's
    * job (TPC-H names repeat heavily — dist-0 pairs would bury the
    * near-match signal), and that contract is what makes the
    * distinct-name collapse lossless. */
  val t95EditDistanceJoin: Q = (s, d) => {
    val parts = T.part(s, d).filter(col("p_partkey") % 4 === 0)
      .select(col("p_partkey").as("id"), lower(col("p_name")).as("name"))
    val planted = parts.select((col("id") + 100000L).as("id"),
      concat(substring(col("name"), 1, 3), substring(col("name"), 5,
        1000000)).as("name"))
    Dedup.editDistancePairs(parts.unionByName(planted),
        maxDist = 2, minDist = 1)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Semi-structured JSON extraction: the `props` JSON column parsed
    * in-plan (get_json_object — codegen'd path traversal, no UDF) and
    * aggregated by the extracted key. from_json(schema) agreement with
    * the path form is spec-pinned (OpsSpec); the oracle replays via
    * DuckDB's json_extract. */
  val t96JsonExtract: Q = (s, d) => {
    val k = get_json_object(col("props"), "$.k").cast("int")
    T.events(s, d)
      .select(col("value"), k.as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4)
          .as("spend"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("k_bucket"))
  }

  /** Cohort retention: users grouped by first-signup week, counted
    * distinct in each subsequent activity week — the retention matrix
    * every growth dashboard is built on. Two aggregates + one join,
    * all keyed on user_id (co-partitioned); week boundaries via
    * date_trunc('week') (Monday start in both engines). */
  val t97CohortRetention: Q = (s, d) => {
    val ev = T.events(s, d)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cw"))
    val act = ev.select(col("user_id"),
      date_trunc("week", col("ts")).as("aw")).distinct()
    cohort.join(act, Seq("user_id"))
      .filter(col("aw") >= col("cw"))
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(to_date(col("aw")), to_date(col("cw"))) / 7)
          .cast("int").as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  /** Co-purchase edges: parts sharing an order (bounded to the first
    * 600 orders), u < v distinct — the graph fixture for t98/t99. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).filter(col("l_orderkey") < 600)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("u"))
    val b = li.select(col("ok"), col("pk").as("v"))
    a.join(b, Seq("ok")).filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
  }

  /** Triangle participation per node on the co-purchase graph —
    * degree-ordered orientation bounds the wedge join (the power-law
    * survival trick); the oracle replays orientation and the
    * three-way join. */
  val t98Triangles: Q = (s, d) =>
    graft.ops.Graph.triangleCounts(coPurchaseEdges(s, d))
      .orderBy(col("node"))

  /** Quantized PageRank, 3 iterations on the co-purchase graph:
    * contributions floor-quantized onto the 1e-9 grid and summed as
    * exact longs, so every iteration replays bit-for-bit cross-engine
    * (the exact-integer-accumulation discipline applied to an
    * iterative algorithm — floor because quantized inputs make
    * rounding TIES common, and tie-breaking is where engines
    * diverge). */
  val t99PageRank: Q = (s, d) =>
    graft.ops.Graph.pageRank(coPurchaseEdges(s, d), iters = 3)
      .orderBy(col("node"))

  /** Hilbert curve positions over the same (partkey, suppkey) buckets
    * as t86 — the tighter-locality clustering key behind
    * [[graft.ops.Layout.writeHilbertOrdered]]. The per-bit
    * reflect/transpose state machine is pure integer arithmetic, so
    * the oracle replays it level-by-level as a recursive CTE; the
    * layout pay-off (Hilbert vs Morton per-file box tightness and
    * box-query file touches on one fixture) is measured in ScaleSpec. */
  val t100Hilbert: Q = (s, d) =>
    T.lineitem(s, d).filter(col("l_orderkey") < 600)
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(256L)).as("x"),
        pmod(col("l_suppkey"), lit(256L)).as("y"))
      .withColumn("hvalue",
        graft.ops.Layout.hilbertValue(col("x"), col("y"), 8))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Count-Min frequency estimates per event type: a 4×32 sketch of
    * user activity (width forced well below the ~150-user domain so
    * collisions are real), probed for users 0–39 next to their exact
    * counts. Every counter and every min-of-4 estimate is an exact
    * integer the DuckDB oracle rebuilds from the same md5-derived
    * buckets — the approximate-operator-exact-check discipline (t71/
    * t85) applied to point frequencies; the never-underestimates and
    * merge-by-sum guarantees are StatsSpec-pinned. */
  val t101CountMin: Q = (s, d) => {
    val ev = T.events(s, d).filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
    val sk = Stats.cmsSketchBy(ev, Seq("event_type"), col("uid"),
      depth = 4, width = 32)
    val probes = ev.filter(col("uid").cast("long") < 40)
      .select(col("event_type"), col("uid").as("probe")).distinct()
    val exact = ev.groupBy(col("event_type"), col("uid"))
      .agg(count(lit(1)).as("true_count"))
      .withColumnRenamed("uid", "probe")
    Stats.cmsEstimate(sk, probes, Seq("event_type"), depth = 4, width = 32)
      .join(exact, Seq("event_type", "probe"))
      .withColumn("overcount", col("est_count") - col("true_count"))
      .orderBy(col("event_type"), col("probe"))
  }

  /** Linear classifier inference over the corpus — the fastText-style
    * quality/domain scoring pass. The "learned" weight table is
    * md5-derived from the seed docs' vocabulary (deterministic stand-in
    * for offline training; inference is the part that runs at 100 TB),
    * so the oracle rebuilds the exact same model and replays every
    * decimal tf·weight sum and 6-dp sigmoid. */
  /** The md5-derived stand-in "learned model" t102/x102 score against:
    * the seed docs' vocabulary with signed pseudo-weights in [-1, 1].
    * ONE definition — the formula is the contract the t102 oracle
    * replays, and the benched x102 must measure the same model. */
  // private[graft]: the x102 fast-sum pin (TextQualitySpec) compares
  // exact vs double sums against the SAME model x102 times
  private[graft] def md5SeedWeights(docs: DataFrame,
                                    vocabCap: Long): DataFrame =
    TextOps.ngramRows(docs.filter(col("doc_id") < vocabCap), 1)
      .filter(col("ngram") =!= "").distinct()
      .select(col("ngram").as("term"),
        ((TextOps.md5U32(col("ngram")) % 2001 - 1000)
          .cast("decimal(18,9)") / 1000).cast("decimal(18,9)").as("weight"))

  val t102LinearScore: Q = (s, d) => {
    val docs = T.documents(s, d)
    TextOps.linearScore(docs.filter(col("doc_id") < 300),
        md5SeedWeights(docs, 20), bias = 0.25)
      .orderBy(col("doc_id"))
  }

  /** Hard-negative mining over the labeled embeddings: per query the 5
    * most-similar OTHER-label vectors, with the hardest positive, the
    * margin and the semi-hard flag — all on 4-dp rounded cosines so
    * rank and booleans replay cross-engine. */
  val t103HardNegatives: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"),
        col("neighbor_label").cast("long").as("neighbor_label"),
        col("cosine"), col("pos_cosine"), col("margin"), col("semihard"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Unicode script profile over the corpus — codepoint-range counts
    * and the dominant script per document ([[TextOps.scriptProfile]]).
    * The fixture is ASCII-only, so the oracle pins the Latin-dominant
    * arithmetic end to end; the multi-script behavior (CJK/Cyrillic/
    * Arabic counts, dominance ties, mojibake detection) is
    * TextQualitySpec-pinned on planted strings. */
  val t104ScriptProfile: Q = (s, d) =>
    TextOps.scriptProfile(T.documents(s, d))
      .orderBy(col("doc_id"))

  /** Contrastive positive pairs mined from the verified near-dup
    * clusters — t103's companion: the transitive closure of the t14
    * edge set as (anchor < positive) training pairs with cluster
    * provenance. */
  val t105PositivePairs: Q = (s, d) =>
    Dedup.positivePairs(
        plantedVerifiedPairs(s, d).select(col("id_a"), col("id_b")))
      .select(col("anchor_id").cast("long").as("anchor_id"),
        col("positive_id").cast("long").as("positive_id"),
        col("cluster_id").cast("long").as("cluster_id"),
        col("cluster_size"))
      .orderBy(col("anchor_id"), col("positive_id"))

  /** Per-user behavior sequences — the sequence-model training-example
    * construction: each user's last 5 events in chronological order
    * with inter-event gaps. Ranking runs on full-precision timestamps
    * (ties by event_id) in both engines; the exported epoch and gap
    * are floored seconds, so every row replays. */
  val t106UserSequences: Q = (s, d) =>
    Temporal.keyedSequences(T.events(s, d).filter(col("user_id") < 50),
        "user_id", "ts", "event_type", "event_id", maxLen = 5)
      .orderBy(col("user_id"), col("pos"))

  /** Trailing-window volume anomaly over the event log — the ingest
    * monitor shape: per (event_type, day) counts vs the previous 7
    * days' mean/std (current day excluded). Integer counts make every
    * moment exact (the variance numerator n·Σv² − (Σv)² is an exact
    * integer), so the oracle replays z and the flag bit-for-bit; a
    * planted spike/flat-history alarm is StatsSpec-pinned. */
  val t107VolumeAnomaly: Q = (s, d) => {
    val daily = T.events(s, d)
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    Stats.trailingAnomaly(daily, Seq("event_type"), col("day"),
        col("n_events"), window = 7, nSigma = 3.0)
      .orderBy(col("event_type"), col("day"))
  }

  /** First-order behavior transition matrix over the event log — the
    * Markov (prev, next) counts + row-normalized probabilities per
    * user-ordered sequence. Exact integer counts; the probability is
    * one IEEE division rounded to 6. */
  val t108TransitionMatrix: Q = (s, d) =>
    Temporal.transitionMatrix(T.events(s, d), "user_id", "ts",
        "event_type", "event_id")
      .orderBy(col("prev_type"), col("next_type"))

  /** Next-event training examples over the event log — t106's
    * sequences unrolled into the (prefix, label) rows a next-action
    * model trains on. The '>'-joined prefix string is the portable
    * encoding both engines build from the same total order. */
  val t109NextEventExamples: Q = (s, d) =>
    Temporal.nextEventExamples(T.events(s, d).filter(col("user_id") < 50),
        "user_id", "ts", "event_type", "event_id", maxLen = 5)
      .orderBy(col("user_id"), col("pos"))

  /** Hierarchy flattening over a synthetic decimal-digit account tree
    * (child custkey → custkey div 10, roots 1–9): every (node,
    * ancestor, depth) materialized so rollups are plain joins — the
    * closure q47's one-level parent link stops short of. Pure integer
    * iteration; the oracle replays it as a recursive CTE with the same
    * min-depth canonicalization. */
  val t110AncestorClosure: Q = (s, d) =>
    graft.ops.Graph.ancestorClosure(
        T.customer(s, d).filter(col("c_custkey") >= 10)
          .select(col("c_custkey").as("child"),
            expr("c_custkey div 10").as("parent")),
        maxDepth = 6)
      .orderBy(col("node"), col("ancestor"))

  /** t110's closure through the path-DOUBLING form
    * ([[graft.ops.Graph.ancestorClosureDoubling]] — ⌈log2 d⌉ self-joins
    * instead of d frontier joins, the deep-taxonomy variant whose
    * round bound ScaleSpec's depth-64 rehearsal proves): same fixture,
    * same output contract, and the oracle is t110's recursive-CTE SQL
    * VERBATIM, so a hash match proves the two forms agree pair-for-pair
    * and depth-for-depth. */
  val t118ClosureDoubling: Q = (s, d) =>
    graft.ops.Graph.ancestorClosureDoubling(
        T.customer(s, d).filter(col("c_custkey") >= 10)
          .select(col("c_custkey").as("child"),
            expr("c_custkey div 10").as("parent")),
        maxDepth = 6)
      .orderBy(col("node"), col("ancestor"))

  /** Subtree account-balance rollup over the t110 tree — every
    * ancestor's decimal-exact total across its whole subtree, one join
    * + one aggregate at query time. Totals export as double after the
    * exact decimal sum (the q01 discipline). */
  val t111SubtreeRollup: Q = (s, d) => {
    val cust = T.customer(s, d)
    val closure = graft.ops.Graph.ancestorClosure(
      cust.filter(col("c_custkey") >= 10)
        .select(col("c_custkey").as("child"),
          expr("c_custkey div 10").as("parent")),
      maxDepth = 6)
    graft.ops.Graph.subtreeRollup(closure,
        cust.select(col("c_custkey").as("id"),
          col("c_acctbal").as("value")))
      .select(col("ancestor"), col("n_members"),
        round(col("total").cast("double"), 4).as("total"))
      .orderBy(col("ancestor"))
  }

  /** Retention labels over the event log: per event, does the same
    * user act again within 6 hours — the churn/propensity label
    * builder. Ordering on full-precision timestamps with event-id
    * ties; label arithmetic on floored seconds (t106's discipline). */
  val t112RetentionLabels: Q = (s, d) =>
    Temporal.futureEventLabel(T.events(s, d).filter(col("user_id") < 50),
        "user_id", "ts", "event_id", horizonSeconds = 6L * 3600)
      .orderBy(col("user_id"), col("event_id"))

  /** KMV set-difference estimates ([[Stats.kmvDifference]]) — the
    * Theta-sketch A∖B on the t75 per-language bigram sketches: per
    * language pair, how many bigrams each side holds that the other
    * lacks, from O(k) sketch state and two IEEE divisions — exact
    * below fill, every set op and division oracle-replayed. The
    * "how much of source A is NOT already in B" curation dashboard
    * number without joining row data. */
  val t113KmvDifference: Q = (s, d) =>
    Stats.kmvDifference(
      Stats.kmvSketchBy(
        TextOps.ngramRows(T.documents(s, d), 2, keep = Seq("lang")),
        Seq("lang"), col("ngram"), k = 64),
      "lang", k = 64)
      .orderBy(col("g_a"), col("g_b"))

  /** Near-name canonicalization ([[Dedup.canonicalNames]]) over the
    * t95 planted corpus: every part name and its 1-edit twin map to
    * the lexicographically smallest name of their edit-distance
    * cluster (transitive closure — the t105 argument applied to
    * names), untouched names to themselves. The oracle replays the
    * composite blocking, the recursive closure and the min-name
    * canonicalization. */
  val t114CanonicalNames: Q = (s, d) => {
    val parts = T.part(s, d).filter(col("p_partkey") % 4 === 0)
      .select(col("p_partkey").as("id"), lower(col("p_name")).as("name"))
    val planted = parts.select((col("id") + 100000L).as("id"),
      concat(substring(col("name"), 1, 3), substring(col("name"), 5,
        1000000)).as("name"))
    Dedup.canonicalNames(parts.unionByName(planted), maxDist = 2)
      .orderBy(col("id"))
  }

  /** t70's backward as-of through the CHUNKED carry
    * ([[Temporal.asofJoinChunked]], hourly chunks) — the hot-key-
    * splitting form the x70s measurement showed a plain window cannot
    * get from AQE. Same output contract as t70; the oracle is t70's
    * independent range-join + top-1 SQL VERBATIM, so a hash match
    * proves chunking changes nothing. */
  val t115AsofChunked: Q = (s, d) => {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    Temporal.asofJoinChunked(purchases, views, Seq("user_id"), "ts",
        "view_ts", payload = Seq("view_id", "view_ts", "view_value"),
        tie = "view_id", chunkSeconds = 3600L)
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"), col("view_id"),
        unix_micros(col("view_ts")).as("view_us"),
        round(col("view_value"), 4).as("view_value"))
      .orderBy(col("purchase_id"))
  }

  /** t85's event-id family with the HLL++ band correction ON: ~2000
    * true distincts per type at p=9 sits squarely in the 2.5m–5m band
    * where the harmonic estimator systematically overshoots, so this
    * is exactly the regime the anchor table exists for. The oracle
    * rebuilds the registers from the same md5 hashes and replays the
    * SAME piecewise-linear correction — its CASE chain is generated
    * from the same anchor array ([[graft.ops.Stats.hllBiasSqlCase]]),
    * so the table cannot drift between engine and oracle. t85 keeps
    * the uncorrected classic estimator pinned alongside. */
  val t116HllBiasCorrected: Q = (s, d) =>
    Stats.hllDistinctBy(T.events(s, d), Seq("event_type"),
        col("event_id").cast("string"), p = 9, biasCorrect = true)
      .select(col("event_type"), col("n_rows"), col("hll_v"),
        col("hll_s"), col("est_distinct"))
      .orderBy(col("event_type"))

  /** Decayed Count-Min (t101's grid under a 1-day half-life): the
    * fixture's 30-day event window anchors at 2024-01-01 and is probed
    * as of 2024-01-31, so a user's estimate is their occurrence count
    * with each event discounted by half per whole day of age. Cells
    * are exact decimal 2^day sums, the rescale is an exact exponent
    * shift, and the oracle replays every cell and estimate — plus an
    * exactly-computed decayed TRUE count per probe, so the CMS
    * never-underestimates guarantee is visible in the overcount
    * column under decay too. */
  val t117CmsDecayed: Q = (s, d) => {
    val t0 = 1704067200000000L      // 2024-01-01T00:00:00Z in micros
    val asOf = 1706659200000000L    // 2024-01-31T00:00:00Z
    val hl = 86400L                 // 1-day half-life
    val ev = T.events(s, d).filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("string").as("uid"),
        col("ts"))
    val sk = Stats.cmsDecayedSketchBy(ev, Seq("event_type"), col("uid"),
      col("ts"), t0, hl, depth = 4, width = 32)
    val probes = ev.filter(col("uid").cast("long") < 40)
      .select(col("event_type"), col("uid").as("probe")).distinct()
    val truDecayed = ev.filter(col("uid").cast("long") < 40)
      .withColumn("__b", floor((unix_micros(col("ts")) - lit(t0))
        .cast("double") / lit(hl * 1000000.0)).cast("long"))
      .groupBy(col("event_type"), col("uid").as("probe"))
      .agg((sum(pow(lit(2.0), col("__b")).cast("decimal(38,0)"))
        .cast("double") / lit(math.pow(2.0, 30.0))).as("__t"))
      .select(col("event_type"), col("probe"),
        round(col("__t"), 4).as("true_decayed"))
    Stats.cmsDecayedEstimate(sk, probes, Seq("event_type"), asOf, t0, hl,
        depth = 4, width = 32)
      .join(truDecayed, Seq("event_type", "probe"))
      .withColumn("overcount",
        round(col("est_decayed") - col("true_decayed"), 4))
      .orderBy(col("event_type"), col("probe"))
  }

  /** Decayed distinct users per event type — t85's HLL under t117's
    * 1-day half-life: one p=9 register set per (type, day), recombined
    * as of 2024-01-31 so each user counts at 2^-(30 − last_day). The
    * oracle rebuilds every per-day register from the same md5 hashes,
    * replays the suffix-union estimates (register maxima merge slices
    * exactly), and runs the identical fixed-point ×10^4 forward-mass
    * chain — every step an exact integer until the one final division,
    * so the approximate-under-decay operator still hash-matches. The
    * exactly-computed decayed TRUE distinct count sits alongside (each
    * user weighted by their true last day), making the estimator's
    * error visible per type like t117's overcount column. */
  val t119HllDecayed: Q = (s, d) => {
    val t0 = 1704067200000000L      // 2024-01-01T00:00:00Z in micros
    val asOf = 1706659200000000L    // 2024-01-31T00:00:00Z -> B = 30
    val hl = 86400L                 // 1-day half-life
    val ev = T.events(s, d).filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("string").as("uid"),
        col("ts"))
    val sk = Stats.hllEpochSketchBy(ev, Seq("event_type"), col("uid"),
      col("ts"), t0, hl, p = 9)
    // exact decayed truth: each distinct user at 2^(lastDay - 30),
    // summed as decimal forward mass (the t117 true_decayed discipline)
    val tru = ev
      .withColumn("__b", floor((unix_micros(col("ts")) - lit(t0))
        .cast("double") / lit(hl * 1000000.0)).cast("long"))
      .groupBy(col("event_type"), col("uid"))
      .agg(max(col("__b")).as("__last"))
      .groupBy(col("event_type"))
      .agg((sum(pow(lit(2.0), col("__last")).cast("decimal(38,0)"))
        .cast("double") / lit(math.pow(2.0, 30.0))).as("__t"))
      .select(col("event_type"), round(col("__t"), 4).as("true_decayed"))
    Stats.hllDecayedDistinct(sk, Seq("event_type"), asOf, t0, hl, p = 9)
      .join(tru, Seq("event_type"))
      .select(col("event_type"), col("n_epochs"), col("rows_decayed"),
        col("est_decayed"), col("true_decayed"))
      .orderBy(col("event_type"))
  }

  /** t80's margin mining through the BUCKETED candidate path — the
    * corpus-scale form (knnJoin both directions, nothing broadcast) at
    * fixed bits, deterministically hash-verified like every other
    * approximate retriever: the oracle replays the sign-LSH buckets,
    * the Hamming-1 probe sets and the per-query top-4 shortlists in
    * BOTH directions (the t29 derivation, twice), then runs t80's
    * margin arithmetic on those shortlists verbatim. x80 benches this
    * exact shape at 8×; recall vs the exact mine is SimilaritySpec-
    * pinned — this query moves the bucketed path itself from
    * spec-trusted to hash-verified. */
  val t120MarginMineBucketed: Q = (s, d) => {
    val emb = T.embeddings(s, d)
    Similarity.marginMineBucketed(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), k = 4, bits = 8)
      .orderBy(col("src_id"), col("tgt_id"))
  }

  /** Keyless point-in-interval range join
    * ([[Temporal.rangeJoinBucketed]]): every purchase × every GLOBAL
    * error-incident window (error ts .. +30 min) containing it — the
    * trade-in-outage-window shape where no equi key exists and naive
    * Spark would plan a BroadcastNestedLoopJoin over |P|·|I| pairs.
    * Buckets are the 1800 s interval length, so each incident explodes
    * to exactly 2 bucket rows and the plan is a shuffled equi-join on
    * the bucket (PlanSpec pins no-BNLJ with auto-broadcast off). The
    * oracle IS the naive theta join — two formulations, one result,
    * every overlapping pair (t70's one-nearest-row discipline, but for
    * the many-match contract). */
  val t121RangeJoin: Q = (s, d) => {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("ts").as("inc_start"),
        (col("ts") + expr("INTERVAL 30 minutes")).as("inc_end"))
    Temporal.rangeJoinBucketed(purchases, incidents,
        pointTs = "ts", startTs = "inc_start", endTs = "inc_end",
        bucketSeconds = 1800L)
      .select(col("purchase_id"), col("error_id"),
        unix_micros(col("ts")).as("purchase_us"),
        unix_micros(col("inc_start")).as("inc_start_us"))
      .orderBy(col("purchase_id"), col("error_id"))
  }

  /** Keyless interval-OVERLAP join ([[Temporal.intervalJoinBucketed]]):
    * every 20-minute view session × every global 30-minute error
    * incident it overlaps — t121's many-match discipline for
    * interval×interval, where the first-common-bucket rule replaces a
    * post-join dedup. The oracle is the naive overlap theta join. */
  val t124IntervalJoin: Q = (s, d) => {
    val ev = T.events(s, d)
    val sessions = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_start"),
        (col("ts") + expr("INTERVAL 20 minutes")).as("v_end"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("i_start"),
        (col("ts") + expr("INTERVAL 30 minutes")).as("i_end"))
    Temporal.intervalJoinBucketed(sessions, incidents, "v_start",
        "v_end", "i_start", "i_end", bucketSeconds = 1800L)
      .select(col("view_id"), col("error_id"),
        unix_micros(col("v_start")).as("v_start_us"),
        unix_micros(col("i_start")).as("i_start_us"))
      .orderBy(col("view_id"), col("error_id"))
  }

  val all: Map[String, Q] = Map(
    "t01_doc_stats" -> t01DocStats,
    "t02_exact_dedup" -> t02ExactDedup,
    "t03_minhash_lsh" -> t03MinHashLsh,
    "t04_jaccard_pairs" -> t04JaccardPairs,
    "t05_simhash" -> t05SimHash,
    "t06_ann_brute" -> t06AnnBrute,
    "t07_ann_lsh" -> t07AnnLsh,
    "t08_media_meta" -> t08MediaMeta,
    "t09_frame_plan" -> t09FramePlan,
    "t10_event_hourly" -> t10EventHourly,
    "t11_ann_ivf" -> t11AnnIvf,
    "t12_embedding_neardup" -> t12EmbeddingNearDup,
    "t13_sessions" -> t13Sessions,
    "t14_neardup_clusters" -> t14NearDupClusters,
    "t15_line_dedup" -> t15LineDedup,
    "t16_hash_sample" -> t16HashSample,
    "t17_media_resize" -> t17MediaResize,
    "t18_salted_rollup" -> t18SaltedRollup,
    "t19_doc_packing" -> t19DocPacking,
    "t20_click_attribution" -> t20ClickAttribution,
    "t21_attribution_outer" -> t21AttributionOuter,
    "t22_kmeans_step" -> t22KmeansStep,
    "t23_token_quantiles" -> t23TokenQuantiles,
    "t24_histogram" -> t24Histogram,
    "t25_tfidf" -> t25Tfidf,
    "t26_zscore" -> t26Zscore,
    "t27_decontaminate" -> t27Decontaminate,
    "t28_kmeans_train" -> t28KmeansTrain,
    "t29_knn_join" -> t29KnnJoin,
    "t30_knn_adaptive" -> t30KnnAdaptive,
    "t31_knn_disjoint" -> t31KnnDisjoint,
    "t32_knn_budget" -> t32KnnBudget,
    "t33_ivf_topk" -> t33IvfTopK,
    "t34_repetition_stats" -> t34RepetitionStats,
    "t35_cap_per_source" -> t35CapPerSource,
    "t36_top_ngrams" -> t36TopNgrams,
    "t37_pii_scrub" -> t37PiiScrub,
    "t38_pq_encode" -> t38PqEncode,
    "t39_pq_adc" -> t39PqAdc,
    "t40_ivf_pq" -> t40IvfPq,
    "t41_pq_kmeans" -> t41PqKmeans,
    "t42_training_mix" -> t42TrainingMix,
    "t43_packed_sequences" -> t43PackedSequences,
    "t44_semantic_dedup" -> t44SemanticDedup,
    "t45_ivf_pq_residual" -> t45IvfPqResidual,
    "t46_neardup_gate" -> t46NearDupGate,
    "t47_stratified_split" -> t47StratifiedSplit,
    "t48_lm_score" -> t48LmScore,
    "t49_retain_best" -> t49RetainBest,
    "t50_drift_monitor" -> t50DriftMonitor,
    "t51_lm_by_lang" -> t51LmScoreByLang,
    "t52_epoch_allocation" -> t52EpochAllocation,
    "t53_temperature_allocation" -> t53TemperatureAllocation,
    "t54_repeated_substring" -> t54RepeatedSubstring,
    "t55_shard_shuffle" -> t55ShardShuffle,
    "t56_neardup_gate_bloom" -> t56NearDupGateBloom,
    "t57_semantic_gate" -> t57SemanticGate,
    "t58_semantic_gate_probed" -> t58SemanticGateProbed,
    "t59_c4_line_filter" -> t59C4LineFilter,
    "t60_quality_prune" -> t60QualityPrune,
    "t61_decontamination_report" -> t61DecontaminationReport,
    "t62_embedding_drift" -> t62EmbeddingDrift,
    "t63_sq_topk" -> t63SqTopK,
    "t64_chunk_documents" -> t64ChunkDocuments,
    "t65_bq_topk" -> t65BqTopK,
    "t66_dsir_weights" -> t66DsirWeights,
    "t67_dsir_frozen" -> t67DsirScoreFrozen,
    "t68_knn_predict" -> t68KnnPredict,
    "t69_graph_search" -> t69GraphSearch,
    "t70_asof_join" -> t70AsofJoin,
    "t71_kmv_distinct" -> t71KmvDistinct,
    "t72_asof_forward" -> t72AsofForward,
    "t73_priority_sample" -> t73PrioritySample,
    "t74_topp_mass" -> t74TopPMass,
    "t75_kmv_overlap" -> t75KmvOverlap,
    "t76_asof_nearest" -> t76AsofNearest,
    "t77_sparse_cosine" -> t77SparseCosine,
    "t78_bm25" -> t78Bm25,
    "t79_hybrid_rrf" -> t79HybridRrf,
    "t80_margin_mine" -> t80MarginMine,
    "t81_ranking_metrics" -> t81RankingMetrics,
    "t82_rbo" -> t82Rbo,
    "t83_asof_graced" -> t83AsofGraced,
    "t84_bm25_gate" -> t84Bm25Gate,
    "t85_hll_distinct" -> t85HllDistinct,
    "t86_zvalue" -> t86ZValue,
    "t87_random_projection" -> t87RandomProjection,
    "t88_funnel" -> t88Funnel,
    "t89_sample_quantiles" -> t89SampleQuantiles,
    "t90_cube_agg" -> t90CubeAgg,
    "t91_window_surface" -> t91WindowSurface,
    "t92_pivot" -> t92Pivot,
    "t93_gap_fill" -> t93GapFill,
    "t94_unpivot" -> t94Unpivot,
    "t95_edit_distance_join" -> t95EditDistanceJoin,
    "t96_json_extract" -> t96JsonExtract,
    "t97_cohort_retention" -> t97CohortRetention,
    "t98_triangles" -> t98Triangles,
    "t99_pagerank" -> t99PageRank,
    "t100_hilbert" -> t100Hilbert,
    "t101_count_min" -> t101CountMin,
    "t102_linear_score" -> t102LinearScore,
    "t103_hard_negatives" -> t103HardNegatives,
    "t104_script_profile" -> t104ScriptProfile,
    "t105_positive_pairs" -> t105PositivePairs,
    "t106_user_sequences" -> t106UserSequences,
    "t107_volume_anomaly" -> t107VolumeAnomaly,
    "t108_transition_matrix" -> t108TransitionMatrix,
    "t109_next_event_examples" -> t109NextEventExamples,
    "t110_ancestor_closure" -> t110AncestorClosure,
    "t111_subtree_rollup" -> t111SubtreeRollup,
    "t112_retention_labels" -> t112RetentionLabels,
    "t113_kmv_difference" -> t113KmvDifference,
    "t114_canonical_names" -> t114CanonicalNames,
    "t115_asof_chunked" -> t115AsofChunked,
    "t116_hll_bias_corrected" -> t116HllBiasCorrected,
    "t117_cms_decayed" -> t117CmsDecayed,
    "t119_hll_decayed" -> t119HllDecayed,
    "t120_margin_mine_bucketed" -> t120MarginMineBucketed,
    "t118_closure_doubling" -> t118ClosureDoubling,
    "t121_range_join" -> t121RangeJoin,
    "t122_keepfirst_dedup" -> t122KeepFirstDedup,
    "t123_dup_spans" -> t123DupSpans,
    "t124_interval_join" -> t124IntervalJoin,
  )

  /** Scale-path variants of the sketch family, timed by Bench but NOT
    * oracle-verified: they hash with Spark-native xxhash64, which DuckDB
    * cannot recompute, so Verify keeps the bit-identical md5 parity paths
    * (t03/t05/t19) while Bench reports both numbers — the md5 path proves
    * correctness, the xxhash64 path is what a 100 TB cluster would run.
    * Kernel parity between the two families is spec-guarded
    * (TextDedupSpec / SketchExprSpec). */
  val benchOnly: Map[String, Q] = Map(
    // REAL media codec pipeline (round 16): genuine PNG/WAV bytes
    // synthesized from the corpus ids, then (x08r) a header-only
    // metadata parse — ImageReader dims / WAV frame header, NO raster
    // decode — and (x08z) the full pixel path: decode -> bilinear
    // fit-to-max -> PNG re-encode. JDK built-in codecs
    // (javax.imageio / javax.sound.sampled), zero external libs;
    // DuckDB cannot replay a PNG parse, so these are bench-only with
    // MultimodalSpec round-trip verification (synthesized dims ==
    // decoded dims; resized bytes re-decode to the claimed dims).
    // Round-16 optimization pass: the synthesis (2500 PNG encodes +
    // 2500 WAV writes) is a frozen static ([[mediaStatic]], the
    // pqStatics/bm25Static discipline — a deployment's asset table
    // already EXISTS), so both entries time the decode-side codec work
    // they claim to measure instead of a synthesis-dominated total.
    "x08r_media_real_meta" -> ((s, d) =>
      Multimodal.extractMetaReal(mediaStatic(s, d)).toDF()
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("bytes"),
          avg(col("duration_ms")).as("avg_ms"))),
    "x08z_media_real_resize" -> ((s, d) =>
      Multimodal.resizeReal(mediaStatic(s, d), maxDim = 24)
        .select(col("asset_id"), col("new_w"), col("new_h"),
          length(col("content")).as("resized_bytes"))),
    // t78's BM25 at the UNCAPPED query width (100 queries at sf0.1,
    // ~8.4M postings-join rows) on the production double-sum
    // accumulator — the regime the gated entry's doc_id cap avoids
    "x78_bm25_scale" -> ((s, d) => {
      val docs = T.documents(s, d)
      TextOps.bm25TopK(docs.filter(col("doc_id") % 50 === 0), docs,
        k = 5, exactSums = false)
    }),
    // t78's BM25 against the PREBUILT postings index ([[TextOps
    // .bm25Index]] built once in Bench warm-up, localCheckpointed):
    // times the amortized per-query-set retrieval alone — distinct
    // query terms -> postings join -> pair sum -> top-k, no corpus
    // tokenize/df/dl/N aggregates in the timed plan (PlanSpec pins
    // that). t78/x78 deliberately keep the inline-statistics one-shot
    // shape; a deployment that probes a reference corpus repeatedly
    // pays THIS number (round-10 verdict item 2: t78/t79's cost is
    // index rebuild, not retrieval — put the warm number on record).
    // Same query slate as x78, production double-sum accumulator.
    "x78i_bm25_warm_search" -> ((s, d) =>
      TextOps.bm25TopKIndexed(
        T.documents(s, d).filter(col("doc_id") % 50 === 0),
        bm25Static(s, d), k = 5, exactSums = false)),
    // t79's hybrid retrieval in its WARM deployment shape: BOTH
    // modalities probe prebuilt indexes — the frozen x78i BM25
    // postings for the lexical list, the frozen x40 IVF-PQ layer
    // (centroids + codebooks, corpus flowing as codes) for the dense
    // list — then reciprocal-rank fusion. The one-shot t79 rebuilds
    // both inline; a retrieval service pays THIS per query set. The
    // 8-query slate shares ids across modalities (vec 0,8..56 = doc
    // 0,8..56); dense neighbor ids live in the replicated 8x space, so
    // the fusion's cross-modal agreement is incidental — the entry
    // times the warm probe + fuse COST (t79's oracle owns semantics).
    "x79i_hybrid_warm" -> ((s, d) => {
      val st = pqStatics(s, d)
      val queries = st.big
        .filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      val dense = Similarity.ivfPqTopK(st.big, queries, st.cents, st.cb,
        m = 4, k = 10, nprobe = 3)
      val sparse = TextOps.bm25TopKIndexed(
        T.documents(s, d)
          .filter(col("doc_id") < 64 && col("doc_id") % 8 === 0),
        bm25Static(s, d), k = 10, exactSums = false)
        .withColumnRenamed("doc_id", "neighbor_id")
      Similarity.rrfFuse(Seq(dense, sparse), k = 5)
    }),
    // t87's JL cut at the 16k regime: project the corpus 64->16 once,
    // then exact top-8 in projected space — times what the 4x
    // bytes-moved reduction costs and buys before any ANN indexing
    // (recall floor for this exact shape pinned in ScaleSpec)
    "x87_jl_search" -> ((s, d) => {
      val proj = Similarity.randomProject(pqStatics(s, d).big, 64, 16)
        .select(col("vec_id"), col("proj").as("embedding"))
      Similarity.bruteForceTopK(proj,
        proj.filter(col("vec_id") < 64 && col("vec_id") % 8 === 0), k = 8)
    }),
    // t03's pipeline on the xxhash64 MinHash kernel + banded self-join
    "x03_minhash_lsh_scale" -> ((s, d) => {
      val docs = withPlantedDups(T.documents(s, d))
      val cands = Dedup.minHashLshCandidates(docs, bands = 8,
        rowsPerBand = 4, shingleSize = 3)
      Dedup.jaccardVerify(cands, docs, threshold = 0.5)
    }),
    // t05's pipeline on the xxhash64 SimHash kernel
    "x05_simhash_scale" -> ((s, d) =>
      Dedup.simHashCandidates(withPlantedDups(T.documents(s, d)),
        blocks = 4, maxHamming = 6)),
    // t15's corpus-wide line dedup with the hash-first native kernel:
    // exploded rows carry 8-byte digests, survivorship is an aggregate
    // (map-side combine), text crosses exactly one doc_id-keyed join
    "x15_line_dedup_scale" -> ((s, d) =>
      TextOps.lineDedupScalable(multiLineDocs(s, d))),
    // t19's packing with fact-scale surrogate sequencing underneath
    "x19_sequence_scale" -> ((s, d) =>
      graft.etl.Merge.sequenceKeysScalable(
        T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber")),
        "seq_key", 0L)),
    // x19's ORDERED sibling: the pipeline-default sequencing (range
    // partition + per-partition rank + checkpointed assignment) at the
    // same fact scale — the deterministic-keys premium over the
    // order-free form on record
    "x19o_sequence_ordered_scale" -> ((s, d) =>
      graft.etl.Merge.sequenceKeysOrdered(
        T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber")),
        Seq(col("l_orderkey"), col("l_linenumber")), "seq_key", 0L)),
    // t117's decayed grid at 8x event scale with 8x the user domain:
    // the exploded depth x width aggregate's map-side combine is what
    // runs at 100 TB — state stays <= depth*width rows per type however
    // many rows and users stream past
    // t121's keyless range join at 4x the overlap density: 2-hour
    // incident windows instead of 30 minutes (~1.1M pairs at sf0.1) —
    // candidate volume scales with interval length x point density per
    // bucket, never |P|·|I|; the plan stays the bucket-keyed shuffled
    // equi-join (PlanSpec pins no-BNLJ / no-broadcast on this frame)
    "x121_range_join_scale" -> ((s, d) => {
      val ev = T.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts"))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"),
          col("ts").as("inc_start"),
          (col("ts") + expr("INTERVAL 2 hours")).as("inc_end"))
      graft.ops.Temporal.rangeJoinBucketed(purchases, incidents,
        "ts", "inc_start", "inc_end", bucketSeconds = 7200L)
    }),
    "x117_cms_decayed_scale" -> ((s, d) => {
      val ev = T.events(s, d)
        .select(col("event_type"), col("user_id"), col("ts"))
      val big = (0 until 8).map(i =>
          ev.select(col("event_type"),
            (col("user_id") * 8 + i).as("user_id"), col("ts")))
        .reduce(_ unionByName _)
      Stats.cmsDecayedSketchBy(big, Seq("event_type"),
        col("user_id").cast("string"), col("ts"),
        1704067200000000L, 86400L, depth = 4, width = 1024)
    }),
    // t119's decayed HLL at 8x event scale with 8x the user domain:
    // the per-(type, day) register aggregate's map-side combine is the
    // 100 TB path (row data collapses to <= 88 x 512 ints per type
    // before the exchange); the suffix-union read recombination runs
    // on that aggregate-sized grid only
    "x119_hll_decayed_scale" -> ((s, d) => {
      val ev = T.events(s, d)
        .select(col("event_type"), col("user_id"), col("ts"))
      val big = (0 until 8).map(i =>
          ev.select(col("event_type"),
            (col("user_id") * 8 + i).as("user_id"), col("ts")))
        .reduce(_ unionByName _)
      val sk = Stats.hllEpochSketchBy(big, Seq("event_type"),
        col("user_id").cast("string"), col("ts"),
        1704067200000000L, 86400L, p = 9)
      Stats.hllDecayedDistinct(sk, Seq("event_type"),
        1706659200000000L, 1704067200000000L, 86400L, p = 9)
    }),
    // t102's classifier inference at corpus width: the model is built
    // from the first 200 docs' vocabulary (model-sized, broadcast) and
    // EVERY document scores — training is offline, this inference pass
    // is what runs at 100 TB; the gated t102 caps the scored set for
    // oracle size, this times the uncapped width
    "x102_linear_score_scale" -> ((s, d) => {
      val docs = T.documents(s, d)
      // exactSums=false (round 15): the 100 TB inference pass takes
      // double sums — the decimal accumulator boxed one BigDecimal per
      // (doc, hit-term) row; round-6 score/prob identity vs the exact
      // path is TextQualitySpec-pinned, t102's oracle stays exact
      TextOps.linearScore(docs, md5SeedWeights(docs, 200), bias = 0.25,
        exactSums = false)
    }),
    // t103's hard-negative mining at the 4k two-sided regime: the
    // labeled frame replicated 8x (replicas are EXACT same-label twins
    // at cosine 1.0 — maximal same-label crowding, precisely what the
    // oversample knob exists for), mined through the bucketed knnJoin
    // with nothing broadcast; the recall floor vs the exact path at
    // this oversample is SimilaritySpec-pinned
    "x103_hard_negatives_scale" -> ((s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"))
      val big = (0 until 8).map(i =>
          emb.select((col("vec_id") * 8 + i).as("vec_id"),
            col("embedding"), col("label")))
        .reduce(_ unionByName _).localCheckpoint()
      Similarity.hardNegativesBucketed(big, big, k = 3, oversample = 4)
    }),
    // t80's margin mining at the two-sided corpus regime: both
    // "language" sides 8x-replicated (~8k x ~8k at sf0.1), candidate
    // lists from the bucketed knnJoin in each direction with nothing
    // broadcast — the CCMatrix composition whose mined-mutual recall
    // vs the exact mine is SimilaritySpec-pinned; the mining tail
    // itself stays rank-frame-sized
    "x80_margin_mine_scale" -> ((s, d) => {
      val big = scaledEmbeddings(s, d, copies = 8)
      Similarity.marginMineBucketed(
        big.filter(col("vec_id") % 2 === 0),
        big.filter(col("vec_id") % 2 === 1), k = 4, bits = 8)
    }),
    // t29's two-sided knn-join measured 8x past fixture scale: the sf
    // embedding frame replicated with distinct ids (replicas share a
    // bucket — a duplication-skewed corpus, sign-LSH's worst case for
    // bucket balance), both sides large, nothing broadcast (PlanSpec
    // guards the shuffle-join shape on this exact frame). ~16k queries ×
    // ~576 Hamming-1 candidates ≈ 9M exact cosines at sf0.1.
    "x29_knn_join_scale" -> ((s, d) => {
      val big = scaledEmbeddings(s, d, copies = 8)
      Similarity.knnJoin(big, big, k = 3, bits = 8)
    }),
    // t32's graded probe budget on the same 8x frame: in the replicated
    // corpus every bucket is dense, so most queries take the 1-probe
    // tier — the regime the budget exists for; the census passes and the
    // checkpointed tier map are part of the measured cost
    "x30_knn_budget_scale" -> ((s, d) => {
      val big = scaledEmbeddings(s, d, copies = 8)
      Similarity.knnJoinBudget(big, big, k = 3, bits = 8)
    }),
    // t44's semantic dedup 16x past fixture scale: the replicated frame
    // with a 64-list quantizer (~250 vectors per cluster after
    // replication) — the within-cluster pair screen is the quadratic
    // term SemDeDup bounds by cluster count, so this measures the shape
    // that dominates at corpus scale (~2M within-cluster cosines)
    "x44_semantic_dedup_scale" -> ((s, d) => {
      val big = scaledEmbeddings(s, d, copies = 16)
      val cents = big.filter(col("vec_id") % 125 === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("cvec"))
      Dedup.semanticDedup(big, cents, tau = 0.99)
    }),
    // t38's PQ encode 8x past fixture scale: the corpus x broadcast-
    // codebook expansion with the map-side min_by hash-agg argmin — 16k
    // vectors x 4 subspaces x ~81 codewords of the native L2 kernel
    // exactSums=false on the scale twins (round 14, the x78 fast-sum
    // precedent): the production path trades the decimal(27,12)
    // accumulator's per-partial BigDecimal boxing for exact-double
    // sums and a projection-shaped encode argmin; code/rank identity
    // vs the exact path is SimilaritySpec-pinned on the fixture, and
    // every t38-t45 ORACLE query keeps the exact default
    "x38_pq_encode_scale" -> ((s, d) => {
      val big = scaledEmbeddings(s, d, copies = 8)
      val cb = Similarity.pqCodebooksFromSample(big, m = 4, every = 200)
      Similarity.pqEncode(big, cb, m = 4, exactSums = false)
    }),
    // t40's IVF-PQ at the 16k regime, TRAINING only: the sampled
    // codebook pass over the shared pre-materialized corpus — timed
    // fresh each pass so a training-path regression has its own number
    // (round-9 verdict: the combined entry's search cost was masked
    // inside a training-dominated total)
    "x40_ivf_pq_train" -> ((s, d) =>
      Similarity.pqCodebooksFromSample(pqStatics(s, d).big, m = 4,
        every = 200)),
    // t40's IVF-PQ composed SEARCH at the 16k regime against the frozen
    // warm-up-trained codebooks: 128 coarse lists (~125 vectors each),
    // nprobe=3, candidates scanned as codes only; k=8 exceeds the 7
    // identical replicas per vector, so the last slot is a genuinely
    // searched neighbor (recall pinned in ScaleSpec). Includes the
    // corpus assign+encode passes — the per-search cost of the raw-
    // corpus API — but no training
    "x40_ivf_pq_search" -> ((s, d) => {
      val st = pqStatics(s, d)
      val queries = st.big
        .filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      Similarity.ivfPqTopK(st.big, queries, st.cents, st.cb, m = 4, k = 8,
        nprobe = 3, exactSums = false)
    }),
    // t45's residual-encoded IVF-PQ, TRAINING only: assign + residual
    // pass + sampled codebooks over the residual space
    "x45_ivf_pq_residual_train" -> ((s, d) => {
      val st = pqStatics(s, d)
      Similarity.ivfPqResidualCodebooks(st.big, st.cents, m = 4,
        every = 200)
    }),
    // t45's residual-encoded IVF-PQ SEARCH at the same regime against
    // the frozen residual codebooks: per-probed-list query tables,
    // probed-list-restricted candidates
    "x45_ivf_pq_residual_search" -> ((s, d) => {
      val st = pqStatics(s, d)
      val queries = st.big
        .filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      Similarity.ivfPqResidualTopK(st.big, queries, st.cents, st.cbr,
        m = 4, k = 8, nprobe = 3, exactSums = false)
    }),
    // t54's repeated-substring removal on the xxhash64 digest family:
    // same planted corpus, 8-byte gram digests instead of md5 hex on
    // every exchanged row — the family a cluster would run
    "x54_repeated_substring_scale" -> ((s, d) => {
      val boiler = "this software is provided as is without any express " +
        "or implied warranty of merchantability"
      val docs = T.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(lit(boiler), lit("\n"), col("text")))
          .when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" "), lit(boiler)))
          .otherwise(col("text")).as("text"))
      TextOps.repeatedNgramRemoval(docs, n = 5, minDocs = 3)
    }),
    // t122's keep-one-copy dedup on the xxhash64 digest family — the
    // 100 TB path: same digest-keyed shapes plus the canonical arg-min
    // aggregate and the (doc, position) saved-by-canonical aggregate
    "x122_keepfirst_dedup_scale" -> ((s, d) =>
      TextOps.repeatedNgramRemoval(T.documents(s, d), n = 5,
        minDocs = 2, keepFirst = true)),
    // the reference's heaviest real shape (Seg:74-75: the 12-month
    // trailing window over the full fact; Seg:211's ~9M-patron
    // backfill regime) rehearsed at 10x patron scale on the
    // month-partitioned layout: the window predicate prunes to 12 of
    // ~80 month directories (ScaleSpec proves the file count), then the
    // Seg two-level decimal aggregate runs over the pruned months only
    // — partition pruning + AQE doing at 10x exactly what they would do
    // at 100 TB. The fact export is one-time I/O (Bench warm-up)
    "x34_seg_window_scale" -> ((s, d) => {
      val copies = 10
      val root = graft.etl.Tables.exportedSegFactByMonth(s, d, copies)
      val fact = s.read.parquet(root)
        .where(col("date_month").between(199709, 199808))
      val dimZip = T.nation(s, d).join(broadcast(T.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("GeographyID"),
          col("r_name").as("SalesTerritory"),
          col("n_name").as("DIN_DisplayMiniMarketName"))
      // the replicated patron population, every replica high-value —
      // the same id arithmetic the fact export used
      val dup = T.customer(s, d)
        .select(col("c_custkey"),
          explode(sequence(lit(0), lit(copies - 1))).as("__i"))
        .select((col("c_custkey") * copies + col("__i"))
          .as("UniquePatronId"), lit(1).as("IsHighValue"))
      val mm = graft.pipelines.Segmentation.minimarketSpend(fact, dimZip,
        dup, 19970901L, 19980831L)
      graft.pipelines.Segmentation.spendRatios(mm)
    }),
    // t63's SQ8 search at the 16k regime: the same 64-query slate the
    // PQ family benches, corpus flowing as int8 codes — the
    // quantization family's third point (PQ / residual IVF-PQ / SQ8)
    // at a comparable scale number
    "x63_sq_scale" -> ((s, d) => {
      val st = pqStatics(s, d)
      val queries = st.big
        .filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      Similarity.sqTopK(st.big, queries, k = 8)
    }),
    // t69's graph layer at the 16k regime, BUILD only: the edge list
    // through the bucketed knnJoin (the x29 shape — never all-pairs).
    // Build and search timed separately (the x40/x45 train/search
    // discipline): a deployment builds the graph once and amortizes it
    // over every search, so neither cost should mask the other
    "x69_graph_build" -> ((s, d) =>
      Similarity.knnGraph(pqStatics(s, d).big, degree = 8, bits = 8)),
    // t69's beam SEARCH against the frozen warm-up-built graph: the
    // fixed 10-node entry sample (round-10 fix) makes round 0
    // O(|Q|*10) and each round beam*degree*|Q| rows — EVERY stage of
    // the search is now corpus-size-independent except the one
    // bounded-heap entry scan, so build (x69_graph_build) scales with
    // the corpus and search stays flat
    "x69_graph_search" -> ((s, d) => {
      val st = pqStatics(s, d)
      val queries = st.big
        .filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      Similarity.graphSearch(st.big, st.graph, queries, k = 8, beam = 8,
        rounds = 2, entryCount = 10)
    }),
    // t65's binary search at the same 16k regime and query slate: the
    // quantization ladder's most aggressive point (32x cut) — stage 1
    // flows sign codes only, stage 2 reranks just the 64-deep
    // shortlist with exact cosines (recall floored in ScaleSpec)
    "x65_bq_scale" -> ((s, d) => {
      val st = pqStatics(s, d)
      val queries = st.big
        .filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      Similarity.bqTopK(st.big, queries, k = 8, shortlist = 64)
    }),
    // t70's as-of join at 10x the event log (~100k rows at sf0.1, keys
    // spread 10x): still ONE hash exchange + one per-key sort — the
    // operator's whole point is that cost tracks |L|+|R|, never the
    // match count, so the 10x plan is byte-identical in shape to t70's
    "x70_asof_scale" -> ((s, d) => {
      val ev = scaledEvents(s, d, copies = 10)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"), col("value").as("view_value"))
      graft.ops.Temporal.asofJoin(purchases, views, Seq("user_id"), "ts",
        "view_ts", payload = Seq("view_id", "view_value"),
        tie = "view_id")
    }),
    // t70's as-of under deliberate 80/20 key skew at 10x (round-10
    // verdict item 6): 80% of ~100k events fold onto ONE user, so one
    // window partition carries 80% of both sides. The union+window
    // as-of inherits groupBy-skew behavior BY DESIGN: the hot key
    // costs one task's sort of its own rows (n_hot log n_hot) and a
    // linear carry — never a pair explosion (the range-join
    // formulation would pay |L_hot|x|R_hot| candidate pairs, ~1.5B at
    // this regime vs ~80k sorted rows here). Measured honestly: AQE's
    // skew-split does NOT engage — it splits skewed JOIN partitions
    // and this plan has no join; a window partition is indivisible
    // (ScaleSpec pins the unchanged one-exchange no-join plan under
    // AQE and the range-join-equal result on the skewed frame). The
    // hot sort IS the ceiling, and this entry records its price next
    // to the uniform x70.
    "x70s_asof_skew_scale" -> ((s, d) => {
      val ev = skewedEvents(s, d, copies = 10)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"), col("value").as("view_value"))
      graft.ops.Temporal.asofJoin(purchases, views, Seq("user_id"), "ts",
        "view_ts", payload = Seq("view_id", "view_value"),
        tie = "view_id")
    }),
    // x70s's skewed frame through the CHUNKED as-of: the hot key's
    // 80% of rows split across hourly chunks into parallel sorts —
    // the mitigation measured against x70s's single-task-sort ceiling
    // (same semantics, TemporalSpec-pinned; t115 oracle-gated)
    "x70c_asof_chunked_skew" -> ((s, d) => {
      val ev = skewedEvents(s, d, copies = 10)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"), col("value").as("view_value"))
      graft.ops.Temporal.asofJoinChunked(purchases, views,
        Seq("user_id"), "ts", "view_ts",
        payload = Seq("view_id", "view_value"), tie = "view_id",
        chunkSeconds = 3600L)
    }),
    // t76's nearest-either as-of at 10x keys — same one-exchange
    // two-carry plan, cost |L|+|R| regardless of window populations
    "x76_asof_nearest_scale" -> ((s, d) => {
      val ev = scaledEvents(s, d, copies = 10)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      graft.ops.Temporal.asofNearest(signups, clicks, Seq("user_id"),
        "ts", "click_ts", payload = Seq("click_id"), tie = "click_id",
        tolerance = Some("2 hours"))
    }),
    // t71's KMV sketch pointed at its real regime: the unbounded-domain
    // distinct (corpus bigram vocabulary) where an exact distinct would
    // shuffle every value — the sketch exchanges 256 longs per
    // partition instead
    "x71_kmv_ngrams" -> ((s, d) =>
      Stats.kmvDistinctBy(
        TextOps.ngramRows(T.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism), 2),
        Seq(), col("ngram"), k = 256)),
    // t95's blocked edit-distance join at the 10x-replicated name
    // regime on the composite (prefix, length-bucket) key — the
    // round-10 `weak` fix measured where it matters: replicas KEEP
    // their name, so every block's population multiplies 10x (the
    // constant-vocabulary worst case that sank the bare-prefix key),
    // and the timed work is candidate generation + levenshtein
    // verification over those dense blocks plus the census and pair
    // count (one summary row out — nothing corpus-sized collects)
    "x95_edit_blocking_scale" -> ((s, d) => {
      val big = scaledPartNames(s, d, copies = 10)
      val census = Dedup.editDistanceBlockCensus(big)
        .agg(max(col("n")).as("max_block"),
          count(lit(1)).as("n_blocks"))
      Dedup.editDistancePairs(big, maxDist = 2, minDist = 1)
        .agg(count(lit(1)).as("n_pairs"))
        .crossJoin(census)
    }),
    // t36's heavy hitters through the Misra-Gries one-pass sketch: the
    // bounded-state path whose exchange is capacity * partitions
    // regardless of vocabulary (t36's exact count stays the oracle path;
    // sketch-vs-exact agreement is TextQualitySpec-pinned)
    "x36_heavy_hitters_sketch" -> ((s, d) => {
      import s.implicits._
      val items = TextOps.ngramRows(T.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism), 2)
        .select("ngram").as[String]
      items.select(graft.functions.MisraGries.sketch(256)).toDF("sk")
        .select(explode(col("sk")).as(Seq("ngram", "est")))
        .orderBy(col("est").desc, col("ngram")).limit(20)
    }),
  )

  /** Frozen statics for the split PQ train/search scale benches: the
    * shared 16k corpus, its 128-list coarse centroids, and the plain +
    * residual codebooks, all localCheckpointed. Built ONCE untimed
    * (Bench warm-up calls [[warmPqStatics]]; a dev-filtered run builds
    * lazily inside the first entry that needs them) so the search
    * entries time pure search order-independently while the train
    * entries time a fresh training run each pass. Deliberately NOT
    * cleared by [[clearStagingCache]]: a deployment trains its index
    * long before any search runs, so per-pass cold staging does not
    * apply to the index side. */
  private case class PqStatics(big: DataFrame, cents: DataFrame,
                               cb: DataFrame, cbr: DataFrame,
                               graph: DataFrame)
  private val pqStaticsMemo =
    scala.collection.concurrent.TrieMap.empty[String, PqStatics]
  private def pqStatics(s: SparkSession, d: String): PqStatics =
    pqStaticsMemo.getOrElseUpdate(d, {
      val big = scaledEmbeddings(s, d, copies = 8)
      val cents = big.filter(col("vec_id") % 125 === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("cvec"))
        .localCheckpoint()
      PqStatics(big, cents,
        Similarity.pqCodebooksFromSample(big, m = 4, every = 200)
          .localCheckpoint(),
        Similarity.ivfPqResidualCodebooks(big, cents, m = 4, every = 200)
          .localCheckpoint(),
        Similarity.knnGraph(big, degree = 8, bits = 8).localCheckpoint())
    })
  private[graft] def warmPqStatics(s: SparkSession, d: String): Unit = {
    pqStatics(s, d); ()
  }

  /** Frozen warm BM25 index over the full sf documents corpus for
    * x78i — the [[pqStatics]] discipline on lexical retrieval: built
    * ONCE untimed (Bench warm-up; lazily on first use in dev-filtered
    * runs) and probed per pass, so x78i times pure retrieval while
    * x78 keeps the build-inclusive one-shot number. */
  private val bm25StaticMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def bm25Static(s: SparkSession, d: String): DataFrame =
    bm25StaticMemo.getOrElseUpdate(d,
      TextOps.bm25Index(T.documents(s, d)).localCheckpoint())
  private[graft] def warmBm25Static(s: SparkSession, d: String): Unit = {
    bm25Static(s, d); ()
  }

  /** Frozen real-media asset table for x08r/x08z — the [[pqStatics]]
    * discipline on the codec benches: synthesized ONCE untimed (Bench
    * warm-up; lazily on first use in dev-filtered runs), so the
    * entries time the decode-side codec path (header parse / decode +
    * resize + re-encode), not the synthesis encode. A deployment's
    * asset table already exists on disk; the synthesis is fixture
    * manufacture, not measured work. */
  private val mediaStaticMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def mediaStatic(s: SparkSession, d: String): DataFrame =
    mediaStaticMemo.getOrElseUpdate(d,
      Multimodal.asAssetsReal(
        T.documents(s, d).select(col("doc_id"), col("text")))
        .localCheckpoint())
  private[graft] def warmMediaStatic(s: SparkSession, d: String): Unit = {
    mediaStatic(s, d); ()
  }

  /** The part-name corpus replicated `copies`x with distinct ids but
    * UNCHANGED names (block populations multiply — the fixed-vocabulary
    * regime the composite edit-distance block key exists for), plus the
    * t95 planted 1-edit twin per 4th name — the scale harness for x95
    * and ScaleSpec's blocking floors. */
  private[graft] def scaledPartNames(s: SparkSession, d: String,
                                     copies: Int): DataFrame = {
    val parts = T.part(s, d)
      .select(col("p_partkey").as("id"), lower(col("p_name")).as("name"))
    val big = parts
      .select(explode(sequence(lit(0), lit(copies - 1))).as("__i"),
        col("id"), col("name"))
      .select((col("id") * copies + col("__i")).as("id"), col("name"))
    val planted = big.filter(col("id") % 4 === 0)
      .select((col("id") + 10000000L).as("id"),
        concat(substring(col("name"), 1, 3),
          substring(col("name"), 5, 1000000)).as("name"))
    big.unionByName(planted).localCheckpoint()
  }

  /** The sf event log replicated `copies`x with distinct event AND user
    * ids (keys multiply, per-key row counts stay fixture-sized) — the
    * scale harness for the as-of join twin. */
  private[graft] def scaledEvents(s: SparkSession, d: String,
                                  copies: Int): DataFrame = {
    val ev = T.events(s, d)
    (0 until copies).map(i => ev.select(
        (col("event_id") * copies + i).as("event_id"), col("ts"),
        (col("user_id") * copies + i).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .reduce(_ unionByName _)
      .localCheckpoint()
  }

  /** [[scaledEvents]] with DELIBERATE 80/20 key skew: 80% of all rows
    * (every event_id % 5 < 4 — deterministic) fold onto user 0, the
    * rest keep their spread keys. The as-of family's worst case: one
    * window partition carries 80% of both sides. */
  private[graft] def skewedEvents(s: SparkSession, d: String,
                                  copies: Int): DataFrame =
    scaledEvents(s, d, copies)
      .withColumn("user_id",
        when(col("event_id") % 5 < 4, lit(0L)).otherwise(col("user_id")))

  /** The sf embedding frame replicated `copies`x with distinct ids —
    * the scale harness for x29/x30 (replicas keep their vector, so bucket
    * populations multiply: the skewed-bucket regime, not the easy
    * uniform one). Materialized once (localCheckpoint): a real pipeline
    * reads its corpus from a table, so the benched cost should be the
    * operator's machinery, not repeated evaluation of this synthetic
    * 8-way union by every consumer in the plan. */
  private[graft] def scaledEmbeddings(s: SparkSession, d: String,
                                      copies: Int): DataFrame = {
    val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
    (0 until copies).map(i =>
        emb.select((col("vec_id") * copies + i).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _)
      // round-16 profile: the union of `copies` one-task scans froze
      // the checkpoint at `copies` partitions (the fixture is one row
      // group), and every consumer's cosine kernel inherited that
      // width — x29's candidate-verify stage ran 8-way with 8.3 s CPU
      // on 24 idle cores. A corpus table at real scale is
      // split-parallel at scan time; the spread here reproduces that
      // shape for the consumers the harness exists to measure.
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint()
  }
}
