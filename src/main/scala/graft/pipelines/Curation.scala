package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** North-star composition — the [[Monthly]] orchestration discipline
  * applied to the training-data side: ONE pure function driving a raw
  * document corpus through the full curation chain the operator
  * library exists for, in the order a production pipeline runs it:
  *
  *   1. C4 line-rule cleaning + page screens  ([[TextOps.c4LineFilter]])
  *   2. PII scrub                             ([[TextOps.scrubPii]])
  *   3. exact dedup                           ([[Dedup.exactDedup]])
  *   3b. (incremental) exact-dup gate vs the persisted corpus state
  *   4. near-dup removal: LSH candidates → Jaccard verify → connected
  *      components → keep-longest survivor    ([[Dedup.retainBest]])
  *   4b. (incremental) near-dup gate vs the persisted band index
  *                                            ([[Dedup.nearDupFlag]])
  *   5. corpus-wide line dedup                ([[TextOps.lineDedupScalable]])
  *   6. eval-set decontamination              ([[Dedup.decontaminate]])
  *   6b. (optional) decontamination by retrieval: BM25 screen against
  *      a frozen eval-set index                ([[TextOps.bm25ScreenFlag]])
  *   7. per-source quality pruning            ([[TextOps.keepTopFraction]])
  *   7b. (optional) learned-classifier screen ([[TextOps.linearScore]])
  *   7c. (optional) DSIR target-distribution selection
  *                                            ([[TextOps.dsirWeights]])
  *   8. temperature epoch allocation → integer replication
  *                                            ([[TextOps.temperatureAllocation]])
  *   9. packed, shard-shuffled egress + manifest audit
  *                                            ([[TextOps.writeTrainingMixSharded]])
  *
  * Doc-grain dedup runs BEFORE line-grain boilerplate removal: an
  * exact or near doc duplicate is the cheaper whole-row kill, and
  * running it first keeps line dedup from silently absorbing it (two
  * identical docs share every line, so the later doc would otherwise
  * starve to empty at the line stage and the dedup ledger would
  * misattribute the loss).
  *
  * Between stages the corpus is localCheckpointed — the in-process
  * stand-in for the parquet handoff a deployment writes (each stage
  * independently restartable, the reference's staging-table
  * discipline). The returned report carries per-stage (n_docs,
  * n_tokens) so a caller gates the publish on expected attrition the
  * way [[Monthly]] gates on its zero-expectation probes; the report's
  * driver-side collect is stage-count-bounded (one row per stage).
  *
  * Scale posture: every stage is one of the audited operators — no new
  * shuffles are introduced by the composition itself; the only
  * composition-owned transform is the allocation replication
  * (explode over n_copies <= maxEpochs with replica ids
  * doc_id·8 + copy, a pure projection).
  */
object Curation {

  /** report: (stage_no, stage, n_docs, n_tokens); mix: the landed
    * shard-shuffled layout read back; audit: [[TextOps.auditTrainingMix]]
    * over it (all ok on success); kept: the post-selection survivors
    * (doc_id, text, source) BEFORE epoch replication — the frame whose
    * fingerprints/bands feed the next incremental run's state;
    * dsirProfileUsed: the DSIR profile stage 7c scored against (the
    * frozen one when given, else the one built this run) — what an
    * incremental run persists so later runs score against the SAME
    * distribution. */
  case class Result(report: DataFrame, mix: DataFrame, audit: DataFrame,
                    kept: DataFrame,
                    dsirProfileUsed: Option[DataFrame] = None)

  def run(docs: DataFrame, evalSet: DataFrame, outPath: String,
          minWords: Int = 5, jaccard: Double = 0.5,
          keepNum: Int = 3, keepDen: Int = 4,
          budgetTokens: Long = 100000L, temperature: Double = 2.0,
          maxEpochs: Double = 4.0, capacity: Int = 512,
          buckets: Int = 8, shards: Int = 8,
          salt: String = "curate",
          dsirTarget: Option[DataFrame] = None,
          dsirNum: Int = 1, dsirDen: Int = 2,
          dsirBuckets: Int = 4096,
          histFingerprints: Option[DataFrame] = None,
          histBandIndex: Option[DataFrame] = None,
          dsirFrozenProfile: Option[DataFrame] = None,
          histSemanticIndex: Option[DataFrame] = None,
          semCentroids: Option[DataFrame] = None,
          docEmbeddings: Option[DataFrame] = None,
          semTau: Double = 0.95,
          bm25EvalIndex: Option[DataFrame] = None,
          bm25Tau: Option[Double] = None,
          clsWeights: Option[DataFrame] = None,
          clsBias: Double = 0.0,
          clsTau: Double = 0.5): Result = {
    val spark = docs.sparkSession
    var ledger = Vector.empty[(String, Long, Long)]
    def stage(name: String)(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint()
      val m = out.agg(count(lit(1)),
          sum(TextOps.tokenCount(col("text")))).collect()(0)
      ledger :+= ((name, m.getLong(0),
        if (m.isNullAt(1)) 0L else m.getLong(1)))
      out
    }
    val base = stage("input")(
      docs.select(col("doc_id"), col("text"), col("source")))

    // 1: local line rules + page screens; docs with no surviving line die
    val cleaned = stage("c4_clean")(
      TextOps.c4LineFilter(base, minWords)
        .filter(col("page_ok") && col("n_kept") > 0)
        .join(base.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("clean_text").as("text"),
          col("source")))

    // 2: PII masked in place (counts ride the report only via tokens)
    val scrubbed = stage("pii_scrub")(
      TextOps.scrubPii(cleaned)
        .join(cleaned.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("clean_text").as("text"),
          col("source")))

    // 3: digest-keyed exact dedup (lowest id survives)
    val exactLocal = stage("exact_dedup")(
      Dedup.exactDedup(scrubbed).drop("fingerprint"))

    // 3b (incremental runs only): docs whose cleaned text the corpus
    // has ALREADY kept in a previous run die here — one anti-join
    // against the persisted fingerprint set (the exact-dup gate
    // across history)
    val exact = histFingerprints match {
      case None => exactLocal
      case Some(h) => stage("exact_vs_history")(
        exactLocal
          .withColumn("fingerprint",
            TextOps.docFingerprint(col("text")))
          .join(h, Seq("fingerprint"), "left_anti")
          .drop("fingerprint"))
    }

    // 4: near-dup removal — candidates only within LSH bands, verified
    // pairs closed under transitivity, keep-the-longest per cluster
    val verified = Dedup.jaccardVerify(
      Dedup.minHashLshCandidates(exact, bands = 8, rowsPerBand = 4,
        shingleSize = 3),
      exact, threshold = jaccard)
    val nearLocal = stage("near_dedup")(
      Dedup.retainBest(exact,
          verified.select(col("id_a"), col("id_b")),
          exact.select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("score")))
        .filter(col("is_kept") === 1)
        .select(col("doc_id"))
        .join(exact, Seq("doc_id")))

    // 4b (incremental runs only): docs sharing a MinHash band with any
    // previously-kept doc die here — the t46 ingest-gate discipline
    // against the persisted band index (same band parameters as the
    // index build)
    val nearDeduped = histBandIndex match {
      case None => nearLocal
      case Some(hb) => stage("neardup_vs_history")(
        Dedup.nearDupFlag(nearLocal, hb)
          .filter(col("is_near_dup") === 0)
          .drop("is_near_dup"))
    }

    // 4c (incremental runs only, embedding modality): docs whose
    // embedding sits within cosine semTau of ANY previously-kept doc's
    // embedding die here — the t57 semantic ingest gate against the
    // persisted per-cluster index, probed with the SAME frozen
    // centroids the index was built with. Docs without an embedding
    // pass ungated (the t46 unshingleable-docs discipline).
    val semDeduped = (histSemanticIndex, semCentroids, docEmbeddings) match {
      case (Some(idx), Some(cents), Some(emb)) =>
        stage("semdup_vs_history") {
          val withVec = nearDeduped.join(
            emb.select(col("doc_id"), col("embedding")),
            Seq("doc_id"), "left")
          Dedup.semanticDupFlag(
              withVec.filter(col("embedding").isNotNull), idx, cents,
              semTau, idCol = "doc_id")
            .filter(col("is_semantic_dup") === 0)
            .drop("is_semantic_dup", "embedding")
            .unionByName(withVec.filter(col("embedding").isNull)
              .drop("embedding"))
        }
      case _ => nearDeduped
    }

    // 5: corpus-frequency line removal; fully-boilerplate docs die
    val lineDeduped = stage("line_dedup")(
      TextOps.lineDedupScalable(semDeduped)
        .filter(length(trim(col("clean_text"))) > 0)
        .join(semDeduped.select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .select(col("doc_id"), col("clean_text").as("text"),
          col("source")))

    // 6: eval-set decontamination — exact or n-gram-contaminated die
    val decontaminated = stage("decontaminate")(
      Dedup.decontaminate(lineDeduped, evalSet)
        .filter(col("exact_dup") === 0 && col("ngram_contaminated") === 0)
        .select(col("doc_id"))
        .join(lineDeduped, Seq("doc_id")))

    // 6b (optional): decontamination by RETRIEVAL — docs whose top
    // BM25 score against the frozen eval-set index reaches bm25Tau
    // die here, the t84 gate inside the pipeline. Catches the
    // paraphrase regime stage 6's exact/5-gram overlap cannot (heavy
    // shared rare vocabulary without a single intact 5-gram); docs
    // sharing no term with the eval set pass with a null top.
    val retrievalClean = (bm25EvalIndex, bm25Tau) match {
      case (Some(idx), Some(tau)) => stage("retrieval_decon")(
        TextOps.bm25ScreenFlag(decontaminated, idx, tau)
          .filter(col("is_contaminated") === 0)
          .drop("bm25_top", "is_contaminated"))
      case _ => decontaminated
    }

    // 7: keep the top keepNum/keepDen of every source by quality
    val pruned = stage("quality_prune")(
      TextOps.keepTopFraction(retrievalClean, col("source"),
          TextOps.qualityScore(col("text")), col("doc_id"),
          keepNum, keepDen)
        .filter(col("is_kept") === 1)
        .select(col("doc_id"), col("text"), col("source")))

    // 7b (optional): learned-classifier screen — fastText-style quality
    // model INFERENCE (t102, [[TextOps.linearScore]]): keep docs whose
    // sigmoid probability reaches clsTau. The heuristic prune (7) ranks
    // within each source; this is the absolute learned threshold the
    // CCNet/GPT-3 recipes apply on top. Skipped — and absent from the
    // report — when no weight table is given.
    val classified = clsWeights match {
      case Some(w) => stage("classifier_prune")(
        pruned.join(TextOps.linearScore(pruned, w, clsBias)
            .filter(col("prob") >= clsTau).select("doc_id"),
          Seq("doc_id")))
      case None => pruned
    }

    // 7c (optional): DSIR target-distribution selection — score the
    // survivors' hashed n-grams and keep the top dsirNum/dsirDen of
    // each source by log_weight (the same per-source rank cut as the
    // quality prune, so the window stays domain-sized at scale; docs
    // with no n-gram evidence rank last and die first). The profile
    // scored against is the FROZEN one when given (incremental runs:
    // score every batch against the same distribution, the t67
    // discipline); else it is built here from (classified, target) —
    // exactly what dsirWeights composes, so the batch path is
    // unchanged. Skipped — and absent from the report — when neither
    // is given.
    val profileUsed: Option[DataFrame] = dsirFrozenProfile.orElse(
      dsirTarget.map(tgt =>
        TextOps.dsirProfile(classified, tgt, n = 2, buckets = dsirBuckets)
          .localCheckpoint()))
    val selected = profileUsed match {
      case None => classified
      case Some(p) => stage("dsir_select")(
        TextOps.keepTopFraction(
            TextOps.dsirScore(classified, p, n = 2, buckets = dsirBuckets)
              .join(classified, Seq("doc_id")),
            col("source"), col("log_weight"), col("doc_id"),
            dsirNum, dsirDen)
          .filter(col("is_kept") === 1)
          .select(col("doc_id"), col("text"), col("source")))
    }

    // 8: temperature allocation → integer replication (replica ids
    // doc_id·8 + copy; n_copies <= maxEpochs, and maxEpochs <= 7 keeps
    // the id arithmetic collision-free)
    require(maxEpochs <= 7.0, "replica id arithmetic caps maxEpochs at 7")
    val replicated = stage("allocate")(
      TextOps.temperatureAllocation(selected, budgetTokens, temperature,
          maxEpochs)
        .select(col("doc_id"), col("n_copies"))
        .filter(col("n_copies") > 0)
        .join(selected, Seq("doc_id"))
        .withColumn("__copy", explode(sequence(lit(1L), col("n_copies"))))
        .select((col("doc_id") * 8 + col("__copy")).as("doc_id"),
          col("text"), col("source")))

    // 9: packed, shard-shuffled egress; the sibling manifest audits the
    // landed layout (cap/rate are pass-through here — attrition already
    // happened upstream in auditable stages)
    val mix = TextOps.writeTrainingMixSharded(replicated, outPath,
      capPerSource = Int.MaxValue, rate = lit(1.0), salt = salt,
      capacity = capacity, buckets = buckets, shards = shards)
    ledger :+= (("egress", mix.count(),
      mix.agg(sum(col("n_tokens"))).collect()(0) match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }))

    val report = spark.createDataFrame(
      ledger.zipWithIndex.map { case ((n, d, t), i) => (i.toLong, n, d, t) })
      .toDF("stage_no", "stage", "n_docs", "n_tokens")
    Result(report, mix, TextOps.auditTrainingMix(spark, outPath), selected,
      profileUsed)
  }

  /** Incremental curation — [[run]] composed across runs: curate a NEW
    * batch of documents (a month, a crawl snapshot) against the
    * PERSISTED state of everything kept before. State under `stateDir`
    * (atomically swapped via [[graft.etl.Publish.publishAll]], so a
    * mid-update crash never leaves a half-written gate):
    *   - `fingerprints`: (fingerprint) — every kept doc's digest, the
    *     exact-dup gate across history (stage 3b);
    *   - `band_index`: (band, band_hash) — the MinHash band index of
    *     every kept doc, the near-dup gate across history (stage 4b,
    *     the t46 ingest discipline).
    * A missing `stateDir` is an empty state (first run ≡ [[run]] plus
    * two no-op history stages). On success the state becomes
    * old ∪ this run's kept survivors, so runs compose: curating months
    * 1..k then k+1 incrementally gates k+1 against every doc kept in
    * 1..k. Batch-scoped stages (line dedup, quality prune, allocation)
    * stay batch-scoped by design — their state would be corpus-sized;
    * the doc-identity gates are exactly the ones history must see.
    *
    * Scale posture: both state frames are compact (one digest / a few
    * band rows per kept doc — no text), grow append-only, and meet the
    * batch in the same anti-join / band-keyed join shapes the
    * streaming gates run per microbatch.
    *
    * Optional state dimensions (each active only when its inputs are
    * given, and each FROZEN at first use — the build-once/score-forever
    * t57/t67 discipline):
    *   - `sem_centroids` + `semantic_index` (needs `docEmbeddings`, a
    *     (doc_id, embedding) side frame, and `semCentroids` on first
    *     run): the coarse quantizer is persisted on first use and
    *     REUSED on every later run — a gate probing different lists
    *     than the index's silently loses recall, so a later
    *     `semCentroids` argument is ignored in favor of the stored
    *     frame. The index grows by the kept survivors' (doc_id,
    *     centroid_id, embedding) rows; stage 4c screens each batch
    *     against it. With `semCompactTau` set, the grown index is
    *     compacted before the swap ([[Dedup.compactSemanticIndex]]:
    *     in-index near-twins collapse to their lowest-id survivor), so
    *     state tracks semantic diversity instead of document count —
    *     use a compaction tau >= the gate's `semTau`.
    *   - `dsir_profile` (needs `dsirTarget` on first run): the full
    *     bucket profile from the FIRST run's (pruned, target) pair is
    *     persisted and every later batch scores against it — the same
    *     document gets the same log_weight no matter which batch it
    *     arrives in (a per-run profile would silently re-rank). A
    *     later `dsirTarget` argument is ignored once a profile is
    *     stored.
    *   - `bm25_index` (needs `bm25Tau`): the eval set's BM25 index
    *     ([[TextOps.bm25Index]]) is built from the FIRST gated run's
    *     `evalSet` and persisted; every later batch screens against
    *     the SAME index (stage 6b, the t84 gate), so a document's
    *     retrieval score — and its fate — never depends on which
    *     batch it arrived in. A later run's `evalSet` reshapes
    *     stage 6's overlap gate (batch-scoped by design) but not the
    *     frozen retrieval index.
    *   - `cls_weights` + `cls_params` (needs `clsWeights` on first
    *     run): the learned classifier is persisted WHOLE — the weight
    *     table plus a one-row (bias, tau) frame — and stored beats
    *     passed for all three, so a month-2 run passing a different
    *     bias or threshold still screens with the first run's
    *     effective model (weights with a different bias ARE a
    *     different classifier). */
  def runIncremental(newDocs: DataFrame, evalSet: DataFrame,
                     outPath: String, stateDir: String,
                     minWords: Int = 5, jaccard: Double = 0.5,
                     keepNum: Int = 3, keepDen: Int = 4,
                     budgetTokens: Long = 100000L,
                     temperature: Double = 2.0,
                     maxEpochs: Double = 4.0, capacity: Int = 512,
                     buckets: Int = 8, shards: Int = 8,
                     salt: String = "curate",
                     dsirTarget: Option[DataFrame] = None,
                     dsirNum: Int = 1, dsirDen: Int = 2,
                     dsirBuckets: Int = 4096,
                     docEmbeddings: Option[DataFrame] = None,
                     semCentroids: Option[DataFrame] = None,
                     semTau: Double = 0.95,
                     semCompactTau: Option[Double] = None,
                     bm25Tau: Option[Double] = None,
                     clsWeights: Option[DataFrame] = None,
                     clsBias: Double = 0.0,
                     clsTau: Double = 0.5): Result = {
    val spark = newDocs.sparkSession
    val empty = newDocs.limit(0)
    def load(name: String): Option[DataFrame] = {
      val p = java.nio.file.Paths.get(stateDir, name)
      if (java.nio.file.Files.exists(p))
        Some(spark.read.parquet(p.toString))
      else None
    }
    def loadOr(name: String, emptyFrame: => DataFrame): DataFrame =
      load(name).getOrElse(emptyFrame)
    val histFps = loadOr("fingerprints",
      empty.select(TextOps.docFingerprint(col("text")).as("fingerprint")))
    val histBands = loadOr("band_index", Dedup.nearDupIndex(empty))
    // the frozen quantizer: stored beats passed (see scaladoc)
    val cents = load("sem_centroids").orElse(semCentroids)
    val semActive = cents.nonEmpty && docEmbeddings.nonEmpty
    val histSem: Option[DataFrame] =
      if (!semActive) None
      else Some(loadOr("semantic_index",
        Dedup.semanticIndex(
            docEmbeddings.get.limit(0), cents.get, idCol = "doc_id")
          .select(col("doc_id"), col("centroid_id"), col("embedding"))))
    val frozenProfile = load("dsir_profile")
    // the frozen classifier model, resolved ONCE so the same frame is
    // both used and persisted (stored beats passed; localCheckpoint so
    // the state swap below can't invalidate the lazy read mid-publish)
    val clsUsed: Option[DataFrame] =
      load("cls_weights").orElse(clsWeights).map(_.localCheckpoint())
    // bias and tau are PART of the model (round-10 advice: a month-2
    // run passing a different bias/tau would silently screen with a
    // different effective classifier — exactly the cross-batch drift
    // cls_weights exists to stop): stored beats passed for all three
    val (clsBiasUsed, clsTauUsed) = load("cls_params")
      .flatMap(_.collect().headOption)
      .map(r => (r.getDouble(r.fieldIndex("bias")),
        r.getDouble(r.fieldIndex("tau"))))
      .getOrElse((clsBias, clsTau))
    // the frozen retrieval index: stored beats rebuilt (see scaladoc)
    val bm25Idx: Option[DataFrame] =
      if (bm25Tau.isEmpty) None
      else Some(load("bm25_index").getOrElse(
        TextOps.bm25Index(evalSet).localCheckpoint()))
    val r = run(newDocs, evalSet, outPath, minWords, jaccard,
      keepNum, keepDen, budgetTokens, temperature, maxEpochs, capacity,
      buckets, shards, salt, dsirTarget, dsirNum, dsirDen, dsirBuckets,
      histFingerprints = Some(histFps), histBandIndex = Some(histBands),
      dsirFrozenProfile = frozenProfile, histSemanticIndex = histSem,
      semCentroids = if (semActive) cents else None,
      docEmbeddings = if (semActive) docEmbeddings else None,
      semTau = semTau,
      bm25EvalIndex = bm25Idx, bm25Tau = bm25Tau,
      // the frozen classifier: stored beats passed (every batch must be
      // screened by the SAME model, the dsir_profile discipline)
      clsWeights = clsUsed,
      clsBias = clsBiasUsed, clsTau = clsTauUsed)
    // state := old ∪ kept survivors — staged fully before the swap, so
    // the lazy reads of the old state complete during staging
    val newFps = histFps.unionByName(r.kept.select(
        TextOps.docFingerprint(col("text")).as("fingerprint")))
      .distinct()
    val newBands = histBands.unionByName(Dedup.nearDupIndex(r.kept))
      .distinct()
    val semState: Map[String, DataFrame] =
      if (!semActive) Map.empty
      else {
        val grown = histSem.get.unionByName(
            Dedup.semanticIndex(
                r.kept.select(col("doc_id"))
                  .join(docEmbeddings.get
                    .select(col("doc_id"), col("embedding")),
                    Seq("doc_id")),
                cents.get, idCol = "doc_id")
              .select(col("doc_id"), col("centroid_id"),
                col("embedding")))
          .distinct()
        // optional compaction (ROADMAP: bounded state for years-long
        // deployments): the index's own semantic dedup — in-index
        // near-twins collapse to one survivor, so state growth tracks
        // semantic DIVERSITY, not document count
        val next = semCompactTau.fold(grown)(tc =>
          Dedup.compactSemanticIndex(grown, tc))
        Map("sem_centroids" -> cents.get, "semantic_index" -> next)
      }
    val dsirState: Map[String, DataFrame] =
      r.dsirProfileUsed.map("dsir_profile" -> _).toMap
    val bm25State: Map[String, DataFrame] =
      bm25Idx.map("bm25_index" -> _).toMap
    // persist the classifier model alongside the other frozen state
    // dimensions — without this, "stored beats passed" could never
    // fire and a month-2 run would silently screen with a DIFFERENT
    // model (or none), the cross-batch drift this state exists to stop.
    // cls_params rides along as a one-row (bias, tau) frame so the
    // WHOLE effective model is frozen, not just the weight table
    val clsState: Map[String, DataFrame] =
      clsUsed.map(w => Map(
        "cls_weights" -> w,
        "cls_params" -> spark.range(1).select(
          lit(clsBiasUsed).as("bias"), lit(clsTauUsed).as("tau")))
      ).getOrElse(Map.empty)
    graft.etl.Publish.publishAll(stateDir,
      Map("fingerprints" -> newFps, "band_index" -> newBands) ++
        semState ++ dsirState ++ bm25State ++ clsState) match {
      case scala.util.Failure(e) => throw e
      case scala.util.Success(_) => ()
    }
    r
  }
}
