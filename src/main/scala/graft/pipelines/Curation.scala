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
  *   4. near-dup removal: LSH candidates → Jaccard verify → connected
  *      components → keep-longest survivor    ([[Dedup.retainBest]])
  *   5. corpus-wide line dedup                ([[TextOps.lineDedupScalable]])
  *   6. eval-set decontamination              ([[Dedup.decontaminate]])
  *   7. per-source quality pruning            ([[TextOps.keepTopFraction]])
  *   7b. (optional) DSIR target-distribution selection
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
    * over it (all ok on success). */
  case class Result(report: DataFrame, mix: DataFrame, audit: DataFrame)

  def run(docs: DataFrame, evalSet: DataFrame, outPath: String,
          minWords: Int = 5, jaccard: Double = 0.5,
          keepNum: Int = 3, keepDen: Int = 4,
          budgetTokens: Long = 100000L, temperature: Double = 2.0,
          maxEpochs: Double = 4.0, capacity: Int = 512,
          buckets: Int = 8, shards: Int = 8,
          salt: String = "curate",
          dsirTarget: Option[DataFrame] = None,
          dsirNum: Int = 1, dsirDen: Int = 2,
          dsirBuckets: Int = 4096): Result = {
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
    val exact = stage("exact_dedup")(
      Dedup.exactDedup(scrubbed).drop("fingerprint"))

    // 4: near-dup removal — candidates only within LSH bands, verified
    // pairs closed under transitivity, keep-the-longest per cluster
    val verified = Dedup.jaccardVerify(
      Dedup.minHashLshCandidates(exact, bands = 8, rowsPerBand = 4,
        shingleSize = 3),
      exact, threshold = jaccard)
    val nearDeduped = stage("near_dedup")(
      Dedup.retainBest(exact,
          verified.select(col("id_a"), col("id_b")),
          exact.select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("score")))
        .filter(col("is_kept") === 1)
        .select(col("doc_id"))
        .join(exact, Seq("doc_id")))

    // 5: corpus-frequency line removal; fully-boilerplate docs die
    val lineDeduped = stage("line_dedup")(
      TextOps.lineDedupScalable(nearDeduped)
        .filter(length(trim(col("clean_text"))) > 0)
        .join(nearDeduped.select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .select(col("doc_id"), col("clean_text").as("text"),
          col("source")))

    // 6: eval-set decontamination — exact or n-gram-contaminated die
    val decontaminated = stage("decontaminate")(
      Dedup.decontaminate(lineDeduped, evalSet)
        .filter(col("exact_dup") === 0 && col("ngram_contaminated") === 0)
        .select(col("doc_id"))
        .join(lineDeduped, Seq("doc_id")))

    // 7: keep the top keepNum/keepDen of every source by quality
    val pruned = stage("quality_prune")(
      TextOps.keepTopFraction(decontaminated, col("source"),
          TextOps.qualityScore(col("text")), col("doc_id"),
          keepNum, keepDen)
        .filter(col("is_kept") === 1)
        .select(col("doc_id"), col("text"), col("source")))

    // 7b (optional): DSIR target-distribution selection — score the
    // survivors' hashed n-grams against the target corpus
    // ([[TextOps.dsirWeights]]) and keep the top dsirNum/dsirDen of
    // each source by log_weight (the same per-source rank cut as the
    // quality prune, so the window stays domain-sized at scale; docs
    // with no n-gram evidence rank last and die first). Skipped —
    // and absent from the report — when no target is given.
    val selected = dsirTarget match {
      case None => pruned
      case Some(tgt) => stage("dsir_select")(
        TextOps.keepTopFraction(
            TextOps.dsirWeights(pruned, tgt, n = 2, buckets = dsirBuckets)
              .join(pruned, Seq("doc_id")),
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
    Result(report, mix, TextOps.auditTrainingMix(spark, outPath))
  }
}
