package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Recorded recall/cost evidence for the bucketed ANN family — the
  * cost/recall trade of [[Similarity.knnJoin]] as numbers, not prose:
  * recall is measured against the exact brute-force top-k on the fixture
  * corpus, and candidate volume (the thing 100 TB cost scales with) is
  * shown to shrink as bucket bits grow. Floors are pinned ~10 points
  * under the observed values so fixture regeneration noise doesn't flap
  * the spec while a real kernel regression (wrong plane signs, broken
  * probe set) still trips it. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
    .localCheckpoint()

  private def recallOf(approx: org.apache.spark.sql.DataFrame,
                       k: Int): Double = {
    val exact = Similarity.bruteForceTopK(emb, emb, k)
      .select(col("query_id"), col("neighbor_id"))
    exact.intersect(approx.select(col("query_id"), col("neighbor_id")))
      .count().toDouble / exact.count()
  }

  private def recallAtBits(bits: Int, k: Int = 3,
                           probe2: Boolean = false): Double =
    recallOf(Similarity.knnJoin(emb, emb, k, bits, probe2 = probe2), k)

  /** Sum over buckets of |queries∩bucket|·|corpus∩bucket| — the pair
    * volume a single-probe bucket join would compare. */
  private def candidateVolume(bits: Int): Long =
    emb.select(Similarity.rhpBucket(col("embedding"), bits).as("bucket"))
      .groupBy("bucket").count()
      .agg(sum(col("count") * col("count"))).first().getLong(0)

  test("knnJoin recall vs brute force is recorded and bounded") {
    val r4 = recallAtBits(4)
    val r8 = recallAtBits(8)
    info(f"recall@3 bits=4: $r4%.3f, bits=8: $r8%.3f (corpus=${emb.count()})")
    // coarser buckets scan more candidates and must not recall worse
    assert(r4 >= r8 - 0.02, f"recall inverted: bits=4 $r4%.3f < bits=8 $r8%.3f")
    // observed on the fixture: 0.497 / 0.129. The fixture vectors are
    // near-random, which is sign-LSH's WORST case (no cluster structure
    // for the hyperplanes to separate) — real embedding corpora sit
    // higher; these floors catch kernel regressions, not corpus quality
    assert(r4 >= 0.40, f"bits=4 recall collapsed: $r4%.3f")
    assert(r8 >= 0.08, f"bits=8 recall collapsed: $r8%.3f")
    // the Hamming-2 probe knob must buy recall back at the same bits
    val r8p2 = recallAtBits(8, probe2 = true)
    info(f"recall@3 bits=8 probe2: $r8p2%.3f")
    assert(r8p2 >= r8, f"probe2 lost recall: $r8p2%.3f < $r8%.3f")
    // adaptive probing sits between the fixed depths by construction:
    // rich queries take the probe1 set, starved ones the probe2 set.
    // At k=3 nearly every query's Hamming-1 census covers k (average
    // ~16 candidates) so adaptive ≈ probe1; at k=10 starvation is
    // common and the adaptive path must lift recall above probe1 while
    // staying under always-probe2
    val rAd3 = recallOf(Similarity.knnJoinAdaptive(emb, emb, 3, 8), 3)
    info(f"recall@3 bits=8 adaptive: $rAd3%.3f")
    assert(rAd3 >= r8 - 0.001 && rAd3 <= r8p2 + 0.001,
      f"adaptive recall $rAd3%.3f outside [$r8%.3f, $r8p2%.3f]")
    val r10p1 = recallOf(Similarity.knnJoin(emb, emb, 10, 8), 10)
    val r10ad = recallOf(Similarity.knnJoinAdaptive(emb, emb, 10, 8), 10)
    val r10p2 = recallOf(Similarity.knnJoin(emb, emb, 10, 8,
      probe2 = true), 10)
    info(f"recall@10 bits=8: probe1 $r10p1%.3f, adaptive $r10ad%.3f, " +
      f"probe2 $r10p2%.3f")
    assert(r10ad >= r10p1 && r10ad <= r10p2 + 0.001,
      f"adaptive@10 $r10ad%.3f outside [$r10p1%.3f, $r10p2%.3f]")
  }

  test("knnJoinBudget: probe depth follows the census; cost shrinks, " +
      "recall stays sandwiched") {
    // bits=8/k=5 measured on THIS fixture corpus: tiers 64/435/1 — the
    // one (bits,k) in range where all three probe depths populate
    // (t32's oracle corpus at sf0.01 uses bits=8/k=8 for the same reason)
    val bits = 8
    val k = 5
    // independent driver-side accounting from the collected bucket
    // assignments: per query the candidate counts at Hamming <=0/1/2,
    // the tier the census rule picks, and the total candidate volumes
    val bk = emb.select(col("vec_id"),
        Similarity.rhpBucket(col("embedding"), bits).cast("int"))
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1)))
    def candAt(qb: Int, maxD: Int): Long =
      bk.count { case (_, rb) => Integer.bitCount(qb ^ rb) <= maxD } - 1L
    val tiers = bk.map { case (_, qb) =>
      val c0 = candAt(qb, 0)
      if (c0 >= k) (0, c0)
      else if (candAt(qb, 1) >= k) (1, candAt(qb, 1))
      else (2, candAt(qb, 2))
    }
    val byTier = tiers.groupBy(_._1).view.mapValues(_.size).toMap
    info(s"tier populations (own/H1/H2): " +
      (0 to 2).map(t => byTier.getOrElse(t, 0)).mkString("/"))
    // the fixture must genuinely exercise all three probe depths —
    // otherwise t32's oracle proves less than it claims
    assert((0 to 2).forall(t => byTier.getOrElse(t, 0) > 0), byTier.toString)
    // cost: the budgeted candidate volume vs uniform Hamming-1 probing
    val volBudget = tiers.map(_._2).sum
    val volP1 = bk.map { case (_, qb) => candAt(qb, 1) }.sum
    info(s"candidate volume: budget=$volBudget, uniform probe1=$volP1")
    assert(volBudget < volP1,
      s"graded probing must cut candidate volume: $volBudget >= $volP1")
    // recall: at worst slightly under uniform probe1 (tier-0 queries scan
    // only their own bucket), never above always-probe2
    val rBudget = recallOf(Similarity.knnJoinBudget(emb, emb, k, bits), k)
    val rP1 = recallOf(Similarity.knnJoin(emb, emb, k, bits), k)
    val rP2 = recallOf(Similarity.knnJoin(emb, emb, k, bits,
      probe2 = true), k)
    info(f"recall@$k bits=$bits: budget $rBudget%.3f, probe1 $rP1%.3f, " +
      f"probe2 $rP2%.3f")
    assert(rBudget >= rP1 - 0.05 && rBudget <= rP2 + 0.001,
      f"budget recall $rBudget%.3f outside [$rP1%.3f - 0.05, $rP2%.3f]")
  }

  test("knnCensus equals the true Hamming-1 candidate count, self and disjoint") {
    // independent recomputation: collect each side's bucket assignments and
    // count, per query, the right rows within Hamming distance 1 of its
    // bucket — plain Scala bit-twiddling, none of the engine's join/probe
    // machinery
    val bits = 4
    def buckets(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
      df.select(col("vec_id"),
          Similarity.rhpBucket(col("embedding"), bits).cast("int"))
        .collect().toSeq.map(r => (r.getLong(0), r.getInt(1)))
    def expected(left: Seq[(Long, Int)], right: Seq[(Long, Int)],
                 selfJoin: Boolean): Map[Long, Long] =
      left.map { case (qid, qb) =>
        qid -> (right.count { case (_, rb) =>
          Integer.bitCount(qb ^ rb) <= 1
        }.toLong - (if (selfJoin) 1 else 0))
      }.toMap
    def censusOf(l: org.apache.spark.sql.DataFrame,
                 r: org.apache.spark.sql.DataFrame,
                 selfJoin: Boolean): Map[Long, Long] =
      Similarity.knnCensus(l, r, bits, selfJoin = selfJoin)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    // disjoint id spaces: evens query the odds — no minus-one anywhere
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    assert(censusOf(evens, odds, selfJoin = false) ===
      expected(buckets(evens), buckets(odds), selfJoin = false))
    // self-join: every query's own vector is discounted from its count
    assert(censusOf(emb, emb, selfJoin = true) ===
      expected(buckets(emb), buckets(emb), selfJoin = true))
  }

  test("selfJoin=false keeps a genuine neighbor whose id equals the query id") {
    // two frames that happen to share id 0 but are different corpora: with
    // selfJoin=false the id-0 right row must rank (it IS the query vector,
    // cosine 1.0); the self-join default would silently drop it
    val q0 = emb.filter(col("vec_id") === 0)
    val top = Similarity.knnJoin(q0, emb, k = 1, bits = 8,
        selfJoin = false)
      .collect()
    assert(top.length === 1)
    assert(top.head.getAs[Long]("neighbor_id") === 0L)
    assert(top.head.getAs[Double]("cosine") === 1.0)
    // adaptive path under the same contract: census must not starve the
    // query by discounting a self row that is a legitimate candidate
    val ad = Similarity.knnJoinAdaptive(q0, emb, k = 1, bits = 8,
        selfJoin = false).collect()
    assert(ad.head.getAs[Long]("neighbor_id") === 0L)
    // the whole ANN family honors the same flag
    val bf = Similarity.bruteForceTopK(emb, q0, k = 1,
        selfJoin = false).collect()
    assert(bf.head.getAs[Long]("neighbor_id") === 0L)
    val lsh = Similarity.lshTopK(emb, q0, k = 1, bits = 8,
        selfJoin = false).collect()
    assert(lsh.head.getAs[Long]("neighbor_id") === 0L)
  }

  test("ivfTopK: trained index end-to-end; recall vs lshTopK at equal " +
      "candidate budget") {
    // the index the search consumes is TRAINED (two Lloyd rounds from the
    // every-32nd init -> 16 lists of array<double> means), so this also
    // exercises the double->float centroid alignment inside ivfTopK
    val cents = Similarity.kmeansCentroids(emb, initEvery = 32, iters = 2)
    val nLists = cents.count().toInt
    // equal NOMINAL budget: IVF probes nprobe of nLists lists; LSH at
    // bits=4/probe1 probes 5 of 16 buckets — the same 5/16 fraction when
    // nprobe = 5 and training keeps all 16 lists alive
    val nprobe = math.max(1, math.round(nLists * 5.0 / 16).toInt)
    val k = 3
    val ivf = Similarity.ivfTopK(emb, emb, cents, k, nprobe)
    val lsh = Similarity.lshTopK(emb, emb, k, bits = 4)
    // ACTUAL candidate budgets, recomputed from the same public pieces
    // the operators use (assignment lists / buckets + probe sets)
    // same element-type alignment the operator applies internally
    val centsF = cents.select(col("centroid_id"),
      transform(col("cvec"), x => x.cast("float")).as("cvec"))
    val asg = Similarity.ivfAssign(emb, centsF)
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"))
    val probeRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__d"), col("centroid_id"))
    val qProbes = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      .crossJoin(broadcast(centsF))
      .withColumn("__d", -Similarity.cosine(col("__qv"), col("cvec")))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number()
        .over(probeRank))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("centroid_id"))
    val ivfCand = qProbes.join(asg, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id")).count()
    val bk = emb.select(col("vec_id"),
        Similarity.rhpBucket(col("embedding"), 4).cast("int"))
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1)))
    val lshCand = bk.map { case (_, qb) =>
      bk.count { case (_, rb) => Integer.bitCount(qb ^ rb) <= 1 } - 1L
    }.sum
    val rIvf = recallOf(ivf, k)
    val rLsh = recallOf(lsh, k)
    info(f"ivfTopK: $nLists%d lists, nprobe=$nprobe%d, cand=$ivfCand%d, " +
      f"recall@$k $rIvf%.3f; lshTopK bits=4/probe1: cand=$lshCand%d, " +
      f"recall@$k $rLsh%.3f")
    // the budgets must be genuinely comparable for the recall comparison
    // to mean anything
    assert(ivfCand.toDouble / lshCand < 2.0 &&
      lshCand.toDouble / ivfCand < 2.0,
      s"candidate budgets diverged: ivf=$ivfCand lsh=$lshCand")
    // observed on the fixture: ivf 0.661 vs lsh 0.497 at 77.8k vs 78.9k
    // candidates — the trained quantizer buys ~16 recall points over
    // data-blind hyperplanes at the same budget, which is WHY ivfTopK
    // exists. Floors pinned ~10 points under observed; a kernel/probe
    // regression still trips them
    assert(rIvf >= 0.55, f"ivfTopK recall collapsed: $rIvf%.3f")
    assert(rLsh >= 0.40, f"lshTopK recall collapsed: $rLsh%.3f")
    assert(rIvf >= rLsh - 0.05,
      f"trained IVF lost its budget-matched edge: $rIvf%.3f vs $rLsh%.3f")
  }

  test("property: knnJoin(selfJoin=false) over random disjoint frames == " +
      "bruteForce restricted to shared-bucket candidates") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val bits = 4
    val allIds = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    for (seed <- 1L to 5L) {
      // random disjoint split: left queries a re-keyed right whose ids
      // COLLIDE with left ids (the t31 trap — selfJoin=false must keep
      // equal-id pairs); sizes and k vary per trial
      val params = for {
        perm <- Gen.const(()).map(_ =>
          new scala.util.Random(seed).shuffle(allIds))
        nL <- Gen.choose(20, 60)
        nR <- Gen.choose(30, 80)
        k <- Gen.choose(1, 5)
      } yield (perm.take(nL), perm.slice(nL, nL + nR), k)
      val (leftIds, rightIds, k) =
        params.pureApply(Gen.Parameters.default, Seed(seed))
      import spark.implicits._
      val left = emb.filter(col("vec_id").isin(leftIds: _*))
      val keyMap = rightIds.zipWithIndex
        .map { case (id, i) => (id, i.toLong) }.toDF("vec_id", "new_id")
      val right = emb.join(keyMap, Seq("vec_id"))
        .select(col("new_id").as("vec_id"), col("embedding"))
        .localCheckpoint()
      // the exact contract: the FULL brute-force ranking per query,
      // restricted to candidates sharing a probed bucket (Hamming <= 1),
      // re-ranked 1..k — engine cosines on both sides, so the only thing
      // under test is the probe/join/rank machinery
      val full = Similarity.bruteForceTopK(right, left,
          k = rightIds.size, selfJoin = false)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(1).toLong))
      def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
        df.select(col("vec_id"),
            Similarity.rhpBucket(col("embedding"), bits).cast("int"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val lb = buckets(left)
      val rb = buckets(right)
      val expected = full.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
        rs.sortBy(_._3)
          .filter { case (_, nid, _) =>
            Integer.bitCount(lb(qid) ^ rb(nid)) <= 1 }
          .take(k).zipWithIndex
          .map { case ((_, nid, _), i) => (qid, i + 1L, nid) }
      }.toSet
      val actual = Similarity.knnJoin(left, right, k, bits,
          selfJoin = false)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSet
      assert(actual === expected,
        s"seed=$seed nL=${leftIds.size} nR=${rightIds.size} k=$k")
    }
  }

  test("pqEncode: one in-range code per (vector, subspace); codeword " +
      "sources self-rank at adc 0") {
    val m = 4
    val cb = Similarity.pqCodebooksFromSample(emb, m, every = 25)
    val codes = Similarity.pqEncode(emb, cb, m)
    val n = emb.count()
    assert(codes.count() === n * m)
    // every code must be a sampled source id
    val validIds = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val badCodes = codes.collect().count(r => !validIds(r.getLong(2)))
    assert(badCodes === 0)
    // a vector that SOURCED codewords has per-subspace distance 0 to its
    // own codewords, so with selfJoin=false it must rank itself first at
    // adc exactly 0 — the end-to-end identity check of encode+ADC
    val q = emb.filter(col("vec_id") === 25)
    val top = Similarity.pqTopK(emb, q, cb, m, k = 1, selfJoin = false)
      .collect()
    assert(top.head.getAs[Long]("neighbor_id") === 25L)
    assert(top.head.getAs[Double]("adc") === 0.0)
  }

  test("exactSums=false fast-sum path: pqEncode codes are identical to " +
      "the decimal-exact path on the fixture, and pqTopK / ivfPqTopK / " +
      "ivfPqResidualTopK return identical (query, rank, neighbor) " +
      "triples — the x78 rank-identity contract applied to PQ") {
    val m = 4
    val cb = Similarity.pqCodebooksFromSample(emb, m, every = 25)
    def codeSet(exact: Boolean) =
      Similarity.pqEncode(emb, cb, m, exactSums = exact).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(codeSet(exact = true) === codeSet(exact = false))
    val q = emb.filter(col("vec_id") % 16 === 0)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ranks(Similarity.pqTopK(emb, q, cb, m, k = 3)) ===
      ranks(Similarity.pqTopK(emb, q, cb, m, k = 3, exactSums = false)))
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    assert(
      ranks(Similarity.ivfPqTopK(emb, q, cents, cb, m, k = 3, nprobe = 2))
        === ranks(Similarity.ivfPqTopK(emb, q, cents, cb, m, k = 3,
          nprobe = 2, exactSums = false)))
    val cbr = Similarity.ivfPqResidualCodebooks(emb, cents, m, every = 25)
    assert(
      ranks(Similarity.ivfPqResidualTopK(emb, q, cents, cbr, m, k = 3,
        nprobe = 2)) ===
      ranks(Similarity.ivfPqResidualTopK(emb, q, cents, cbr, m, k = 3,
        nprobe = 2, exactSums = false)))
  }

  test("pqEncode raises on a dimension not divisible by m instead of " +
      "silently dropping trailing dims") {
    import spark.implicits._
    // dim 5, m 4: the old slice arithmetic would quietly exclude the
    // 5th dimension from every subspace; the guard must raise instead
    val vecs = Seq((1L, Array(1f, 2f, 3f, 4f, 5f)),
      (0L, Array(5f, 4f, 3f, 2f, 1f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooksFromSample(vecs, m = 4, every = 1)
    val e = intercept[Exception] {
      Similarity.pqEncode(vecs, cb, m = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("divisible by m")),
      s"expected the divisibility guard, got: $e")
  }

  test("pqTopK recall vs exact L2 brute force is recorded and bounded; " +
      "finer subspaces buy recall") {
    val k = 5
    // exact squared-L2 top-k (ADC approximates L2, not cosine, so the
    // ground truth here is L2 — recallOf's cosine baseline would mix
    // metrics)
    val l2 = aggregate(zip_with(col("__qv"), col("__cv"), (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val exact = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(l2, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val nExact = exact.count()
    def recallAtM(m: Int): Double = {
      val cb = Similarity.pqCodebooksFromSample(emb, m, every = 25)
      val adc = Similarity.pqTopK(emb, emb, cb, m, k)
      exact.intersect(adc.select(col("query_id"), col("neighbor_id")))
        .count().toDouble / nExact
    }
    val r4 = recallAtM(4)
    val r8 = recallAtM(8)
    info(f"pqTopK recall@$k vs exact L2: m=4 $r4%.3f, m=8 $r8%.3f " +
      f"(20 codewords/subspace, near-random 64-dim fixture)")
    // Lloyd-refined codebooks must not LOSE recall vs the raw sample
    // init (each step reduces total quantization error); record the
    // lift — the ROADMAP idea-4 number
    val cbK = Similarity.pqCodebooksKmeans(emb, m = 4, every = 25,
      iters = 2)
    val adcK = Similarity.pqTopK(emb, emb, cbK, m = 4, k)
    val rK = exact.intersect(
        adcK.select(col("query_id"), col("neighbor_id")))
      .count().toDouble / nExact
    info(f"pqTopK m=4 with 2-step Lloyd-refined codebooks: $rK%.3f " +
      f"(sampled init: $r4%.3f)")
    assert(rK >= r4 - 0.02,
      f"refined codebooks lost recall: $rK%.3f vs sampled $r4%.3f")
    // observed m=4: 0.081, m=8: 0.141 — coarse by construction: random
    // data is the PQ worst case (no cluster structure for codewords to
    // exploit) yet still 8-16x above the ~0.01 chance floor, and recall
    // must IMPROVE as subspaces shrink (finer quantization => smaller
    // per-subspace error). The floors catch a broken encode/ADC (wrong
    // slice arithmetic or table join collapses recall to chance) without
    // flapping on fixture noise
    assert(r4 >= 0.05, f"pqTopK m=4 recall collapsed: $r4%.3f")
    assert(r8 >= r4, f"finer subspaces lost recall: m=8 $r8%.3f < m=4 $r4%.3f")
  }

  test("ivfPqTopK agrees with the full ADC scan on shared candidates " +
      "and cuts the scan by the probed fraction") {
    val m = 4
    val k = 5
    val nprobe = 2
    val cb = Similarity.pqCodebooksFromSample(emb, m, every = 25)
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val nLists = cents.count()
    val queries = emb.filter(col("vec_id") < 50)
    val ivfpq = Similarity.ivfPqTopK(emb, queries, cents, cb, m, k, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    // every (query, neighbor, adc) the composition emits must carry the
    // SAME adc the full scan computes — the coarse quantizer may only
    // restrict candidates, never change scores
    val full = Similarity.pqTopK(emb, queries, cb, m, k = emb.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { case (pair, adc) =>
      assert(full(pair) === adc, s"adc diverged for $pair")
    }
    // scan cut: candidate pairs vs the full |q| x |corpus| ADC scan
    val asg = Similarity.ivfAssign(emb, cents)
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"))
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__d", -Similarity.cosine(col("__qv"), col("cvec")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__d"), col("centroid_id"))))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("centroid_id"))
    val candPairs = probes.join(asg, Seq("centroid_id")).count()
    val fullPairs = queries.count() * emb.count()
    info(f"ivfPqTopK: $candPairs%d candidate pairs vs $fullPairs%d full " +
      f"scan (${candPairs.toDouble / fullPairs}%.3f; nprobe=$nprobe of " +
      f"$nLists%d lists)")
    assert(candPairs < fullPairs / 2,
      s"coarse quantizer failed to cut the scan: $candPairs vs $fullPairs")
  }

  test("candidate volume shrinks as bucket bits grow (the 100 TB cost knob)") {
    val v0 = emb.count() * emb.count() // brute force compares everything
    val v4 = candidateVolume(4)
    val v8 = candidateVolume(8)
    info(s"pair volume: brute=$v0, bits=4: $v4, bits=8: $v8")
    assert(v4 < v0 && v8 < v4,
      s"bucketing must cut pair volume monotonically: $v0 -> $v4 -> $v8")
  }

  test("ivfPqResidualTopK: codeword source self-ranks at adc 0; residual " +
      "codes beat raw-vector codes on a clustered corpus") {
    import org.apache.spark.sql.expressions.Window
    val m = 4
    // a vector that SOURCED residual codewords (25 is in the every-25
    // sample) probing its own list has per-subspace distance 0 to its own
    // codewords — adc exactly 0 proves assignment, residualization,
    // encode and the per-list query table agree end-to-end
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val cb = Similarity.ivfPqResidualCodebooks(emb, cents, m, every = 25)
    val self = Similarity.ivfPqResidualTopK(emb,
        emb.filter(col("vec_id") === 25), cents, cb, m, k = 1, nprobe = 1,
        selfJoin = false).collect()
    assert(self.head.getAs[Long]("neighbor_id") === 25L)
    assert(self.head.getAs[Double]("adc") === 0.0)
    // clustered corpus — the regime residual encoding exists for: 53
    // clusters (MORE than the 20 sampled codewords can enumerate), each
    // offset +40 along its own axis. The coarse quantizer separates
    // clusters and residuals collapse every cluster back to the small
    // noise ball around its representative; raw-vector codewords must
    // spend their precision on offsets they cannot all represent (most
    // clusters have no sampled codeword), so at the same code budget
    // residual encoding must cut the total quantization DISTORTION
    // (sum over the corpus of the chosen-codeword squared error — the
    // quantity ADC ranking quality is driven by; recall@k on a
    // 500-vector fixture is chance-dominated within 9-member clusters,
    // so it is recorded but not the assertion)
    val clustered = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("__cl", (col("vec_id") % 53).cast("int"))
      .select(col("vec_id"), col("__cl"),
        transform(col("embedding"), (x, i) =>
          when(i === col("__cl"), x + lit(40.0f)).otherwise(x))
          .as("embedding"))
      .localCheckpoint()
    val labelReps = clustered
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__cl")).orderBy(col("vec_id"))))
      .filter(col("__rn") === 1)
      .select(col("__cl").cast("long").as("centroid_id"),
        col("embedding").as("cvec"))
      .localCheckpoint()
    val k = 5
    val nprobe = 3
    val l2 = aggregate(zip_with(col("__qv"), col("__cv"), (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val exact = clustered.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      .crossJoin(clustered.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(l2, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val nExact = exact.count()
    val rawCb = Similarity.pqCodebooksFromSample(clustered, m, every = 25)
    val rRaw = exact.intersect(
        Similarity.ivfPqTopK(clustered, clustered, labelReps, rawCb, m, k,
            nprobe)
          .select(col("query_id"), col("neighbor_id")))
      .count().toDouble / nExact
    val resCb = Similarity.ivfPqResidualCodebooks(clustered, labelReps, m,
      every = 25)
    val rRes = exact.intersect(
        Similarity.ivfPqResidualTopK(clustered, clustered, labelReps, resCb,
            m, k, nprobe)
          .select(col("query_id"), col("neighbor_id")))
      .count().toDouble / nExact
    info(f"clustered-corpus recall@$k: raw-vector IVF-PQ $rRaw%.3f, " +
      f"residual IVF-PQ $rRes%.3f (53 axis-offset clusters, nprobe=3)")
    assert(rRes >= 0.25, f"residual IVF-PQ recall collapsed: $rRes%.3f")
    // the assertion: distortion = sum over (vector, subspace) of the
    // chosen codeword's squared error. Raw codes must eat the +40
    // offsets (~3200 per unrepresented cluster-subspace); residual
    // codes only quantize noise
    def distortion(vecs: org.apache.spark.sql.DataFrame, vecCol: String,
                   cbD: org.apache.spark.sql.DataFrame): Double = {
      val subs = vecs.select(col("vec_id"), posexplode(array(
          (0 until m).map(s => slice(col(vecCol), s * 16 + 1, 16)): _*)))
        .select(col("vec_id"), col("pos").as("subspace"),
          col("col").as("sub"))
      val codes = Similarity.pqEncode(vecs, cbD, m, vecCol = vecCol)
      val l2hof = aggregate(zip_with(col("sub"), col("w"), (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      codes.join(subs, Seq("vec_id", "subspace"))
        .join(cbD, Seq("subspace", "code_id"))
        .agg(sum(l2hof)).first().getDouble(0)
    }
    val dRaw = distortion(clustered, "embedding", rawCb)
    val dRes = distortion(
      Similarity.ivfResiduals(clustered, labelReps), "residual", resCb)
    info(f"clustered-corpus PQ distortion: raw $dRaw%.0f, residual " +
      f"$dRes%.0f (${dRaw / dRes}%.1f x)")
    assert(dRaw > 2 * dRes,
      f"residual encoding must cut quantization distortion on clustered " +
        f"data: raw $dRaw%.0f vs residual $dRes%.0f")
  }

  test("residual codebooks refine with the standard Lloyd loop and " +
      "distortion falls") {
    // idea-13 closure: pqCodebooksKmeans composes over the RESIDUAL
    // frame unchanged (vecCol = "residual"), so the t45 path gets
    // trained codewords without new machinery; Lloyd must not raise
    // total quantization distortion over the sampled init
    val m = 4
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val res = Similarity.ivfResiduals(emb, cents).localCheckpoint()
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      val subs = res.select(col("vec_id"), posexplode(array(
          (0 until m).map(s => slice(col("residual"), s * 16 + 1, 16)): _*)))
        .select(col("vec_id"), col("pos").as("subspace"),
          col("col").as("sub"))
      val l2hof = aggregate(zip_with(col("sub"), col("w"), (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      Similarity.pqEncode(res, cb, m, vecCol = "residual")
        .join(subs, Seq("vec_id", "subspace"))
        .join(cb.withColumn("w",
          transform(col("w"), x => x.cast("double"))),
          Seq("subspace", "code_id"))
        .agg(sum(l2hof)).first().getDouble(0)
    }
    val sampled = Similarity.ivfPqResidualCodebooks(emb, cents, m,
      every = 25)
    val refined = Similarity.pqCodebooksKmeans(res, m, every = 25,
      iters = 2, vecCol = "residual")
    val d0 = distortion(sampled)
    val d2 = distortion(refined)
    info(f"residual-codebook distortion: sampled $d0%.1f, 2-step Lloyd " +
      f"$d2%.1f (${(1 - d2 / d0) * 100}%.1f%% lower)")
    assert(d2 <= d0,
      f"Lloyd refinement raised residual distortion: $d2%.1f > $d0%.1f")
  }

  test("semanticDedup: planted twins flag exactly when co-clustered with " +
      "their original; pairs compose with connectedComponents") {
    import graft.ops.Dedup
    val twins = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    val all = emb.unionByName(twins).localCheckpoint()
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val flagged = Dedup.semanticDedup(all, cents, tau = 0.99)
      .localCheckpoint()
    // the fixture corpus is near-random: no two ORIGINALS sit at cosine
    // >= 0.99, so no original may ever be flagged
    val flaggedOriginals = flagged
      .filter(col("vec_id") < 100000L && col("is_semantic_dup") === 1)
      .count()
    assert(flaggedOriginals === 0L,
      s"$flaggedOriginals originals flagged as semantic dups")
    // given that, the ONLY >= 0.99 pairs are (original, its twin) — so
    // the flagged set must EQUAL the set of twins the quantizer
    // co-assigned with their original (cluster-mateship is the screen's
    // only reachability; this is an exact property, not a floor)
    val asg = Similarity.ivfAssign(all, cents)
    val orig = asg.filter(col("vec_id") < 100000L)
      .select(col("vec_id"), col("centroid_id"))
    val twinAsg = asg.filter(col("vec_id") >= 100000L)
      .select((col("vec_id") - 100000L).as("vec_id"),
        col("centroid_id").as("__tc"))
    val coAssigned = orig.join(twinAsg, Seq("vec_id"))
      .filter(col("centroid_id") === col("__tc")).count()
    val nFlagged = flagged.filter(col("is_semantic_dup") === 1).count()
    info(s"co-assigned twins: $coAssigned / ${emb.count()}, " +
      s"flagged: $nFlagged")
    assert(nFlagged === coAssigned,
      s"flagged $nFlagged != co-assigned twins $coAssigned")
    // transitive retention composes exactly like the MinHash family:
    // pairs -> connectedComponents -> keep min id per component. Every
    // component here is one (original, twin) edge — 2 nodes, and the
    // component label is the original's id
    val comps = Dedup.connectedComponents(
      Dedup.semanticDupPairs(all, cents, tau = 0.99)
        .select(col("id_a"), col("id_b")))
    val sizes = comps.groupBy(col("comp")).count()
    assert(sizes.filter(col("count") =!= 2).count() === 0L,
      "expected every semantic-dup component to be an (original, twin) pair")
    assert(sizes.count() === nFlagged,
      "one component per flagged twin expected")
    assert(comps.filter(col("comp") >= 100000L).count() === 0L,
      "component label must be the original's (min) id")
  }

  test("sqEncode/sqTopK: codes bounded, dequantization error within half " +
      "a step, near-exact recall at 8 bits") {
    import graft.ops.Similarity.{sqEncode, sqTopK}
    val enc = sqEncode(emb).localCheckpoint()
    // every code in [-127, 127]
    assert(enc.filter(exists(col("codes"),
      c => abs(c) > 127)).count() === 0L)
    // roundtrip: |code*scale - x| <= scale/2 element-wise (+1 ulp slack)
    val bad = enc.join(emb, Seq("vec_id"))
      .filter(exists(zip_with(col("codes"), col("embedding"),
        (c, x) => abs(c * col("scale") - x.cast("double")) >
          col("scale") * 0.5 + lit(1e-9)), b => b))
      .count()
    assert(bad === 0L, s"$bad vectors outside the quantization bound")
    // recall vs the exact brute force: int8 on 64 dims loses almost
    // nothing — floor pinned well under the observed value
    val r = recallOf(sqTopK(emb, emb, 5), 5)
    info(f"SQ8 recall@5 vs exact: $r%.3f")
    assert(r >= 0.9, f"SQ8 recall collapsed: $r%.3f")
  }

  test("semanticDupFlagProbed: boundary twin missed at nprobe=1 is caught " +
      "at nprobe=2; nprobe=1 == semanticDupFlag; flags grow monotonically") {
    import graft.ops.Dedup
    import spark.implicits._
    // hand-built Voronoi boundary case — the gap the probe knob exists
    // for: centroids at 0° and 36.87°, corpus vector at 17° (quantizes
    // to c1), incoming twin at 20° (quantizes to c2, 3° = cosine 0.9986
    // from its corpus twin). One probe screens the wrong list and
    // misses; two probes reach the twin's list and flag.
    val corpus = Seq((1L, Array(0.95630f, 0.29237f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1f, 0f)), (20L, Array(0.8f, 0.6f)))
      .toDF("centroid_id", "cvec")
    val idx = Dedup.semanticIndex(corpus, cents)
    val incoming = Seq((100L, Array(0.93969f, 0.34202f)))
      .toDF("vec_id", "embedding")
    def flags(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(flags(Dedup.semanticDupFlag(incoming, idx, cents, tau = 0.99))
      === Map(100L -> 0L), "one-list gate must miss the boundary twin")
    assert(flags(Dedup.semanticDupFlagProbed(incoming, idx, cents,
      tau = 0.99, nprobe = 1)) === Map(100L -> 0L))
    assert(flags(Dedup.semanticDupFlagProbed(incoming, idx, cents,
      tau = 0.99, nprobe = 2)) === Map(100L -> 1L),
      "two probes must reach the corpus twin's list")
    // fixture scale: nprobe=1 reproduces the base gate exactly, and the
    // flagged set grows monotonically with nprobe
    val cents2 = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val idx2 = Dedup.semanticIndex(emb, cents2).localCheckpoint()
    val twins = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
      .localCheckpoint()
    val base = flags(Dedup.semanticDupFlag(twins, idx2, cents2, tau = 0.99))
    val p1 = flags(Dedup.semanticDupFlagProbed(twins, idx2, cents2,
      tau = 0.99, nprobe = 1))
    val p2 = flags(Dedup.semanticDupFlagProbed(twins, idx2, cents2,
      tau = 0.99, nprobe = 2))
    assert(p1 === base, "nprobe=1 must reproduce the one-list gate")
    assert(p1.forall { case (id, f) => f <= p2(id) },
      "flags must grow monotonically with nprobe")
  }

  test("embedding gate/profile/monitor accept kmeansCentroids-trained " +
      "(array<double>) centroid frames — element types align internally") {
    import graft.ops.Dedup
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val trained = Similarity.kmeansCentroids(emb, initEvery = 100,
      iters = 1).localCheckpoint()
    // the mixed-width case is real: trained means are array<double>,
    // the corpus is array<float>
    assert(trained.schema("cvec").dataType
      .asInstanceOf[ArrayType].elementType === DoubleType)
    val idx = Dedup.semanticIndex(emb, trained).localCheckpoint()
    // the incoming rows ARE index members → every one must flag 1,
    // which also requires the gate's assign pass to agree with the
    // index build's (same aligned quantizer both sides)
    val incoming = emb.limit(50).localCheckpoint()
    val g1 = Dedup.semanticDupFlag(incoming, idx, trained, tau = 0.99)
    assert(g1.filter(col("is_semantic_dup") === 1L).count() === 50L)
    val g2 = Dedup.semanticDupFlagProbed(incoming, idx, trained,
      tau = 0.99, nprobe = 2)
    assert(g2.filter(col("is_semantic_dup") === 1L).count() === 50L)
    // alignment is a pure element cast: assignment under trained
    // centroids equals assignment under the same centroids pre-cast
    // to the corpus's float width
    val asFloat = trained.withColumn("cvec",
      transform(col("cvec"), x => x.cast("float")))
    val aT = Similarity.ivfAssignWithCos(emb, trained)
      .select(col("vec_id"), col("centroid_id"))
    val aF = Similarity.ivfAssignWithCos(emb, asFloat)
      .select(col("vec_id"), col("centroid_id"))
    assert(aT.except(aF).count() === 0L && aF.except(aT).count() === 0L)
    // profile + monitor on the same corpus: no drift anywhere
    val prof = Similarity.embeddingProfile(emb, trained)
    val mon = Similarity.embeddingDriftMonitor(emb, trained, prof)
    assert(mon.filter(col("drift") === 1L).count() === 0L)
  }

  test("bqEncode packs sign bits exactly (incl. bit 63 and the zero " +
      "edge); bqTopK at full shortlist equals brute force; shortlist " +
      "recall is measured and floored") {
    import spark.implicits._
    def wordsOf(v: Array[Float]): Seq[Long] =
      Similarity.bqEncode(Seq((1L, v)).toDF("vec_id", "embedding"))
        .select("words").first().getSeq[Long](0)
    // dims 0, 2 and 65 positive over 66 dims → word0 bits {0,2},
    // word1 bit 1 (dim 64 negative)
    val v = Array.fill(66)(-1f)
    v(0) = 1f; v(2) = 0.5f; v(65) = 2f
    assert(wordsOf(v) === Seq(5L, 2L))
    // zero is NOT positive; an all-zero vector packs to a zero word
    assert(wordsOf(Array.fill(64)(0f)) === Seq(0L))
    // bit 63 is the long's sign bit — packing must not mangle it
    val v63 = Array.fill(64)(-1f); v63(63) = 1f
    assert(wordsOf(v63) === Seq(Long.MinValue))
    // shortlist >= corpus degenerates to EXACTLY the brute force:
    // every candidate survives stage 1, stage 2 is the standard
    // top-k contract
    val q = emb.filter(col("vec_id") < 8)
    val full = Similarity.bqTopK(emb, q, k = 5,
        shortlist = emb.count().toInt)
      .select("query_id", "rank", "neighbor_id", "cosine")
    val brute = Similarity.bruteForceTopK(emb, q, 5)
    assert(full.except(brute).count() === 0L &&
      brute.except(full).count() === 0L)
    // recall of the default 4k Hamming shortlist vs exact
    val r = recallOf(Similarity.bqTopK(emb, emb, 5), 5)
    info(f"bq recall@5 (shortlist=20) vs exact: $r%.3f")
    assert(r >= 0.25, f"bq shortlist recall collapsed: $r%.3f")
  }

  test("graphSearch: best-seen cosine is monotone in rounds; recall " +
      "measured and floored on the exact and bucketed graphs") {
    val gExact = Similarity.knnGraphExact(emb, degree = 8)
      .localCheckpoint()
    // the frontier is the best-ever beam, so each query's top cosine
    // can only improve as rounds grow
    def best(rounds: Int): Map[Long, Double] =
      Similarity.graphSearch(emb, gExact, emb, k = 1, beam = 8,
          rounds = rounds, entryCount = 20)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val b0 = best(0); val b1 = best(1); val b2 = best(2)
    assert(b0.forall { case (id, c) => c <= b1(id) + 1e-9 },
      "round 1 must not lose the entry frontier's best")
    assert(b1.forall { case (id, c) => c <= b2(id) + 1e-9 },
      "round 2 must not lose round 1's best")
    // recall at the working configuration, exact graph then the
    // bucketed-construction graph (pays the knnJoin edge recall toll)
    val rExact = recallOf(Similarity.graphSearch(emb, gExact, emb, 5,
      beam = 16, rounds = 3, entryCount = 20), 5)
    val gBucket = Similarity.knnGraph(emb, degree = 8, bits = 8)
      .localCheckpoint()
    val rBucket = recallOf(Similarity.graphSearch(emb, gBucket, emb, 5,
      beam = 16, rounds = 3, entryCount = 20), 5)
    info(f"graphSearch recall@5 (beam=16, rounds=3): exact graph " +
      f"$rExact%.3f, bucketed graph $rBucket%.3f")
    // measured 0.704/0.567 (md5 entry sample) — the best recall of any family member on
    // this worst-case near-random fixture (lsh probe1 0.497, ivf
    // 0.661); floors ~10 pts under
    assert(rExact >= 0.6, f"exact-graph recall collapsed: $rExact%.3f")
    assert(rBucket >= 0.45, f"bucketed-graph recall collapsed: $rBucket%.3f")
  }

  test("graphSearch: entry density vs rounds at ~equal candidate " +
      "budget — the hierarchical-entry-layer question, measured") {
    // ROADMAP #6 asks whether a coarse upper graph layer (HNSW proper)
    // would beat the flat every-Nth entry set. Proxy measurement: hold
    // the scored-candidate budget roughly fixed (entries + rounds *
    // beam * degree) and trade entry density against walk depth. If
    // recall saturates across the trade-off, entry SELECTION is not
    // the bottleneck on this corpus and a second graph layer has no
    // headroom to buy.
    val g = Similarity.knnGraphExact(emb, degree = 8).localCheckpoint()
    def r(entryCount: Int, rounds: Int): Double =
      recallOf(Similarity.graphSearch(emb, g, emb, 5, beam = 16,
        rounds = rounds, entryCount = entryCount), 5)
    val sparse = r(10, 4)  // 10 entries + 4 walk rounds
    val flat   = r(20, 3)  // 20 entries + 3 rounds
    val dense  = r(50, 2)  // 50 entries + 2 rounds
    info(f"recall@5 at ~equal budget: sparse-entries/4r $sparse%.3f, " +
      f"flat/3r $flat%.3f, dense-entries/2r $dense%.3f")
    // measured 0.704 / 0.704 / 0.686 (md5 sample; every-Nth measured
    // 0.726/0.706/0.681): MORE walk beats MORE entries on the
    // worst-case fixture — entry selection is already saturated, so a
    // hierarchical entry layer has nothing to buy here (ROADMAP #6
    // closed by measurement), and that same saturation is what
    // justifies the FIXED 10-20 node entry sample (round-10 fix:
    // round-0 cost no longer scales with the corpus); floors pin the
    // shape
    assert(sparse >= flat - 0.02 && flat >= dense - 0.02,
      "walk depth must not lose to entry density at equal budget")
    assert(Seq(sparse, flat, dense).max -
      Seq(sparse, flat, dense).min < 0.1,
      "recall should saturate across the entry/depth trade-off")
  }

  test("knnPredict: hand-built majority and tiebreak; clustered-corpus " +
      "label recovery — exact path perfect, bucketed path floored") {
    import spark.implicits._
    // query at 0°, corpus at ±5°/10°/20°: k=3 neighbors carry labels
    // (7, 7, 3) → majority 7 with 2 votes
    val corpus = Seq(
      (1L, Array(0.9962f, 0.0872f), 7),
      (2L, Array(0.9962f, -0.0872f), 7),
      (3L, Array(0.9848f, 0.1736f), 3),
      (4L, Array(0.9397f, 0.3420f), 3))
      .toDF("vec_id", "embedding", "label")
    val query = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val p3 = Similarity.knnPredict(corpus, query, k = 3).collect().head
    assert((p3.getLong(0), p3.getInt(1), p3.getLong(2)) === ((100L, 7, 2L)))
    // a 1-1 vote at k=2 must fall to the smallest label
    val corpus2 = corpus.withColumn("label",
      when(col("vec_id") === 2L, 3).otherwise(col("label")))
    val p2 = Similarity.knnPredict(corpus2, query, k = 2).collect().head
    assert((p2.getInt(1), p2.getLong(2)) === ((3, 1L)))
    // the axis-offset clustered regime with label = planted cluster id:
    // every vector's 5 nearest sit in its own ~9-member cluster, so the
    // exact path must recover every label; the bucketed path pays the
    // usual LSH recall toll and its accuracy is measured and floored
    val clustered = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("label", (col("vec_id") % 53).cast("int"))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), (x, i) =>
          when(i === col("label"), x + lit(40.0f)).otherwise(x))
          .as("embedding"))
      .localCheckpoint()
    val n = clustered.count().toDouble
    def accuracy(bits: Int): Double =
      Similarity.knnPredict(clustered, clustered, k = 5, bits = bits)
        .join(clustered.select(col("vec_id").as("query_id"),
          col("label")), Seq("query_id"))
        .filter(col("predicted_label") === col("label"))
        .count() / n
    val aExact = accuracy(0)
    val aBucketed = accuracy(8)
    info(f"clustered label recovery: exact $aExact%.3f, " +
      f"bucketed bits=8 $aBucketed%.3f")
    assert(aExact === 1.0, f"exact path must recover every label: $aExact")
    assert(aBucketed >= 0.9,  // measured 1.0 — clusters are
      // LSH-separable by construction; a broken probe set collapses this
      f"bucketed label recovery collapsed: $aBucketed%.3f")
  }

  test("rrfFuse: hand-computed fusion, consensus beats a single better " +
      "rank, n_lists provenance, score ties break by id, single-list " +
      "fusion preserves the ranking, k caps") {
    import spark.implicits._
    val a = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
      .toDF("query_id", "rank", "neighbor_id")
    val b = Seq((1L, 1L, 20L), (1L, 2L, 40L))
      .toDF("query_id", "rank", "neighbor_id")
    val f = Similarity.rrfFuse(Seq(a, b), k = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // doc 20 (ranks 2+1) = 1/62 + 1/61 = 0.032522 beats doc 10's
    // single rank 1 = 1/61; then 40 (1/62), then 30 (1/63)
    assert(f.map(_._2).toSeq === Seq(20L, 10L, 40L, 30L), f.toSeq)
    assert(f.head._3 === 2L && f.tail.forall(_._3 == 1L),
      "n_lists: only the consensus doc came from both lists")
    assert(math.abs(f.head._4 - 0.032522) < 1e-6)
    assert(math.abs(f(1)._4 - 0.016393) < 1e-6)
    // equal scores (rank 1 in exactly one list each): lower id first
    val ta = Seq((1L, 1L, 7L)).toDF("query_id", "rank", "neighbor_id")
    val tb = Seq((1L, 1L, 3L)).toDF("query_id", "rank", "neighbor_id")
    assert(Similarity.rrfFuse(Seq(ta, tb), k = 2).collect()
      .map(_.getLong(2)).toSeq === Seq(3L, 7L))
    // one list in = the same ranking out (RRF is rank-monotone)
    val solo = Similarity.rrfFuse(Seq(a), k = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(solo.toSeq === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // k caps the fused list
    assert(Similarity.rrfFuse(Seq(a, b), k = 2).count() === 2L)
  }

  test("marginMine: hand-computed ratio margins on a 2x2 system, " +
      "mutual-best pairs flagged, planted cross-side twin mined") {
    import spark.implicits._
    // unit 2-D vectors with exactly-representable cosines:
    // cos(x1,y1)=1, cos(x1,y2)=.6, cos(x2,y1)=0, cos(x2,y2)=.8
    val src = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(1f, 0f)), (3L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val mined = Similarity.marginMine(
        Similarity.bruteForceTopK(tgt, src, k = 2, selfJoin = false),
        Similarity.bruteForceTopK(src, tgt, k = 2, selfJoin = false))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(5))).toMap
    // half-means: x1 (1+.6)/4=.4, x2 (0+.8)/4=.2, y1 .25, y3 .35
    assert(math.abs(mined((0L, 1L))._1 - 1.0 / 0.65) < 1e-5)
    assert(math.abs(mined((0L, 3L))._1 - 0.6 / 0.75) < 1e-5)
    assert(math.abs(mined((2L, 3L))._1 - 0.8 / 0.55) < 1e-5)
    assert(mined((2L, 1L))._1 === 0.0)
    // mutual-best: exactly the true alignment (0-1, 2-3)
    assert(mined.filter(_._2._2 == 1L).keySet ===
      Set((0L, 1L), (2L, 3L)))
    // planted twin across sides on the fixture corpus: the twin pair
    // must be mined mutual-best with that src's top margin
    val half = emb.filter(col("vec_id") < 40)
    val s2 = half.filter(col("vec_id") % 2 === 0)
    val t2 = half.filter(col("vec_id") % 2 === 1)
      .unionAll(half.filter(col("vec_id") === 0)
        .select((col("vec_id") + 1001L).as("vec_id"), col("embedding")))
    val m2 = Similarity.marginMine(
      Similarity.bruteForceTopK(t2, s2, k = 3, selfJoin = false),
      Similarity.bruteForceTopK(s2, t2, k = 3, selfJoin = false))
    val twin = m2.filter(col("src_id") === 0L &&
      col("tgt_id") === 1001L).collect()
    assert(twin.length === 1 && twin.head.getLong(5) === 1L,
      "identical cross-side twin must be mined mutual-best")
    // contract: a pair proposed by one direction for an id the other
    // direction never queried has no neighborhood mean and is DROPPED,
    // not scored — here fwd only queried src 0, so bwd's pairs for
    // src 2 vanish and only src 0's candidates survive
    val sampledFwd = Similarity.bruteForceTopK(tgt,
      src.filter(col("vec_id") === 0L), k = 2, selfJoin = false)
    val dropped = Similarity.marginMine(sampledFwd,
      Similarity.bruteForceTopK(src, tgt, k = 2, selfJoin = false))
    assert(dropped.select("src_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(0L),
      "pairs without both neighborhood means must drop")
  }

  test("rankingMetrics: hand-computed recall/MRR/nDCG, empty-system " +
      "query scores zero, system-only query excluded, perfect system " +
      "scores one") {
    import spark.implicits._
    val truth = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 300L),
      (2L, 1L, 100L), (2L, 2L, 200L))
      .toDF("query_id", "rank", "neighbor_id")
    // q1 system: hit at rank 1 (200) and rank 3 (100), miss at 2;
    // q2 retrieved nothing; q3 has no truth -> excluded
    val sys = Seq((1L, 1L, 200L), (1L, 2L, 999L), (1L, 3L, 100L),
      (3L, 1L, 100L)).toDF("query_id", "rank", "neighbor_id")
    val m = Similarity.rankingMetrics(sys, truth, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(m.keySet === Set(1L, 2L), "system-only q3 must be excluded")
    val (n1, h1, rec1, mrr1, ndcg1) = m(1L)
    assert(n1 === 3L && h1 === 2L)
    assert(math.abs(rec1 - 2.0 / 3) < 1e-6)
    assert(mrr1 === 1.0, "first system row relevant -> MRR 1")
    // dcg = 1/log2(2) + 1/log2(4) = 1.5;
    // idcg = 1 + ln2/ln3 + 0.5 = 2.1309298 -> ndcg 0.703918
    assert(math.abs(ndcg1 - 0.703918) < 1e-6)
    assert(m(2L) === ((2L, 0L, 0.0, 0.0, 0.0)),
      "query the system never answered scores zero across the board")
    // a perfect system (system == truth) scores 1/1/1 everywhere
    val perfect = Similarity.rankingMetrics(truth, truth, k = 3)
      .collect()
    assert(perfect.forall(r => r.getDouble(3) === 1.0 &&
      r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0), "perfect run")
  }

  test("rboSimilarity: identical prefixes score 1-p^k, reversal and " +
      "single-overlap hand values, disjoint zero, one-sided query " +
      "present with zero") {
    import spark.implicits._
    // k=3, p=9/10: per-depth terms 0.1, 0.045, 0.027 ->
    // W(1)=.172, W(2)=.072, W(3)=.027
    def rf(rows: (Long, Long, Long)*) =
      rows.toDF("query_id", "rank", "neighbor_id")
    def run(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame) =
      Similarity.rboSimilarity(a, b, k = 3).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val abc = rf((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
    val same = run(abc, abc)(1L)
    assert(same._1 === 3L && math.abs(same._2 - 0.271) < 1e-6,
      s"identical prefixes must score 1 - 0.9^3: $same")
    // reversed: m = 3, 2, 3 -> .027 + .072 + .027
    val rev = run(abc, rf((1L, 1L, 30L), (1L, 2L, 20L), (1L, 3L, 10L)))(1L)
    assert(math.abs(rev._2 - 0.126) < 1e-6, s"reversal: $rev")
    // only the rank-1 item shared -> W(1) = .172
    val one = run(abc, rf((1L, 1L, 10L), (1L, 2L, 77L), (1L, 3L, 88L)))(1L)
    assert(one._1 === 1L && math.abs(one._2 - 0.172) < 1e-6)
    // disjoint prefixes: explicit zero row
    assert(run(abc, rf((1L, 1L, 77L), (1L, 2L, 88L), (1L, 3L, 99L)))(1L)
      === ((0L, 0.0)))
    // a query present in only one ranking still reports (0, 0.0)
    val uni = run(abc, rf((2L, 1L, 10L)))
    assert(uni(2L) === ((0L, 0.0)) && uni(1L) === ((0L, 0.0)))
  }

  test("randomProject: seed-reproducible, norm-preserving in expectation, " +
      "replica structure survives, projected-search recall measured and " +
      "floored") {
    val proj = Similarity.randomProject(emb, 64, 16).localCheckpoint()
    // seed determinism: the same seed rebuilds the same projection, a
    // different seed moves it (the no-persisted-matrix story)
    val again = Similarity.randomProject(emb, 64, 16)
      .select(col("vec_id"), col("proj"))
    assert(proj.select(col("vec_id"), col("proj")).exceptAll(again).isEmpty,
      "same seed must reproduce the projection bit-for-bit")
    val other = Similarity.randomProject(emb.limit(1), 64, 16, seed = "jl2")
      .select(col("proj")).collect()(0).getSeq[Double](0)
    val first = proj.orderBy("vec_id").select(col("proj"))
      .collect()(0).getSeq[Double](0)
    assert(first != other, "a different seed must yield a different matrix")
    // identical vectors project identically -> dedup/replica structure
    // survives the cut exactly
    val twin = emb.limit(8).withColumn("vec_id", col("vec_id") + 100000L)
    val both = Similarity.randomProject(emb.limit(8).unionByName(twin),
      64, 16)
    val groups = both.select(pmod(col("vec_id"), lit(100000L)).as("g"),
        col("proj")).groupBy("g")
      .agg(countDistinct(col("proj")).as("n")).collect()
    assert(groups.forall(_.getLong(1) == 1L),
      "identical inputs must share one projected image")
    // E[||Px||^2] = ||x||^2 under the ±1/sqrt(d) family: the mean ratio
    // over 500 vectors concentrates near 1
    val ratio = proj.select((Similarity.l2Norm(col("proj")) /
        Similarity.l2Norm(col("embedding"))).as("r"))
      .agg(avg(col("r"))).collect()(0).getDouble(0)
    info(f"mean norm ratio ||Px||/||x||: $ratio%.3f")
    assert(ratio > 0.85 && ratio < 1.15,
      f"JL norm preservation broken: mean ratio $ratio%.3f")
    // what a 100 TB consumer actually needs from the cut: NEAR-DUP
    // structure survives. Plant a perturbed twin per vector (first
    // coordinate zeroed, cos ≈ 0.98 to its source, ≈ 0 to everything
    // else) and require the projected-space top-1 to find it. The
    // isotropic-noise recall is also recorded: random equidistant
    // points are JL's worst case, so it is honest-low and only
    // soft-floored — distance preservation, not rank preservation of
    // noise ties, is the JL contract
    val twins = emb.select((col("vec_id") + 100000L).as("vec_id"),
      concat(array(lit(0.0f)), slice(col("embedding"), 2, 63))
        .as("embedding"))
    val planted = Similarity.randomProject(emb.unionByName(twins), 64, 16)
      .select(col("vec_id"), col("proj").as("embedding"))
      .localCheckpoint()
    val top1 = Similarity.bruteForceTopK(planted,
        planted.filter(col("vec_id") < 100000L), 1)
      .filter(col("neighbor_id") === col("query_id") + 100000L)
      .count().toDouble / 500.0
    info(f"projected top-1 planted-twin hit rate: $top1%.3f")
    assert(top1 >= 0.95, f"near-dup structure lost in projection: $top1%.3f")
    val pFrame = proj.select(col("vec_id"), col("proj").as("embedding"))
    val r = recallOf(Similarity.bruteForceTopK(pFrame, pFrame, 5), 5)
    info(f"isotropic-noise recall@5 after 64->16 (worst case): $r%.3f")
    assert(r >= 0.05, f"even noise recall should not collapse to 0: $r%.3f")
    // a dimension mismatch must fail fast, not silently project to
    // all-nulls (zip_with null-pads the shorter array)
    import spark.implicits._
    val short = Seq((1L, Seq.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.randomProject(short, 64, 16).collect()
    }
    assert(ex.getMessage.contains("randomProject"), ex.getMessage)
  }

  test("hardNegativesBucketed: different labels only, k respected, and " +
      "the bucketed shortlist recovers the exact negatives on the " +
      "fixture (recall pinned)") {
    val emb = graft.etl.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"), col("label"))
    val exact = Similarity.hardNegatives(emb, emb, k = 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.hardNegativesBucketed(emb, emb, k = 3,
        oversample = 4, bits = 2).collect()
    val labels = emb.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    approx.foreach { r =>
      assert(labels(r.getLong(0)) != r.getInt(3),
        s"query ${r.getLong(0)} got a same-label negative")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 3)
    }
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = approxSet.intersect(exact).size.toDouble / exact.size
    info(f"bucketed-negative recall vs exact: $recall%.3f")
    assert(recall >= 0.8,
      f"bits=2/oversample=4 shortlist should recover most exact " +
        f"negatives on the 50-vector fixture: $recall%.3f")
  }

  test("marginMineBucketed: knnJoin-fed candidates mine the exact " +
      "mutual-best pairs on the fixture (recall pinned), and the " +
      "mutual flag stays symmetric") {
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    val k = 4
    def mutualSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.filter(col("is_mutual") === 1)
        .select(col("src_id"), col("tgt_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = mutualSet(Similarity.marginMine(
      Similarity.bruteForceTopK(tgt, src, k, selfJoin = false),
      Similarity.bruteForceTopK(src, tgt, k, selfJoin = false)))
    assert(exact.nonEmpty, "fixture must yield exact mutual-best pairs")
    val minedDf = Similarity.marginMineBucketed(src, tgt, k, bits = 2)
    val mined = mutualSet(minedDf)
    // mutual-best is per-side rank-1 — each endpoint appears in at
    // most one mutual pair, in either mining mode
    assert(mined.groupBy(_._1).forall(_._2.size == 1))
    assert(mined.groupBy(_._2).forall(_._2.size == 1))
    val recall = mined.intersect(exact).size.toDouble / exact.size
    info(f"bucketed-mine mutual recall vs exact: $recall%.3f " +
      f"(exact ${exact.size}, mined ${mined.size})")
    // observed 0.801 (156 exact mutual pairs, 164 mined) at bits=2 on
    // the near-random fixture (sign-LSH's worst case); the floor
    // catches a broken probe set or a margin rule drift, not corpus
    // quality
    assert(recall >= 0.6, f"bucketed-mine recall collapsed: $recall%.3f")
  }

  test("hardNegatives: planted geometry — same-label never returned, " +
      "violating vs semi-hard flags, margin from the hardest positive, " +
      "null positive evidence for a unique label") {
    import spark.implicits._
    // 2-D geometry with hand-checkable cosines against q = (1, 0):
    //   id 1 (label 0): cos 0.9939  — the positive
    //   id 2 (label 1): cos 1.0000  — violating negative (beats the pos)
    //   id 4 (label 2): cos 0.7071  — semi-hard
    //   id 3 (label 1): cos 0.0     — semi-hard, ties id 5 broken by id
    //   id 5 (label 5): cos 0.0     — ALSO the unique-label query
    val emb = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(1f, 0.01f), 1), (3L, Seq(0f, 1f), 1),
      (4L, Seq(1f, 1f), 2), (5L, Seq(0f, 1f), 5))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb,
        emb.filter(col("vec_id").isin(0L, 5L)), k = 3)
      .orderBy("query_id", "rank").collect()
    val q0 = out.filter(_.getLong(0) == 0L)
    assert(q0.map(_.getLong(2)).toSeq == Seq(2L, 4L, 3L),
      "rank by rounded cosine desc, id tie-break")
    assert(q0.forall(_.getInt(3) != 0), "never a same-label negative")
    val pos = q0.head.getDouble(5)
    assert(pos == 0.9939, s"hardest positive cosine: $pos")
    // id 2: cos rounds to 1.0 > pos -> violating (semihard = false)
    assert(q0(0).getDouble(4) == 1.0 && !q0(0).getBoolean(7))
    // id 4, id 3: farther than the positive -> semi-hard, exact margins
    assert(q0(1).getBoolean(7) && q0(1).getDouble(6) == 0.2868)
    assert(q0(2).getBoolean(7) && q0(2).getDouble(6) == 0.9939)
    // q5 has no same-label peer: negatives still mined, evidence null
    val q5 = out.filter(_.getLong(0) == 5L)
    assert(q5.nonEmpty && q5.forall(r =>
      r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7)))
  }
}
