package graft

import org.apache.spark.sql.functions._
import graft.etl.Scale

/** Skew/scale helpers: salted results must equal their plain equivalents. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum under skew") {
    // one hot key (90% of rows) + long tail
    val df = spark.range(10000).select(
      when(col("id") % 10 < 9, "HOT").otherwise(concat(lit("k"), col("id") % 7))
        .as("k"),
      (col("id") % 100).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    val salted = Scale.saltedSum(df, Seq("k"), "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("x34: the 12-month trailing window prunes the 10x " +
      "month-partitioned fact to its anchored month directories") {
    val d = "/root/testdata/sf0.001"
    val root = graft.etl.Tables.exportedSegFactByMonth(spark, d, copies = 10)
    val all = spark.read.parquet(root)
    val totalMonths = all.select("date_month").distinct().count()
    assert(totalMonths >= 60,
      s"fixture should span a multi-year calendar, saw $totalMonths months")
    val win = all.where(col("date_month").between(199709, 199808))
    val winMonths = win.select("date_month").distinct().count()
    assert(winMonths === 12L)
    // the window predicate must land on the scan as a partition filter,
    // pruning directories before any data is read
    val plan = win.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("date_month"), plan.take(1500))
    // and the executed scan touches only the window's directories: the
    // export wrote one file per month (repartition on the partition
    // column), so the distinct files actually read must track the
    // window's 12 months, not the table's ~80
    val files = win.select(input_file_name()).distinct().count()
    assert(files <= winMonths * 2,
      s"read $files files for $winMonths month directories — pruning lost")
    // replication preserved the calendar: the window's row count is
    // exactly 10x the base fact's rows in the same DateKey span
    val base = graft.etl.Tables.lineitem(spark, d)
      .join(graft.etl.Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.etl.Tables.supplier(spark, d),
        col("l_suppkey") === col("s_suppkey"))
      .where(graft.etl.Ops.dateKey(col("o_orderdate"))
        .between(19970901L, 19980831L))
      .count()
    assert(win.where(col("DateKey").between(19970901L, 19980831L)).count()
      === base * 10)
  }

  test("bucketed tables sort-merge join with no exchange") {
    val a = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"),
      (col("id") * 3).as("vb"))
    Scale.writeBucketed(a, "graft_bk_a", "k", buckets = 4)
    Scale.writeBucketed(b, "graft_bk_b", "k", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_bk_a").join(spark.table("graft_bk_b"), "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bk_a")
      spark.sql("DROP TABLE IF EXISTS graft_bk_b")
    }
  }

  test("saltedJoin equals plain inner join") {
    val left = spark.range(5000).select(
      when(col("id") % 10 < 8, 1L).otherwise(col("id") % 50).as("k"),
      col("id").as("v"))
    val right = spark.range(50).select(col("id").as("rk"),
      concat(lit("dim"), col("id")).as("name"))
    val plain = left.join(right, col("k") === col("rk"))
      .groupBy("name").count().orderBy("name").collect()
    val salted = Scale.saltedJoin(left, right, "k", "rk")
      .groupBy("name").count().orderBy("name").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("approxDistinct is within rsd of exact") {
    val df = spark.range(20000).select((col("id") % 3).as("k"),
      (col("id") % 5000).as("v"))
    val approx = Scale.approxDistinct(df, Seq("k"), "v", 0.02)
      .collect().map(_.getLong(1))
    approx.foreach(a => assert(math.abs(a - 5000.0) / 5000.0 < 0.1))
  }

  test("AQE splits the pathological hot-key join at runtime (skew=true)") {
    // The S1:97 shape: one client ('MC') carries ~95% of the rows. For
    // SHUFFLE joins, AQE's skew-join split handles this at runtime with no
    // code change — this test plants the skew and asserts the split fired.
    // Salting (saltedJoin/saltedSum above) remains necessary where AQE
    // can't help: skewed AGGREGATIONS (no skew-agg rewrite exists) and
    // plans where the hot key sits under a window/rank rather than a join.
    // Thresholds are scaled down to fixture bytes; at cluster scale the
    // defaults (256 MB partition threshold) play the same role.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k",
      // coalescing would merge the tiny partitions and shift the median
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000).select(
        when(col("id") % 20 < 19, "MC")
          .otherwise(concat(lit("c"), col("id") % 100)).as("client"),
        concat(lit("fingerprint_payload_padding_"), col("id")).as("payload"))
      val right = spark.range(200).select(
        when(col("id") === 0, "MC")
          .otherwise(concat(lit("c"), col("id"))).as("client"),
        col("id").as("client_id"))
      val j = left.join(right, "client")
      // collect() (not count()) so THIS dataset's own query execution runs
      // to the final adaptive plan — count() wraps it in a fresh one and
      // the inspected plan would stay isFinalPlan=false
      assert(j.collect().length == 200000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true") ||
        plan.contains("skewed"), s"AQE skew split did not fire:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("x95 edit-distance blocking: equals the direct-id bare-prefix " +
      "result set, planted 1-edit twins all survive at 10x, and " +
      "candidate volume is replication-FLAT (the quadratic killer)") {
    import graft.ops.Dedup
    // (a) result-set equality with the PRE-FIX formulation (direct-id
    // bare-prefix join, no distinct collapse, no length pruning — an
    // independent reference): the fix is candidate pruning only
    val small = graft.DataQueries.scaledPartNames(spark,
      "/root/testdata/sf0.001", copies = 2)
    val got = Dedup.editDistancePairs(small, maxDist = 2, minDist = 1)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
    val blk = small.withColumn("blk", substring(col("name"), 1, 3))
    val ref = blk.select(col("blk"), col("id").as("id_a"),
        col("name").as("na"))
      .join(blk.select(col("blk"), col("id").as("id_b"),
        col("name").as("nb")), Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("na"), col("nb")).between(1, 2))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("na"), col("nb")).as("edit_dist"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "blocking fix changed the result set")
    // (b) the x95 10x regime: every planted twin (one deletion, prefix
    // preserved -> equal or adjacent length bucket) is retained
    val big = graft.DataQueries.scaledPartNames(spark,
      "/root/testdata/sf0.01", copies = 10)
    val nPlanted = big.filter(col("id") >= 10000000L).count()
    val pairs = Dedup.editDistancePairs(big, maxDist = 2, minDist = 1)
      .localCheckpoint()
    val twinHits = pairs.filter(
      col("id_b") === col("id_a") + 10000000L &&
        col("edit_dist") === 1).count()
    assert(twinHits === nPlanted,
      s"planted twins lost by blocking: $twinHits of $nPlanted")
    // (c) the fix that matters at 100 TB: candidate volume runs over
    // DISTINCT names, so it must be (near-)FLAT in the replication
    // factor — the pre-fix direct-id blocking paid ~100x more here
    // (every block's population multiplied 10x => pairs 100x). The
    // census is distinct-name populations; candidate volume from it
    // via the same neighbor-expansion join the operator does.
    def candVolume(names: org.apache.spark.sql.DataFrame): Long = {
      val c = Dedup.editDistanceBlockCensus(names).localCheckpoint()
      c.select(col("pfx"), col("lb").as("lbk"), col("n").as("na"))
        .join(c.select(col("pfx"),
          explode(array(col("lb") - 1, col("lb"), col("lb") + 1))
            .as("lbk"), col("n").as("nb")), Seq("pfx", "lbk"))
        .agg(sum(col("na") * col("nb"))).head().getLong(0)
    }
    val one = graft.DataQueries.scaledPartNames(spark,
      "/root/testdata/sf0.01", copies = 1)
    val (v1, v10) = (candVolume(one), candVolume(big))
    val rows10 = big.count()
    info(s"candidate volume 1x: $v1, 10x: $v10 " +
      s"(${v10.toDouble / v1}%x for 10x rows = $rows10); " +
      s"pairs ${pairs.count()}")
    // planted-twin coverage differs slightly between the corpora
    // (copies=10 plants a twin for every base name, copies=1 for a
    // quarter), so allow 2x — the pre-fix behavior here would be ~100x
    assert(v10 <= v1 * 2,
      s"candidate volume grew with replication: $v1 -> $v10")
  }

  test("x70s: as-of under 80/20 key skew — result equals the range-join " +
      "reference, and the plan under AQE stays ONE exchange + window " +
      "with no join (so no AQE skew-split node exists to fire)") {
    import graft.ops.Temporal
    // the skewed harness at spec scale: 80% of events on user 0
    val ev = graft.DataQueries.skewedEvents(spark,
      "/root/testdata/sf0.001", copies = 2)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    val asof = Temporal.asofJoin(purchases, views, Seq("user_id"), "ts",
      "view_ts", payload = Seq("view_id", "view_value"), tie = "view_id")
    // correctness on the skewed frame: the textbook range join +
    // per-purchase top-1 (nearest prior view, ties by highest id) —
    // the t70 oracle's formulation, independent of the union+window
    import org.apache.spark.sql.expressions.Window
    val ranked = purchases.join(views, Seq("user_id"), "left")
      .filter(col("view_ts").isNull || col("view_ts") <= col("ts"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("purchase_id"))
          .orderBy(col("view_ts").desc_nulls_last,
            col("view_id").desc_nulls_last)))
      .filter(col("__rn") === 1)
    // left-join rows that matched only out-of-range views need the
    // null carry, like the oracle's outer form
    val ref = purchases.join(ranked.filter(col("view_ts").isNotNull)
        .select(col("purchase_id"), col("view_id"), col("view_ts"),
          col("view_value")),
      Seq("purchase_id"), "left")
    val a = asof.select(col("purchase_id"), col("view_id"),
      col("view_value"))
    val r = ref.select(col("purchase_id"), col("view_id"),
      col("view_value"))
    assert(a.exceptAll(r).isEmpty && r.exceptAll(a).isEmpty,
      "skewed as-of diverged from the range-join reference")
    // plan under AQE: the window partition is indivisible, so AQE's
    // skew-split (a JOIN optimization) has nothing to attach to —
    // the honest skew story is the hot key's single-task sort, which
    // is linear-log in its rows, vs the range join's |L_hot|*|R_hot|
    // pair explosion. Pin that the plan did NOT regress into a join
    // under skew and still carries exactly one hash exchange per
    // window input.
    assert(spark.conf.get("spark.sql.adaptive.enabled") != "false")
    // execute asof ITSELF first: the exceptAll above ran on derived
    // DataFrames with their own queryExecutions, so without an action
    // here asof's executedPlan is the initial AdaptiveSparkPlan
    // (isFinalPlan=false) and the skew=true assertion below could
    // never fail — AQE skew markers only appear post-execution
    asof.count()
    val p = asof.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of planned a join:\n${p.take(1500)}")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 1, s"expected 1 hash exchange, got $hashEx:\n" +
      p.take(1500))
    assert(!p.contains("skew=true"),
      "unexpected AQE skew-split in a windowed plan")
    val hot = ev.filter(col("user_id") === 0L).count()
    info(s"hot key carries $hot of ${ev.count()} rows; " +
      "cost = one task sorting them (linear-log), not pairs")
  }

  test("x70c crossover: on a 2M-row 90%-hot key the CHUNKED as-of " +
      "agrees with the plain window and the single-task sort ceiling " +
      "is measured against the parallel chunk sorts") {
    import graft.ops.Temporal
    // synthetic hot log: 2M events over ~23 days of seconds, 90% on
    // key 0 — the regime where one window partition IS the job
    val n = 2000000L
    val ev = spark.range(n).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 97).as("k"),
        to_timestamp(from_unixtime(lit(1700000000L) + col("id")))
          .as("ts"),
        col("id"))
      .localCheckpoint()
    val lhs = ev.filter(col("id") % 2 === 1)
      .select(col("k"), col("ts"), col("id").as("lid"))
    val rhs = ev.filter(col("id") % 2 === 0)
      .select(col("k"), col("ts").as("rts"), col("id").as("rid"))
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(col("rid")), sum(col("rid"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (plainFp, plainS) = timed(fingerprint(
      Temporal.asofJoin(lhs, rhs, Seq("k"), "ts", "rts",
        payload = Seq("rid"), tie = "rid")))
    // ~128 one-day-ish chunks: the hot key's 1.8M rows become ~128
    // parallel sorts of ~14k rows instead of one sort of 1.8M
    val (chunkFp, chunkS) = timed(fingerprint(
      Temporal.asofJoinChunked(lhs, rhs, Seq("k"), "ts", "rts",
        payload = Seq("rid"), tie = "rid", chunkSeconds = 16384L)))
    assert(chunkFp === plainFp,
      s"chunked diverged on the hot log: $chunkFp vs $plainFp")
    info(f"2M rows, 90%% hot key: plain window $plainS%.1f s " +
      f"(single-task sort) vs chunked $chunkS%.1f s " +
      f"(${n / 16384}%d-way parallel chunks)")
    // no wall-time assert (host noise); the fingerprint equality is
    // the gate, the timings are the recorded evidence. Measured
    // result (pinned in PLANS.md): the plain window still WINS here
    // (3.7 vs 4.6 s) — an in-memory 1.8M-row sort is cheap and the
    // chunked form's exchange+join overhead is not. The crossover
    // needs a hot key big enough to SPILL one task's sort — x70sp
    // below FORCES that regime via the window buffer's spill
    // threshold, since staging hundreds of millions of rows is
    // beyond a polite local test.
  }

  test("x70sp forced-spill rehearsal: when the hot task's window " +
      "buffer actually spills, the chunked as-of keeps every chunk " +
      "under the spill threshold — disk churn measured via task " +
      "metrics, outputs fingerprint-identical") {
    import graft.ops.Temporal
    // 16M events over ~185 days of seconds, 95% on one key: the hot
    // window partition is ~15.2M rows. With the buffer forced to
    // spill every 128k rows (the knob that simulates a task whose
    // sort exceeds executor memory — locally, 128 GiB of heap means
    // a real spill would need hundreds of millions of rows), the
    // plain as-of's single hot task churns through ~115 disk spills
    // while 65536-second chunks hold ~60k rows each — under the
    // threshold, memory-only by construction.
    val n = 16000000L
    val ev = spark.range(n).select(
        when(col("id") % 20 < 19, 0L).otherwise(col("id") % 97).as("k"),
        to_timestamp(from_unixtime(lit(1700000000L) + col("id")))
          .as("ts"),
        col("id"))
      .localCheckpoint()
    val lhs = ev.filter(col("id") % 2 === 1)
      .select(col("k"), col("ts"), col("id").as("lid"))
    val rhs = ev.filter(col("id") % 2 === 0)
      .select(col("k"), col("ts").as("rts"), col("id").as("rid"))
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach { m =>
          spilled.addAndGet(m.diskBytesSpilled); ()
        }
      }
    }
    def measure(f: => (Long, Long)): ((Long, Long), Double, Long) = {
      spilled.set(0L)
      spark.sparkContext.addSparkListener(listener)
      try {
        val t0 = System.nanoTime()
        val fp = f
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously — poll to quiescence
        var last = -1L
        var waited = 0
        while (spilled.get != last && waited < 50) {
          last = spilled.get; Thread.sleep(100); waited += 1
        }
        (fp, secs, spilled.get)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(col("rid")), sum(col("rid"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val prevMem =
      spark.conf.get("spark.sql.windowExec.buffer.in.memory.threshold")
    val prevSp =
      spark.conf.get("spark.sql.windowExec.buffer.spill.threshold")
    try {
      spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "16384")
      spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "131072")
      val (plainFp, plainS, plainSpill) = measure(fingerprint(
        Temporal.asofJoin(lhs, rhs, Seq("k"), "ts", "rts",
          payload = Seq("rid"), tie = "rid")))
      val (chunkFp, chunkS, chunkSpill) = measure(fingerprint(
        Temporal.asofJoinChunked(lhs, rhs, Seq("k"), "ts", "rts",
          payload = Seq("rid"), tie = "rid", chunkSeconds = 65536L)))
      assert(chunkFp === plainFp,
        s"chunked diverged under forced spill: $chunkFp vs $plainFp")
      // the rehearsal is only honest if the plain hot task REALLY hit
      // disk, and the chunked form's whole point is that its chunk
      // partitions never cross the same threshold
      assert(plainSpill > 0L,
        "forced-spill setup failed: the plain window never spilled")
      assert(chunkSpill < plainSpill / 4,
        f"chunked spilled ${chunkSpill}%d B vs plain ${plainSpill}%d B " +
          "— chunks crossed the spill threshold")
      info(f"16M rows, 95%% hot, forced spill: plain $plainS%.1f s " +
        f"(${plainSpill / 1048576}%d MiB spilled) vs chunked " +
        f"$chunkS%.1f s (${chunkSpill / 1048576}%d MiB spilled)")
    } finally {
      spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", prevMem)
      spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", prevSp)
    }
  }

  test("knn recall at the benched scale regimes is measured and floored") {
    import graft.ops.Similarity
    val sf = "/root/testdata/sf0.1"
    val emb2k = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    def recallOf(approx: org.apache.spark.sql.DataFrame,
                 exact: org.apache.spark.sql.DataFrame): Double = {
      val e = exact.select(col("query_id"), col("neighbor_id"))
      e.intersect(approx.select(col("query_id"), col("neighbor_id")))
        .count().toDouble / e.count()
    }
    // (a) the sf0.1 corpus: 2000 DISTINCT vectors, 4x the fixture the
    // SimilaritySpec sandwich runs on — full ground truth is 4M cosines
    val gt2k = Similarity.bruteForceTopK(emb2k, emb2k, 3).localCheckpoint()
    val rP1 = recallOf(Similarity.knnJoin(emb2k, emb2k, 3, bits = 8), gt2k)
    val rBud = recallOf(Similarity.knnJoinBudget(emb2k, emb2k, 3, bits = 8),
      gt2k)
    info(f"2000-distinct recall@3 bits=8: probe1 $rP1%.3f, budget $rBud%.3f")
    // (b) the EXACT 16k x29/x30 benched frame (sf0.1 replicated 8x,
    // duplication-skewed buckets): ground truth for a 200-query sample
    // (vec_id % 80) against the FULL frame's join output — the per-query
    // probe machinery is independent, so the sample restriction loses
    // nothing while keeping brute force at 3.2M cosines
    val big = DataQueries.scaledEmbeddings(spark, sf, copies = 8)
    val sample = big.filter(col("vec_id") % 80 === 0).localCheckpoint()
    def sampled(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("query_id") % 80 === 0)
    val gt3 = Similarity.bruteForceTopK(big, sample, 3).localCheckpoint()
    val x29 = recallOf(sampled(Similarity.knnJoin(big, big, 3, bits = 8)),
      gt3)
    val x30 = recallOf(sampled(Similarity.knnJoinBudget(big, big, 3,
      bits = 8)), gt3)
    // k=8 > the 7 identical replicas each vector has in the 8x frame, so
    // at least one slot per query must be a genuinely-searched neighbor
    val gt8 = Similarity.bruteForceTopK(big, sample, 8).localCheckpoint()
    val x29k8 = recallOf(sampled(Similarity.knnJoin(big, big, 8, bits = 8)),
      gt8)
    val x30k8 = recallOf(sampled(Similarity.knnJoinBudget(big, big, 8,
      bits = 8)), gt8)
    info(f"16k-frame sampled recall bits=8: @3 probe1 $x29%.3f / " +
      f"budget $x30%.3f; @8 probe1 $x29k8%.3f / budget $x30k8%.3f")
    // floors pinned under measured (see PLANS.md "knn recall at scale";
    // measured: 0.139/0.028, 1.000/1.000, 0.893/0.878); a probe/kernel
    // regression at the benched regime trips them where the
    // fixture-scale sandwich could miss it. The 2000-distinct budget
    // number is LOW by design: at ~8 vectors per bucket every census
    // covers k=3, so nearly all queries take the own-bucket tier — the
    // ~(1+bits)x candidate cut is exactly what the 0.11-point recall gap
    // buys; callers who need probe1 recall on dense corpora should use
    // knnJoin, and the gap is now a recorded number, not a claim
    assert(rP1 >= 0.10 && rBud >= 0.015,
      f"2000-distinct recall collapsed: probe1 $rP1%.3f budget $rBud%.3f")
    assert(x29 >= 0.80 && x30 >= 0.80,
      f"16k replicated recall@3 collapsed: $x29%.3f / $x30%.3f")
    assert(x29k8 >= 0.50 && x30k8 >= 0.50,
      f"16k replicated recall@8 collapsed: $x29k8%.3f / $x30k8%.3f")
    // the budget join's contract at scale: recall at or below the
    // uniform probe1 join (tier-0 queries scan fewer candidates), never
    // meaningfully above it by accident of bucketing
    assert(x30 <= x29 + 0.001 && x30k8 <= x29k8 + 0.001,
      f"budget recall above probe1 at scale: $x30%.3f>$x29%.3f or " +
        f"$x30k8%.3f>$x29k8%.3f")
  }

  test("PQ-family ADC recall at the benched 16k regime is measured and " +
      "floored (the x38/x40/x45 frames)") {
    import graft.ops.Similarity
    val sf = "/root/testdata/sf0.1"
    // the EXACT x40/x45 benched shape: sf0.1 replicated 8x, 8 distinct
    // queries, 128 coarse lists, m=4 codebooks sampled every 200
    val big = DataQueries.scaledEmbeddings(spark, sf, copies = 8)
    val queries = big.filter(col("vec_id") < 64 && col("vec_id") % 8 === 0)
      .localCheckpoint()
    val cents = big.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      .localCheckpoint()
    val cb = Similarity.pqCodebooksFromSample(big, m = 4, every = 200)
      .localCheckpoint()
    val cbRes = Similarity.ivfPqResidualCodebooks(big, cents, m = 4,
      every = 200).localCheckpoint()
    // exact squared-L2 ground truth for the 8 queries (ADC approximates
    // L2; a cosine baseline would mix metrics), same neighbor_id tiebreak
    val k = 8
    val l2 = aggregate(zip_with(col("__qv"), col("__cv"), (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val exact = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv")))
      .crossJoin(big.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(l2, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val nExact = exact.count()
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      exact.intersect(approx.select(col("query_id"), col("neighbor_id")))
        .count().toDouble / nExact
    val rPq = recallOf(Similarity.pqTopK(big, queries, cb, m = 4, k = k))
    val rIvf = recallOf(Similarity.ivfPqTopK(big, queries, cents, cb,
      m = 4, k = k, nprobe = 3))
    val rRes = recallOf(Similarity.ivfPqResidualTopK(big, queries, cents,
      cbRes, m = 4, k = k, nprobe = 3))
    info(f"16k-frame ADC recall@$k: pq $rPq%.3f, ivfPq $rIvf%.3f, " +
      f"residual ivfPq $rRes%.3f")
    // structural floor: each query has 7 identical replicas at exact
    // distance 0 sharing its codes and coarse list — correct encode,
    // probe and tiebreak machinery MUST return all 7 (56 of the 64
    // ground-truth slots = 0.875); only the genuinely searched 8th slot
    // is corpus-quality-dependent. Measured: exactly 0.875 for all
    // three paths (the 8th slot misses on the near-random fixture —
    // m=4 ADC's single-slot hit rate there is ~the t38 family's 0.08
    // fixture recall, consistent with 0/8 queries landing it). A broken
    // table join, probe set or argmin collapses these to ~chance,
    // which is what the floor trips.
    assert(rPq >= 0.875, f"pqTopK lost replica slots: $rPq%.3f")
    assert(rIvf >= 0.875, f"ivfPqTopK lost replica slots: $rIvf%.3f")
    assert(rRes >= 0.875, f"residual ivfPqTopK lost replica slots: $rRes%.3f")
    // the x65 binary-search shape: a query's 7 identical replicas share
    // its sign codes exactly (Hamming 0), so the shortlist must carry
    // all 7 and the exact rerank must place them first — the same
    // structural floor. (bq reranks by cosine, but identical vectors
    // tie at the top under either metric.)
    val rBq = recallOf(Similarity.bqTopK(big, queries, k = k,
      shortlist = 64))
    info(f"16k-frame bq recall@$k (shortlist=64): $rBq%.3f")
    assert(rBq >= 0.875, f"bqTopK lost replica slots: $rBq%.3f")
    // the x87 JL shape: identical replicas project identically, so the
    // 16-dim projected search ties them at cosine 1 and the same
    // 7-replica structural floor applies after a 4x dimensionality cut
    val projBig = Similarity.randomProject(big, 64, 16)
      .select(col("vec_id"), col("proj").as("embedding"))
      .localCheckpoint()
    val projQ = projBig.join(queries.select("vec_id"), "vec_id")
    val rJl = recallOf(Similarity.bruteForceTopK(projBig, projQ, k))
    info(f"16k-frame JL-projected (64->16) recall@$k: $rJl%.3f")
    assert(rJl >= 0.875, f"randomProject lost replica slots: $rJl%.3f")
  }

  test("x110d depth rehearsal: a depth-64 forest closes in " +
      "ceil(log2 64)+1 doubling rounds (O(log d) proven) and matches " +
      "the linear frontier's 64-round output pair-for-pair") {
    import graft.ops.Graph
    // 32 disjoint chains of 64 edges each: the deep-taxonomy regime
    // where ROUNDS (job scheduling + lineage), not row counts, dominate
    // the linear form — closure is 32 * 64*65/2 = 66,560 pairs
    val edges = spark.range(32).select(col("id").as("c"))
      .crossJoin(spark.range(64).select(col("id").as("i")))
      .select((col("c") * 1000 + col("i")).as("child"),
        (col("c") * 1000 + col("i") + 1).as("parent"))
      .localCheckpoint()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ((doubled, rounds), tD) = timed {
      val (df, r) = Graph.closureDoublingWithRounds(edges, 64,
        "child", "parent")
      (df.localCheckpoint(), r)
    }
    assert(rounds == 7,
      s"depth 64 must close in ceil(log2 64)+1 = 7 rounds, took $rounds")
    val (linear, tL) = timed(
      Graph.ancestorClosure(edges, maxDepth = 64).localCheckpoint())
    info(f"depth-64 rehearsal: doubling $rounds rounds $tD%.2f s, " +
      f"linear 64 frontier joins $tL%.2f s")
    assert(doubled.count() === 66560L)
    assert(doubled.exceptAll(linear).isEmpty &&
      linear.exceptAll(doubled).isEmpty,
      "doubling closure diverged from the linear form at depth 64")
  }

  test("writeFactByMonth enables partition pruning on the month") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fact").toString
    val fact = Seq((1L, 20250115L, 10.0), (2L, 20250220L, 20.0),
      (3L, 20250321L, 30.0)).toDF("id", "DateKey", "Amount")
    Scale.writeFactByMonth(fact, "DateKey", dir)
    val read = spark.read.parquet(dir).filter(col("date_month") === 202502)
    assert(read.count() == 1)
    // the scan carries a partition filter (pruning, not a full scan)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("202502"), plan)
  }

  test("zValue interleave round-trips and orders locally; writeZOrdered " +
      "gives file-skipping on BOTH dimensions where a linear sort gives " +
      "one") {
    import graft.ops.Layout
    // interleave correctness in plain Scala terms: z(x, y) with 2 cols ->
    // bit i of x at 2i, bit i of y at 2i+1
    def zRef(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = Seq((0L, 0L), (255L, 255L), (1L, 0L), (0L, 1L), (170L, 85L))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == zRef(x, y), s"($x,$y)") }

    // layout proof: 64k uniform points, 16 files; a 1/8-of-domain range
    // predicate on EITHER dimension must touch at most half the z-ordered
    // files, while the linear-by-x layout cannot prune y at all
    val n = 65536
    val df = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(256L)).as("x"),
      pmod(col("id") * 40503L + 7L, lit(256L)).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val lDir = java.nio.file.Files.createTempDirectory("graft_l").toString
    val zRead = Layout.writeZOrdered(df, zDir, Seq("x", "y"), 8, 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(lDir)
    val lRead = spark.read.parquet(lDir)
    def touched(stats: Array[org.apache.spark.sql.Row], cIdx: Int,
                lo: Long, hi: Long): Int =
      stats.count(r => r.getLong(cIdx) <= hi && r.getLong(cIdx + 1) >= lo)
    // fileStats: __f, n_rows, min_x, max_x, min_y, max_y
    val zs = Layout.fileStats(zRead, Seq("x", "y")).collect()
    val ls = Layout.fileStats(lRead, Seq("x", "y")).collect()
    assert(zs.length == 16 && ls.length == 16,
      s"expected 16 files, got z=${zs.length} linear=${ls.length}")
    val (zx, zy) = (touched(zs, 2, 96, 127), touched(zs, 4, 96, 127))
    val (lx, ly) = (touched(ls, 2, 96, 127), touched(ls, 4, 96, 127))
    info(s"files touched for 1/8-range: zorder x=$zx y=$zy; linear x=$lx y=$ly")
    assert(lx <= 4, s"linear layout must prune its own sort column: $lx")
    assert(ly == 16, "linear layout cannot prune the unsorted dimension")
    assert(zx <= 8 && zy <= 8,
      s"z-order must prune both dimensions to <= half the files: x=$zx y=$zy")
  }

  test("x86k 3-column layout rehearsal: 3-D Morton prunes ALL THREE " +
      "dimensions where 2-D leaves the third unpruned — the measured " +
      "workload the k-D Hilbert roadmap item is gated on") {
    import graft.ops.Layout
    // 64k points uniform in a 256^3 cube via three coprime multipliers
    val df = spark.range(65536).select(
      pmod(col("id") * 2654435761L, lit(256L)).as("x"),
      pmod(col("id") * 40503L + 7L, lit(256L)).as("y"),
      pmod(col("id") * 69069L + 13L, lit(256L)).as("z"))
    def layoutTouched(zCols: Seq[String]): Map[String, Int] = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_z3").toString
      val read = Layout.writeZOrdered(df, dir, zCols, 8, 16)
      val stats = Layout.fileStats(read, Seq("x", "y", "z")).collect()
      assert(stats.length == 16)
      Seq("x", "y", "z").zipWithIndex.map { case (c, i) =>
        c -> stats.count(r =>
          r.getLong(2 + 2 * i) <= 127L && r.getLong(3 + 2 * i) >= 96L)
      }.toMap
    }
    val m3 = layoutTouched(Seq("x", "y", "z"))
    val m2 = layoutTouched(Seq("x", "y"))
    info(s"files touched for a 1/8-range probe per dimension: " +
      s"3-D Morton $m3; 2-D Morton (z unclustered) $m2")
    // 2-D layout: x/y prune, the third dimension reads everything.
    // Thresholds carry slack: repartitionByRange SAMPLES its file
    // boundaries with an RDD-id-derived seed, so exact file counts
    // shift a little with session history (observed x in 6..9)
    assert(m2("x") <= 13 && m2("y") <= 13, m2.toString)
    assert(m2("z") == 16,
      "an unclustered third column must not prune — else the fixture " +
        "is degenerate and proves nothing")
    // 3-D Morton: EVERY dimension prunes (measured ~11/9/8 of 16 —
    // with 16 files only four interleaved top bits exist, so each
    // dimension owns 1-2 of them and per-dim pruning power is ~2x,
    // the honest cost of covering three dimensions at this file
    // count; more files deepen it). The 3-column clustering workload
    // is served by the existing k-column zValue; a Butz k-D Hilbert
    // could only improve the per-file box-tightness margin (measured
    // at 2-D in the Hilbert test as Morton-vs-Hilbert), not restore
    // lost pruning — the roadmap item stays closed-as-measured.
    assert(m3.values.forall(_ <= 13), m3.toString)
  }

  test("hilbertValue matches the reference state machine, walks the grid " +
      "in unit steps (Morton does not), and writeHilbertOrdered measures " +
      "tighter per-file boxes than Morton on the same fixture") {
    import graft.ops.Layout
    // reference implementation in plain Scala (the Wikipedia xy2d loop)
    def href(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      var (x, y, d) = (x0, y0, 0L)
      var s = n >> 1
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    // bits=1 base case is the canonical ∪ shape
    assert(Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .map { case (x, y) => href(1, x, y) } == Seq(0L, 1L, 2L, 3L))
    // full 16x16 grid: expression == reference on every point, the curve
    // is a bijection, and CONSECUTIVE positions are always Manhattan-1
    // neighbors — the locality property Morton provably lacks
    val grid = spark.range(256).select(
      (col("id") / 16).cast("long").as("x"), (col("id") % 16).as("y"))
    val got = grid
      .withColumn("h", Layout.hilbertValue(col("x"), col("y"), 4))
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.foreach { case (x, y, h, _) => assert(h == href(4, x, y), s"($x,$y)") }
    assert(got.map(_._3).toSet == (0L until 256L).toSet, "not a bijection")
    def unitSteps(key: ((Long, Long, Long, Long)) => Long): Int =
      got.sortBy(key).toSeq.sliding(2).count { case Seq(a, b) =>
        math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1
      case _ => false }
    assert(unitSteps(_._3) == 255, "hilbert walk must be all unit steps")
    val mortonUnit = unitSteps(_._4)
    info(s"unit steps of 255: hilbert=255, morton=$mortonUnit")
    assert(mortonUnit < 255, "morton jumps across quadrant seams")

    // layout measurement: same 64k fixture as the z-order test, 16 files
    // each; compare summed per-file bounding-box area (the footer-stats
    // quantity a reader prunes with) and 1/8-range file touches
    val n = 65536
    val df = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(256L)).as("x"),
      pmod(col("id") * 40503L + 7L, lit(256L)).as("y"))
    val hDir = java.nio.file.Files.createTempDirectory("graft_h").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft_z2").toString
    val hRead = Layout.writeHilbertOrdered(df, hDir, "x", "y", 8, 16)
    val zRead = Layout.writeZOrdered(df, zDir, Seq("x", "y"), 8, 16)
    def boxArea(stats: Array[org.apache.spark.sql.Row]): Long =
      stats.map(r => (r.getLong(3) - r.getLong(2) + 1) *
        (r.getLong(5) - r.getLong(4) + 1)).sum
    def touched(stats: Array[org.apache.spark.sql.Row], cIdx: Int,
                lo: Long, hi: Long): Int =
      stats.count(r => r.getLong(cIdx) <= hi && r.getLong(cIdx + 1) >= lo)
    val hs = Layout.fileStats(hRead, Seq("x", "y")).collect()
    val zs = Layout.fileStats(zRead, Seq("x", "y")).collect()
    assert(hs.length == 16 && zs.length == 16)
    val (hArea, zArea) = (boxArea(hs), boxArea(zs))
    val (hx, hy) = (touched(hs, 2, 96, 127), touched(hs, 4, 96, 127))
    info(s"summed file-box area: hilbert=$hArea morton=$zArea " +
      s"(ratio ${hArea.toDouble / zArea})")
    info(s"files touched for 1/8-range: hilbert x=$hx y=$hy")
    assert(hx <= 8 && hy <= 8,
      s"hilbert must prune both dimensions to <= half the files: x=$hx y=$hy")
    // the measured claim (this fixture is deterministic): Hilbert's boxes
    // are no looser than Morton's — the locality argument, measured
    assert(hArea <= zArea,
      s"hilbert boxes should not be looser than morton: $hArea vs $zArea")
  }

  test("x85s sparse-HLL threshold sweep: many-small-groups state bytes " +
      "collapse vs dense (shuffle-measured), the densify cap sweep is " +
      "flat around the m/4 default, registers identical throughout") {
    import org.apache.spark.sql.functions.udaf
    import org.apache.spark.sql.Encoders
    val p = 12 // m = 4096: dense partials are 16 KiB of ints per group
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach { m =>
          shuffled.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
        }
      }
    }
    def measure(df: => org.apache.spark.sql.DataFrame)
        : (Seq[(Long, Seq[Int])], Double, Long) = {
      shuffled.set(0L)
      spark.sparkContext.addSparkListener(listener)
      try {
        val t0 = System.nanoTime()
        val rows = df.orderBy("g").collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Int](1)))
        val secs = (System.nanoTime() - t0) / 1e9
        var last = -1L
        var waited = 0
        while (shuffled.get != last && waited < 50) {
          last = shuffled.get; Thread.sleep(100); waited += 1
        }
        (rows, secs, shuffled.get)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def sketch(df: org.apache.spark.sql.DataFrame, cap: Int)
        : org.apache.spark.sql.DataFrame = {
      val agg =
        if (cap < 0) udaf(new graft.functions.HyperLogLog(p),
          Encoders.scalaLong)
        else udaf(new graft.functions.HyperLogLogSparse(p, cap),
          Encoders.scalaLong)
      df.select(col("g"), graft.ops.Stats.hash60(col("v")).as("__h"))
        .groupBy(col("g")).agg(agg(col("__h")).as("hll"))
    }
    // regime A — many SMALL groups (the sparse form's reason to exist):
    // 2000 groups x 64 distincts over 8 partitions. Dense carries a
    // 16 KiB partial per (group, partition) in executor memory and
    // onto the wire; sparse carries <= 64 packed ints. On the WIRE,
    // lz4 collapses the dense partials' zero runs, so compressed
    // shuffle bytes understate the 64x in-memory gap — the measured
    // wire win is ~2x and the assertion pins sparse strictly smaller;
    // the memory gap needs no measurement (it is the m/4 cap by
    // construction).
    val small = spark.range(512000).select(
        (col("id") % 2000).as("g"),
        concat(lit("u"), (col("id") % 128000)).as("v"))
      .repartition(8).localCheckpoint()
    val (dRows, dS, dBytes) = measure(sketch(small, -1))
    val (sRows, sS, sBytes) = measure(sketch(small, 0)) // default m/4
    assert(sRows == dRows, "sparse registers diverged from dense")
    assert(sBytes < dBytes,
      s"sparse partials should shuffle less than dense even compressed: " +
        s"$sBytes vs $dBytes")
    info(f"many-small (2000 x 64, p=$p): dense $dS%.1f s " +
      f"${dBytes / 1024}%d KiB shuffled (lz4) vs sparse $sS%.1f s " +
      f"${sBytes / 1024}%d KiB — wire ratio ${dBytes.toDouble / sBytes}%.1fx, " +
      "in-memory partials 16 KiB vs <= 256 B")
    // regime B — groups that CROSS the cap (40 groups x ~6000
    // distincts touch ~3150 of 4096 registers): the cap trades sorted-
    // insert cost against densify point. The sweep records m/16, m/4,
    // m/2 wall times; registers must agree at every cap. Timings are
    // evidence (host noise), the recorded flatness is the tuning
    // conclusion the default rests on.
    val big = spark.range(960000).select(
        (col("id") % 40).as("g"),
        concat(lit("w"), (col("id") % 240000)).as("v"))
      .repartition(8).localCheckpoint()
    val caps = Seq((1 << p) / 16, (1 << p) / 4, (1 << p) / 2)
    val runs = caps.map(c => (c, measure(sketch(big, c))))
    val (bd, bdS, _) = measure(sketch(big, -1))
    runs.foreach { case (c, (rows, _, _)) =>
      assert(rows == bd, s"cap=$c registers diverged from dense")
    }
    info("crossing regime (40 x ~6000, p=" + p + "): " +
      runs.map { case (c, (_, s, _)) => f"cap=$c $s%.1f s" }
        .mkString(", ") + f" vs dense $bdS%.1f s")
  }
}
