package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Profiling aggregates: exact interpolated percentiles, equal-width
  * histogram boundary behavior. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("percentilesBy: linear interpolation, per-group") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L)).toDF("g", "v")
    val out = Stats.percentilesBy(df, Seq(col("g")), "v", Seq(0.5, 0.9))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) == 2.5)          // median of 1..4
    assert(math.abs(out(0).getDouble(2) - 3.7) < 1e-9) // p90 interpolated
    assert(out(1).getDouble(1) == 10.0)          // singleton group
    assert(out(0).getLong(3) == 4L)
  }

  test("zscoreBy: standardizes per group, NULLs degenerate groups") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0), ("c", 9.0)).toDF("g", "v")
    val out = Stats.zscoreBy(df, Seq(col("g")), col("v"))
      .orderBy("g", "v").collect()
    // group a: mean 2, sample sd 1 -> z = -1, 0, 1
    assert(out(0).getDouble(2) == -1.0 && out(1).getDouble(2) == 0.0 &&
      out(2).getDouble(2) == 1.0)
    // constant group b: sd 0 -> NULL; singleton c: n=1 -> NULL
    assert(out(3).isNullAt(2) && out(4).isNullAt(2) && out(5).isNullAt(2))
  }

  test("zscoreBy: expression group keys, incl. structurally identical ones") {
    val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0), (4L, 8.0)).toDF("k", "v")
    // two structurally identical expressions as group keys — the former
    // toString-keyed aliases collided on these ("(k % 2)" twice)
    val out = Stats.zscoreBy(df, Seq(col("k") % 2, col("k") % 2), col("v"))
    assert(out.columns.toSeq == Seq("k", "v", "zscore"))
    val rows = out.orderBy("k").collect()
    // even group {4.0, 8.0}: mean 6, sd ~2.828 -> z = ∓1/sqrt(2)
    val z2 = rows(1).getDouble(2)
    assert(math.abs(z2 + 1.0 / math.sqrt(2)) < 1e-9)
    // distinct expressions still group independently of their rendering
    val byExpr = Stats.zscoreBy(df, Seq(col("k") % 2, col("k") % 3), col("v"))
      .orderBy("k").collect()
    // (k%2, k%3) is unique per k in 1..4 -> every group is a singleton
    assert(byExpr.forall(_.isNullAt(2)))
  }

  test("histogram: degenerate single-value range pins bucket 0") {
    val df = Seq(7.5, 7.5, 7.5).toDF("v")
    val out = Stats.histogram(df, col("v"), 20).collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L &&
      out(0).getLong(1) == 3L)
  }

  test("histogram: equal widths, max folds into last bucket") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val out = Stats.histogram(df, col("v"), 10)
      .orderBy("bucket").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (0L to 9L))
    // buckets 0..8 hold 10 values each ([0,10), ...); bucket 9 holds 11
    // (90..99 plus the max 100 folded in)
    assert(out.take(9).forall(_.getLong(1) == 10L))
    assert(out(9).getLong(1) == 11L)
  }

  test("kmvDistinctBy: exact below fill — sketch IS the distinct set") {
    val df = Seq("a" -> "x", "a" -> "y", "a" -> "x", "a" -> "z",
      "b" -> "x").toDF("g", "v")
    val out = Stats.kmvDistinctBy(df, Seq("g"), col("v"), k = 8)
      .orderBy("g").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getLong(1) == 4L && a.getLong(2) == 3L) // n_rows, n_kmv
    assert(a.isNullAt(3), "kth_min must be null below fill")
    assert(a.getDouble(4) == 3.0, "below fill the estimate is exact")
    assert(out(1).getDouble(4) == 1.0)
  }

  test("kmvDistinctBy: estimator lands near truth and nulls are ignored") {
    // 500 distinct values + nulls, one group, k = 64 — estimator branch
    val df = (0 until 1500).map(i =>
      if (i % 3 == 2) ("g", null: String) else ("g", s"val_${i / 3}"))
      .toDF("g", "v")
    val r = Stats.kmvDistinctBy(df, Seq("g"), col("v"), k = 64).collect()(0)
    assert(r.getLong(1) == 1000L, "null rows must not count")
    assert(r.getLong(2) == 64L)
    val est = r.getDouble(4)
    // deterministic (md5-derived): exactly 484.9693 on this value set
    // (-3.0%); the theoretical se at k=64 is ~12.7%, floor at 3 se
    assert(math.abs(est - 500.0) / 500.0 < 0.38,
      f"estimate $est%.1f too far from 500")
    assert(math.abs(est - 484.9693) < 1e-6,
      "md5-derived estimate must be bit-deterministic")
  }

  test("kmvOverlap: exact below fill (identical / disjoint / known " +
      "overlap); estimator lands near truth above fill") {
    val df = (Seq("a", "b", "c", "d").map(("g1", _)) ++
      Seq("c", "d", "e", "f").map(("g2", _)) ++
      Seq("x", "y").map(("g3", _)) ++
      Seq("a", "b", "c", "d").map(("g4", _))).toDF("g", "v")
    val out = Stats.kmvOverlap(
        Stats.kmvSketchBy(df, Seq("g"), col("v"), k = 8), "g", k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out.size === 6, "4 groups -> 6 pairs")
    val (s12, u12, j12, i12) = out(("g1", "g2"))
    assert(s12 === 2L && u12 === 6.0, "union {a..f}, shared {c,d}")
    assert(math.abs(j12 - 0.3333) < 1e-9 && math.abs(i12 - 2.0) < 1e-3)
    val (s14, u14, j14, _) = out(("g1", "g4"))
    assert(s14 === 4L && u14 === 4.0 && j14 === 1.0, "identical sets")
    val (s13, _, j13, i13) = out(("g1", "g3"))
    assert(s13 === 0L && j13 === 0.0 && i13 === 0.0, "disjoint sets")
    // above fill: |A|=1000, |B|=1000, overlap 500 -> union 1500,
    // jaccard 1/3; k=64 sketches must land in the neighborhood
    val big = ((0 until 1000).map(i => ("h1", s"v$i")) ++
      (500 until 1500).map(i => ("h2", s"v$i"))).toDF("g", "v")
    val (_, ub, jb, ib) = Stats.kmvOverlap(
        Stats.kmvSketchBy(big, Seq("g"), col("v"), k = 64), "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap.apply(("h1", "h2"))
    assert(math.abs(ub - 1500.0) / 1500.0 < 0.35,
      f"union estimate $ub%.0f too far from 1500")
    assert(math.abs(jb - 1.0 / 3.0) < 0.15,
      f"jaccard estimate $jb%.3f too far from 0.333")
    assert(ib > 0, "intersection estimate must be positive")
  }

  test("kmvDifference: exact below fill (known asymmetric difference, " +
      "identical sets zero both ways, disjoint sets are whole sets); " +
      "estimator lands near truth above fill") {
    val df = (Seq("a", "b", "c").map(("g1", _)) ++
      Seq("b", "c", "d", "e").map(("g2", _)) ++
      Seq("x", "y").map(("g3", _)) ++
      Seq("a", "b", "c").map(("g4", _))).toDF("g", "v")
    val out = Stats.kmvDifference(
        Stats.kmvSketchBy(df, Seq("g"), col("v"), k = 8), "g", k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(("g1", "g2")) === ((1L, 2L, 1.0, 2.0)),
      "g1\\g2 = {a}, g2\\g1 = {d,e}")
    assert(out(("g1", "g4")) === ((0L, 0L, 0.0, 0.0)), "identical sets")
    assert(out(("g1", "g3")) === ((3L, 2L, 3.0, 2.0)),
      "disjoint: each side's whole set")
    // above fill: |A\B| = 500, |B\A| = 500 at union 1500, k=64
    val big = ((0 until 1000).map(i => ("h1", s"v$i")) ++
      (500 until 1500).map(i => ("h2", s"v$i"))).toDF("g", "v")
    val (_, _, ea, eb) = Stats.kmvDifference(
        Stats.kmvSketchBy(big, Seq("g"), col("v"), k = 64), "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap.apply(("h1", "h2"))
    assert(math.abs(ea - 500.0) / 500.0 < 0.5,
      f"a-minus-b estimate $ea%.0f too far from 500")
    assert(math.abs(eb - 500.0) / 500.0 < 0.5,
      f"b-minus-a estimate $eb%.0f too far from 500")
  }

  test("kmvDistinctBy: partitioning-independent (mergeable set algebra) " +
      "and runs as an ObjectHashAggregate") {
    val ev = graft.etl.Tables.events(spark, "/root/testdata/sf0.001")
    def run(parts: Int) =
      Stats.kmvDistinctBy(ev.repartition(parts), Seq("event_type"),
          col("user_id").cast("string"), k = 8)
        .orderBy("event_type").collect().toSeq
    assert(run(1) == run(7),
      "k-min of a set must not depend on the reduce/merge tree")
    val plan = Stats.kmvDistinctBy(ev, Seq("event_type"),
        col("user_id").cast("string"), k = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
  }

  test("hllDistinctBy: registers mergeable (partitioning-independent), " +
      "both estimator branches land near truth") {
    // 2000 distinct values -> raw harmonic branch at p=9 (threshold 1280)
    val big = (1L to 5000L).map(i => ("g", (i % 2000).toString)).toDF("g", "v")
    val r = Stats.hllDistinctBy(big, Seq("g"), col("v"), p = 9).collect()(0)
    val est = r.getDouble(r.fieldIndex("est_distinct"))
    assert(math.abs(est - 2000.0) / 2000.0 < 0.15,
      f"raw-branch estimate $est%.1f too far from 2000")
    // 100 distinct -> linear-counting branch; ~3x tighter at low card
    val small = (1L to 400L).map(i => ("g", (i % 100).toString)).toDF("g", "v")
    val r2 = Stats.hllDistinctBy(small, Seq("g"), col("v"), p = 9).collect()(0)
    val est2 = r2.getDouble(r2.fieldIndex("est_distinct"))
    assert(math.abs(est2 - 100.0) / 100.0 < 0.10,
      f"LC-branch estimate $est2%.1f too far from 100")
    // registers must not depend on the reduce/merge tree
    def regs(parts: Int) =
      Stats.hllSketchBy(big.repartition(parts), Seq("g"), col("v"), p = 9)
        .collect()(0).getSeq[Int](1)
    assert(regs(1) == regs(13),
      "register maxima must be order- and partitioning-free")
  }

  test("hllDistinctBy: nulls ignored, S/V are exact integers replayable " +
      "from the hash set, re-merged shard sketches equal one-pass") {
    val df = Seq(("g", "a"), ("g", "b"), ("g", "b"), ("g", null))
      .toDF("g", "v")
    val r = Stats.hllDistinctBy(df, Seq("g"), col("v"), p = 9).collect()(0)
    assert(r.getLong(r.fieldIndex("n_rows")) == 3L) // null dropped
    // brute-force replay of V and S from the two md5 hashes
    val hashes = Seq("a", "b").map { v =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(v).take(15), 16)
    }
    val regs = scala.collection.mutable.Map[Int, Int]()
    hashes.foreach { h =>
      val j = (h >>> 51).toInt
      val w = h & ((1L << 51) - 1)
      val bl = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rk = 51 + 1 - bl
      regs(j) = math.max(regs.getOrElse(j, 0), rk)
    }
    val expectedV = 512L - regs.size
    val expectedS = expectedV * (1L << 52) +
      regs.values.map(rk => 1L << (52 - rk)).sum
    assert(r.getLong(r.fieldIndex("hll_v")) == expectedV)
    assert(r.getLong(r.fieldIndex("hll_s")) == expectedS)
    // shard-sketch remerge: elementwise max of per-shard registers
    // equals the one-pass registers (the months-later remerge story)
    val ev = graft.etl.Tables.events(spark, "/root/testdata/sf0.001")
    val onePass = Stats.hllSketchBy(ev, Seq("event_type"),
        col("user_id").cast("string"), p = 9)
      .orderBy("event_type").collect().map(_.getSeq[Int](1))
    // remerge in Scala (the stored-sketch consumer's operation)
    val perShard = Stats.hllSketchBy(
        ev.withColumn("shard", pmod(col("event_id"), lit(4))),
        Seq("event_type", "shard"), col("user_id").cast("string"), p = 9)
      .collect().groupBy(_.getString(0))
    val remerged = perShard.toSeq.sortBy(_._1).map { case (_, rows) =>
      rows.map(_.getSeq[Int](2)).reduce((a, b) =>
        a.zip(b).map { case (x, y) => math.max(x, y) })
    }
    assert(remerged.zip(onePass.toSeq).forall { case (a, b) => a == b },
      "remerged per-shard registers must equal the one-pass sketch")
  }

  test("hllBiasAnchors: the recorded derivation reproduces the table " +
      "(spot anchors re-derived in plain Scala)") {
    // the anchor tables claim provenance: "128 runs over salted value
    // sets md5('hllbias:<p>:<run>:<i>'), 22 cardinalities m*(2+0.17k)".
    // Re-run that exact procedure for two (p, k) spots and compare to
    // the hardcoded entries — proof the table is the derivation's
    // output, not hand-tuned numbers
    def hash60(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(15), 16)
    def anchor(p: Int, k: Int): (Double, Double) = {
      val m = 1 << p
      val mBits = 60 - p
      val maxRank = mBits + 1
      val alphaNum =
        0.7213 / (1.0 + 1.079 / m) * m * m * math.pow(2.0, maxRank)
      val n = (m * (2.0 + 0.17 * k)).toInt
      var sumRaw = 0.0
      var sumBias = 0.0
      for (rep <- 0 until 128) {
        val regs = new Array[Int](m)
        var i = 0
        while (i < n) {
          val h = hash60(s"hllbias:$p:$rep:$i")
          val j = (h >>> mBits).toInt
          val w = h & ((1L << mBits) - 1)
          val bl = if (w == 0L) 0
            else 64 - java.lang.Long.numberOfLeadingZeros(w)
          val rk = mBits + 1 - bl
          if (rk > regs(j)) regs(j) = rk
          i += 1
        }
        var s2 = 0L
        var q = 0
        while (q < m) { s2 += 1L << (maxRank - regs(q)); q += 1 }
        val raw = alphaNum / s2.toDouble
        sumRaw += raw
        sumBias += raw - n
      }
      (sumRaw / 128, sumBias / 128)
    }
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((p, k) <- Seq((7, 0), (8, 5))) {
      val (r, b) = anchor(p, k)
      val (tr, tb) = graft.ops.Stats.hllBiasAnchors(p)(k)
      assert(round4(r) == tr && round4(b) == tb,
        f"p=$p k=$k: derived ($r%.4f, $b%.4f) != table ($tr, $tb)")
    }
  }

  test("cmsDecayedSketchBy: halving per half-life of age (exact when " +
      "collision-free), shard grids merge by summing cells, null event " +
      "time and horizon breaches fail loud") {
    val t0 = 1704067200000000L
    val hl = 86400L
    def ts(day: Int) = new java.sql.Timestamp(
      t0 / 1000L + day.toLong * 86400L * 1000L)
    // item "old": 8 hits on day 0; item "new": 8 hits on day 3;
    // item "mix": 4 on day 1 + 4 on day 2. As of day 4 (B=4):
    // old = 8/16 = 0.5, new = 8/2 = 4.0, mix = 4/8 + 4/4 = 1.5
    val rows = (1 to 8).map(i => ("g", "old", ts(0))) ++
      (1 to 8).map(i => ("g", "new", ts(3))) ++
      (1 to 4).map(i => ("g", "mix", ts(1))) ++
      (1 to 4).map(i => ("g", "mix", ts(2)))
    val df = rows.toDF("g", "v", "ts")
    val sk = Stats.cmsDecayedSketchBy(df, Seq("g"), col("v"), col("ts"),
      t0, hl, depth = 4, width = 4096) // wide -> collision-free here
    val probes = Seq(("g", "old"), ("g", "new"), ("g", "mix"))
      .toDF("g", "probe")
    val asOf = t0 + 4L * 86400L * 1000000L
    val est = Stats.cmsDecayedEstimate(sk, probes, Seq("g"), asOf, t0,
        hl, depth = 4, width = 4096)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(est == Map("old" -> 0.5, "new" -> 4.0, "mix" -> 1.5),
      est.toString)
    // shard grids merge by summing cells == one-pass (exact decimals)
    val onePass = sk.orderBy("g", "row", "bucket").collect().toSeq
    val merged = Stats.cmsDecayedSketchBy(df.repartition(7), Seq("g"),
        col("v"), col("ts"), t0, hl, depth = 4, width = 4096)
      .orderBy("g", "row", "bucket").collect().toSeq
    assert(onePass == merged, "cells must be partitioning-independent")
    // weighted mass parity with the plain sketch: weight w multiplies
    // the decayed contribution exactly (3 x day-3 hits at w=2 -> 6/2)
    val wdf = Seq(("g", "w", ts(3), 2L), ("g", "w", ts(3), 2L),
      ("g", "w", ts(3), 2L)).toDF("g", "v", "ts", "w")
    val wEst = Stats.cmsDecayedEstimate(
        Stats.cmsDecayedSketchBy(wdf, Seq("g"), col("v"), col("ts"),
          t0, hl, depth = 4, width = 4096, weightCol = col("w")),
        Seq(("g", "w")).toDF("g", "probe"), Seq("g"), asOf, t0, hl,
        depth = 4, width = 4096)
      .collect()(0).getDouble(2)
    assert(wEst == 3.0, s"weighted decayed estimate: $wEst != 6/2")
    // null event time: the row must not vanish silently
    val withNull = df.unionByName(
      Seq(("g", "old", null: java.sql.Timestamp)).toDF("g", "v", "ts"))
    val exNull = intercept[Exception] {
      Stats.cmsDecayedSketchBy(withNull, Seq("g"), col("v"), col("ts"),
        t0, hl).collect()
    }
    assert(exNull.getMessage.contains("null event time"),
      exNull.getMessage)
    // beyond the 88-half-life horizon: re-anchor, don't overflow
    val far = Seq(("g", "old", ts(100))).toDF("g", "v", "ts")
    val exFar = intercept[Exception] {
      Stats.cmsDecayedSketchBy(far, Seq("g"), col("v"), col("ts"),
        t0, hl).collect()
    }
    assert(exFar.getMessage.contains("horizon"), exFar.getMessage)
  }

  test("cmsDecayedSketchBy: a weighted mass that cannot fit " +
      "decimal(38,0) fails loud instead of silently dropping cell mass") {
    val t0 = 1704067200000000L
    val hl = 86400L
    // 5e17 (fits decimal(18,0)) * 2^87 ~ 7.7e43 > 1e38: the non-ANSI
    // decimal overflow yields NULL, which sum() would silently skip —
    // the never-underestimates guarantee must fail loud instead
    val far = Seq(("g", "v", new java.sql.Timestamp(
        t0 / 1000L + 87L * 86400L * 1000L), 500000000000000000L))
      .toDF("g", "v", "ts", "w")
    // under ANSI (the session default) the cast itself throws; the
    // raise_error guard covers non-ANSI deployments where the overflow
    // would otherwise be a silent NULL — either way, LOUD
    val ex = intercept[Exception] {
      Stats.cmsDecayedSketchBy(far, Seq("g"), col("v"), col("ts"),
        t0, hl, weightCol = col("w")).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(chain.contains("overflows decimal(38,0)") ||
      chain.contains("NUMERIC_VALUE_OUT_OF_RANGE"), chain)
  }

  test("hllDecayedDistinct: all-fresh equals the plain estimate, old " +
      "mass halves per half-life, mixed recency replays from suffix " +
      "estimates, shard grids merge by register max, guards fail loud") {
    val t0 = 1704067200000000L
    val hl = 86400L
    def ts(day: Int) = new java.sql.Timestamp(
      t0 / 1000L + day.toLong * 86400L * 1000L)
    val asOf = t0 + 4L * 86400L * 1000000L // B = 4
    def round4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1000 + 1000 distincts: the A u B union (~2000) lands in p=9's
    // 2.5m..5m harmonic band so the biasCorrect assertion below has a
    // correction that actually fires; B alone (~1000) stays in the
    // linear-counting branch, exercising both estimator paths
    val usersA = (1 to 1000).map(i => s"a_$i") // last seen day 1
    val usersB = (1 to 1000).map(i => s"b_$i") // seen day 4 (fresh)
    def frame(rows: Seq[(String, java.sql.Timestamp)]) =
      rows.map { case (v, t) => ("g", v, t) }.toDF("g", "v", "ts")
    def plainEst(values: Seq[String]): Double =
      Stats.hllDistinctBy(frame(values.map(v => (v, ts(0)))).drop("ts"),
          Seq("g"), col("v"), p = 9)
        .collect()(0).getAs[Double]("est_distinct")
    def decayed(rows: Seq[(String, java.sql.Timestamp)]): Double =
      Stats.hllDecayedDistinct(
          Stats.hllEpochSketchBy(frame(rows), Seq("g"), col("v"),
            col("ts"), t0, hl, p = 9),
          Seq("g"), asOf, t0, hl, p = 9)
        .collect()(0).getAs[Double]("est_decayed")
    // all-fresh (every event in epoch B): weight 1 — the decayed
    // estimate IS the plain estimate (through the shared x10^4 fix-point)
    val estB = plainEst(usersB)
    assert(decayed(usersB.map(v => (v, ts(4)))) == estB)
    // all-old (epoch 0, B=4): the same fixed-point S4 rescaled by 2^-4
    val s4B = math.round(estB * 10000.0)
    val expectedOld = round4(s4B.toDouble / 16.0 / 10000.0)
    assert(decayed(usersB.map(v => (v, ts(0)))) == expectedOld)
    // mixed recency: A last seen day 1, B day 4 — replay the suffix
    // algebra from plain estimates: S_1 = est(A u B), S_4 = est(B),
    // decayed = (S4(B)*2^4 + max(S4(AuB)-S4(B),0)*2^1) / 2^4 / 10^4.
    // A user also seen on an EARLIER day must not change anything
    // (last-epoch semantics), so a_1 gets a day-0 echo.
    val mixed = usersA.map(v => (v, ts(1))) ++
      usersB.map(v => (v, ts(4))) ++ Seq(("a_1", ts(0)))
    val s4AB = math.round(plainEst(usersA ++ usersB) * 10000.0)
    val expectedMixed = round4(
      (s4B * 16L + math.max(s4AB - s4B, 0L) * 2L).toDouble / 16.0
        / 10000.0)
    assert(decayed(mixed) == expectedMixed)
    // biasCorrect threads the SAME anchor-table correction through the
    // suffix estimates: replay it from the bias-corrected plain
    // estimates exactly as above (the A u B union, ~2000 distinct,
    // sits in p=9's 2.5m..5m band — 1280..2560 — so the correction
    // actually moves the numbers; B alone, ~1000, stays linear-counting)
    def plainEstBc(values: Seq[String]): Double =
      Stats.hllDistinctBy(frame(values.map(v => (v, ts(0)))).drop("ts"),
          Seq("g"), col("v"), p = 9, biasCorrect = true)
        .collect()(0).getAs[Double]("est_distinct")
    val s4Bbc = math.round(plainEstBc(usersB) * 10000.0)
    val s4ABbc = math.round(plainEstBc(usersA ++ usersB) * 10000.0)
    val expectedBc = round4(
      (s4Bbc * 16L + math.max(s4ABbc - s4Bbc, 0L) * 2L).toDouble / 16.0
        / 10000.0)
    val gotBc = Stats.hllDecayedDistinct(
        Stats.hllEpochSketchBy(frame(mixed), Seq("g"), col("v"),
          col("ts"), t0, hl, p = 9),
        Seq("g"), asOf, t0, hl, p = 9, biasCorrect = true)
      .collect()(0).getAs[Double]("est_decayed")
    assert(gotBc == expectedBc, s"biasCorrect decayed: $gotBc != $expectedBc")
    assert(gotBc != decayed(mixed),
      "the band correction must actually move an in-band estimate")
    // per-epoch registers are partitioning-independent (max-merge)
    val mdf = frame(mixed)
    val onePass = Stats.hllEpochSketchBy(mdf, Seq("g"), col("v"),
        col("ts"), t0, hl, p = 9)
      .orderBy("g", "epoch").collect().toSeq
    val sharded = Stats.hllEpochSketchBy(mdf.repartition(7), Seq("g"),
        col("v"), col("ts"), t0, hl, p = 9)
      .orderBy("g", "epoch").collect().toSeq
    assert(onePass == sharded, "registers must be partitioning-independent")
    // rows_decayed is exact forward mass: 1000 rows at day 1 + 1000 at
    // day 4 + the day-0 echo -> (1000*2 + 1000*16 + 1) / 16
    val rd = Stats.hllDecayedDistinct(
        Stats.hllEpochSketchBy(mdf, Seq("g"), col("v"), col("ts"),
          t0, hl, p = 9),
        Seq("g"), asOf, t0, hl, p = 9)
      .collect()(0).getAs[Double]("rows_decayed")
    assert(rd == 1125.0625, s"rows_decayed $rd")
    // null event time fails loud (the cmsDecayed rule)
    val exNull = intercept[Exception] {
      Stats.hllEpochSketchBy(
        frame(Seq(("x", null: java.sql.Timestamp))), Seq("g"),
        col("v"), col("ts"), t0, hl).collect()
    }
    assert(exNull.getMessage.contains("null event time"),
      exNull.getMessage)
    // an epoch AFTER asOf would carry weight > 1: clock skew fails loud
    val exFuture = intercept[Exception] {
      Stats.hllDecayedDistinct(
        Stats.hllEpochSketchBy(frame(Seq(("x", ts(5)))), Seq("g"),
          col("v"), col("ts"), t0, hl),
        Seq("g"), asOf, t0, hl).collect()
    }
    assert(exFuture.getMessage.contains("after asOf"),
      exFuture.getMessage)
  }

  test("hllDistinctBy biasCorrect: the band correction tightens the " +
      "error where the harmonic estimator systematically overshoots") {
    // 48 groups x 1350 distinct values at p=9: raw estimates land near
    // the band start (~2.6m) where the derived anchors show ~+3% bias.
    // Value salts ('specband') are DISJOINT from the table-derivation
    // salts ('hllbias'), so this is held-out evidence, not a replay of
    // the fit — and everything is deterministic, so the pinned bounds
    // cannot flap.
    val df = (0 until 48).flatMap(g =>
        (0 until 1350).map(i => (s"g$g", s"specband:$g:$i")))
      .toDF("g", "v")
    def meanSignedErr(biasCorrect: Boolean): Double = {
      val est = Stats.hllDistinctBy(df, Seq("g"), col("v"), p = 9,
          biasCorrect = biasCorrect)
        .select(col("est_distinct")).collect().map(_.getDouble(0))
      est.map(e => (e - 1350.0) / 1350.0).sum / est.length
    }
    val classic = meanSignedErr(biasCorrect = false)
    val corrected = meanSignedErr(biasCorrect = true)
    info(f"mean signed error over 48 in-band groups: " +
      f"classic ${classic * 100}%.2f%%, corrected ${corrected * 100}%.2f%%")
    // observed on this deterministic fixture: classic +1.41%, corrected
    // -0.65% — the overshoot the table was built for, mostly removed
    assert(classic > 0.008, f"expected systematic overshoot, got $classic%.4f")
    assert(math.abs(corrected) < math.abs(classic),
      f"correction did not tighten: $corrected%.4f vs $classic%.4f")
    assert(math.abs(corrected) < 0.012,
      f"corrected mean error above 1.2%%: $corrected%.4f")
    // outside the band nothing changes: the LC branch (small n) and the
    // beyond-5m regime must be untouched by the flag
    val small = (1 to 100).map(i => ("g", s"specsmall:$i")).toDF("g", "v")
    val lcOff = Stats.hllDistinctBy(small, Seq("g"), col("v"), p = 9)
      .collect()(0).getDouble(4)
    val lcOn = Stats.hllDistinctBy(small, Seq("g"), col("v"), p = 9,
      biasCorrect = true).collect()(0).getDouble(4)
    assert(lcOff == lcOn, "LC branch must be untouched by biasCorrect")
    val huge = (0 until 4000).map(i => ("g", s"spechuge:$i")).toDF("g", "v")
    val hOff = Stats.hllDistinctBy(huge, Seq("g"), col("v"), p = 9)
      .collect()(0).getDouble(4)
    val hOn = Stats.hllDistinctBy(huge, Seq("g"), col("v"), p = 9,
      biasCorrect = true).collect()(0).getDouble(4)
    assert(hOff == hOn, "beyond-5m estimates must be untouched")
  }

  test("sampleQuantilesBy: exact at or below the sample size, " +
      "partitioning-independent, estimator lands near truth above it") {
    // group of 5 <= k=8: the sample IS the group -> exact interpolation
    val tiny = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("a", 4L, 40.0), ("a", 5L, 50.0)).toDF("g", "id", "v")
    val t = Stats.sampleQuantilesBy(tiny, Seq("g"), col("v"),
      col("id").cast("string"), Seq(0.5, 0.9), k = 8).collect()(0)
    assert(t.getLong(1) == 5L && t.getLong(2) == 5L)
    assert(t.getDouble(3) == 30.0)            // exact median
    assert(math.abs(t.getDouble(4) - 46.0) < 1e-9) // exact p90 interp
    // 20000 uniform rows, k=256: the p50 estimate concentrates near
    // the true median (rank-space se ~ sqrt(.25/256) ~ 3.1%)
    val big = (1L to 20000L).map(i => ("g", i, (i % 1000).toDouble))
      .toDF("g", "id", "v")
    val b = Stats.sampleQuantilesBy(big, Seq("g"), col("v"),
      col("id").cast("string"), Seq(0.5), k = 256).collect()(0)
    val p50 = b.getDouble(3)
    info(f"sampled p50 on uniform[0,1000): $p50%.1f (truth ~499.5)")
    assert(math.abs(p50 - 499.5) < 100.0,
      f"sampled median too far from truth: $p50%.1f")
    // the sample (and so the estimate) must not depend on partitioning
    def run(parts: Int) =
      Stats.sampleQuantilesBy(big.repartition(parts), Seq("g"), col("v"),
        col("id").cast("string"), Seq(0.25, 0.5, 0.9), k = 256)
        .collect().toSeq
    assert(run(1) == run(13),
      "bottom-k-by-hash sample must be partitioning-free")
  }

  test("quantileOfArray: matches the percentile aggregate on shared " +
      "samples (the formula the streaming gate interpolates with)") {
    val samples = Seq(
      Seq(10.0, 20.0, 30.0, 40.0, 50.0),
      Seq(3.0), Seq(1.0, 2.0), Seq(7.0, 7.0, 7.0),
      (1 to 97).map(_.toDouble * 1.5).toSeq)
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "sample")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val viaExpr = df.select(col("id"),
          Stats.quantileOfArray(col("sample"), p).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaAgg = df.select(col("id"), explode(col("sample")).as("v"))
        .groupBy("id").agg(expr(s"percentile(v, $p)").as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaExpr == viaAgg, s"p=$p: $viaExpr vs $viaAgg")
    }
    // empty array -> null, not a crash
    val e = Seq((0L, Seq.empty[Double])).toDF("id", "sample")
      .select(Stats.quantileOfArray(col("sample"), 0.5)).collect()(0)
    assert(e.isNullAt(0))
  }

  test("trailingAnomaly: a spike over noisy history flags with a large " +
      "z, a change over FLAT history flags with null z, warm-up rows " +
      "never flag, the current row is excluded from its own baseline") {
    // key a: 7 noisy-but-stable days then a 30-spike (sd > 0 branch);
    // key b: 7 flat days then a small change (sd = 0 branch)
    val rows =
      Seq(10L, 12L, 11L, 10L, 13L, 11L, 12L, 30L).zipWithIndex.map {
        case (v, i) => ("a", f"d$i%02d", v) } ++
      Seq(10L, 10L, 10L, 10L, 10L, 10L, 10L, 11L).zipWithIndex.map {
        case (v, i) => ("b", f"d$i%02d", v) }
    val df = rows.toDF("k", "day", "v")
    val out = Stats.trailingAnomaly(df, Seq("k"), col("day"), col("v"))
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
          r.getBoolean(5))).toMap
    val (na, za, aa) = out(("a", "d07"))
    assert(na == 7L && za > 10.0 && aa, s"spike must flag: z=$za")
    val (nb, zb, ab) = out(("b", "d07"))
    assert(nb == 7L && zb.isNaN && ab,
      "flat-history change must flag with null z")
    // warm-up rows (fewer than minPrior priors) never flag — including
    // a's volatile early days
    for (i <- 0 until 3; k <- Seq("a", "b"))
      assert(!out((k, f"d$i%02d"))._3, s"$k d$i must not flag")
    // the current row is excluded from its own baseline: a's d07 mean
    // is the mean of d00-d06 (79/7), untouched by the spike itself
    val mean = Stats.trailingAnomaly(df, Seq("k"), col("day"), col("v"))
      .filter(col("k") === "a" && col("day") === "d07")
      .collect()(0).getDouble(6)
    assert(mean == 11.2857, s"baseline mean (79/7 rounded to 4): $mean")
  }

  test("HyperLogLogSparse: registers bit-identical to dense across " +
      "cardinalities (incl. the densify boundary), buffer stays sparse " +
      "below m/4, all merge shapes agree") {
    import graft.functions.{HyperLogLog, HyperLogLogSparse}
    val p = 9
    val m = 1 << p
    // DataFrame-level: sparse aggregation == dense aggregation exactly,
    // at a cardinality below m/4 (stays sparse), around the densify
    // boundary, and far above it — under multiple partitionings so the
    // sparse/sparse, sparse/dense and dense/dense merge paths all run
    for (card <- Seq(10, m / 4 - 1, m / 4 + 5, 3 * m)) {
      val df = (1 to card * 3).map(i => ("g", s"v${i % card}")).toDF("g", "v")
      for (parts <- Seq(1, 13)) {
        val dense = Stats.hllSketchBy(df.repartition(parts), Seq("g"),
          col("v"), p).collect()(0).getSeq[Int](1)
        val sparse = Stats.hllSketchBy(df.repartition(parts), Seq("g"),
          col("v"), p, sparse = true).collect()(0).getSeq[Int](1)
        assert(sparse == dense, s"card=$card parts=$parts")
      }
    }
    // unit-level: the buffer representation itself — below m/4 distinct
    // registers the partial stays a packed list, never a dense array
    val agg = new HyperLogLogSparse(p)
    val ref = new HyperLogLog(p)
    val rnd = new scala.util.Random(11)
    var (buf, refBuf) = (agg.zero, ref.zero)
    (1 to 60).foreach { _ =>
      val h = rnd.nextLong() & ((1L << 60) - 1)
      buf = agg.reduce(buf, h)
      refBuf = ref.reduce(refBuf, h)
    }
    assert(buf.length <= m / 4, s"60 values must stay sparse: ${buf.length}")
    assert(agg.finish(buf).toSeq == ref.finish(refBuf).toSeq)
    // …and a sparse-merged-into-dense partial equals the dense result
    var big = agg.zero
    (1 to 2000).foreach { _ =>
      big = agg.reduce(big, rnd.nextLong() & ((1L << 60) - 1)) }
    assert(big.length == m, "2000 values must have densified")
    val mergedSD = agg.merge(agg.zero ++ buf.clone(), big.clone())
    val mergedDS = agg.merge(big.clone(), buf.clone())
    assert(mergedSD.toSeq == mergedDS.toSeq,
      "merge must commute across representations")
  }

  test("cmsSketchBy/cmsEstimate: never underestimates, exact when " +
      "collision-free, weighted mass, disjoint-slice sketches merge by " +
      "summing cells") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map(_ => ("g", s"item${rnd.nextInt(50)}"))
    val df = rows.toDF("g", "v")
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val probes = truth.keys.toSeq.map(("g", _)).toDF("g", "probe")

    // tight sketch (real collisions): estimate >= truth for EVERY item
    val tight = Stats.cmsSketchBy(df, Seq("g"), col("v"),
      depth = 4, width = 16)
    val estT = Stats.cmsEstimate(tight, probes, Seq("g"),
        depth = 4, width = 16)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    truth.foreach { case (item, n) =>
      assert(estT(item) >= n, s"$item: est ${estT(item)} < true $n") }
    assert(truth.exists { case (item, n) => estT(item) > n },
      "width 16 over 50 items must actually collide")

    // wide sketch (4 x 4096 over 50 items): every estimate exact —
    // md5-derived buckets make this deterministic, not probabilistic
    val wide = Stats.cmsSketchBy(df, Seq("g"), col("v"),
      depth = 4, width = 4096)
    val estW = Stats.cmsEstimate(wide, probes, Seq("g"),
        depth = 4, width = 4096)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(estW == truth, "collision-free sketch must be exact")

    // merge-by-sum: cells of two disjoint halves, summed, estimate
    // exactly like the one-pass sketch (the re-mergeable-shards story)
    val (h1, h2) = (rows.take(1500).toDF("g", "v"),
      rows.drop(1500).toDF("g", "v"))
    val merged = Stats.cmsSketchBy(h1, Seq("g"), col("v"), 4, 16)
      .unionAll(Stats.cmsSketchBy(h2, Seq("g"), col("v"), 4, 16))
      .groupBy("g", "row", "bucket").agg(sum("cnt").as("cnt"))
    val estM = Stats.cmsEstimate(merged, probes, Seq("g"), 4, 16)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(estM == estT, "summed shard sketches must equal one-pass")

    // weighted: integer weights count mass, not rows
    val wdf = Seq(("g", "a", 5L), ("g", "a", 2L), ("g", "b", 1L))
      .toDF("g", "v", "w")
    val wsk = Stats.cmsSketchBy(wdf, Seq("g"), col("v"),
      depth = 4, width = 4096, weightCol = col("w"))
    val wes = Stats.cmsEstimate(wsk,
        Seq(("g", "a"), ("g", "b")).toDF("g", "probe"), Seq("g"), 4, 4096)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(wes == Map("a" -> 7L, "b" -> 1L))
  }
}
