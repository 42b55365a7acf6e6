package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.Merge

/** Property-based invariants (SURVEY §5.4) using ScalaCheck generators
  * directly (no scalatestplus bridge in the offline dep set): merge
  * idempotence, insert-if-absent key uniqueness, map-update monotonicity. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val kvGen = Gen.listOfN(8,
    Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 100)))

  private def samples(n: Int): Seq[List[(Long, Int)]] =
    (1 to n).map(i => kvGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("insertIfAbsent never produces duplicate keys") {
    for (t <- samples(5); s <- samples(3)) {
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v")
      val out = Merge.insertIfAbsent(target, source, Seq("k"))
      assert(out.groupBy("k").count().filter(col("count") > 1).isEmpty,
        s"dup keys for target=$t source=$s")
    }
  }

  test("mergeUpsert is idempotent for any source") {
    for ((t, s) <- samples(5).zip(samples(5).reverse)) {
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v").dropDuplicates("k")
      val once = Merge.mergeUpsert(target, source, Seq("k"), Seq("v"))
      val twice = Merge.mergeUpsert(once, source, Seq("k"), Seq("v"))
      assert(once.orderBy("k", "v").collect().toSeq ==
        twice.orderBy("k", "v").collect().toSeq,
        s"not idempotent for target=$t source=$s")
    }
  }

  test("mapUpdate never un-maps and never changes out-of-guard rows") {
    for (facts <- samples(8)) {
      val fact = facts.zipWithIndex
        .map { case ((fk, v), i) =>
          (i.toLong, fk, if (v % 2 == 0) 0L else v.toLong) }
        .toDF("id", "fk", "mapped")
      val mapping = Seq((1L, 101L), (3L, 103L)).toDF("mk", "mv")
      val out = Merge.mapUpdate(fact, mapping, Seq(col("fk") === col("mk")),
        Map("mapped" -> col("mv")), guard = col("mapped") === 0)
      val before = fact.select("id", "mapped").as[(Long, Long)]
        .collect().toMap
      val after = out.select("id", "mapped").as[(Long, Long)]
        .collect().toMap
      before.foreach { case (id, m) =>
        if (m != 0) assert(after(id) == m, s"already-mapped row $id changed")
        else assert(after(id) == 0 || after(id) > 100,
          s"unmapped row $id got bogus value ${after(id)}")
      }
    }
  }

  test("connectedComponents matches a union-find oracle on random graphs") {
    val edgeGen = Gen.listOfN(12, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
      .map(_.filter { case (a, b) => a != b })
    for (i <- 1 to 4) {
      val edges = edgeGen.pureApply(Gen.Parameters.default, Seed(100L + i))
      if (edges.nonEmpty) {
        // driver-side union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expect = parent.keys.map(n => n -> find(n)).toMap
        val got = graft.ops.Dedup
          .connectedComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // union-find roots are component minima by construction above
        assert(got == expect, s"graph=$edges got=$got expect=$expect")
      }
    }
  }

  test("editDistancePairs matches a brute-force same-prefix oracle on " +
      "random name corpora (random lengths, heavy repeats)") {
    // names from a tiny alphabet with random lengths 3-9 and a 10-row
    // corpus: repeats are common (exercising the distinct collapse),
    // lengths straddle bucket boundaries (exercising the neighbor
    // probe); the oracle is the definition itself — every id pair with
    // equal 3-prefix and levenshtein in [1, 2]
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val nameGen = for {
      n <- Gen.choose(3, 9)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = Gen.listOfN(10, nameGen)
    for (i <- 1 to 5) {
      val names = corpusGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val rows = names.zipWithIndex.map { case (n, id) => (id.toLong, n) }
      val expect = (for {
        (ia, na) <- rows; (ib, nb) <- rows
        if ia < ib && na.take(3) == nb.take(3)
        d = lev(na, nb) if d >= 1 && d <= 2
      } yield (ia, ib, d)).toSet
      val got = graft.ops.Dedup
        .editDistancePairs(rows.toDF("id", "name"), maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(got == expect, s"names=$rows got=$got expect=$expect")
    }
  }

  test("hashSample: nested rates give nested samples (stable holdouts)") {
    val docs = spark.range(0, 500).toDF("doc_id")
    def ids(rate: Double) = graft.ops.TextOps
      .hashSample(docs, col("doc_id"), lit(rate), "h1")
      .collect().map(_.getLong(0)).toSet
    val s25 = ids(0.25)
    val s50 = ids(0.5)
    val s75 = ids(0.75)
    assert(s25.subsetOf(s50) && s50.subsetOf(s75))
    assert(ids(1.0).size == 500 && ids(0.0).isEmpty)
  }

  test("lineDedup conserves every distinct non-blank line exactly once") {
    val textGen = Gen.listOfN(4,
      Gen.listOfN(3, Gen.oneOf("alpha", "beta", "gamma", "", "delta"))
        .map(_.mkString("\n")))
    for (i <- 1 to 4) {
      val texts = textGen.pureApply(Gen.Parameters.default, Seed(200L + i))
      val docs = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.ops.TextOps.lineDedup(docs)
      val keptLines = out.collect().flatMap(_.getString(1).split("\n", -1))
        .filter(_.trim.nonEmpty)
      val inputDistinct = texts.flatMap(_.split("\n", -1))
        .filter(_.trim.nonEmpty).distinct.sorted
      assert(keptLines.sorted.toSeq == inputDistinct.toSeq,
        s"texts=$texts kept=${keptLines.toSeq}")
    }
  }

  test("stratifiedSplit: exact floor-boundary proportions, full cover, " +
      "determinism — for random weights and skewed strata") {
    import graft.ops.TextOps
    // random positive weights (2-4 labels) and random skewed stratum
    // sizes, including singleton and empty-difference cases
    val wGen = Gen.choose(2, 4).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 9)))
    val sGen = Gen.listOfN(3, Gen.choose(1, 40))
    for (i <- 1 to 5) {
      val ws = wGen.pureApply(Gen.Parameters.default, Seed(300L + i))
        .zipWithIndex.map { case (w, j) => s"l$j" -> w.toDouble }
      val sizes = sGen.pureApply(Gen.Parameters.default, Seed(400L + i))
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(r => (s * 1000L + r, s"src$s"))
      }
      val docs = rows.toDF("doc_id", "source")
      val out = TextOps.stratifiedSplit(docs, ws).localCheckpoint()
      // full cover: every row labeled with a declared label
      assert(out.count() === rows.length.toLong)
      assert(out.filter(!col("split").isin(ws.map(_._1): _*)).count() === 0L)
      // exact floor boundaries per stratum: label j's count equals
      // floor(cum_j * n) - floor(cum_{j-1} * n)
      val total = ws.map(_._2).sum
      val cums = ws.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
      val got = out.groupBy(col("source"), col("split")).count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      sizes.zipWithIndex.foreach { case (n, s) =>
        val bounds = (0.0 +: cums).map(c => math.floor(c * n).toLong)
        ws.map(_._1).zipWithIndex.foreach { case (lbl, j) =>
          val want =
            (if (j == ws.size - 1) n.toLong else bounds(j + 1)) - bounds(j)
          assert(got.getOrElse((s"src$s", lbl), 0L) === want,
            s"seed=$i stratum=src$s label=$lbl want=$want " +
              s"got=${got.get((s"src$s", lbl))} (n=$n ws=$ws)")
        }
      }
      // deterministic: re-run assigns identical labels
      val again = TextOps.stratifiedSplit(docs, ws)
        .select(col("doc_id"), col("split"))
      assert(out.select(col("doc_id"), col("split"))
        .except(again).count() === 0L)
    }
  }

  test("cmsEstimate never underestimates and merge-by-sum equals " +
      "one-pass on random multisets") {
    import graft.ops.Stats
    val itemGen = Gen.listOfN(60, Gen.choose(0, 12).map(i => s"i$i"))
    for (seed <- 1 to 4) {
      val items = itemGen.pureApply(Gen.Parameters.default, Seed(seed))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      val df = items.map(("g", _)).toDF("g", "v")
      val probes = truth.keys.toSeq.map(("g", _)).toDF("g", "probe")
      val est = Stats.cmsEstimate(
          Stats.cmsSketchBy(df, Seq("g"), col("v"), 3, 8),
          probes, Seq("g"), 3, 8)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      truth.foreach { case (item, n) =>
        assert(est(item) >= n, s"seed=$seed $item: ${est(item)} < $n") }
      val (h1, h2) = items.splitAt(items.size / 2)
      val merged = Stats.cmsSketchBy(h1.map(("g", _)).toDF("g", "v"),
          Seq("g"), col("v"), 3, 8)
        .unionAll(Stats.cmsSketchBy(h2.map(("g", _)).toDF("g", "v"),
          Seq("g"), col("v"), 3, 8))
        .groupBy("g", "row", "bucket").agg(sum("cnt").as("cnt"))
      val estM = Stats.cmsEstimate(merged, probes, Seq("g"), 3, 8)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(estM == est, s"seed=$seed: shard merge must equal one-pass")
    }
  }

  test("hilbertValue is a bijection onto [0, 4^bits) with unit-step " +
      "locality at random bit widths") {
    import graft.ops.Layout
    for (bits <- Seq(1, 2, 3, 5)) {
      val n = 1 << bits
      val grid = spark.range(n.toLong * n).select(
        (col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
      val got = grid
        .withColumn("h", Layout.hilbertValue(col("x"), col("y"), bits))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._3).toSet == (0L until n.toLong * n).toSet,
        s"bits=$bits: not a bijection")
      val sorted = got.sortBy(_._3).toSeq
      assert(sorted.sliding(2).forall {
        case Seq(a, b) =>
          math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1
        case _ => true
      }, s"bits=$bits: walk must be unit steps")
    }
  }

  test("sequenceKeysOrdered: keys equal offset + rank in sort order " +
      "for ANY input partitioning (plain-Scala sort oracle)") {
    val nameGen = Gen.listOfN(40, Gen.choose(0, 25)
      .map(i => f"name_${i * 7 % 26}%02d"))
    for (seed <- 1 to 4; parts <- Seq(1, 3, 13)) {
      val names = nameGen.pureApply(Gen.Parameters.default,
        Seed(seed + 40L)).distinct
      val expected = names.sorted.zipWithIndex
        .map { case (n, i) => n -> (1000L + i + 1) }.toMap
      val got = Merge.sequenceKeysOrdered(
          names.toDF("n").repartition(parts), Seq(col("n")), "k", 1000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"seed=$seed parts=$parts: ordered keys diverged from sort rank")
    }
  }

  test("ancestorClosureDoubling equals the linear closure AND a " +
      "plain-Scala min-depth oracle on random DAGs") {
    import graft.ops.Graph
    // random DAGs by construction: edges only point to higher ids
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 10L), Gen.choose(1L, 11L)))
    for (seed <- 1 to 5) {
      val edges = edgeGen.pureApply(Gen.Parameters.default,
          Seed(seed + 70L))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        // plain-Scala BFS min-depth closure
        val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val oracle = scala.collection.mutable.Map[(Long, Long), Long]()
        for (start <- edges.map(_._1).distinct) {
          var frontier = Set(start)
          var d = 0L
          while (frontier.nonEmpty && d <= 12) {
            d += 1
            frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
            frontier.foreach { anc =>
              val k = (start, anc)
              if (!oracle.contains(k)) oracle(k) = d
            }
          }
        }
        val df = edges.toDF("child", "parent")
        def asMap(r: org.apache.spark.sql.DataFrame) =
          r.collect().map(x =>
            (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
        val dd = asMap(Graph.ancestorClosureDoubling(df, maxDepth = 12))
        assert(dd == oracle.toMap, s"seed=$seed: doubling != BFS oracle")
        assert(dd == asMap(Graph.ancestorClosure(df, maxDepth = 12)),
          s"seed=$seed: doubling != linear")
      }
    }
  }

  test("cmsDecayedEstimate never underestimates the exact decayed " +
      "truth on random (item, day) multisets; shard merge == one-pass") {
    import graft.ops.Stats
    val t0 = 1704067200000000L
    val hl = 86400L
    val rowGen = Gen.listOfN(50,
      Gen.zip(Gen.choose(0, 9).map(i => s"i$i"), Gen.choose(0, 20)))
    for (seed <- 1 to 4) {
      val rows = rowGen.pureApply(Gen.Parameters.default, Seed(seed + 60L))
      val asOfB = 21
      val truth = rows.groupBy(_._1).view.mapValues(_.map { case (_, d) =>
        math.pow(2.0, (d - asOfB).toDouble) }.sum).toMap
      val df = rows.map { case (item, day) =>
        ("g", item, new java.sql.Timestamp(
          t0 / 1000L + day.toLong * 86400L * 1000L)) }
        .toDF("g", "v", "ts")
      val probes = truth.keys.toSeq.map(("g", _)).toDF("g", "probe")
      val asOf = t0 + asOfB.toLong * 86400L * 1000000L
      def estOf(sketch: org.apache.spark.sql.DataFrame) =
        Stats.cmsDecayedEstimate(sketch, probes, Seq("g"), asOf, t0, hl,
            depth = 3, width = 8)
          .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
      val est = estOf(Stats.cmsDecayedSketchBy(df, Seq("g"), col("v"),
        col("ts"), t0, hl, depth = 3, width = 8))
      // est rounds to 4 dp, so "never undercounts" holds up to half a
      // rounding quantum
      truth.foreach { case (item, tv) =>
        assert(est(item) >= tv - 5e-5,
          s"seed=$seed $item: ${est(item)} undercuts decayed truth $tv") }
      val (h1, h2) = rows.splitAt(rows.size / 2)
      def grid(rs: Seq[(String, Int)]) =
        Stats.cmsDecayedSketchBy(rs.map { case (item, day) =>
            ("g", item, new java.sql.Timestamp(
              t0 / 1000L + day.toLong * 86400L * 1000L)) }
          .toDF("g", "v", "ts"), Seq("g"), col("v"), col("ts"), t0, hl,
          depth = 3, width = 8)
      val merged = grid(h1).unionAll(grid(h2))
        .groupBy("g", "row", "bucket").agg(sum("mass").as("mass"))
      assert(estOf(merged) == est,
        s"seed=$seed: decayed shard merge must equal one-pass")
    }
  }

  test("trailingAnomaly matches a per-key sliding-window reference on " +
      "random series and never flags warm-up rows") {
    import graft.ops.Stats
    val vGen = Gen.listOfN(14, Gen.choose(0L, 40L))
    for (seed <- 1 to 4) {
      val vs = vGen.pureApply(Gen.Parameters.default, Seed(seed + 90L))
      val df = vs.zipWithIndex.map { case (v, i) => ("k", f"d$i%02d", v) }
        .toDF("k", "day", "v")
      val out = Stats.trailingAnomaly(df, Seq("k"), col("day"), col("v"),
          window = 7, nSigma = 3.0, minPrior = 3)
        .orderBy("day").collect()
      out.zipWithIndex.foreach { case (r, i) =>
        val prior = vs.slice(math.max(0, i - 7), i)
        assert(r.getLong(3) == prior.size, s"seed=$seed row $i n_prior")
        if (prior.size < 3)
          assert(!r.getBoolean(5), s"seed=$seed row $i warm-up flagged")
        else {
          val mean = prior.sum.toDouble / prior.size
          val sd = math.sqrt(
            prior.map(v => (v - mean) * (v - mean)).sum / (prior.size - 1))
          val expect =
            if (sd > 0) math.abs(vs(i) - mean) > 3.0 * sd
            else vs(i).toDouble != mean
          assert(r.getBoolean(5) == expect, s"seed=$seed row $i flag")
        }
      }
    }
  }
}
