package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Graph analytics: triangle counting (hand-counted shapes) and
  * quantized PageRank (fixed points, hand-computed asymmetric values,
  * partitioning independence of the decimal accumulation). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 gives 3 per node, a square gives none, " +
      "shared-edge triangles credit all corners") {
    // K4: 4 triangles, each node in C(3,2) = 3 of them
    val k4 = (for { u <- 1 to 4; v <- 1 to 4 if u < v } yield (u.toLong,
      v.toLong)).toDF("u", "v")
    val t = Graph.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // C4 (square): no triangles at all
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    assert(Graph.triangleCounts(sq).isEmpty)
    // two triangles sharing edge (1,2): nodes 1,2 in two each
    val bow = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("u", "v")
    val b = Graph.triangleCounts(bow).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("ancestorClosure: full closure with min path depth, DAG pairs " +
      "take the shorter path, self-loops drop, cycles fail loud") {
    import spark.implicits._
    import graft.ops.Graph
    // tree: 100 -> 10 -> 1, 11 -> 1; plus a DAG shortcut 100 -> 1
    // (direct) so (100, 1) has paths of depth 2 and 1 -> keep 1
    val edges = Seq((100L, 10L), (10L, 1L), (11L, 1L), (100L, 1L),
      (5L, 5L)) // self-loop must vanish
      .toDF("child", "parent")
    val got = Graph.ancestorClosure(edges, maxDepth = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (100L, 10L) -> 1L, (100L, 1L) -> 1L, (10L, 1L) -> 1L,
      (11L, 1L) -> 1L), got.toString)
    // a 3-cycle can never drain the frontier: fail, don't truncate
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("child", "parent")
    val ex = intercept[IllegalStateException] {
      Graph.ancestorClosure(cyc, maxDepth = 4).collect()
    }
    assert(ex.getMessage.contains("cycle"), ex.getMessage)

    // chained diamonds (a->b1/b2->c->d1/d2->e->...): path count doubles
    // per diamond (2^k paths bottom-to-top), but the per-level dedup
    // keeps every frame pair-bounded (round-10 advice) — with 8 chained
    // diamonds the closure must still come back (256 paths collapse to
    // one (bottom, top) pair of depth 16) with correct min depths
    val k = 8
    val diam = (0 until k).flatMap { i =>
      val (lo, hi) = (i * 10L, (i + 1) * 10L)
      Seq((lo, lo + 1), (lo, lo + 2), (lo + 1, hi), (lo + 2, hi))
    }.toDF("child", "parent")
    val dg = Graph.ancestorClosure(diam, maxDepth = 2 * k + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(dg((0L, k * 10L)) === 2L * k)
    assert(dg((0L, 1L)) === 1L && dg((0L, 10L)) === 2L)
    // pair count: distinct reachable pairs only, not 2^k paths —
    // anchors contribute 3(k-i) pairs each, the 2 mids of diamond i
    // contribute 1 + 3(k-i-1) each: 108 + 184 = 292 at k=8
    assert(dg.size === 292)

    // subtree rollup on the tree part: node values 1->5, 10->7,
    // 11->11, 100->2; root 1's subtree = all (25), node 10's = itself
    // + 100 (9), leaves roll up only themselves
    val tree = Seq((100L, 10L), (10L, 1L), (11L, 1L))
      .toDF("child", "parent")
    val vals = Seq((1L, 5.0), (10L, 7.0), (11L, 11.0), (100L, 2.0))
      .toDF("id", "value")
    val roll = Graph.subtreeRollup(
        Graph.ancestorClosure(tree, maxDepth = 6), vals)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue()))).toMap
    assert(roll == Map(
      1L -> ((4L, 25.0)), 10L -> ((2L, 9.0)),
      11L -> ((1L, 11.0)), 100L -> ((1L, 2.0))), roll.toString)
  }

  test("ancestorClosureDoubling: identical pairs AND min depths to the " +
      "linear form on tree+shortcut, chained diamonds and a forest; " +
      "cycles still fail loud") {
    import spark.implicits._
    import graft.ops.Graph
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val fixtures = Seq(
      // tree + DAG shortcut + self-loop (the linear test's fixture)
      (Seq((100L, 10L), (10L, 1L), (11L, 1L), (100L, 1L), (5L, 5L)), 6),
      // 8 chained diamonds — the path-explosion regime
      ((0 until 8).flatMap { i =>
        val (lo, hi) = (i * 10L, (i + 1) * 10L)
        Seq((lo, lo + 1), (lo, lo + 2), (lo + 1, hi), (lo + 2, hi))
      }, 17),
      // forest of three chains of different depths
      ((0L until 5L).map(i => (i, i + 1)) ++
        (10L until 13L).map(i => (i, i + 1)) ++ Seq((20L, 21L)), 6))
    fixtures.foreach { case (edges, maxDepth) =>
      val df = edges.toDF("child", "parent")
      assert(asMap(Graph.ancestorClosureDoubling(df, maxDepth)) ==
        asMap(Graph.ancestorClosure(df, maxDepth)),
        s"doubling diverged from linear on $edges")
    }
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("child", "parent")
    val ex = intercept[IllegalStateException] {
      Graph.ancestorClosureDoubling(cyc, maxDepth = 4).collect()
    }
    assert(ex.getMessage.contains("cycle"), ex.getMessage)
    // an understated maxDepth fails loud even when growth stops within
    // the round cap (depth-6 chain declared as 5: the ceil(log2 5)+1
    // rounds converge — 2^3 covers depth 6 — but a depth-6 pair
    // violates the declared bound)
    val chain6 = (0L until 6L).map(i => (i, i + 1)).toDF("child", "parent")
    val ex2 = intercept[IllegalArgumentException] {
      Graph.ancestorClosureDoubling(chain6, maxDepth = 5).collect()
    }
    assert(ex2.getMessage.contains("deeper"), ex2.getMessage)
    // degenerate inputs: an edge set that is empty (or all self-loops)
    // closes to the empty frame, like the linear form
    val selfOnly = Seq((5L, 5L)).toDF("child", "parent")
    assert(Graph.ancestorClosureDoubling(selfOnly, maxDepth = 4)
      .collect().isEmpty)
  }

  test("pageRank: regular graphs are fixed points at 1.0; a star matches " +
      "the hand-unrolled quantized recursion; partitioning-independent") {
    // triangle (2-regular): pr/2 + pr/2 = pr, so 0.15 + 0.85*1 = 1.0
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val fp = Graph.pageRank(tri, iters = 4).collect()
    assert(fp.forall(_.getDouble(1) == 1.0),
      "a regular graph must sit at the 1.0 fixed point")
    // star: center 0 with leaves 1..3 — replay the exact quantized
    // recursion by hand
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    // mirror the exact engine arithmetic: contributions truncation-
    // quantized onto the 1e-9 grid, summed as exact longs, then the
    // damped update quantized again — base is the DECIMAL-exact
    // 1 - 0.85 (the binary subtraction is one ulp off, and quantizers
    // care)
    val base = (BigDecimal(1) - BigDecimal(0.85)).toDouble
    def q(x: Double) = math.floor(x * 1e9) / 1e9
    var c = 1.0; var l = 1.0 // center, leaf
    for (_ <- 1 to 3) {
      val siC = 3L * math.floor(l / 1.0 * 1e9).toLong
      val siL = math.floor(c / 3.0 * 1e9).toLong
      val cNew = q(base + 0.85 * (siC.toDouble / 1e9))
      val lNew = q(base + 0.85 * (siL.toDouble / 1e9))
      c = cNew; l = lNew
    }
    val got = Graph.pageRank(star, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == c, s"center: ${got(0L)} vs hand $c")
    assert(got(1L) == l && got(2L) == l && got(3L) == l)
    // decimal accumulation => the same ranks under any partitioning
    val edges = (1L to 400L).map(i => (i % 37, (i * 7) % 41 + 100))
      .distinct.toDF("u", "v")
    val a = Graph.pageRank(edges, iters = 2).orderBy("node")
      .collect().toSeq
    val b = Graph.pageRank(edges.repartition(13), iters = 2)
      .orderBy("node").collect().toSeq
    assert(a == b, "quantized contributions must sum order-free")
  }
}
