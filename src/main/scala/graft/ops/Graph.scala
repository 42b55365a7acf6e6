package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over a plain (u, v) edge frame — the
  * relational formulations that scale on a shuffle engine (no graph
  * runtime needed): degree-ordered triangle counting and quantized
  * PageRank. Complements the similarity-graph machinery
  * ([[Similarity.knnGraph]], [[Dedup]]'s connected components) with the
  * two classic whole-graph statistics.
  *
  * Edge contract: `u < v`, distinct — one row per undirected edge.
  */
object Graph {

  private def undirected(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))

  /** Per-node triangle participation via DEGREE-ORDERED orientation
    * (Schank & Wagner 2005): direct every edge from its lower-degree
    * endpoint (ties by id), so each node's out-degree is O(sqrt(m)) and
    * the path-join below is bounded by Σ outdeg² — the trick that makes
    * triangle counting survive power-law graphs where a naive
    * wedge-join explodes on hub nodes. Three joins, all on edge keys;
    * each triangle is found exactly once and credited to its three
    * corners. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = undirected(edges).groupBy(col("u").as("n"))
      .agg(count(lit(1)).as("d"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val ori = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"))
    val p1 = ori.select(col("s").as("a"), col("t").as("b"))
    val p2 = ori.select(col("s").as("b"), col("t").as("c"))
    val p3 = ori.select(col("s").as("a"), col("t").as("c"))
    p1.join(p2, "b").join(p3, Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Quantized PageRank, `iters` synchronous iterations: each node
    * starts at 1.0; per iteration every node sends `pr/deg` to each
    * neighbor and updates to `(1-d) + d·Σ inflow`. Contributions are
    * TRUNCATION-quantized onto a 1e-9 grid and accumulated as exact
    * LONGS, which makes the per-node sum order- and partitioning-
    * independent and lets an external engine replay every iteration
    * bit-for-bit. Truncation was chosen deliberately: round() ties
    * happen CONSTANTLY on quantized inputs (a 9-dp pr divided by 2 is
    * a midpoint by construction) and engines break ties differently,
    * while floor() in Spark is BigDecimal/toString-based and can round
    * UP across an integer boundary where a binary floor would not —
    * cast-to-long truncation of the identical double sequence is the
    * one quantizer both engines agree on exactly. Cost per iteration: one edge-side join + one
    * node-keyed long-sum aggregate (the groupBy bill × iters); no
    * driver-side state. */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // decimal-exact base: (1 - 0.85) in binary doubles is one ulp OFF
    // the double nearest to 0.15, and an external engine writing the
    // constant as a decimal literal gets the latter — subtract in
    // decimal, then take the nearest double, so both agree
    val base = (BigDecimal(1) - BigDecimal(damping)).toDouble
    val und = undirected(edges)
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var pr = deg.select(col("u").as("node"), lit(1.0).as("pr"))
    for (_ <- 1 to iters) {
      // quantize by CAST-to-long truncation, not floor(): Spark's floor
      // on doubles goes through BigDecimal.valueOf (toString-based),
      // which can round UP across an integer boundary where a binary
      // floor would not — cast truncates the binary value, exactly what
      // an external engine's trunc() does (values are all positive, so
      // truncation IS floor)
      val inflow = und
        .join(pr.select(col("node").as("u"), col("pr")), "u")
        .join(deg, "u")
        .select(col("v").as("node"),
          (col("pr") / col("deg") * lit(1e9)).cast("long").as("ci"))
        .groupBy(col("node"))
        .agg(sum(col("ci")).as("si"))
      pr = deg.select(col("u").as("node"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (((lit(base) + lit(damping) *
              (coalesce(col("si"), lit(0L)).cast("double") / lit(1e9))) *
              lit(1e9)).cast("long").cast("double") / lit(1e9)).as("pr"))
    }
    pr
  }

  /** Ancestor closure of a parent hierarchy — org-chart / BOM / account
    * tree flattening (the reference's parent-account self-link q47 walks
    * ONE level; this materializes every (node, ancestor, depth) so
    * rollups become a plain join instead of a recursive query). Accepts
    * DAGs (multiple parents): each pair keeps its MINIMUM path depth,
    * which is also what makes the output canonical on trees. Self-loops
    * are dropped; a frontier still alive past `maxDepth` fails loud —
    * a "hierarchy" with a cycle (or one deeper than declared) must not
    * silently truncate rollups.
    *
    * Scale shape: linear level-chaining — one equi shuffle join per
    * level, frontier-sized frames, lineage truncated per level
    * (localCheckpoint, the connectedComponents discipline). Business
    * hierarchies are shallow (≤ ~12 levels), so O(depth) joins beats
    * the doubling scheme's log-rounds on constants while keeping every
    * intermediate frame node-count-bounded. */
  def ancestorClosure(edges: DataFrame, maxDepth: Int = 12,
                      childCol: String = "child",
                      parentCol: String = "parent"): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val base = edges
      .select(col(childCol).as("node"), col(parentCol).as("ancestor"))
      .filter(col("node") =!= col("ancestor"))
      .distinct().localCheckpoint()
    var level = base.withColumn("depth", lit(1L))
    var acc = level
    var d = 1
    var alive = true
    while (alive && d < maxDepth) {
      // collapse each level to distinct (node, ancestor) BEFORE the
      // checkpoint: without it the frame carries one row per distinct
      // PATH, and a diamond-heavy DAG grows 2^levels intermediate rows
      // (round-10 advice) — the final min() would still be right, but
      // the job blows up first. With the dedup every frame is bounded
      // by |node pairs|; min(depth) keeps the shortest-path contract
      // (all rows in one level share depth d+1 today, but min() stays
      // correct if a future variant mixes depths).
      val next = level
        .select(col("node"), col("ancestor").as("__mid"), col("depth"))
        .join(base.select(col("node").as("__mid"), col("ancestor")),
          Seq("__mid"))
        .groupBy(col("node"), col("ancestor"))
        .agg(min(col("depth") + 1).as("depth"))
        .localCheckpoint()
      if (next.isEmpty) alive = false
      else { acc = acc.unionByName(next); level = next; d += 1 }
    }
    if (alive && d >= maxDepth) {
      val probe = level
        .select(col("ancestor").as("__mid"))
        .join(base.select(col("node").as("__mid")), Seq("__mid"))
      if (!probe.isEmpty)
        throw new IllegalStateException(
          s"ancestorClosure frontier still alive past maxDepth=$maxDepth" +
            " — cycle, or a deeper hierarchy than declared")
    }
    acc.groupBy(col("node"), col("ancestor"))
      .agg(min(col("depth")).as("depth"))
  }

  /** [[ancestorClosure]] by path doubling — the deep-hierarchy form:
    * after round k the frame holds every (node, ancestor) pair whose
    * shortest path is ≤ 2^k edges (a shortest path of length ≤ 2^k
    * splits into two halves of length ≤ 2^(k-1), so the self-join's
    * min(d1 + d2) is the shortest distance — the classic transitive-
    * closure recurrence), so a depth-d hierarchy closes in ⌈log2 d⌉
    * self-joins instead of d frontier joins. Same output contract and
    * the SAME min-depth semantics as the linear form (ScaleSpec pins
    * equality on chain, diamond and forest fixtures; t118 pins it
    * against t110's recursive-CTE oracle verbatim).
    *
    * Crossover: each round self-joins the ACCUMULATED closure (up to
    * |node pairs| rows) where the linear form joins only the frontier
    * against the base edges — for the ≤ ~12-level business hierarchies
    * the reference has, linear wins on constants (SURVEY's call), and
    * the doubling form wins when depth is what hurts: rounds —
    * scheduler latency + lineage — dominate a deep chain long before
    * row counts do (ScaleSpec's depth-64 rehearsal measures it).
    * Cycle guard: a cycle keeps producing new pairs, so rounds are
    * capped at ⌈log2 maxDepth⌉ + 1 and a still-growing frame past the
    * cap fails loudly, like the linear form's probe. */
  def ancestorClosureDoubling(edges: DataFrame, maxDepth: Int = 64,
                              childCol: String = "child",
                              parentCol: String = "parent"): DataFrame =
    closureDoublingWithRounds(edges, maxDepth, childCol, parentCol)._1

  /** [[ancestorClosureDoubling]] plus the executed round count — the
    * spec's hook for proving the O(log d) round bound. */
  private[graft] def closureDoublingWithRounds(
      edges: DataFrame, maxDepth: Int, childCol: String,
      parentCol: String): (DataFrame, Int) = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val base = edges
      .select(col(childCol).as("node"), col(parentCol).as("ancestor"))
      .filter(col("node") =!= col("ancestor"))
      .distinct()
      .withColumn("depth", lit(1L))
      .localCheckpoint()
    val maxRounds = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1, maxDepth - 1).toLong) + 1 // ceil(log2 maxDepth) + 1
    var acc = base
    var accN = base.count()
    var rounds = 0
    var grew = true
    while (grew && rounds < maxRounds) {
      val next = acc
        .unionByName(acc
          .select(col("node"), col("ancestor").as("__mid"),
            col("depth").as("__d1"))
          .join(acc.select(col("node").as("__mid"), col("ancestor"),
            col("depth").as("__d2")), Seq("__mid"))
          .select(col("node"), col("ancestor"),
            (col("__d1") + col("__d2")).as("depth")))
        .groupBy(col("node"), col("ancestor"))
        .agg(min(col("depth")).as("depth"))
        .localCheckpoint()
      val n = next.count()
      rounds += 1
      if (n == accN) grew = false
      else { acc = next; accN = n }
    }
    if (grew) {
      // still growing at the cap: every DAG of depth <= maxDepth has
      // converged by now, so this is a cycle or an understated depth
      throw new IllegalStateException(
        s"ancestorClosureDoubling still growing after $rounds rounds " +
          s"(maxDepth=$maxDepth) — cycle, or a deeper hierarchy than " +
          "declared")
    }
    // ONE validation aggregate over the converged frame for both
    // loud-failure contracts. (a) Cycles: unlike the linear frontier
    // (which a cycle keeps alive forever), doubling CONVERGES on a
    // cyclic graph — its finite pair set just includes a composed
    // (n, n) self-pair for every cycle member. (b) Depth: a max depth
    // past maxDepth means the declared bound was wrong even though
    // growth stopped (maxDepth between the true depth and the next
    // power of two). coalesce: an empty edge set is trivially valid.
    val v = acc.agg(
        coalesce(max(col("depth")), lit(0L)),
        coalesce(max(when(col("node") === col("ancestor"), 1L)
          .otherwise(0L)), lit(0L)))
      .first()
    if (v.getLong(1) > 0L)
      throw new IllegalStateException(
        "ancestorClosureDoubling: composed self-pair found — the edge " +
          "set contains a cycle")
    require(v.getLong(0) <= maxDepth,
      s"ancestorClosureDoubling found paths deeper than maxDepth=$maxDepth")
    (acc, rounds)
  }

  /** Subtree rollup over an [[ancestorClosure]] — the point of
    * flattening: every ancestor's total over its ENTIRE subtree
    * (descendants at any depth, plus its own row) as one join + one
    * aggregate, no recursion at query time. `values` = (id, value)
    * rows; nodes absent from the closure contribute only to their own
    * total. Values accumulate as decimals (order/partitioning-free) —
    * the q01 exact-aggregation discipline. Returns (ancestor,
    * n_members, total) where n_members counts self + descendants that
    * HAVE a value row. */
  def subtreeRollup(closure: DataFrame, values: DataFrame,
                    idCol: String = "id", valueCol: String = "value",
                    valueDecimal: String = "decimal(27,4)"): DataFrame = {
    val v = values.select(col(idCol).as("__vid"),
      col(valueCol).cast(valueDecimal).as("__v"))
    // each value row lands on itself (depth 0) and on every ancestor
    val membership = v.select(col("__vid").as("ancestor"), col("__vid"))
      .unionByName(
        closure.select(col("ancestor"), col("node").as("__vid")))
    membership.join(v, Seq("__vid"))
      .groupBy(col("ancestor"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("__v")).as("total"))
  }
}
