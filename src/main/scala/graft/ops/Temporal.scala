package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered joins — the as-of join family (each left row picks ONE
  * right row by temporal proximity on the same key) that event-log
  * enrichment needs constantly: price-as-of-trade, last-profile-before-
  * event, next-heartbeat-after-alert. SQL engines bolt this on as a
  * special operator (DuckDB ASOF JOIN, kdb aj); Spark has no built-in,
  * and the naive formulation (range join + per-left top-1) explodes into
  * |L|x|matches| intermediate rows.
  *
  * This implementation is NOT a join at all in the physical plan: both
  * sides union into one tagged frame, ONE hash exchange on the key, and
  * a running `last(payload, ignoreNulls)` over the per-key time sort
  * carries the nearest right payload onto every left row. Cost is one
  * shuffle + one sort of |L|+|R| rows total — no candidate explosion,
  * no range-bucket tuning, and a key's cost is bounded by its own row
  * count. Skew honesty (round-11 measurement, x70s): a hot key is ONE
  * task's sort — linear-log in its rows, never a pair explosion, but
  * AQE cannot split it (skew-split is a join optimization; a window
  * partition is indivisible). When a single key outgrows one task,
  * use [[asofJoinChunked]]: the same semantics with the hot key split
  * across time chunks.
  */
object Temporal {

  /** As-of join: for each `left` row, the single nearest `right` row on
    * the same `keys` with `right(rightTs) <= left(leftTs)` (backward,
    * the default) or `>=` (forward), equality always allowed. Ties on
    * the right timestamp are broken by `tie` (highest wins backward,
    * lowest wins forward — "latest/earliest write wins"); `tie` must be
    * unique per (key, rightTs) for a deterministic result. Left-outer:
    * unmatched left rows survive with null payload. `tolerance` (an
    * INTERVAL literal body, e.g. "1 hour") voids matches farther than
    * that from the left timestamp. `toleranceCol` is the PER-ROW
    * form (mutually exclusive with `tolerance`): a LEFT column
    * holding that row's grace in whole seconds — each entity brings
    * its own staleness budget (per-sensor heartbeat windows,
    * per-tier SLA lookbacks). A null grace voids the match (no
    * budget defined = no enrichment — the SQL-comparison semantics,
    * deliberately kept); a negative grace voids everything except
    * exact-timestamp matches it also excludes (dist >= 0 > grace).
    *
    * Returns all `left` columns plus `payload` columns from the matched
    * right row (null when unmatched / out of tolerance). `rightTs` and
    * `tie` may themselves be listed in `payload` to surface match
    * provenance. Payload columns must not collide with left columns —
    * alias on the way in.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               tie: String, tolerance: Option[String] = None,
               forward: Boolean = false,
               toleranceCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(tolerance.isEmpty || toleranceCol.isEmpty,
      "tolerance and toleranceCol are mutually exclusive")
    toleranceCol.foreach(tc => require(left.columns.contains(tc),
      s"toleranceCol $tc must be a left column"))
    val bad = payload.toSet.intersect(left.columns.toSet)
    require(bad.isEmpty, s"payload collides with left columns: $bad")
    val reserved = Set("__ts", "__tie", "__pay", "__is_left", "__m", "__k")
    val clash = reserved.intersect(left.columns.toSet)
    require(clash.isEmpty, s"left columns clash with asofJoin helpers: $clash")

    val pay = struct(col(rightTs).as("__rts") +:
      payload.map(c => col(c).as(c)): _*)
    val r = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ts"), col(tie).as("__tie"),
      pay.as("__pay"), lit(0).as("__is_left")): _*)
    val payType = r.schema("__pay").dataType
    val tieType = r.schema("__tie").dataType
    val l = left.select(left.columns.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"), lit(1).as("__is_left")): _*)

    // Traversal order per key: right rows first at equal timestamps (so
    // an equal-ts right row IS visible to the left row), and among
    // right rows at one timestamp the winner sorts LAST so the running
    // `last` carries it. Backward walks time ascending (latest prior
    // right wins); forward walks time descending (earliest subsequent
    // right wins), with the tie direction mirrored.
    val ord =
      if (forward) Seq(col("__ts").desc, col("__is_left"), col("__tie").desc)
      else Seq(col("__ts").asc, col("__is_left"), col("__tie").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r.select(l.columns.map(c =>
        if (r.columns.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)): _*))
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val dist =
      if (forward) unix_micros(col("__m.__rts")) - unix_micros(col("__ts"))
      else unix_micros(col("__ts")) - unix_micros(col("__m.__rts"))
    val inTol = (tolerance, toleranceCol) match {
      case (Some(t), _) =>
        if (forward) col("__m.__rts") <= col("__ts") + expr(s"INTERVAL $t")
        else col("__m.__rts") >= col("__ts") - expr(s"INTERVAL $t")
      case (_, Some(tc)) =>
        // clamp before the µs scaling: a huge grace (an "unbounded"
        // sentinel) must saturate, not wrap negative under non-ANSI
        // multiply and void everything; null grace stays null (void)
        val graceUs = when(
          col(tc).cast("long") >= lit(Long.MaxValue / 1000000L),
          lit(Long.MaxValue)).otherwise(
          col(tc).cast("long") * lit(1000000L))
        dist <= graceUs
      case _ => lit(true)
    }
    val kept = matched.withColumn("__k",
      when(col("__m").isNotNull && inTol, col("__m")))
    kept.select(left.columns.map(col) ++
      payload.map(c => col(s"__k.$c").as(c)): _*)
  }

  /** [[asofJoin]] with the hot key SPLIT across time chunks — the skew
    * mitigation the x70s measurement showed AQE cannot provide (a
    * window partition is indivisible; skew-split only splits joins).
    * Identical backward semantics (same tie rule, same tolerance
    * voiding, left-outer) by construction:
    *
    *   1. every row gets `chunk = floor(ts / chunkSeconds)` — time
    *      partitions, so ALL rows of an earlier chunk are strictly
    *      earlier than every row of a later one (equal timestamps
    *      share a chunk, preserving the equal-ts visibility rule);
    *   2. the running carry windows over (key, CHUNK) — a key with a
    *      billion rows across a year of 1-day chunks runs ~365
    *      parallel sorts instead of one giant one;
    *   3. each chunk's LAST right payload (max by (ts, tie) — exactly
    *      the row the carry would hand the next chunk) collapses to a
    *      (key, chunk) boundary table, prefix-carried per key over the
    *      CHUNK order — an aggregate-sized window (distinct occupied
    *      chunks per key, not rows);
    *   4. a left row's match = its within-chunk carry, else its
    *      chunk's prefix carry (the latest right of any earlier
    *      chunk). The (key, chunk) join back reuses step 2's
    *      partitioning on the big side; the boundary side is tiny.
    *
    * Equality with [[asofJoin]] on every input is TemporalSpec-pinned
    * (uniform, skewed, tie-heavy, unmatched, tolerance). Costs one
    * more exchange than the unchunked form (the boundary table) — pay
    * it when a key's row count threatens a single task, not before.
    * Backward + constant `tolerance` only (the deployed hot-key
    * shapes); forward/per-row-grace callers use [[asofJoin]]. */
  def asofJoinChunked(left: DataFrame, right: DataFrame,
                      keys: Seq[String], leftTs: String, rightTs: String,
                      payload: Seq[String], tie: String,
                      chunkSeconds: Long = 86400L,
                      tolerance: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoinChunked needs at least one key column")
    require(chunkSeconds >= 1, "chunkSeconds must be >= 1")
    val bad = payload.toSet.intersect(left.columns.toSet)
    require(bad.isEmpty, s"payload collides with left columns: $bad")
    val reserved = Set("__ts", "__tie", "__pay", "__is_left", "__m",
      "__k", "__chunk", "__bpay", "__ppay")
    val clash = reserved.intersect(left.columns.toSet) ++
      left.columns.filter(c =>
        c.startsWith("__r_") || c.startsWith("__b_"))
    require(clash.isEmpty,
      s"left columns clash with asofJoinChunked helpers: $clash")

    val pay = struct(col(rightTs).as("__rts") +:
      payload.map(c => col(c).as(c)): _*)
    val r = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ts"), col(tie).as("__tie"),
      pay.as("__pay"), lit(0).as("__is_left")): _*)
    val payType = r.schema("__pay").dataType
    val tieType = r.schema("__tie").dataType
    val l = left.select(left.columns.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"), lit(1).as("__is_left")): _*)
    // materialized once — the tagged union feeds THREE branches (the
    // within-chunk window, the boundary aggregate, the chunk census);
    // without this the |L|+|R| scan lineage runs once per branch
    // (review finding — the band-join discipline again)
    val tagged = l.unionByName(r.select(l.columns.map(c =>
        if (r.columns.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)): _*))
      .withColumn("__chunk",
        floor(unix_micros(col("__ts")) / lit(chunkSeconds * 1000000L)))
      .localCheckpoint()

    // (2) within-chunk running carry — the asofJoin window with the
    // chunk added to the partitioning, so a hot key parallelizes
    val ord = Seq(col("__ts").asc, col("__is_left"), col("__tie").asc)
    val wc = Window.partitionBy((keys.map(col) :+ col("__chunk")): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = tagged
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(wc))

    // (3) per-(key, chunk) boundary = the chunk's winning right row
    // (max by (ts, tie) — identical to what the running carry ends the
    // chunk holding), prefix-carried per key over chunk order; seeded
    // from EVERY occupied chunk (left-only chunks carry a null
    // boundary but still need a prefix row)
    val bounds = tagged.filter(col("__is_left") === 0)
      .groupBy((keys.map(col) :+ col("__chunk")): _*)
      .agg(max_by(col("__pay"), struct(col("__ts"), col("__tie")))
        .as("__bpay"))
    // null-safe attach (like the final carry join): grouping put null
    // keys / the null-ts chunk in real groups, so a plain equi join
    // would orphan their boundaries
    val boundsR = bounds.select(
      (keys.map(c => col(c).as(s"__b_$c")) :+
        col("__chunk").as("__b_chunk") :+ col("__bpay")): _*)
    val boundsCond = (keys.map(c => col(c) <=> col(s"__b_$c")) :+
      (col("__chunk") <=> col("__b_chunk"))).reduce(_ && _)
    val chunks = tagged.select((keys.map(col) :+ col("__chunk")): _*)
      .distinct()
      .join(boundsR, boundsCond, "left")
      .select((keys.map(col) :+ col("__chunk") :+ col("__bpay")): _*)
    val wp = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunks.withColumn("__ppay",
        last(col("__bpay"), ignoreNulls = true).over(wp))
      .select((keys.map(col) :+ col("__chunk") :+ col("__ppay")): _*)

    // (4) combine: within-chunk match wins (it is never older than the
    // previous chunk's boundary), else the prefix carry. The join is
    // NULL-SAFE on every key and the chunk: window partitioning groups
    // null keys (and null-ts rows' null chunk) like GROUP BY does, so
    // a plain equi join would silently DROP those left rows that
    // asofJoin keeps (review finding); <=> restores row-for-row parity
    val carryR = carry.select(
      (keys.map(c => col(c).as(s"__r_$c")) :+
        col("__chunk").as("__r_chunk") :+ col("__ppay")): _*)
    val joinCond = (keys.map(c => col(c) <=> col(s"__r_$c")) :+
      (col("__chunk") <=> col("__r_chunk"))).reduce(_ && _)
    val matched = within.filter(col("__is_left") === 1)
      .join(carryR, joinCond, "left")
      .withColumn("__m", coalesce(col("__m"), col("__ppay")))
    val inTol = tolerance match {
      case Some(t) =>
        col("__m.__rts") >= col("__ts") - expr(s"INTERVAL $t")
      case None => lit(true)
    }
    val kept = matched.withColumn("__k",
      when(col("__m").isNotNull && inTol, col("__m")))
    kept.select(left.columns.map(col) ++
      payload.map(c => col(s"__k.$c").as(c)): _*)
  }

  /** Nearest-either-direction as-of: the single right row minimizing
    * |rightTs − leftTs| on the same keys, equal distances resolved
    * BACKWARD (the at-or-before row wins — "prefer what was already
    * known"); within each direction the usual tie rule applies
    * (backward: highest `tie`; forward: lowest). `tolerance` bounds
    * both directions. Adds a `matched_dir` column ('b'/'f', null when
    * unmatched) next to the payload.
    *
    * Same single hash exchange as [[asofJoin]] — BOTH carries run over
    * the one tagged union (two sorts of the same partitioning, no
    * second shuffle, still no join operator); distances compare as
    * exact long micros. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String],
                  tie: String,
                  tolerance: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofNearest needs at least one key column")
    val bad = payload.toSet.intersect(left.columns.toSet)
    require(bad.isEmpty, s"payload collides with left columns: $bad")
    require(!left.columns.contains("matched_dir"),
      "left already has a matched_dir column")
    val reserved = Set("__ts", "__tie", "__pay", "__is_left", "__b", "__f")
    val clash = reserved.intersect(left.columns.toSet)
    require(clash.isEmpty, s"left columns clash with helpers: $clash")

    val pay = struct(col(rightTs).as("__rts") +:
      payload.map(c => col(c).as(c)): _*)
    val r = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ts"), col(tie).as("__tie"),
      pay.as("__pay"), lit(0).as("__is_left")): _*)
    val payType = r.schema("__pay").dataType
    val tieType = r.schema("__tie").dataType
    val l = left.select(left.columns.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"), lit(1).as("__is_left")): _*)
    val part = Window.partitionBy(keys.map(col): _*)
    val wB = part.orderBy(col("__ts").asc, col("__is_left"),
        col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part.orderBy(col("__ts").desc, col("__is_left"),
        col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = l.unionByName(r.select(l.columns.map(c =>
        if (r.columns.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)): _*))
      .withColumn("__b", last(col("__pay"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__pay"), ignoreNulls = true).over(wF))
      .filter(col("__is_left") === 1)
    def void(c: Column, dist: Column): Column = tolerance.fold(c) { t =>
      when(dist <= unix_micros(col("__ts") + expr(s"INTERVAL $t")) -
        unix_micros(col("__ts")), c)
    }
    val distB = unix_micros(col("__ts")) - unix_micros(col("__b.__rts"))
    val distF = unix_micros(col("__f.__rts")) - unix_micros(col("__ts"))
    val chosen = u
      .withColumn("__bk", void(col("__b"), distB))
      .withColumn("__fk", void(col("__f"), distF))
      .withColumn("__k",
        when(col("__bk").isNull, col("__fk"))
          .when(col("__fk").isNull, col("__bk"))
          .when(unix_micros(col("__ts")) -
              unix_micros(col("__bk.__rts")) <=
            unix_micros(col("__fk.__rts")) - unix_micros(col("__ts")),
            col("__bk"))
          .otherwise(col("__fk")))
      .withColumn("matched_dir",
        when(col("__k").isNull, lit(null).cast("string"))
          .when(unix_micros(col("__k.__rts")) <= unix_micros(col("__ts")),
            lit("b"))
          .otherwise(lit("f")))
    chosen.select(left.columns.map(col) ++
      payload.map(c => col(s"__k.$c").as(c)) :+ col("matched_dir"): _*)
  }

  /** Ordered-sequence (funnel) analysis: per key, the timestamp at
    * which each stage of `stages` first completes, where stage k must
    * happen STRICTLY after stage k-1 ("signup, then a view after the
    * signup, then a purchase after that view"). Returns one row per
    * key: `stage<k>_ts` per stage (null once the chain breaks — a
    * non-null stage k implies all earlier stages are non-null) plus
    * `stages_reached`.
    *
    * Shape: ONE hash exchange on the key. Stage k's candidates are
    * found with a running `min(stage k-1 time so far)` window over the
    * per-key time sort — all k windows share the one partitioning and
    * sort, and the final per-key aggregate reuses it too, so cost is a
    * single shuffle + sort of the event log regardless of stage count,
    * the same bill as one `groupBy(key)`. Same-timestamp events never
    * count as "after" (strict comparison), which also makes the result
    * independent of sort-tie order — no tiebreak column needed.
    * Repeated stage names ("purchase, then another purchase") work:
    * the strict inequality walks forward through equal types. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val reserved = events.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty, s"event columns clash with helpers: ${reserved.toSeq}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    for (k <- stages.indices) {
      val cand =
        if (k == 0) when(col(typeCol) === stages(0), col(tsCol))
        else when(col(typeCol) === stages(k) &&
          col(s"__run_${k - 1}") < col(tsCol), col(tsCol))
      df = df.withColumn(s"__cand_$k", cand)
        .withColumn(s"__run_$k", min(col(s"__cand_$k")).over(w))
    }
    val aggs = stages.indices.map(k =>
      min(col(s"__cand_$k")).as(s"stage${k}_ts"))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .withColumn("stages_reached",
        stages.indices.map(k =>
          when(col(s"stage${k}_ts").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
  }

  /** First-order transition matrix over per-key event sequences — the
    * Markov summary of a behavior log (what follows what, how often):
    * consecutive (prev, next) pairs in each key's chronological order,
    * counted corpus-wide, with the row-normalized transition
    * probability. The sequence-analytics companion to [[funnel]]
    * (funnel asks "did the chain complete", this asks "what do chains
    * look like") and the statistics a synthetic-behavior generator or
    * next-event baseline model is fit from. Ties order by `tieCol`, so
    * pairs are total-order deterministic; probabilities divide exact
    * integer counts and round to 6 for export.
    *
    * Scale shape: one hash exchange on the key for the lag window, one
    * aggregate-sized (prev, next) count; row totals are one window sum
    * OVER that aggregate frame (the state space is |event types|²,
    * never row count), so the corpus is read and shuffled exactly
    * once. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    // row totals as a window over the ALREADY-aggregated frame
    // (|event types|² rows), not a groupBy + join back: the latter
    // duplicates the scan+lag lineage in the plan and only AQE stage
    // reuse saves it — this form reads the corpus exactly once
    // unconditionally (review finding)
    pairs
      .withColumn("prob", round(col("n_transitions").cast("double") /
        sum(col("n_transitions"))
          .over(Window.partitionBy(col("prev_type"))).cast("double"), 6))
  }

  /** Future-activity labels — the supervised LABEL builder next to the
    * t106/t109 feature builders: for every event, whether its key has
    * another event within `horizonSeconds` after it (in the (ts, tie)
    * total order) — the retention label of a churn model, the
    * will-it-convert label of a propensity model. One lead() over the
    * per-key order: the next event is the earliest follower, so
    * "next within horizon" IS "any within horizon". Label arithmetic
    * runs on floored epoch seconds (deterministic cross-engine; the
    * t106 export discipline) while ORDERING keeps full timestamp
    * precision with `tieCol` ties. Keys' last events label false —
    * exactly the right-censoring a downstream trainer must window away
    * (the caller drops the trailing horizon; this op doesn't guess the
    * observation end). */
  def futureEventLabel(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, horizonSeconds: Long): DataFrame = {
    require(horizonSeconds >= 0, "horizonSeconds must be >= 0")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val sec = unix_timestamp(col(tsCol))
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__next", lead(sec, 1).over(w))
      .select(col(keyCol), col(tieCol), sec.as("ts_epoch"),
        (col("__next").isNotNull &&
          col("__next") - sec <= horizonSeconds).as("label"))
  }

  /** Next-event training examples — the supervised dataset a next-action
    * model actually consumes, built from [[keyedSequences]]: for every
    * position k ≥ 2 of a key's (last-N) sequence, one example with
    * `prefix` = the values before k (in order, '>'-joined) and `label` =
    * the value at k. The prefix string is the portable encoding both
    * engines build identically from the same total order; a trainer
    * splits it back or hashes it as a feature. Examples per key ≤
    * maxLen − 1 — the long-history bound [[keyedSequences]] already
    * pays for.
    *
    * Scale shape: keyedSequences' one exchange, plus one more ordered
    * window over the SAME key partitioning for the running prefix —
    * no additional shuffle. */
  def nextEventExamples(events: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, tieCol: String,
                        maxLen: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyedSequences(events, keyCol, tsCol, valueCol, tieCol, maxLen)
      .withColumn("prefix", concat_ws(">", collect_list(col("value")).over(w)))
      .filter(col("pos") >= 2)
      .select(col(keyCol), col("pos"), col("prefix"),
        col("value").as("label"))
  }

  /** Per-key chronological behavior sequences — the training-example
    * construction for sequence models over event logs (recommendation /
    * next-action pretraining): each key's LAST `maxLen` events as
    * ordered (pos, value, ts, gap_seconds) rows, pos 1 = oldest kept,
    * gap = seconds since the previous KEPT event (null at pos 1). Ties
    * order by `tieCol` so the sequence is total-order deterministic.
    *
    * Scale shape: one hash exchange on the key; the recency cut is a
    * DESC row_number that plans as a map-side WindowGroupLimit (only
    * ~maxLen rows per key per partition cross the exchange), and pos +
    * gap are windows over the SAME partitioning — no second shuffle.
    * The long-history user costs maxLen rows downstream no matter how
    * many events they have. */
  /** Exact floor division of a long-micros column by a positive long
    * width, staying in integer arithmetic end to end: `a - pmod(a, w)`
    * is exactly divisible by `w`, and `div` is the integral divide.
    * The obvious `floor(a / w)` routes through DOUBLE division, which
    * is floor-exact only while |a| < 2^53 (~year 2255 in micros) — a
    * far-future timestamp could mis-bucket at a boundary and silently
    * drop a qualifying pair (round-13 ADVICE). */
  private[graft] def floorDivMicros(a: Column, w: Long): Column =
    call_function("div", a - pmod(a, lit(w)), lit(w))

  /** Point-in-interval range join: every (`points` row, `intervals` row)
    * pair where `startTs <= pointTs <= endTs` (inclusive both ends) and
    * the optional `keys` columns are equal — event-in-session,
    * trade-in-outage-window, price-validity enrichment. This is the
    * MANY-match sibling of [[asofJoin]] (which picks ONE nearest row):
    * the output carries every overlapping interval.
    *
    * Why it exists: Spark plans the naive theta form
    * (`p.ts BETWEEN i.s AND i.e`, no equi key) as
    * BroadcastNestedLoopJoin — |P|·|I| comparisons, a scale killer the
    * moment the interval side outgrows a broadcast. This form
    * manufactures an equi key instead (the standard binned range join):
    * each point hashes to ONE `bucketSeconds`-wide time bucket, each
    * interval explodes to the buckets it touches, and a shuffled
    * equi-join on (keys, bucket) + the exact BETWEEN filter finds every
    * pair. A point lives in exactly one bucket, so a qualifying pair
    * appears exactly once — no post-join dedup. Cost: one explode
    * (ceil(len/width)+1 rows per interval, loud-guarded below), one
    * hash shuffle each side, candidate volume = pairs sharing a bucket
    * — tune `bucketSeconds` toward the typical interval length so most
    * intervals explode to ~2 rows and buckets stay slim.
    *
    * SQL comparison semantics throughout (the inner-join oracle's):
    * null point/start/end timestamps and empty intervals (end < start)
    * simply match nothing — the null bucket never equi-joins and
    * `sequence` over a negative span is empty. An interval spanning
    * more than `maxBucketsPerInterval` buckets fails LOUD instead of
    * silently exploding the shuffle (an open-ended "interval" — a
    * sentinel 9999-12-31 end — is a modeling bug this surfaces, not a
    * row to absorb).
    *
    * Output: all `points` columns, then all `intervals` columns except
    * the shared `keys` (kept once, from the point side). Non-key column
    * names must not collide — alias on the way in. */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
                        pointTs: String, startTs: String, endTs: String,
                        bucketSeconds: Long, keys: Seq[String] = Nil,
                        maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    val clash = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(clash.isEmpty,
      s"non-key columns shared by both sides: $clash — alias them first")
    val reserved = Set("__rjb")
    require(!(points.columns ++ intervals.columns).exists(reserved),
      "__rjb is reserved by rangeJoinBucketed")

    val w = bucketSeconds * 1000000L // micros; bucket ids stay exact longs
    val p = points.withColumn("__rjb",
      floorDivMicros(unix_micros(col(pointTs)), w))
    val b0 = floorDivMicros(unix_micros(col(startTs)), w)
    val b1 = floorDivMicros(unix_micros(col(endTs)), w)
    val guardedB1 = when(b1 - b0 >= lit(maxBucketsPerInterval.toLong),
        raise_error(concat(
          lit(s"rangeJoinBucketed: an interval spans more than " +
            s"$maxBucketsPerInterval buckets of $bucketSeconds s — " +
            "widen bucketSeconds or fix the interval; start="),
          col(startTs).cast("string"), lit(" end="),
          col(endTs).cast("string"))))
      .otherwise(b1)
    // sequence(a, b) with b < a DESCENDS (step -1) rather than being
    // empty — an end-before-start interval must explode to nothing,
    // so gate the sequence; null gates/bounds explode to no rows too
    val iv = intervals.withColumn("__rjb",
      explode(when(b1 >= b0, sequence(b0, guardedB1))))
    p.join(iv, keys :+ "__rjb",  "inner")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .select((points.columns.map(col) ++
        intervals.columns.filterNot(keys.contains).map(col)): _*)
  }

  /** Interval-overlap join: every (`left` row, `right` row) pair whose
    * closed intervals [ls, le] and [rs, re] OVERLAP (`ls <= re AND
    * rs <= le`) with the optional `keys` equal — session × outage,
    * shift × incident, stay × promotion-window. The interval × interval
    * generalization of [[rangeJoinBucketed]] (a point is a zero-length
    * interval).
    *
    * Same binned construction — both sides explode to the buckets they
    * touch and equi-join on (keys, bucket) — plus the FIRST-COMMON-
    * BUCKET rule instead of a post-join dedup: two overlapping
    * intervals share every bucket their intersection touches, so the
    * pair is kept only in the bucket where the later one starts,
    * `greatest(floor(ls/w), floor(rs/w))` — exactly one surviving copy
    * per qualifying pair, no distinct over an exploded result. Cost and
    * guards are [[rangeJoinBucketed]]'s: ceil(len/width)+1 rows per
    * interval per side (loud at `maxBucketsPerInterval`), one hash
    * shuffle each side, candidate volume = co-bucketed pairs. Null
    * bounds and empty (end < start) intervals match nothing — the
    * inner-join oracle's comparison semantics.
    *
    * Output: all `left` columns, then all `right` columns except the
    * shared `keys`. Non-key names must not collide — alias on the way
    * in. */
  def intervalJoinBucketed(left: DataFrame, right: DataFrame,
                           leftStart: String, leftEnd: String,
                           rightStart: String, rightEnd: String,
                           bucketSeconds: Long, keys: Seq[String] = Nil,
                           maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    val clash = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(clash.isEmpty,
      s"non-key columns shared by both sides: $clash — alias them first")
    // __ijs_r included: the right side's __ijs is RENAMED to it below,
    // so an input column already named __ijs_r would slip past a
    // two-name guard and ambiguate the greatest() (round-13 ADVICE)
    val reserved = Set("__ijb", "__ijs", "__ijs_r")
    require(!(left.columns ++ right.columns)
        .exists(c => reserved.contains(c)),
      "__ijb/__ijs/__ijs_r are reserved by intervalJoinBucketed")

    val w = bucketSeconds * 1000000L
    def explodeSide(df: DataFrame, startC: String, endC: String) = {
      val b0 = floorDivMicros(unix_micros(col(startC)), w)
      val b1 = floorDivMicros(unix_micros(col(endC)), w)
      val guardedB1 = when(b1 - b0 >= lit(maxBucketsPerInterval.toLong),
          raise_error(concat(
            lit(s"intervalJoinBucketed: an interval spans more than " +
              s"$maxBucketsPerInterval buckets of $bucketSeconds s — " +
              "widen bucketSeconds or fix the interval; start="),
            col(startC).cast("string"), lit(" end="),
            col(endC).cast("string"))))
        .otherwise(b1)
      // gate on b1 >= b0: sequence() DESCENDS for inverted bounds
      // (the rangeJoinBucketed lesson), and null gates explode to no rows
      df.withColumn("__ijs", b0)
        .withColumn("__ijb", explode(when(b1 >= b0,
          sequence(col("__ijs"), guardedB1))))
    }
    val l = explodeSide(left, leftStart, leftEnd)
    val r = explodeSide(right, rightStart, rightEnd)
      .withColumnRenamed("__ijs", "__ijs_r")
    l.join(r, keys :+ "__ijb", "inner")
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        // first-common-bucket: keep the pair only where the LATER
        // interval starts — each qualifying pair survives exactly once
        col("__ijb") === greatest(col("__ijs"), col("__ijs_r")))
      .select((left.columns.map(col) ++
        right.columns.filterNot(keys.contains).map(col)): _*)
  }

  def keyedSequences(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, tieCol: String,
                     maxLen: Int): DataFrame = {
    require(maxLen >= 1, "maxLen must be >= 1")
    val recency = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val forward = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val sec = unix_timestamp(col(tsCol))
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__rn", row_number().over(recency))
      .filter(col("__rn") <= maxLen)
      .withColumn("pos", row_number().over(forward))
      .withColumn("gap_seconds", sec - lag(sec, 1).over(forward))
      .select(col(keyCol), col("pos").cast("long").as("pos"),
        col(valueCol).as("value"), sec.as("ts_epoch"),
        col("gap_seconds"))
  }
}
