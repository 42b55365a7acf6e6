package graft

import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** As-of join semantics (backward/forward, ties, tolerance, outer
  * nulls), equivalence with the interval-join attribution on real
  * events, and the no-join plan shape the operator exists for. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def leftDf = Seq(
    ("A", "2024-01-01 00:00:10", 100L),
    ("A", "2024-01-01 00:00:05", 101L),
    ("A", "2024-01-01 00:00:03", 102L),
    ("B", "2024-01-01 00:00:10", 103L),
    ("C", "2024-01-01 00:00:10", 104L)
  ).toDF("k", "lts", "lid")
    .select(col("k"), to_timestamp(col("lts")).as("lts"), col("lid"))

  private def rightDf = Seq(
    ("A", "2024-01-01 00:00:05", 1L, 10.0),
    ("A", "2024-01-01 00:00:05", 2L, 20.0),
    ("A", "2024-01-01 00:00:07", 3L, 30.0),
    ("B", "2024-01-01 00:00:30", 4L, 40.0)
  ).toDF("k", "rts", "rid", "v")
    .select(col("k"), to_timestamp(col("rts")).as("rts"),
      col("rid"), col("v"))

  private def matchOf(out: Array[org.apache.spark.sql.Row]): Map[Long, Option[Long]] =
    out.map(r => r.getAs[Long]("lid") ->
      Option(r.getAs[java.lang.Long]("rid")).map(_.toLong)).toMap

  test("asofJoinChunked == asofJoin row-for-row: hand fixture at a " +
      "chunk size that splits it, the real event log (uniform AND " +
      "80/20-skewed), tie-heavy equal timestamps, and tolerance") {
    def same(a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame, label: String): Unit =
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, label)
    // hand fixture with 2-second chunks: rows straddle boundaries and
    // the equal-ts pair (rid 1/2 at :05) shares a chunk by definition
    same(
      Temporal.asofJoinChunked(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rid", "v"), tie = "rid", chunkSeconds = 2L),
      Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rid", "v"), tie = "rid"),
      "hand fixture, 2s chunks")
    // tolerance voids identically (the match surfaces through the
    // boundary carry and must still void on distance)
    same(
      Temporal.asofJoinChunked(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rid"), tie = "rid", chunkSeconds = 2L,
        tolerance = Some("2 seconds")),
      Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
        payload = Seq("rid"), tie = "rid",
        tolerance = Some("2 seconds")),
      "hand fixture, 2s chunks + 2s tolerance")
    // the real event log, uniform and deliberately skewed (the x70s
    // harness: 80% of rows on user 0 — the input this variant exists
    // for), hourly chunks
    for ((ev, label) <- Seq(
        (graft.etl.Tables.events(spark, d), "uniform events"),
        (graft.DataQueries.skewedEvents(spark, d, copies = 2),
          "skewed events"))) {
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"), col("value").as("view_value"))
      same(
        Temporal.asofJoinChunked(purchases, views, Seq("user_id"), "ts",
          "view_ts", payload = Seq("view_id", "view_value"),
          tie = "view_id", chunkSeconds = 3600L),
        Temporal.asofJoin(purchases, views, Seq("user_id"), "ts",
          "view_ts", payload = Seq("view_id", "view_value"),
          tie = "view_id"),
        label)
    }
    // tie-heavy: many rights at ONE timestamp sitting exactly on a
    // chunk boundary — the boundary winner must be the max tie, and a
    // left row in the NEXT chunk must receive it
    val ties = (1L to 9L).map(i => ("K", "2024-01-01 00:00:04", i))
      .toDF("k", "rts", "rid")
      .select(col("k"), to_timestamp(col("rts")).as("rts"), col("rid"))
    val probe = Seq(("K", "2024-01-01 00:00:07", 1L))
      .toDF("k", "lts", "lid")
      .select(col("k"), to_timestamp(col("lts")).as("lts"), col("lid"))
    val got = Temporal.asofJoinChunked(probe, ties, Seq("k"), "lts",
        "rts", payload = Seq("rid"), tie = "rid", chunkSeconds = 2L)
      .collect()
    assert(got.length == 1 && got(0).getAs[Long]("rid") == 9L,
      "boundary carry must hand the NEXT chunk the max-tie winner")
    // null keys and null timestamps: window partitioning groups nulls
    // (GROUP BY semantics), so asofJoin KEEPS such left rows — the
    // chunked carry join is null-safe for exactly this parity (review
    // finding: a plain equi join silently dropped them)
    val nl = Seq((null.asInstanceOf[String], "2024-01-01 00:00:10", 1L),
        ("A", null.asInstanceOf[String], 2L),
        ("A", "2024-01-01 00:00:10", 3L))
      .toDF("k", "lts", "lid")
      .select(col("k"), to_timestamp(col("lts")).as("lts"), col("lid"))
    val nr = Seq((null.asInstanceOf[String], "2024-01-01 00:00:05", 7L),
        ("A", "2024-01-01 00:00:05", 8L))
      .toDF("k", "rts", "rid")
      .select(col("k"), to_timestamp(col("rts")).as("rts"), col("rid"))
    same(
      Temporal.asofJoinChunked(nl, nr, Seq("k"), "lts", "rts",
        payload = Seq("rid"), tie = "rid", chunkSeconds = 2L),
      Temporal.asofJoin(nl, nr, Seq("k"), "lts", "rts",
        payload = Seq("rid"), tie = "rid"),
      "null keys / null timestamps")
  }

  test("backward: latest prior wins, equal-ts visible, ties take the " +
      "highest tie, unmatched rows survive with nulls") {
    val out = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts",
      payload = Seq("rid", "v"), tie = "rid").collect()
    assert(out.length == leftDf.count())
    val m = matchOf(out)
    assert(m(100L).contains(3L), "lts=10: latest prior is rts=7")
    assert(m(101L).contains(2L), "lts=5: equal-ts tie -> highest rid")
    assert(m(102L).isEmpty, "lts=3: nothing at or before")
    assert(m(103L).isEmpty, "B's only right row is later")
    assert(m(104L).isEmpty, "C has no right rows at all")
    val v100 = out.find(_.getAs[Long]("lid") == 100L).get.getAs[Double]("v")
    assert(v100 == 30.0, "payload columns ride along with the match")
  }

  test("backward tolerance: a match farther than the interval is voided") {
    val m = matchOf(Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts",
      "rts", payload = Seq("rid", "v"), tie = "rid",
      tolerance = Some("2 seconds")).collect())
    assert(m(100L).isEmpty, "10 - 7 = 3s > 2s tolerance")
    assert(m(101L).contains(2L), "0s away stays matched")
  }

  test("per-row toleranceCol: each left row's own grace decides, null " +
      "grace voids, negative grace voids, constant column == constant " +
      "interval, mutually exclusive with tolerance") {
    // lid 100 sits 3s from its match (rts=7), lid 101 0s from rts=5:
    // give 100 a 2s budget (voids) and 101 a 10s budget (keeps)
    def graced(g: org.apache.spark.sql.Column) =
      Temporal.asofJoin(leftDf.withColumn("grace_s", g), rightDf,
        Seq("k"), "lts", "rts", payload = Seq("rid", "v"),
        tie = "rid", toleranceCol = Some("grace_s"))
    val perRow = matchOf(graced(when(col("lid") === 100L, 2L)
      .otherwise(10L)).collect())
    assert(perRow(100L).isEmpty, "3s away, 2s budget: voided")
    assert(perRow(101L).contains(2L), "0s away, 10s budget: kept")
    // null grace = no budget defined = no enrichment
    val nullG = matchOf(graced(when(col("lid") === 101L,
      lit(null).cast("long")).otherwise(10L)).collect())
    assert(nullG(101L).isEmpty, "null grace voids")
    assert(nullG(100L).contains(3L), "others keep their budget")
    // negative grace voids even the 0-distance match
    assert(matchOf(graced(lit(-1L)).collect())(101L).isEmpty)
    // a huge grace (an "unbounded" sentinel) saturates instead of
    // wrapping negative under the µs scaling
    val unbounded = matchOf(graced(lit(Long.MaxValue)).collect())
    assert(unbounded(100L).contains(3L) && unbounded(101L).contains(2L),
      "Long.MaxValue grace must keep every in-order match")
    // a constant column reproduces the constant interval exactly
    val asCol = matchOf(graced(lit(2L)).collect())
    val asInterval = matchOf(Temporal.asofJoin(leftDf, rightDf,
      Seq("k"), "lts", "rts", payload = Seq("rid", "v"), tie = "rid",
      tolerance = Some("2 seconds")).collect())
    assert(asCol === asInterval)
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(leftDf.withColumn("grace_s", lit(1L)), rightDf,
        Seq("k"), "lts", "rts", payload = Seq("rid", "v"), tie = "rid",
        tolerance = Some("1 hour"), toleranceCol = Some("grace_s"))
    }
  }

  test("forward: earliest subsequent wins, ties take the LOWEST tie, " +
      "tolerance voids far matches") {
    val m = matchOf(Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts",
      "rts", payload = Seq("rid", "v"), tie = "rid",
      forward = true).collect())
    assert(m(102L).contains(1L), "lts=3 -> earliest at rts=5, lowest rid")
    assert(m(101L).contains(1L), "equal ts counts as subsequent")
    assert(m(100L).isEmpty, "nothing at or after lts=10 for A")
    assert(m(103L).contains(4L), "B matches its rts=30 row")
    val tol = matchOf(Temporal.asofJoin(leftDf, rightDf, Seq("k"), "lts",
      "rts", payload = Seq("rid", "v"), tie = "rid", forward = true,
      tolerance = Some("10 seconds")).collect())
    assert(tol(103L).isEmpty, "30 - 10 = 20s > 10s tolerance")
    assert(tol(102L).contains(1L), "2s away stays matched")
  }

  test("asofJoin with 1h tolerance reproduces the interval-join " +
      "attribution (t21) on real events") {
    val ev = graft.etl.Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val asof = Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts",
        "click_ts", payload = Seq("click_id", "click_ts"),
        tie = "click_id", tolerance = Some("1 hour"))
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        col("click_id").as("attributed_click"),
        unix_micros(col("click_ts")).as("click_us"))
      .collect().toSet
    val interval = DataQueries.t21AttributionOuter(spark, d)
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("attributed_click"), col("click_us"))
      .collect().toSet
    assert(asof == interval,
      s"asof=${asof.size} rows, interval=${interval.size} rows; " +
        s"diff=${(asof diff interval).take(3)} / ${(interval diff asof).take(3)}")
  }

  test("asofNearest: strictly-nearer side wins, equal distance goes " +
      "backward, per-direction tie rules hold, tolerance voids, plan " +
      "stays join-free on one exchange") {
    val l = Seq(("A", "2024-01-01 00:00:10", 100L),
      ("A", "2024-01-01 00:00:05", 101L),
      ("A", "2024-01-01 00:00:03", 102L),
      ("B", "2024-01-01 00:00:10", 103L),
      ("C", "2024-01-01 00:00:10", 104L)
    ).toDF("k", "lts", "lid")
      .select(col("k"), to_timestamp(col("lts")).as("lts"), col("lid"))
    val r = Seq(("A", "2024-01-01 00:00:05", 1L),
      ("A", "2024-01-01 00:00:05", 2L),
      ("A", "2024-01-01 00:00:12", 3L),
      ("B", "2024-01-01 00:00:30", 4L)
    ).toDF("k", "rts", "rid")
      .select(col("k"), to_timestamp(col("rts")).as("rts"), col("rid"))
    def run(tol: Option[String]) = graft.ops.Temporal
      .asofNearest(l, r, Seq("k"), "lts", "rts", Seq("rid"), "rid", tol)
      .collect().map(row => row.getAs[Long]("lid") ->
        ((Option(row.getAs[java.lang.Long]("rid")).map(_.toLong),
          Option(row.getAs[String]("matched_dir"))))).toMap
    val m = run(None)
    assert(m(100L) === ((Some(3L), Some("f"))),
      "lts=10: forward 12 (d2) beats backward 5 (d5)")
    assert(m(101L) === ((Some(2L), Some("b"))),
      "lts=5: both directions at d0 -> backward wins with its " +
        "highest-id tie rule")
    assert(m(102L) === ((Some(1L), Some("f"))),
      "lts=3: forward ties at rts=5 take the LOWEST id")
    assert(m(103L) === ((Some(4L), Some("f"))))
    assert(m(104L) === ((None, None)), "no candidates -> nulls")
    val t = run(Some("10 seconds"))
    assert(t(103L) === ((None, None)), "20s away voided by 10s tolerance")
    assert(t(100L) === ((Some(3L), Some("f"))), "2s away survives")
    val plan = graft.ops.Temporal
      .asofNearest(l, r, Seq("k"), "lts", "rts", Seq("rid"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1200))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"both carries must share ONE exchange, " +
      s"got $hashEx:\n${plan.take(1200)}")
  }

  test("t70 plan: NO join operator — one tagged union, ONE hash " +
      "exchange, a running window") {
    val p = SparkEntry.queries("t70_asof_join")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n${p.take(1500)}")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx")
    assert(p.contains("Window"), p.take(1500))
  }

  test("funnel: strict ordering per stage, chain breaks stay broken, " +
      "same-ts never counts as after, repeated stages walk forward, " +
      "ONE exchange for any stage count") {
    import graft.ops.Temporal
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // u1: clean A(1) -> B(3) -> C(5)
      (1L, ts(1), "A"), (1L, ts(3), "B"), (1L, ts(5), "C"),
      // u2: B before A must NOT count; B after A missing -> chain breaks
      // at stage 1 even though a C exists later
      (2L, ts(1), "B"), (2L, ts(2), "A"), (2L, ts(6), "C"),
      // u3: B at the SAME ts as A is not "after"; the later B at 7 is
      (3L, ts(4), "A"), (3L, ts(4), "B"), (3L, ts(7), "B"), (3L, ts(9), "C"),
      // u4: no A at all -> no stages
      (4L, ts(2), "B"), (4L, ts(3), "C")
    ).toDF("uid", "t", "typ")
    val out = Temporal.funnel(ev, "uid", "t", "typ", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> (
        Option(r.getTimestamp(1)).map(_.getTime / 1000),
        Option(r.getTimestamp(2)).map(_.getTime / 1000),
        Option(r.getTimestamp(3)).map(_.getTime / 1000),
        r.getInt(4))).toMap
    assert(out(1L) === ((Some(1L), Some(3L), Some(5L), 3)))
    assert(out(2L) === ((Some(2L), None, None, 1)),
      "a stage-2 event before stage 1 must not complete the chain")
    assert(out(3L) === ((Some(4L), Some(7L), Some(9L), 3)),
      "same-ts is not after; the next strict B must be picked")
    assert(out(4L) === ((None, None, None, 0)))
    // repeated stages: A then another A strictly later
    val rep = Temporal.funnel(ev, "uid", "t", "typ", Seq("B", "B"))
      .collect().map(r => r.getLong(0) -> (
        Option(r.getTimestamp(1)).map(_.getTime / 1000),
        Option(r.getTimestamp(2)).map(_.getTime / 1000))).toMap
    assert(rep(3L) === ((Some(4L), Some(7L))),
      "a repeated stage must advance past the first occurrence")
    assert(rep(1L) === ((Some(3L), None)))
    // one hash exchange regardless of stage count: all windows and the
    // final aggregate share the key partitioning
    val p = Temporal.funnel(ev, "uid", "t", "typ", Seq("A", "B", "C"))
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx")
  }

  test("futureEventLabel: within-horizon follower labels true, gap " +
      "past horizon false, last event right-censors false, boundary " +
      "is inclusive") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, t(0), 1L, "a"), // next at +100 <= 100 -> true (boundary)
      (2L, t(100), 1L, "a"), // next at +101 > 100 -> false
      (3L, t(201), 1L, "a"), // last event -> false (censored)
      (4L, t(0), 2L, "a") // singleton -> false
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Temporal.futureEventLabel(ev, "user_id", "ts",
        "event_id", horizonSeconds = 100L)
      .orderBy("event_id").collect()
      .map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false),
      got.toString)
  }

  test("nextEventExamples: ordered prefixes with labels, pos-1 rows " +
      "emit no example, prefixes cover only the KEPT window") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1 has 4 events but maxLen 3: the oldest ("z") is cut, so
    // prefixes must start at "a" — a truncation-blind builder would
    // leak "z" into every prefix
    val ev = Seq(
      (1L, t(5), 1L, "z"), (2L, t(10), 1L, "a"),
      (3L, t(20), 1L, "b"), (4L, t(30), 1L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Temporal.nextEventExamples(ev, "user_id", "ts",
        "event_type", "event_id", maxLen = 3)
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq((2L, "a", "b"), (3L, "a>b", "c")),
      got.toSeq.toString)
  }

  test("transitionMatrix: hand-counted pairs, row-normalized probs, " +
      "same-ts ties chain by tieCol, no cross-key chaining") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: a -> b -> a; user 2: a -> b (same ts, id-ordered);
      // user 3: a -> c. No (user-1 last) -> (user-2 first) pair.
      (1L, t(10), 1L, "a"), (2L, t(20), 1L, "b"), (3L, t(30), 1L, "a"),
      (4L, t(30), 2L, "a"), (5L, t(30), 2L, "b"),
      (6L, t(1), 3L, "a"), (7L, t(2), 3L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Temporal.transitionMatrix(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("a", "b") -> (2L, 0.666667), ("a", "c") -> (1L, 0.333333),
      ("b", "a") -> (1L, 1.0)), got.toString)
  }

  test("keyedSequences: recency cut keeps the LAST maxLen, positions " +
      "re-rank oldest-first, gaps are between kept events only, ties " +
      "break by tieCol, null keys/ts drop") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: 4 events; maxLen 3 drops the OLDEST (id 10)
      (10L, t(100), java.lang.Long.valueOf(1L), "a"),
      (11L, t(200), java.lang.Long.valueOf(1L), "b"),
      (12L, t(260), java.lang.Long.valueOf(1L), "c"),
      (13L, t(500), java.lang.Long.valueOf(1L), "d"),
      // user 2: same-ts tie — higher event_id is MORE recent
      (20L, t(100), java.lang.Long.valueOf(2L), "x"),
      (21L, t(100), java.lang.Long.valueOf(2L), "y"),
      // dropped rows
      (30L, t(100), null.asInstanceOf[java.lang.Long], "n"),
      (31L, null.asInstanceOf[java.sql.Timestamp],
        java.lang.Long.valueOf(3L), "n")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.Temporal.keyedSequences(ev, "user_id", "ts",
        "event_type", "event_id", maxLen = 3)
      .orderBy("user_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, "b", -1L), // gap null at pos 1; event "a" cut
      (1L, 2L, "c", 60L),
      (1L, 3L, "d", 240L),
      (2L, 1L, "x", -1L), // tie: lower id is older -> pos 1
      (2L, 2L, "y", 0L)), out.toSeq.toString)
  }

  test("rangeJoinBucketed == naive theta join on real events (keyless " +
      "AND keyed), and the pair set is bucket-width-invariant") {
    val ev = graft.etl.Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("user_id").as("i_user"), col("ts").as("inc_start"),
        (col("ts") + expr("INTERVAL 2 hours")).as("inc_end"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("purchase_id", "error_id")
    val naive = purchases.join(incidents,
      col("ts") >= col("inc_start") && col("ts") <= col("inc_end"))
    val naiveKeyed = naive.filter(col("p_user") === col("i_user"))
    for (w <- Seq(60L, 1800L, 7200L, 86400L)) {
      val got = Temporal.rangeJoinBucketed(purchases, incidents,
        "ts", "inc_start", "inc_end", bucketSeconds = w)
      assert(pairs(got).exceptAll(pairs(naive)).isEmpty &&
        pairs(naive).exceptAll(pairs(got)).isEmpty,
        s"keyless pair-set mismatch at bucketSeconds=$w")
    }
    // keyed: the same-user restriction rides the equi key, not the filter
    val keyed = Temporal.rangeJoinBucketed(
      purchases.withColumnRenamed("p_user", "u"),
      incidents.withColumnRenamed("i_user", "u"),
      "ts", "inc_start", "inc_end", bucketSeconds = 3600L,
      keys = Seq("u"))
    assert(pairs(keyed).exceptAll(pairs(naiveKeyed)).isEmpty &&
      pairs(naiveKeyed).exceptAll(pairs(keyed)).isEmpty,
      "keyed pair-set mismatch")
  }

  test("intervalJoinBucketed == naive overlap join on real events " +
      "(keyless AND keyed), bucket-width-invariant, exactly one row " +
      "per qualifying pair") {
    val ev = graft.etl.Tables.events(spark, d)
    val sessions = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_start"),
        (col("ts") + expr("INTERVAL 20 minutes")).as("v_end"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("user_id").as("i_user"), col("ts").as("i_start"),
        (col("ts") + expr("INTERVAL 30 minutes")).as("i_end"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("view_id", "error_id")
    val naive = sessions.join(incidents,
      col("v_start") <= col("i_end") && col("i_start") <= col("v_end"))
    for (w <- Seq(60L, 1800L, 86400L)) {
      val got = Temporal.intervalJoinBucketed(sessions, incidents,
        "v_start", "v_end", "i_start", "i_end", bucketSeconds = w)
      // exceptAll both ways ALSO proves multiplicity 1 (a duplicated
      // pair would survive the diff against the naive single row)
      assert(pairs(got).exceptAll(pairs(naive)).isEmpty &&
        pairs(naive).exceptAll(pairs(got)).isEmpty,
        s"keyless pair-set mismatch at bucketSeconds=$w")
    }
    val naiveKeyed = naive.filter(col("v_user") === col("i_user"))
    val keyed = Temporal.intervalJoinBucketed(
      sessions.withColumnRenamed("v_user", "u"),
      incidents.withColumnRenamed("i_user", "u"),
      "v_start", "v_end", "i_start", "i_end",
      bucketSeconds = 3600L, keys = Seq("u"))
    assert(pairs(keyed).exceptAll(pairs(naiveKeyed)).isEmpty &&
      pairs(naiveKeyed).exceptAll(pairs(keyed)).isEmpty,
      "keyed pair-set mismatch")
  }

  test("intervalJoinBucketed edges: touching endpoints overlap, nesting " +
      "and identity count once, end-before-start and null bounds match " +
      "nothing, oversized interval fails loud") {
    val nullTs = lit(null).cast("timestamp")
    def mk(rows: Seq[(Long, String, String)], id: String, s0: String,
           e0: String) =
      rows.toDF(id, "s0", "e0")
        .select(col(id), to_timestamp(col("s0")).as(s0),
          to_timestamp(col("e0")).as(e0))
    val ls = mk(Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
      (2L, "2024-01-01 01:00:00", "2024-01-01 02:00:00"),
      (3L, "2024-01-01 03:00:00", "2024-01-01 02:30:00")), // end < start
      "lid", "ls", "le")
      .unionByName(Seq(4L).toDF("lid")
        .select(col("lid"), nullTs.as("ls"), nullTs.as("le")))
    val rs = mk(Seq(
      (10L, "2024-01-01 00:10:00", "2024-01-01 00:20:00"), // touches l1's end
      (11L, "2024-01-01 01:15:00", "2024-01-01 01:20:00"), // nested in l2
      (12L, "2024-01-01 01:00:00", "2024-01-01 02:00:00"), // identical to l2
      (13L, "2024-01-01 02:00:01", "2024-01-01 02:30:00")),// just past l2
      "rid", "rstart", "rend")
    val got = Temporal.intervalJoinBucketed(ls, rs, "ls", "le",
        "rstart", "rend", bucketSeconds = 7L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: each pair exactly once
    assert(got.sorted.toSeq ==
      Seq((1L, 10L), (2L, 11L), (2L, 12L)), got.mkString(","))
    val err = intercept[Exception] {
      Temporal.intervalJoinBucketed(ls,
        mk(Seq((20L, "2024-01-01 00:00:00", "2024-01-01 01:00:00")),
          "rid", "rstart", "rend"),
        "ls", "le", "rstart", "rend",
        bucketSeconds = 60L, maxBucketsPerInterval = 5).count()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    assert(chain(err).contains("intervalJoinBucketed"), chain(err).take(500))
  }

  test("rangeJoinBucketed edges: inclusive bounds, end-before-start and " +
      "null timestamps match nothing, null keys match nothing, and an " +
      "oversized interval fails loud") {
    val nullTs = lit(null).cast("timestamp")
    val pts = Seq((1L, "2024-01-01 00:00:10"), (2L, "2024-01-01 00:01:00"))
      .toDF("pid", "p").select(col("pid"), to_timestamp(col("p")).as("p"))
      .unionByName(Seq(3L).toDF("pid")
        .select(col("pid"), nullTs.as("p")))
    val ivs = Seq(
      (10L, "2024-01-01 00:00:10", "2024-01-01 00:00:10"), // point == both ends
      (11L, "2024-01-01 00:00:05", "2024-01-01 00:00:59"), // p1 only
      (12L, "2024-01-01 00:02:00", "2024-01-01 00:01:00"), // end < start
      (13L, "2024-01-01 00:01:00", "2024-01-01 00:01:30")  // p2 at start edge
    ).toDF("iid", "s0", "e0")
      .select(col("iid"), to_timestamp(col("s0")).as("s"),
        to_timestamp(col("e0")).as("e"))
      .unionByName(Seq(14L).toDF("iid")
        .select(col("iid"), nullTs.as("s"), nullTs.as("e")))
    val got = Temporal.rangeJoinBucketed(pts, ivs, "p", "s", "e",
        bucketSeconds = 7L) // width coprime to the data's second grid
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)), got.toString)
    // null keys never pair (SQL equi-join semantics)
    val kp = pts.withColumn("k",
      when(col("pid") === 1L, lit(null).cast("string")).otherwise(lit("a")))
    val ki = ivs.withColumn("k",
      when(col("iid").isin(10L, 11L), lit(null).cast("string"))
        .otherwise(lit("a")))
    val keyed = Temporal.rangeJoinBucketed(kp, ki, "p", "s", "e",
        bucketSeconds = 7L, keys = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(keyed == Set((2L, 13L)), keyed.toString)
    // an interval spanning more than maxBucketsPerInterval buckets is a
    // modeling bug (open-ended sentinel end) -> loud, not a silent explode
    val wide = Seq((20L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
      .toDF("iid", "s0", "e0")
      .select(col("iid"), to_timestamp(col("s0")).as("s"),
        to_timestamp(col("e0")).as("e"))
    val err = intercept[Exception] {
      Temporal.rangeJoinBucketed(pts, wide, "p", "s", "e",
        bucketSeconds = 60L, maxBucketsPerInterval = 5).count()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    assert(chain(err).contains("rangeJoinBucketed"), chain(err).take(500))
  }

  test("floorDivMicros is exact integer floor division: matches " +
      "Math.floorDiv beyond 2^53 micros (where floor(double/) rounds " +
      "wrong) and on pre-1970 negatives (where trunc-div rounds wrong)") {
    // adversarial values: 1-2 micros below a multiple of the 7 s bucket
    // width near year 9999 (|a| > 2^53) — double conversion rounds the
    // numerator UP across the multiple, so floor(a.toDouble / w) lands
    // one bucket high; and negatives, where integral `div` alone would
    // truncate toward zero instead of flooring
    val w = 7000000L
    val micros = Seq(
      253402300794999999L, 253402300794999998L, // double-floor off by +1
      253402300787999999L,                      // same pathology
      253402300795000000L,                      // exact multiple (control)
      -1L, -6999999L, -7000000L, -7000001L,     // pre-1970 floor vs trunc
      0L, 1L, 6999999L)                         // small controls
    val got = micros.toDF("a")
      .select(col("a"), Temporal.floorDivMicros(col("a"), w).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    micros.foreach { a =>
      assert(got(a) == Math.floorDiv(a, w),
        s"a=$a got=${got(a)} want=${Math.floorDiv(a, w)}")
    }
    // and at least one of the adversarial values genuinely breaks the
    // old double formulation — the reason this helper exists
    assert(math.floor(253402300794999999L.toDouble / w.toDouble).toLong !=
      Math.floorDiv(253402300794999999L, w))
  }
}
