package graft

import org.apache.spark.sql.functions._
import graft.etl.Merge

/** Specs for the relational core: merge/upsert/map-update semantics
  * (SURVEY §2.1 O3-O7) including the reference's tricky cases — guard rows
  * on delete, conditional update, untouched-row preservation. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("insertIfAbsent appends only new keys, never duplicates") {
    val incoming = Seq((2L, "B2", 99.0), (4L, "d", 40.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val out = Merge.insertIfAbsent(target, incoming, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // existing row 2 untouched
    assert(out(1).getString(1) == "b")
  }

  test("mergeUpsert: matched updates, unmatched inserts, rest untouched") {
    val source = Seq((2L, "b", 200.0), (5L, "e", 50.0)).toDF("k", "name", "v")
    val out = Merge.mergeUpsert(target, source, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 10.0), (2L, 200.0), (3L, 30.0), (5L, 50.0)))
  }

  test("mergeUpsert honors conditional update clause") {
    val source = Seq((2L, "b", 20.0), (3L, "c", 300.0)).toDF("k", "name", "v")
    val out = Merge.mergeUpsert(target, source, Seq("k"), Seq("v"),
        updateCondition = Some(col("t.v") =!= col("s.v")))
      .orderBy("k").collect()
    // k=2 equal values -> no update path taken; k=3 differs -> updated
    assert(out.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 10.0), (2L, 20.0), (3L, 300.0)))
  }

  test("mergeUpsert deleteNotMatched removes target-only rows except guard") {
    val source = Seq((2L, "b", 200.0)).toDF("k", "name", "v")
    val out = Merge.mergeUpsert(target, source, Seq("k"), Seq("v"),
        deleteNotMatched = true, deleteGuard = Some(col("t.k") === 1))
      .orderBy("k").collect()
    // 1 kept by guard, 2 matched+updated, 3 deleted
    assert(out.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 10.0), (2L, 200.0)))
  }

  test("mergeUpsert is idempotent") {
    val source = Seq((2L, "b", 200.0), (5L, "e", 50.0)).toDF("k", "name", "v")
    val once = Merge.mergeUpsert(target, source, Seq("k"), Seq("v"))
    val twice = Merge.mergeUpsert(once, source, Seq("k"), Seq("v"))
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("mapUpdate maps only guarded rows and preserves everything else") {
    val fact = Seq((1L, 100L, 0L), (2L, 200L, 0L), (3L, 100L, 7L))
      .toDF("id", "fk", "mapped")
    val mapping = Seq((100L, 111L)).toDF("mk", "mv")
    val out = Merge.mapUpdate(fact, mapping, Seq(col("fk") === col("mk")),
        Map("mapped" -> col("mv")), guard = col("mapped") === 0)
      .orderBy("id").collect()
    // id=1: unmapped+match -> 111; id=2: unmapped+no match -> stays 0;
    // id=3: already mapped -> guard false, stays 7 even though match exists
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 111L), (2L, 0L), (3L, 7L)))
  }

  test("mapUpdate preserves row count (no join fan-out on unique mapping)") {
    val fact = spark.range(100).select(col("id"), (col("id") % 10).as("fk"),
      lit(0L).as("mapped"))
    val mapping = spark.range(10).select(col("id").as("mk"),
      (col("id") + 1000).as("mv"))
    val out = Merge.mapUpdate(fact, mapping, Seq(col("fk") === col("mk")),
      Map("mapped" -> col("mv")), guard = lit(true))
    assert(out.count() == 100)
  }

  test("pickLatest keeps exactly one row per key by order") {
    val df = Seq((1L, "2024-01-01", "old"), (1L, "2024-02-01", "new"),
      (2L, "2024-01-15", "only")).toDF("k", "d", "tag")
    val out = Merge.pickLatest(df, Seq(col("k")), Seq(col("d").desc))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("new", "only"))
  }

  test("rankPick keeps ties like T-SQL RANK") {
    val df = Seq((1L, 10, "a"), (1L, 10, "b"), (1L, 20, "c"))
      .toDF("k", "prio", "tag")
    val out = Merge.rankPick(df, Seq(col("k")), col("prio"))
    assert(out.count() == 2) // both prio-10 rows survive
  }

  test("modePerGroup picks most frequent, ties by value asc") {
    val df = Seq(("b1", "x"), ("b1", "x"), ("b1", "y"),
      ("b2", "p"), ("b2", "q")).toDF("brand", "t")
    val out = Merge.modePerGroup(df, "brand", "t").orderBy("brand").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "p"))
  }

  test("sequenceKeys: contiguous keys from offset in given order") {
    val df = Seq("c", "a", "b").toDF("n")
    val out = Merge.sequenceKeys(df, Seq(col("n")), "k", 100L)
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(1), r.getString(0))).toSeq ==
      Seq((101L, "a"), (102L, "b"), (103L, "c")))
  }

  test("sequenceKeysScalable: dense unique keys from offset, no global sort") {
    val out = Merge.sequenceKeysScalable(
      spark.range(1000).repartition(7).toDF("id"), "k", 500L)
    val keys = out.select("k").as[Long].collect().sorted
    assert(keys.toSeq == (501L to 1500L))
  }

  test("sequenceKeysOrdered: byte-identical keys to the global-window " +
      "form on unique ord, with NO single-partition exchange in the plan") {
    // multi-partition input with names deliberately scattered across
    // partitions, so key assignment genuinely depends on the range
    // repartition + base-offset math, not input luck
    val df = spark.range(500).repartition(7)
      .select(concat(lit("name_"),
        lpad(col("id").cast("string"), 4, "0")).as("n"))
    val ordered = Merge.sequenceKeysOrdered(df, Seq(col("n")), "k", 100L)
      .select("n", "k")
    val global = Merge.sequenceKeys(df, Seq(col("n")), "k", 100L)
      .select("n", "k")
    assert(ordered.exceptAll(global).isEmpty &&
      global.exceptAll(ordered).isEmpty,
      "ordered sequencing diverged from the reference global window")
    // scale posture: the whole point — no task ever sorts the world
    ordered.count()
    val p = ordered.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in sequenceKeysOrdered plan:\n${p.take(2000)}")
  }

  /** The q19 misuse guard: `Merge.sequenceKeys` (the literal global-
    * window form, a single-partition sort by construction) exists ONLY
    * to pin the reference's S4:65 semantics in the q19 oracle and to
    * anchor the ordered form's equivalence test above. Any NEW caller
    * is a scale regression waiting to ship — this lint fails the build
    * the moment one appears, so the reference-semantics form cannot
    * quietly leak into a pipeline. */
  test("lint: sequenceKeys (global-window form) has no callers outside " +
      "its q19 oracle home and its own definition/equivalence test") {
    val allowed = Set(
      "src/main/scala/graft/etl/Merge.scala", // the definition
      "src/main/scala/graft/CoreQueries.scala") // q19, reference semantics
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"lint expects to run from the repo root, cwd=${
        System.getProperty("user.dir")}")
    val call = java.util.regex.Pattern.compile(
      "sequenceKeys\\s*\\(") // NOT ...Ordered( / ...Scalable(
    val walk = java.nio.file.Files.walk(root)
    val offenders =
      try walk.filter(p => p.toString.endsWith(".scala"))
        .filter(p => !allowed(p.toString))
        .filter { p =>
          val src = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          call.matcher(src).find()
        }
        .map[String](_.toString)
        .toArray.toSeq
      finally walk.close()
    assert(offenders.isEmpty,
      s"sequenceKeys (single-partition window) called outside its " +
        s"allowed homes — use sequenceKeysOrdered/Scalable: $offenders")
  }
}
