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
}
