package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.etl.Tables

/** Pins the egress writers' round-trip contract on adversarial values —
  * the q52/q53 oracles prove the HAPPY path (the q51 snapshot has no
  * newlines or empty strings); this spec pins the edges so the contract
  * is a tested fact, not an accident of fixture data:
  *  - JSON-lines round-trips everything exactly (nulls, empty strings,
  *    embedded commas/quotes/newlines);
  *  - CSV round-trips quoting/commas and nulls, but single-line-record
  *    CSV (kept for splittability — multiLine parsing cannot be split
  *    across executors) cannot carry embedded newlines, and the default
  *    null encoding reads empty strings back as null.
  * If either degradation ever silently changes (Spark default flip,
  * option added to the writers), these assertions flag it. */
class EgressSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def frame(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

  /** Null-tolerant: the corrupt records the CSV newline edge produces
    * carry null ids (mapped to -1), which is part of what gets asserted. */
  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().toSeq
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))

  test("JSON egress round-trips nulls, empties, commas, quotes and newlines") {
    val rows = Seq(
      Row(1L, "plain", 1.5),
      Row(2L, "comma, and \"quotes\"", null),
      Row(3L, "line1\nline2", 2.25),
      Row(4L, "", 3.0),
      Row(5L, null, 0.0625))
    val back = Tables.egressRoundTrip(spark, frame(rows), "json", "spec")
    assert(collect(back) == collect(frame(rows)))
  }

  test("CSV egress round-trips quoting and nulls; documents its two edges") {
    val safe = Seq(
      Row(1L, "plain", 1.5),
      Row(2L, "comma, and \"quotes\"", null),
      Row(5L, null, 0.0625))
    val back = Tables.egressRoundTrip(spark, frame(safe), "csv", "spec")
    assert(collect(back) == collect(frame(safe)))

    // documented edge 1: empty string reads back as null (default CSV
    // null encoding) — the reason q52-style snapshots use empty→NULL
    // normalized columns (Ops.emptyToNull) upstream
    val empty = Seq(Row(4L, "", 3.0))
    val backEmpty = Tables.egressRoundTrip(spark, frame(empty), "csv", "spec")
    assert(collect(backEmpty) == Seq((4L, None, Some(3.0))))

    // documented edge 2: embedded newlines do not survive single-line
    // CSV records — the quoted field is written but the reader splits
    // on the raw newline, yielding a corrupt extra record
    val nl = Seq(Row(3L, "line1\nline2", 2.25))
    val backNl = Tables.egressRoundTrip(spark, frame(nl), "csv", "spec")
    assert(collect(backNl) != Seq((3L, Some("line1\nline2"), Some(2.25))),
      "single-line CSV unexpectedly round-tripped a newline — revisit " +
        "the splittability note on Tables.csv if Spark's default changed")
  }
}
