package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
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

  test("ORC egress round-trips everything the text formats cannot: " +
      "nulls, empties, newlines, typed doubles") {
    val rows = Seq(
      Row(1L, "plain", 1.5),
      Row(2L, "comma, and \"quotes\"", null),
      Row(3L, "line1\nline2", 2.25),
      Row(4L, "", 3.0),
      Row(5L, null, 0.0625))
    val back = Tables.egressRoundTrip(spark, frame(rows), "orc", "spec")
    assert(collect(back) == collect(frame(rows)),
      "typed columnar ORC must round-trip exactly — no text-format edges")
  }

  // ---- property sweep: generated adversarial strings -------------------
  // Same discipline as PropertySpec: ScalaCheck generators applied with
  // pinned seeds (no scalatestplus bridge in the offline dep set), so
  // the sweep is deterministic across runs while covering the string
  // space the hand-picked cases above cannot: quote runs, delimiter
  // soup, backslashes, tabs/CR, multibyte unicode (CJK, emoji through
  // surrogate pairs, combining accents), and empty-vs-null.

  /** Adversarial string characters, delimiter/escape-heavy on purpose. */
  private val advChar: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf(",", "\"", "\\", "'"),
    2 -> Gen.oneOf("\n", "\r", "\t"),
    2 -> Gen.const(" "),
    4 -> Gen.alphaNumStr.map(s => s.take(1)),
    // the second accent is the NFD combining form, written as an
    // explicit escape so an editor NFC-normalization can never
    // silently collapse it into the NFC "é" beside it
    2 -> Gen.oneOf("é", "ß", "日", "本", "🦄", "e\u0301", "∑", "|", ";"))

  private val advString: Gen[String] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, advChar).map(_.mkString))

  /** One generated row: id injected later; string nullable 1-in-8;
    * doubles are exact binary fractions so text formatting is lossless. */
  private val advCell: Gen[(Option[String], Option[Double])] = for {
    s <- Gen.frequency(7 -> advString.map(Option(_)), 1 -> Gen.const(None))
    v <- Gen.frequency(
      7 -> Gen.choose(-(1 << 20), 1 << 20).map(n => Some(n / 16.0)),
      1 -> Gen.const(None))
  } yield (s, v)

  private def advRows(seed: Long, n: Int): Seq[Row] =
    Gen.listOfN(n, advCell).pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case ((s, v), i) =>
        Row(i.toLong, s.orNull,
          v.map(java.lang.Double.valueOf).orNull)
      }

  test("property: JSON egress round-trips every generated adversarial frame") {
    for (seed <- 1L to 6L) {
      val rows = advRows(seed, 24)
      val back = Tables.egressRoundTrip(spark, frame(rows), "json", "prop")
      assert(collect(back) == collect(frame(rows)), s"seed=$seed")
    }
  }

  test("property: CSV egress round-trips generated frames modulo its two " +
      "documented edges (empty->null, no embedded line breaks)") {
    for (seed <- 11L to 16L) {
      // restrict to what single-line CSV records can carry at all, then
      // assert the round trip is EXACTLY identity-except-empty->null —
      // any new degradation (quote mangling, backslash loss, unicode
      // damage, whitespace trimming) fails the sweep
      val rows = advRows(seed, 24).map { r =>
        val s = Option(r.getString(1))
          .map(_.replaceAll("[\n\r]", "·")).orNull
        Row(r.getLong(0), s, r.get(2))
      }
      val expected = rows.map { r =>
        val s = Option(r.getString(1)).filter(_.nonEmpty).orNull
        Row(r.getLong(0), s, r.get(2))
      }
      val back = Tables.egressRoundTrip(spark, frame(rows), "csv", "prop")
      assert(collect(back) == collect(frame(expected)), s"seed=$seed")
    }
  }
}
