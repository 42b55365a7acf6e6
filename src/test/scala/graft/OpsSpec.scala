package graft

import org.apache.spark.sql.functions._
import graft.etl.Ops

/** Unit specs for the scalar column library (SURVEY §2.8 surface). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).first().get(0)

  test("emptyToNull: blank-after-trim becomes NULL, others pass through") {
    assert(one(Ops.emptyToNull(lit("   "))) == null)
    assert(one(Ops.emptyToNull(lit(""))) == null)
    assert(one(Ops.emptyToNull(lit(" a "))) == " a ")
  }

  test("fingerprint: normalization collapses case/whitespace/null variants") {
    val a = one(Ops.fingerprint(Seq(lit("  Acme Corp "), lit("US"))))
    val b = one(Ops.fingerprint(Seq(lit("ACME CORP"), lit("us"))))
    val c = one(Ops.fingerprint(Seq(lit("Other"), lit("us"))))
    assert(a == b)
    assert(a != c)
    // NULL behaves as empty string (T-SQL ISNULL/CONCAT parity)
    val n = one(Ops.fingerprint(Seq(lit(null).cast("string"), lit("US"))))
    val e = one(Ops.fingerprint(Seq(lit(""), lit("US"))))
    assert(n == e)
  }

  test("fingerprint: sha1 of known canonical input") {
    // sha1("A|B") — canonical concat with | separator
    assert(one(Ops.fingerprint(Seq(lit("a "), lit(" b")))) ==
      one(sha1(lit("A|B"))))
  }

  test("stripPrefix removes marker case-insensitively") {
    assert(one(Ops.stripPrefix(lit("REV:123"), "REV:")) == "123")
    assert(one(Ops.stripPrefix(lit("rev:123"), "REV:")) == "123")
    assert(one(Ops.stripPrefix(lit("X123"), "REV:")) == "X123")
  }

  test("cleanName applies replace chain left-to-right") {
    assert(one(Ops.cleanName(lit("A.B.&C"), Seq("." -> "", "&" -> "AND"))) ==
      "ABANDC")
  }

  test("padLast4: last 4 of '0000'+x incl. NULL -> '0000'") {
    assert(one(Ops.padLast4(lit("123456"))) == "3456")
    assert(one(Ops.padLast4(lit("7"))) == "0007")
    assert(one(Ops.padLast4(lit(null).cast("string"))) == "0000")
  }

  test("normZip: plus4 strip, 4-digit pad, else unchanged") {
    assert(one(Ops.normZip(lit("12345-6789"))) == "12345")
    assert(one(Ops.normZip(lit("1234"))) == "01234")
    assert(one(Ops.normZip(lit("54321"))) == "54321")
    // any len-10 value with a dash strips at the dash (reference semantics:
    // spScript.sql:120-125 checks only LEN and CHARINDEX, not digit shape)
    assert(one(Ops.normZip(lit("1234-67890"))) == "1234")
  }

  test("dateKey / monthStartKey / endOfMonth") {
    val d = lit("2025-02-14").cast("date")
    assert(one(Ops.dateKey(d)) == 20250214)
    assert(one(Ops.monthStartKey(d)) == 20250201)
    assert(one(Ops.endOfMonth(d)).toString == "2025-02-28")
  }

  test("safeRatio: null on zero denominator") {
    assert(one(Ops.safeRatio(lit(10), lit(0))) == null)
    assert(one(Ops.safeRatio(lit(10), lit(4))) == 2.5)
  }

  test("tryDate: null on unparseable") {
    assert(one(Ops.tryDate(lit("2024-01-15"))).toString == "2024-01-15")
    assert(one(Ops.tryDate(lit("nope"))) == null)
  }

  test("exactSum is partitioning-independent") {
    val df = spark.range(1000).select(
      (col("id").cast("double") / 7.0).as("v"))
    val a = df.repartition(1).agg(Ops.exactSum(col("v"))).first().getDouble(0)
    val b = df.repartition(7).agg(Ops.exactSum(col("v"))).first().getDouble(0)
    assert(a == b)
  }

  test("JSON surface: from_json(schema) agrees with get_json_object " +
      "path extraction (t96's in-plan parse), malformed JSON -> null") {
    import org.apache.spark.sql.types.{StructType, StructField, IntegerType}
    val ev = graft.etl.Tables.events(spark, "/root/testdata/sf0.001")
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val mismatches = ev.select(
        get_json_object(col("props"), "$.k").cast("int").as("a"),
        from_json(col("props"), schema).getField("k").as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(mismatches == 0L,
      "the path and schema parsers must extract identically")
    // malformed / missing-key inputs parse to null, not an error
    val bad = Seq("{broken", """{"other": 1}""", null)
      .toDF("props")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .collect()
    assert(bad.forall(_.isNullAt(0)))
  }
}
