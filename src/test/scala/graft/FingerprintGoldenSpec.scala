package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Fingerprint

/** Golden-file protection for the S1 sha1 canonicalization chain
  * (PreparePOStoTxnMap_script.sql:7-14) — the hash family the reference
  * actually runs. The oracle queries pin the md5 twin (DuckDB lacks
  * sha1), so these digests are the only cross-check of the full
  * normalize→strip→concat→sha1 chain under the production algo:
  *
  *   - a pinned table of edge-case merchant rows (NULLs, blanks,
  *     whitespace-only parts, REV: prefix in every casing/position,
  *     unicode, embedded pipe) whose sha1/sha1-nomid digests were
  *     computed by an independent implementation (python hashlib over
  *     the documented canonical string);
  *   - a fixture-slice sweep where plain-JVM MessageDigest recomputes
  *     the canonical string OUTSIDE the Column expression chain.
  */
class FingerprintGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val header = Seq(
    // (mid, legal, name, addr, city, state, zip, country)
    ("123", "REV:Acme LLC", "Acme", "1 Main St", "Springfield", "IL",
      "62701", "US"),
    (null, null, "  spaced  ", "", "x", null, "0000", "ca"),
    ("42", "rev:lower prefix", "Café", "Ünïcode 7", "Köln", "NR W",
      " 4455 ", "DE"),
    ("9", "NOREV:keep", "N|me", "has|pipe", "c", "s", "z", "US"),
    ("00", "REV:", "", " ", "  ", "x", "", "us"),
    ("7", " REV:pad", "m", "a", "c", "s", "z", "US"))
    .toDF("MerchantNumber", "MerchantLegalName", "MerchantName",
      "AddressLine01", "CityName", "StateProvince", "PostalCode",
      "CountryCode")

  // canonical strings (documented in each row's comment):
  //   123|ACME LLC|ACME|1 MAIN ST|SPRINGFIELD|IL|62701|US
  //   ||SPACED||X||0000|CA                  (NULL == '' T-SQL parity)
  //   42|LOWER PREFIX|CAFÉ|ÜNÏCODE 7|KÖLN|NR W|4455|DE
  //   9|NOREV:KEEP|N|ME|HAS|PIPE|C|S|Z|US   (embedded pipe ambiguity)
  //   00|||||X||US                          (REV: strips to empty)
  //   7|REV:PAD|M|A|C|S|Z|US                (leading space defeats strip)
  private val goldenSimHash = Seq(
    "d90d285adae4ca52a5c3a2e55dca513bec596327",
    "cfe210a7557af2431b095903e8d0d96f96d34800",
    "01ee98b55c65faa1dc8e4e50be4d8171d4c7c76c",
    "744f0a2df870b06abbafa52c7338a06114f2431e",
    "44e9d60b97712ebb5dc61a2e74c5257b53d8e265",
    "6f4d908104b6ca61e9ad94a97be16bf14e7115fa")
  private val goldenNoMid = Seq(
    "473237cc633a05b4193c1280b19eb5b904fe2d6d",
    "62d6d0bacdc2f7124d6aba0291a255a182fddd5a",
    "b06788d1d40057c2f1b2faa34aed5cf05a90b4ed",
    "c4da8676880d77bc6bd4ef0ddae1055e3be9e0d1",
    "dc45e82a5d677031738c2d9aafaba256e4873be0",
    "f019dd1b4716696e519151ea321c470d02e2c0b4")

  test("sha1 simhash + simhashnomid match externally computed digests") {
    val got = Fingerprint.withHashes(header, "sha1")
      .select(col("__simhash"), col("__simhashnomid")).collect()
    assert(got.map(_.getString(0)).toSeq == goldenSimHash)
    assert(got.map(_.getString(1)).toSeq == goldenNoMid)
  }

  test("sha1 chain matches plain-JVM recomputation over a fixture slice") {
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .orderBy(col("s_suppkey")).limit(20)
      .select(col("s_suppkey").cast("string").as("MerchantNumber"),
        col("s_name").as("MerchantLegalName"),
        concat(lit("REV:"), col("s_name")).as("MerchantName"),
        col("s_acctbal").cast("string").as("AddressLine01"),
        lit("  pad  ").as("CityName"),
        lit(null).cast("string").as("StateProvince"),
        col("s_nationkey").cast("string").as("PostalCode"),
        lit("US").as("CountryCode"))
    val rows = Fingerprint.withHashes(sup, "sha1")
      .select(col("*")).collect()
    val md = java.security.MessageDigest.getInstance("SHA-1")
    def norm(s: String): String = {
      val x = Option(s).getOrElse("")
      // T-SQL LTRIM/RTRIM trims the space character only
      x.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .toUpperCase(java.util.Locale.ROOT)
    }
    def stripRev(s: String): String =
      if (s != null && s.toUpperCase(java.util.Locale.ROOT).startsWith("REV:"))
        s.substring(4)
      else s
    rows.foreach { r =>
      val parts = Seq(r.getAs[String]("MerchantNumber"),
        stripRev(r.getAs[String]("MerchantLegalName")),
        r.getAs[String]("MerchantName"), r.getAs[String]("AddressLine01"),
        r.getAs[String]("CityName"), r.getAs[String]("StateProvince"),
        r.getAs[String]("PostalCode"), r.getAs[String]("CountryCode"))
      def hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("__simhash") ==
        hex(parts.map(norm).mkString("|")))
      assert(r.getAs[String]("__simhashnomid") ==
        hex(parts.tail.map(norm).mkString("|")))
    }
  }
}
