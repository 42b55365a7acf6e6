package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipelines.{Fingerprint, Monthly}
import graft.etl.Publish

/** The SURVEY §3.1 monthly batch end to end on a minimal coherent world:
  * one existing merchant, one new eligible merchant, one ineligible; three
  * transactions whose patron / unique-patron keys exercise the natural,
  * synthesized, employee, card and catch-all mapping passes; the
  * reference's zero-expectation validation probes must come back 0; the
  * result publishes atomically and reads back. */
class MonthlySpec extends SparkSpec {
  import spark.implicits._

  test("monthly batch: fingerprints, patrons, personas, atomic publish") {
    val header = Seq(
      // (id, transactionid, merchant attrs..., patron attrs...)
      (1L, "1", "M1", "LEGAL ONE", "ONE", "1 MAIN ST", "NYC", "NY", "10001",
        "US", "AA", "5812", "2025-02-05", "P1", "11111", "840", "999"),
      (2L, "2", "M2", "REV:LEGAL TWO", "TWO", "2 OAK AVE", "SF", "CA",
        "94100", "US", "AA", "5812", "2025-02-10", "P7", "11111", "840",
        "123456789"),
      (3L, "3", "M3", "LEGAL THREE", "THREE", "3 ELM RD", "BERLIN", "BE",
        "10117", "XX", "BB", "5812", "2025-02-15", null, "22222", "276",
        "5550000")
    ).toDF("id", "transactionid", "MerchantNumber", "MerchantLegalName",
      "MerchantName", "AddressLine01", "CityName", "StateProvince",
      "PostalCode", "CountryCode", "clientcode", "MccCode",
      "TransactionDate", "proxyid", "cardmemberbillingzipcode",
      "cardmembercountrycode", "creditcardnum")
      .withColumn("TransactionDate", col("TransactionDate").cast("date"))

    val detail = Seq((11L, "1", "2025-02-05"), (12L, "2", "2025-02-10"),
      (13L, "3", "2025-02-15"))
      .toDF("id", "transactionid", "txndate")
      .withColumn("txndate", col("txndate").cast("date"))

    // existing fingerprint dim: merchant M1's hash, already SF-mapped
    val m1Hash = header.filter(col("id") === 1L)
      .select(Fingerprint.simHash(header(_), "md5").as("h"))
      .first().getString(0)
    val dimFingerprint = Seq((10L, m1Hash, "LEGAL ONE", "ONE", "1 MAIN ST", 5L))
      .toDF("FingerprintID", "SimHash", "MerchantLegalName", "MerchantName",
        "AddressLine01", "SFRestaurantKey")

    val fact = Seq(
      (1L, 11L, 20250205L, 1L, 0L, 1, 800.0),
      (2L, 12L, 20250210L, 1L, 0L, 1, 300.0),
      (3L, 13L, 20250215L, 1L, 0L, 2, 500.0)
    ).toDF("TH_ID", "DVHD_ID", "DateKey", "Patron_ID", "UniquePatronId",
      "GeographyID", "amt")
      .withColumn("Amount", col("amt").cast("decimal(18,4)")).drop("amt")
      .withColumn("FingerprintID", lit(null).cast("long"))
      .withColumn("SFRestaurantKey", lit(1L))

    // patron mapping attributes per transaction: T1 natural 'P1' (existing
    // patron 100), T2 natural 'P7' (inserted this run from its header row),
    // T3 synthesized '7_0000' (existing patron 200)
    val txnProxy = Seq(
      (1L, "P1", 1L, "999"),
      (2L, "P7", 2L, "123456789"),
      (3L, "none", 7L, "5550000"))
      .toDF("TH_ID", "proxyid", "ClientID", "creditcardnum")
    val dimPatron = Seq((100L, "P1"), (200L, "7_0000")).toDF("ID", "ProxyID")

    // unique-patron keys: D11 maps via the catch-all proxy pass, D12 via
    // the employee pass, D13 via the padded-card pass — the latter two
    // against candidates inserted this run
    val txnKeys = Seq(
      (11L, "C9", "", "555", "U1"),
      (12L, "C2", "E2", "888", "none"),
      (13L, "C3", "", "999123", "zzz"))
      .toDF("DVHD_ID", "clientcode", "employeeid", "creditcardnum", "proxyid")
    val dimUniquePatron = Seq((1000L, "U1", 1), (999L, "UX", 1))
      .toDF("UniquePatronId", "ProxyID", "IsHighValue")
    val candidates = Seq(("C2_E2_888", 1), ("C3_9123", 1))
      .toDF("ProxyID", "IsHighValue")
      .withColumn("UniquePatronId", lit(null).cast("long"))

    val result = Monthly.run(Monthly.Inputs(
      header = header, detail = detail, dimFingerprint = dimFingerprint,
      fact = fact, txnProxy = txnProxy, txnKeys = txnKeys,
      dimPatron = dimPatron, dimUniquePatron = dimUniquePatron,
      uniquePatronCandidates = candidates,
      dimZipGeo = Seq(("11111", 1), ("22222", 2)).toDF("ZipCode", "GeographyID"),
      dimClient = Seq(("AA", 2L)).toDF("clientcode", "ClientID"),
      dimTerritory = Seq((1, "EAST", "NY"), (2, "WEST", "BERLIN"))
        .toDF("GeographyID", "SalesTerritory", "DIN_DisplayMiniMarketName"),
      startDate = "2025-02-01", endDate = "2025-02-28",
      startKey = 20250201L, endKey = 20250228L, algo = "md5"))

    // S1: the eligible new merchant (M2) got the next sequenced id; the
    // ineligible-country M3 did not enter the dimension
    val fps = result.outputs("dim_fingerprint").orderBy("FingerprintID").collect()
    assert(fps.map(_.getLong(0)).toSeq == Seq(10L, 11L))
    assert(fps(1).getAs[String]("MerchantLegalName") == "LEGAL TWO") // REV: stripped
    assert(fps(1).getAs[Long]("SFRestaurantKey") == 1L)

    // S3: T1 mapped to the existing fingerprint + its SF key; T2/T3 keep
    // the null/sentinel (their hashes were not in the dim at map time)
    val f = result.outputs("fact_transaction").orderBy("TH_ID").collect()
    assert(f(0).getAs[Long]("FingerprintID") == 10L)
    assert(f(0).getAs[Long]("SFRestaurantKey") == 5L)
    assert(f(1).isNullAt(f(1).fieldIndex("FingerprintID")))

    // P-Pat: natural, inserted-natural and synthesized passes all landed
    assert(f.map(_.getAs[Long]("Patron_ID")).toSeq != Seq(1L, 1L, 1L))
    assert(result.unmappedPatrons == 0)
    // S2: employee, card and catch-all passes all landed
    assert(result.unmappedUniquePatrons == 0)
    val uids = f.map(_.getAs[Long]("UniquePatronId")).toSeq
    assert(uids.head == 1000L && !uids.contains(0L))

    // Seg: every spending patron is single-territory single-minimarket ->
    // Office manager; the spend-less UX patron backfills as Undefined
    val personas = result.outputs("personas")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(personas(999L) == "Undefined")
    assert(personas(uids.head) == "Office manager")

    // publish atomically and read back
    val root = Files.createTempDirectory("graft_monthly").toString
    assert(Publish.publishAll(root, result.outputs).isSuccess)
    val back = spark.read.parquet(s"$root/fact_transaction")
    assert(back.count() == 3)
  }
}
