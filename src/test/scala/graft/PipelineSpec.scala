package graft

import org.apache.spark.sql.functions._
import graft.etl.Publish
import graft.pipelines._

/** End-to-end semantics of the reference pipelines on reference-shaped
  * mini fixtures (FIXTURES.md §A schemas). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // ---- Fingerprint (S1) ----

  private lazy val header = Seq(
    (1L, 101L, "M1", "Acme LLC", "Acme", "1 Main St", "NYC", "NY", "10001",
      "US", "CL1", "2025-02-10", "5812"),
    (2L, 102L, "M1", "REV:Acme LLC", "Acme", "1 Main St", "NYC", "NY",
      "10001", "US", "CL2", "2025-02-15", "5812"),
    (3L, 103L, "M2", "Burgers Inc", "Burgers", "2 Side St", "LA", "CA",
      "90001", "US", "CL1", "2025-02-20", "5814"),
    (4L, 104L, "M3", "Foreign Gmbh", "Foreign", "3 Weg", "Berlin", "BE",
      "10115", "DE", "CL1", "2025-02-21", "5812")
  ).toDF("id", "transactionid", "MerchantNumber", "MerchantLegalName",
    "MerchantName", "AddressLine01", "CityName", "StateProvince",
    "PostalCode", "CountryCode", "clientcode", "TransactionDate", "MccCode")
    .withColumn("TransactionDate", col("TransactionDate").cast("date"))

  test("fingerprint: REV: strip makes txn 1 and 2 the same merchant") {
    val fp = header.select(Fingerprint.simHash(header(_)).as("h")).collect()
    assert(fp(0).getString(0) == fp(1).getString(0))
    assert(fp(0).getString(0) != fp(2).getString(0))
  }

  test("newFingerprints: whitelist + anti-join + grouped aggregate") {
    val existing = header.filter(col("id") === 3)
      .select(Fingerprint.simHash(header(_)).as("SimHash"))
    val out = Fingerprint.newFingerprints(header, existing,
      lit("2025-02-01"), lit("2025-02-28")).collect()
    // M2 excluded (already fingerprinted), DE row excluded (not whitelisted),
    // M1 variants collapse into one new fingerprint with 2 clients
    assert(out.length == 1)
    val row = out(0)
    assert(row.getAs[String]("MerchantNumber") == "M1")
    assert(row.getAs[Long]("ClientCount") == 2)
    assert(row.getAs[Long]("BankFeedCount") == 2)
  }

  test("monthlyFullMap maps known fingerprints, leaves new ones null") {
    val detail = Seq((11L, 101L, "2025-02-10"), (12L, 103L, "2025-02-20"))
      .toDF("id", "transactionid", "txndate")
      .withColumn("txndate", col("txndate").cast("date"))
    val fps = header.filter(col("id") === 1)
      .select(lit(77L).as("FingerprintID"),
        Fingerprint.simHash(header(_)).as("SimHash"))
    val out = Fingerprint.monthlyFullMap(header, detail, fps,
      lit("2025-02-01")).orderBy("TransactionId").collect()
    assert(out(0).getAs[Long]("PosFingerprintId") == 77L)
    assert(out(1).isNullAt(out(1).fieldIndex("PosFingerprintId")))
  }

  // ---- Billing group (S4) ----

  test("billing group: name cleaning, SCD intervals, open-row sentinel") {
    // global max txndate is 2025-03-31, itself a month-end — the S4:22
    // sentinel (EOMONTH(groupMax) = raw @maxDate) fires for Joe's group
    val invoices = Seq(
      (1L, "JOE'S/CAFE-TERMED", "2025-01-15"),
      (1L, "JOE'S/CAFE-TERMED", "2025-03-31"),
      (2L, "OLD_GROUP", "2025-01-20")
    ).toDF("SiteId", "BillGroup", "txndate")
      .withColumn("txndate", col("txndate").cast("date"))
    val backOffice = Seq((900L, "JOES-CAFE")).toDF("ID", "billing_id")
    val target = Seq.empty[(String, Long, Long, String, java.sql.Date,
      java.sql.Date)].toDF("Id", "BackOfficeBillingGroupId", "SiteId",
      "BillingGroupDisplayName", "ValidFrom", "ValidTo")
    val out = BillingGroup.mergeLocations(target, invoices, backOffice,
      lit("2025-01-01")).orderBy("SiteId").collect()
    val joes = out(0)
    assert(joes.getAs[String]("BillingGroupDisplayName") == "JOES-CAFE")
    assert(joes.getAs[Long]("BackOfficeBillingGroupId") == 900L)
    assert(joes.getAs[java.sql.Date]("ValidFrom").toString == "2025-01-01")
    // group month-end equals the raw global max -> open-row sentinel
    assert(joes.getAs[java.sql.Date]("ValidTo").toString == "9999-12-31")
    val old = out(1)
    assert(old.getAs[String]("BillingGroupDisplayName") == "OLD GROUP")
    assert(old.getAs[java.sql.Date]("ValidTo").toString == "2025-01-31")
    assert(old.getAs[Long]("BackOfficeBillingGroupId") == -1L)
  }

  test("billing group: dim insert sequences keys from max") {
    val dim = Seq((5L, "EXISTING", -1L))
      .toDF("BillingGroupKey", "BillingGroupName", "BillingGroupBackOfficeId")
    val locations = Seq(("EXISTING", -1L), ("NEW A", 2L), ("NEW B", -1L))
      .toDF("BillingGroupDisplayName", "BackOfficeBillingGroupId")
    val out = BillingGroup.insertNewGroups(dim, locations)
      .orderBy("BillingGroupKey").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L, 6L, 7L))
    assert(out.map(_.getString(1)).toSeq == Seq("EXISTING", "NEW A", "NEW B"))
  }

  // ---- Patron (P-Pat + S2) ----

  test("patron: dup resolution keeps highest txncount per proxy") {
    val proxy = Seq(
      ("CL1", "P1", "10001", "US", "41111", 5L),
      ("CL1", "P1", "10002", "US", "42222", 9L),
      ("CL1", "P_2", "10003", "US", "43333", 2L) // underscore -> excluded
    ).toDF("clientcode", "proxyid", "cardmemberbillingzipcode",
      "cardmembercountrycode", "creditcardnum", "txncount")
    val dimPatron = Seq.empty[(Long, String, Integer, Integer, String, String)]
      .toDF("ID", "ProxyID", "ClientID", "GeographyID", "ZipCode",
        "CC_Last4Digits")
    val dimZip = Seq(("10002", 7)).toDF("ZipCode", "GeographyID")
    val dimClient = Seq(("CL1", 3)).toDF("clientcode", "ClientID")
    val out = Patron.insertNewPatrons(dimPatron, proxy, dimZip, dimClient)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("ZipCode") == "10002") // the 9-txn row won
    assert(out(0).getAs[Int]("GeographyID") == 7)
    assert(out(0).getAs[String]("CC_Last4Digits") == "2222")
  }

  test("patron: two-pass fact mapping incl. synthesized proxy") {
    val fact = Seq((1L, 20250210L, 1L), (2L, 20250211L, 1L),
      (3L, 20250212L, 1L), (4L, 20240101L, 1L))
      .toDF("TH_ID", "DateKey", "Patron_ID")
    val txnProxy = Seq(
      (1L, "P1", 3, "41111"),      // natural proxy
      (2L, "nope", 3, "90042"),    // synthesized 3_0042
      (3L, "nope", 3, "99999"),    // no match either way
      (4L, "P1", 3, "41111")       // out of window
    ).toDF("TH_ID", "proxyid", "ClientID", "creditcardnum")
    val dimPatron = Seq((10L, "P1"), (11L, "3_0042"))
      .toDF("ID", "ProxyID")
    val out = Patron.mapFactPatron(fact, txnProxy, dimPatron,
      20250201L, 20250228L).orderBy("TH_ID").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 11L, 1L, 1L))
  }

  test("patron: unmapped validation counts only in-window sentinels") {
    val fact = Seq((1L, 20250210L, 0L), (2L, 20250210L, 9L),
      (3L, 20240101L, 0L)).toDF("DVHD_ID", "DateKey", "UniquePatronId")
    assert(Patron.unmappedCount(fact, 20250201L, 20250228L) == 1)
  }

  // ---- Restaurant (P-Rest) ----

  test("restaurant: rank-pick chooses best match quality, keeps ties") {
    val sites = Seq((1L, "Blue Cafe"), (2L, "Green Diner"))
      .toDF("site_ID", "rest_location_name")
    val locations = Seq(
      (100L, "Blue Cafe", "BC Din"),      // exact -> quality 1
      (101L, "Blue Cafe Uptown", "BCU"),  // contains -> quality 3
      (102L, "Green Dining Co", "Green Diner") // din-name exact -> 2
    ).toDF("RLP_ID", "RLP_restaurantName", "RLP_DinName")
    val out = Restaurant.rankSiteMatches(sites, locations)
      .orderBy("site_ID").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("RLP_ID") == 100L)
    assert(out(1).getAs[Long]("RLP_ID") == 102L)
  }

  test("restaurant: dim sync deletes gone rows except the Unknown guard") {
    val dim = Seq((0L, 0L, "Unknown", 0), (1L, 11L, "Keep", 1),
      (2L, 22L, "Gone", 1))
      .toDF("RestaurantKey", "RLP_ID", "RestaurantLocationName",
        "ProgramEndDateKey")
    val staging = Seq((11L, "Keep Updated", 2), (33L, "Brand New", 2))
      .toDF("RLP_ID", "RestaurantLocationName", "ProgramEndDateKey")
    val out = Restaurant.syncDimRestaurant(dim, staging,
      Seq("RestaurantLocationName", "ProgramEndDateKey"))
      .orderBy("RLP_ID").collect()
    assert(out.map(_.getAs[String]("RestaurantLocationName")).toSeq ==
      Seq("Unknown", "Keep Updated", "Brand New"))
  }

  test("restaurant: new groups keyed from max in cleaned-name order, " +
      "program range aggregated, existing names skipped; ledger hint " +
      "overrides the dim scan") {
    val dim = Seq((7L, "EXISTING GROUP", 20240101, 20241231))
      .toDF("RestaurantGroupKey", "RestaurantGroupName",
        "RestaurantGroupStartDateKey", "RestaurantGroupEndDateKey")
    val staging = Seq(
      ("existing group", 20250101, 20250131),  // cleans to the known name
      ("Zeta Chain", 20250201, 20250228),
      ("zeta chain.", 20250105, 20250420),     // same group after cleaning
      ("Alpha's Diner", 20250301, 20250331)
    ).toDF("ChainName", "ProgramStartDateKey", "ProgramEndDateKey")
    val out = Restaurant.insertNewGroups(dim, staging)
      .orderBy("RestaurantGroupKey").collect()
    // ALPHAS DINER sorts before ZETA CHAIN -> keys 8, 9; ranges merged
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(
      (7L, "EXISTING GROUP"), (8L, "ALPHAS DINER"), (9L, "ZETA CHAIN")))
    val zeta = out(2)
    assert(zeta.getAs[Int]("RestaurantGroupStartDateKey") == 20250105)
    assert(zeta.getAs[Int]("RestaurantGroupEndDateKey") == 20250420)
    // a KeyLedger-held max wins over the dim scan
    val hinted = Restaurant.insertNewGroups(dim, staging,
        maxKeyHint = Some(100L))
      .orderBy("RestaurantGroupKey").collect()
    assert(hinted.map(_.getLong(0)).toSeq == Seq(7L, 101L, 102L))
  }

  // ---- BiReporting (S5) ----

  test("bi reporting: definition merge + bridge sync + dim backfill") {
    val dim = Seq((1L, 100L, "Old Name", "A", 0L))
      .toDF("BiReportingId", "BiBackofficeId", "BiReportingName",
        "BiReportingGroupOwner", "BiReportingParentId")
    val src = Seq((1L, 100L, "New Name", "A", 0L),
      (2L, 200L, "Fresh", "B", 1L))
      .toDF("BiReportingId", "BiBackofficeId", "BiReportingName",
        "BiReportingGroupOwner", "BiReportingParentId")
    val merged = BiReporting.mergeDefinitions(dim, src)
      .orderBy("BiBackofficeId").collect()
    assert(merged.map(_.getString(2)).toSeq == Seq("New Name", "Fresh"))

    val bridge = Seq((1L, 10L), (1L, 11L)).toDF("BiReportingId", "RestaurantKey")
    val bsrc = Seq((1L, 10L), (2L, 12L)).toDF("BiReportingId", "RestaurantKey")
    val b2 = BiReporting.mergeRelationships(bridge, bsrc)
      .orderBy("BiReportingId", "RestaurantKey").collect()
    assert(b2.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 12L))) // (1,11) deleted
  }

  // ---- Segmentation (Seg + Cui) ----

  test("segmentation: persona thresholds match the reference rules") {
    val mm = Seq(
      // patron 1: all spend in one territory+mm -> Office manager
      (1L, "East", "NYC", BigDecimal(100)),
      // patron 2: 50/50 split across territories -> Road Warrior
      (2L, "East", "NYC", BigDecimal(50)), (2L, "West", "LA", BigDecimal(50)),
      // patron 3: one territory, split minimarkets -> City person
      (3L, "East", "NYC", BigDecimal(50)), (3L, "East", "BOS", BigDecimal(50))
    ).toDF("UniquePatronId", "SalesTerritory", "DIN_DisplayMiniMarketName",
      "MinimarketAmount")
    val dup = Seq(1L, 2L, 3L, 4L).toDF("UniquePatronId")
    val out = Segmentation.classify(Segmentation.spendRatios(mm), dup)
      .orderBy("UniquePatronId").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(
      (1L, "Office manager"), (2L, "Road Warrior"), (3L, "City person"),
      (4L, "Undefined")))
  }

  test("spend views: per-persona shares sum to the industry/client total") {
    val mm = Seq(
      (1L, "East", "NYC", BigDecimal(100)),                              // OM
      (2L, "East", "NYC", BigDecimal(50)), (2L, "West", "LA", BigDecimal(50)), // RW
      (3L, "East", "NYC", BigDecimal(50)), (3L, "East", "BOS", BigDecimal(50)) // CP
    ).toDF("UniquePatronId", "SalesTerritory", "DIN_DisplayMiniMarketName",
      "MinimarketAmount")
    val personas = Segmentation.personaLabel(Segmentation.spendRatios(mm))
    val dimPatron = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("UniquePatronId", "ClientID")
    val dimClient = Seq((10L, "Food", "C10", "Acme"), (20L, "Tech", "C20", "Bit"))
      .toDF("ClientID", "ClientIndustry", "ClientCode", "ClientName")
    val ind = Segmentation.industrySpend(mm, personas, dimPatron, dimClient)
      .orderBy("ClientIndustry", "PersonaName").collect()
    assert(ind.map(r => (r.getString(0), r.getString(1),
      r.getDecimal(2).doubleValue, r.getDouble(3))).toSeq == Seq(
      ("Food", "Office manager", 100.0, 0.5),
      ("Food", "Road Warrior", 100.0, 0.5),
      ("Tech", "City person", 100.0, 1.0)))
    val cli = Segmentation.clientSpend(mm, personas, dimPatron, dimClient)
      .orderBy("ClientCode", "PersonaName").collect()
    assert(cli.map(r => (r.getString(1), r.getString(3),
      r.getDouble(5))).toSeq == Seq(
      ("C10", "Office manager", 0.5), ("C10", "Road Warrior", 0.5),
      ("C20", "City person", 1.0)))
  }

  test("cuisine imputation: partner mode preferred, rank cutoff honored") {
    val dim = Seq(
      (1L, "B1", "Partner", "Italian", 10),
      (2L, "B1", "Common", "French", 10),
      (3L, "B1", "Common", "French", 10),
      (4L, "B1", "Common", "N/A", 10),     // -> Italian (partner mode)
      (5L, "B2", "Common", "Thai", 10),
      (6L, "B2", "Common", "N/A", 10),     // -> Thai (common mode)
      (7L, "B1", "Common", "N/A", 2000)    // rank >= cutoff -> untouched
    ).toDF("SFRestaurantKey", "Brand", "Type", "CuisineType", "Rank")
    val out = Segmentation.imputeCuisine(dim).orderBy("SFRestaurantKey")
      .collect()
    assert(out.map(_.getAs[String]("CuisineType")).toSeq ==
      Seq("Italian", "French", "French", "Italian", "Thai", "Thai", "N/A"))
  }

  // ---- Publish (O12) ----

  test("publish: all-or-nothing staging") {
    val root = java.nio.file.Files.createTempDirectory("graft_pub").toString
    val ok = Publish.publishAll(root, Map(
      "a" -> Seq(1, 2).toDF("x"), "b" -> Seq(3).toDF("y")))
    assert(ok.isSuccess)
    assert(spark.read.parquet(s"$root/a").count() == 2)
    // a failing output publishes nothing new
    val bad = Publish.publishAll(root, Map(
      "c" -> Seq(4).toDF("z"),
      "boom" -> Seq(1).toDF("x").filter(expr("assert_true(x > 99)").isNull)))
    assert(bad.isFailure)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/c")))
  }
}
