package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{Merge, Ops}

/** S1 — POS-to-transaction fingerprint mapping
  * (`1. Prepare POS to Txn Mapping/PreparePOStoTxnMap_script.sql`).
  *
  * The pipeline fingerprints each transaction's merchant attributes with a
  * canonical hash (S1:7-14), maps transactions to the `PosFingerprints`
  * dimension by hash equality (S1:18-25), and inserts newly-seen merchants
  * as fresh fingerprints after a whitelist + anti-join + aggregate
  * (S1:50-128).
  */
object Fingerprint {

  /** The 8 merchant attributes hashed by the reference (S1:7-14), with the
    * `REV:` reversal-marker strip on the legal name (S1:9). */
  def merchantParts(c: String => Column): Seq[Column] = Seq(
    c("MerchantNumber"),
    Ops.stripPrefix(c("MerchantLegalName"), "REV:"),
    c("MerchantName"), c("AddressLine01"), c("CityName"),
    c("StateProvince"), c("PostalCode"), c("CountryCode"))

  /** SimHash column (the reference's `simhash`, S1:54-61); `simhashnomid`
    * drops MerchantNumber (S1:63-69) for merchant-number-agnostic matching. */
  def simHash(c: String => Column, algo: String = "sha1"): Column =
    Ops.fingerprint(merchantParts(c), algo)
  def simHashNoMid(c: String => Column, algo: String = "sha1"): Column =
    Ops.fingerprint(merchantParts(c).tail, algo)

  /** Both canonical hashes in ONE projection (`__simhash`, `__simhashnomid`).
    * The reference evaluates the HASHBYTES expression 7 times across S1
    * (S1:7-14, 18-25, 54-69, 85-92, 112-127); deriving both columns once and
    * letting every consumer read the attributes keeps the hash a single
    * pass over the 100 TB header scan. [[newFingerprints]] detects the
    * precomputed columns and skips re-deriving them — materialize this frame
    * (persist/localCheckpoint, the staging-table analog of S1:5) when it
    * feeds both sides of the new-fingerprint anti-join. */
  def withHashes(header: DataFrame, algo: String = "sha1"): DataFrame =
    header
      .withColumn("__simhash", simHash(col(_), algo))
      .withColumn("__simhashnomid", simHashNoMid(col(_), algo))

  /** S1:5-26 — the monthly full map: detail ⋈ header (S1:16-17), canonical
    * hash, left-join the fingerprint dimension on the recomputed hash.
    * Output mirrors `QA.PosMonthlyFullMap(Id, TransactionId,
    * PosFingerprintId, SimHash, DvId)`. */
  def monthlyFullMap(header: DataFrame, detail: DataFrame,
                     fingerprints: DataFrame, since: Column,
                     algo: String = "sha1"): DataFrame = {
    val h = header.withColumn("__simhash", simHash(header(_), algo))
    detail.filter(col("txndate") >= since)
      .join(h, detail("transactionid") === h("transactionid"))
      .join(fingerprints.select(col("FingerprintID"), col("SimHash")),
        col("__simhash") === col("SimHash"), "left")
      .select(header("id").as("Id"),
        h("transactionid").as("TransactionId"),
        col("FingerprintID").as("PosFingerprintId"),
        col("__simhash").as("SimHash"),
        detail("id").as("DvId"))
  }

  /** S1:44-128 — insert new fingerprints: previous-month window (S1:46-48,
    * 93), country+MCC whitelist or ClientCode='MC' (S1:94-98), anti-join on
    * existing hashes (S1:84-92, 99), group by normalized attributes,
    * aggregate client counts / date range (S1:79-82, 103-128). Returns the
    * fingerprint rows to append; caller unions into the dimension (O3). */
  def newFingerprints(header: DataFrame, existing: DataFrame,
                      startDate: Column, endDate: Column,
                      countries: Seq[String] = Seq("US", "PR", "VI", "GU",
                        "CA", "MX", "AS", "MP", "UM"),
                      mccCodes: Seq[String] = Seq("5814", "5812", "5813",
                        "5811", "5462", "5921", "7932"),
                      algo: String = "sha1", maxLogId: Long = 0L): DataFrame = {
    val norm: String => Column = n => Ops.normPart(Ops.emptyToNull(col(n)))
    // reuse hashes precomputed by [[withHashes]] (the caller materialized
    // them once); derive them here only when absent
    val hashed =
      if (header.columns.contains("__simhashnomid")) header
      else withHashes(header, algo)
    val eligible = hashed
      .filter(col("TransactionDate").between(startDate, endDate))
      .filter((col("CountryCode").isin(countries: _*) &&
        col("MccCode").isin(mccCodes: _*)) || col("clientcode") === "MC")
      .join(existing.select(col("SimHash")),
        col("__simhash") === col("SimHash"), "left_anti")
    eligible
      .groupBy(
        norm("MerchantNumber").as("MerchantNumber"),
        Ops.normPart(Ops.stripPrefix(Ops.emptyToNull(col("MerchantLegalName")),
          "REV:")).as("MerchantLegalName"),
        norm("MerchantName").as("MerchantName"),
        norm("AddressLine01").as("AddressLine01"),
        norm("CityName").as("CityName"),
        norm("StateProvince").as("StateProvince"),
        norm("PostalCode").as("PostalCode"),
        norm("CountryCode").as("CountryCode"),
        col("__simhash").as("SimHash"),
        col("__simhashnomid").as("SimHashNoMid"))
      .agg(
        countDistinct(col("clientcode")).as("ClientCount"),
        count(lit(1)).as("BankFeedCount"),
        min(col("TransactionDate")).cast("date").as("AnalysisStartDate"),
        max(col("TransactionDate")).cast("date").as("AnalysisEndDate"))
      .withColumn("LogID", lit(maxLogId + 1))
      .withColumn("Certified", lit("N"))
  }

  /** S3:26-29 — map `FactTransaction.FingerprintID`/`SFRestaurantKey` from
    * the monthly map, only where still unmapped inside the month window. */
  def updateFactFingerprint(fact: DataFrame, fullMap: DataFrame,
                            dimFingerprint: DataFrame,
                            startKey: Long, endKey: Long): DataFrame = {
    val m = fullMap.filter(col("PosFingerprintId").isNotNull)
      .select(col("TransactionId").as("__tid"),
        col("PosFingerprintId").as("__fid"))
      // deterministic mapping per transaction
      .transform(Merge.pickLatest(_, Seq(col("__tid")),
        Seq(col("__fid").asc)))
      .join(dimFingerprint.select(col("FingerprintID").as("__fid"),
        col("SFRestaurantKey").as("__sfkey")), Seq("__fid"), "left")
    Merge.mapUpdate(fact, m, Seq(fact("TH_ID") === col("__tid")),
      Map("FingerprintID" -> col("__fid"), "SFRestaurantKey" -> col("__sfkey")),
      guard = fact("FingerprintID").isNull &&
        fact("DateKey").between(startKey, endKey))
  }

  /** S3:19-23 — strip U+FFFD from the DimFingerprint name columns. */
  def cleanFingerprintNames(dim: DataFrame,
                            cols: Seq[String] = Seq("MerchantLegalName",
                              "MerchantName", "AddressLine01")): DataFrame =
    cols.foldLeft(dim)((d, c) =>
      d.withColumn(c, Ops.stripReplacementChar(col(c))))
}
