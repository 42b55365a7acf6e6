package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.Merge

/** SURVEY §3.1 entry point 1 — the monthly batch (S1 → S3 → S2 → Seg) as
  * ONE pure function over immutable frames.
  *
  * Each SSMS script becomes a stage whose outputs feed the next exactly in
  * the reference's run order (PreparePOStoTxnMap → fingerprint mapping →
  * patron conformance → unique-patron mapping → segmentation). Every fact
  * update is guarded and sentinel-driven like the reference, so a month
  * rerun is idempotent; the returned warehouse map is what the caller
  * hands to `etl.Publish.publishAll` — the stage-then-atomic-swap analog
  * of the reference's transaction (spScript.sql:20-22, 345-357).
  *
  * Validation invariants (S2:90-94, S3:41/91-99: "a zero count indicates
  * the mapping was successful") are computed as part of the result rather
  * than printed, so callers can gate the publish on them.
  */
object Monthly {

  /** The warehouse and month window one run needs. Frame contracts follow
    * the reference tables (see the spec for a minimal instance):
    *  - header: POS header incl. merchant attrs + patron proxy attrs
    *  - detail: detail volume rows (id, transactionid, txndate)
    *  - dimFingerprint: (FingerprintID, SimHash, name cols, SFRestaurantKey)
    *  - fact: FactTransaction with the sentinel-keyed FK columns
    *  - txnProxy / txnKeys: per-transaction patron join attributes
    *  - dimPatron: (ID, ProxyID, ...); dimUniquePatron:
    *    (UniquePatronId, ProxyID, IsHighValue)
    *  - dimZipGeo: (ZipCode, GeographyID); dimClient: (clientcode, ClientID)
    *  - dimTerritory: (GeographyID, SalesTerritory,
    *    DIN_DisplayMiniMarketName) */
  case class Inputs(
      header: DataFrame,
      detail: DataFrame,
      dimFingerprint: DataFrame,
      fact: DataFrame,
      txnProxy: DataFrame,
      txnKeys: DataFrame,
      dimPatron: DataFrame,
      dimUniquePatron: DataFrame,
      uniquePatronCandidates: DataFrame,
      dimZipGeo: DataFrame,
      dimClient: DataFrame,
      dimTerritory: DataFrame,
      startDate: String,
      endDate: String,
      startKey: Long,
      endKey: Long,
      algo: String = "sha1",
      keyLedger: Option[String] = None)

  /** Updated warehouse + the reference's zero-expectation probes. */
  case class Result(outputs: Map[String, DataFrame],
                    unmappedPatrons: Long,
                    unmappedUniquePatrons: Long)

  /** Fill NULL surrogate keys with a sequence continuing from the current
    * max (IDENTITY analog, O39) — new dimension rows minted by the
    * insert-if-absent stages get their keys here. `maxKeyHint` skips the
    * scalar max scan when the caller holds a [[graft.etl.KeyLedger]]
    * value; sequencing is [[Merge.sequenceKeysOrdered]] (ord is the
    * dimension's unique proxy id, so keys match the global row_number
    * form with no single-partition window). */
  private def assignMissingKeys(dim: DataFrame, keyCol: String,
                                ord: Column,
                                maxKeyHint: Option[Long]): DataFrame = {
    val maxKey = maxKeyHint.getOrElse(
      dim.agg(coalesce(max(col(keyCol)), lit(0L))).first().getLong(0))
    val existing = dim.filter(col(keyCol).isNotNull)
    val fresh = Merge.sequenceKeysOrdered(
      dim.filter(col(keyCol).isNull).drop(keyCol), Seq(ord), keyCol, maxKey)
    existing.unionByName(fresh.select(existing.columns.map(col).toIndexedSeq: _*))
  }

  def run(in: Inputs): Result = {
    val sd = lit(in.startDate)
    val ed = lit(in.endDate)
    // max-key lookups go through the KeyLedger metadata files when the
    // run carries a ledger dir (SURVEY §7.3-7: the dimension max is the
    // one driver-side collect worth replacing at 100 TB); without one,
    // the legacy scalar max scan runs inline. A ledger-enabled caller
    // MUST refresh after publishing ([[refreshLedger]]) — the recorded
    // max is pre-mint, so skipping the refresh would re-mint the same
    // keys next run (MonthlySpec proves the full cycle).
    def ledgerMax(table: String, df: DataFrame,
                  keyCol: String): Option[Long] =
      in.keyLedger.map(dir => graft.etl.KeyLedger.maxKey(dir, table) {
        df.agg(coalesce(max(col(keyCol)), lit(0L))).first().getLong(0)
      })

    // ---- S1: staging full map + new-fingerprint insert ----
    val fullMap = Fingerprint.monthlyFullMap(in.header, in.detail,
      in.dimFingerprint, sd, in.algo)
    val maxFpId = ledgerMax("dimFingerprint", in.dimFingerprint,
        "FingerprintID")
      .getOrElse(in.dimFingerprint
        .agg(coalesce(max(col("FingerprintID")), lit(0L)))
        .first().getLong(0))
    val newFps = Merge.sequenceKeysOrdered(
        Fingerprint.newFingerprints(in.header, in.dimFingerprint, sd, ed,
          algo = in.algo),
        Seq(col("SimHash")), "FingerprintID", maxFpId)
      .select(col("FingerprintID"), col("SimHash"), col("MerchantLegalName"),
        col("MerchantName"), col("AddressLine01"),
        lit(1L).as("SFRestaurantKey")) // S3:64 unmapped sentinel
    val dimFp = Fingerprint.cleanFingerprintNames(
      in.dimFingerprint.unionByName(newFps, allowMissingColumns = true))

    // ---- S3: fingerprint fact mapping (guarded, in-window only) ----
    val fact1 = Fingerprint.updateFactFingerprint(in.fact, fullMap, dimFp,
      in.startKey, in.endKey)

    // ---- P-Pat/S2: patron conformance + two fact mapping passes ----
    val clProxy = Patron.stageClProxy(in.header, sd, ed)
    val dimPatron = assignMissingKeys(
      Patron.insertNewPatrons(in.dimPatron, clProxy, in.dimZipGeo,
        in.dimClient),
      "ID", col("ProxyID"), ledgerMax("dimPatron", in.dimPatron, "ID"))
    val fact2 = Patron.mapFactPatron(fact1, in.txnProxy, dimPatron,
      in.startKey, in.endKey)
    val dimUnique = assignMissingKeys(
      Patron.insertUniquePatrons(in.dimUniquePatron,
        in.uniquePatronCandidates),
      "UniquePatronId", col("ProxyID"),
      ledgerMax("dimUniquePatron", in.dimUniquePatron, "UniquePatronId"))
    val fact3 = Patron.mapFactUniquePatron(fact2, in.txnKeys, dimUnique,
      in.startKey, in.endKey)

    // ---- Seg: spend staging, personas, bridge ----
    val mm = Segmentation.minimarketSpend(
      fact3.select(col("UniquePatronId"), col("GeographyID"), col("DateKey"),
        col("Amount")),
      in.dimTerritory, dimUnique, in.startKey, in.endKey)
    val personas = Segmentation.classify(Segmentation.spendRatios(mm),
      dimUnique)

    Result(
      outputs = Map(
        "staging_full_map" -> fullMap,
        "dim_fingerprint" -> dimFp,
        "dim_patron" -> dimPatron,
        "dim_unique_patron" -> dimUnique,
        "fact_transaction" -> fact3,
        "minimarket_spend" -> mm,
        "personas" -> personas),
      unmappedPatrons =
        fact3.filter(col("Patron_ID") === 1 &&
          col("DateKey").between(in.startKey, in.endKey)).count(),
      unmappedUniquePatrons =
        Patron.unmappedCount(fact3, in.startKey, in.endKey))
  }

  /** The publish-time half of the KeyLedger contract: refresh the
    * recorded max for every key-minting dimension from the PUBLISHED
    * frames. `run` reads the ledger as authoritative and never writes
    * post-mint maxima (the outputs are still lazy inside run — forcing
    * them there would double-compute the batch), so a ledger-enabled
    * deployment must call this after `Publish.publishAll` succeeds;
    * skipping it re-mints the same keys next run. One scalar aggregate
    * per dimension, off the mapping critical path — read the frames
    * back from the published parquet so the scan is a key-column read,
    * not a lineage replay. MonthlySpec proves the full
    * run → publish → refresh → rerun cycle continues keys without
    * collision. */
  def refreshLedger(dir: String,
                    outputs: Map[String, DataFrame]): Unit = {
    graft.etl.KeyLedger.recordFrom(dir, "dimFingerprint",
      outputs("dim_fingerprint"), "FingerprintID")
    graft.etl.KeyLedger.recordFrom(dir, "dimPatron",
      outputs("dim_patron"), "ID")
    graft.etl.KeyLedger.recordFrom(dir, "dimUniquePatron",
      outputs("dim_unique_patron"), "UniquePatronId")
    ()
  }
}
