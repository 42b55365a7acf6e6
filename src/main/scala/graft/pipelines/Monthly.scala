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
    // publishes through [[publishWithLedger]], which records the
    // post-mint maxima write-ahead of the swap — the recorded value
    // here is pre-mint, so publishing around the ledger would re-mint
    // the same keys next run (MonthlySpec proves the full cycle AND
    // the crash windows).
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

  /** The three key-minting dimensions: (ledger table, output name, key
    * column) — ONE list so [[publishWithLedger]] and [[refreshLedger]]
    * can never disagree about what gets recorded. */
  private val ledgerTables = Seq(
    ("dimFingerprint", "dim_fingerprint", "FingerprintID"),
    ("dimPatron", "dim_patron", "ID"),
    ("dimUniquePatron", "dim_unique_patron", "UniquePatronId"))

  /** Publish the batch AND commit the key ledger in the crash-safe
    * order — the ledger-enabled deployment's ONE publish call. The
    * post-mint maxima are recorded from the STAGED parquet (already
    * written, so reading it is a key-column scan, not a lineage
    * replay) BEFORE any table swaps in, via [[graft.etl.Publish
    * .publishAll]]'s onStaged seam. That write-ahead ordering is what
    * makes every crash window safe:
    *
    *  - crash while staging: ledger untouched, nothing published —
    *    the rerun mints the same keys again, publishes once;
    *  - crash after a ledger record, before the swap: nothing
    *    published, ledger AHEAD — the rerun mints from the recorded
    *    max, leaving a key GAP (exactly SQL Server IDENTITY after a
    *    rollback) but never a duplicate;
    *  - crash after the swap: ledger and warehouse already agree.
    *
    * The reverse order (publish, then record — the old refreshLedger
    * contract) had a window where a crash left published keys BELOW a
    * stale ledger max, silently re-minted on rerun; MonthlySpec's
    * crash-injection test pins that this ordering closes it. */
  def publishWithLedger(spark: org.apache.spark.sql.SparkSession,
                        root: String, outputs: Map[String, DataFrame],
                        ledgerDir: String)
      : scala.util.Try[Seq[String]] = {
    // fail BEFORE staging, not silently after: a publish that omits a
    // key-minting dimension (subset publish, renamed output) would
    // otherwise swap the warehouse in while the ledger keeps the
    // pre-mint max — the exact silent-duplicate-keys bug this API
    // exists to close (review finding; refreshLedger's outputs(out)
    // lookup is loud for the same reason)
    val missing = ledgerTables.collect {
      case (_, out, _) if !outputs.contains(out) => out
    }
    require(missing.isEmpty,
      s"publishWithLedger: outputs map lacks key-minting dimension(s) " +
        s"$missing — publish them here too, or use Publish.publishAll " +
        "for a subset publish that mints no keys")
    graft.etl.Publish.publishAll(root, outputs, staged =>
      ledgerTables.foreach { case (table, out, keyCol) =>
        graft.etl.KeyLedger.recordFrom(ledgerDir, table,
          spark.read.parquet(staged(out)), keyCol)
      })
  }

  /** Record the post-mint maxima from already-materialized output
    * frames — the manual half of the ledger contract for deployments
    * that publish through their own channel instead of
    * [[publishWithLedger]] (which is the default: it removes the
    * crash window between publish and refresh by recording BEFORE the
    * swap). If you call this yourself, it must run only after the
    * outputs are DURABLY published; a crash in between leaves the
    * ledger at the pre-mint max and the next run re-mints published
    * keys. One scalar aggregate per dimension. */
  def refreshLedger(dir: String,
                    outputs: Map[String, DataFrame]): Unit = {
    ledgerTables.foreach { case (table, out, keyCol) =>
      graft.etl.KeyLedger.recordFrom(dir, table, outputs(out), keyCol)
    }
    ()
  }
}
