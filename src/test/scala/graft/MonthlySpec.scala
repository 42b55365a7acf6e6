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

  /** The minimal coherent month the suite runs end to end — shared by the
    * batch test and the rerun-idempotence property below. */
  private def monthInputs(): Monthly.Inputs = {
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

    Monthly.Inputs(
      header = header, detail = detail, dimFingerprint = dimFingerprint,
      fact = fact, txnProxy = txnProxy, txnKeys = txnKeys,
      dimPatron = dimPatron, dimUniquePatron = dimUniquePatron,
      uniquePatronCandidates = candidates,
      dimZipGeo = Seq(("11111", 1), ("22222", 2)).toDF("ZipCode", "GeographyID"),
      dimClient = Seq(("AA", 2L)).toDF("clientcode", "ClientID"),
      dimTerritory = Seq((1, "EAST", "NY"), (2, "WEST", "BERLIN"))
        .toDF("GeographyID", "SalesTerritory", "DIN_DisplayMiniMarketName"),
      startDate = "2025-02-01", endDate = "2025-02-28",
      startKey = 20250201L, endKey = 20250228L, algo = "md5")
  }

  test("monthly batch: fingerprints, patrons, personas, atomic publish") {
    val result = Monthly.run(monthInputs())

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

  /** The reference's rerun-safety contract (SURVEY §2.9): running the same
    * month again must not corrupt the warehouse. Two facets:
    *  - determinism — the same inputs produce bit-equal outputs;
    *  - fixed point — a rerun over the ALREADY-updated warehouse converges:
    *    the first rerun may legitimately map MORE fact rows (S1 builds the
    *    full map from the dim as it stood before that run's inserts, so
    *    fingerprints minted in run 1 only become mappable in run 2 — same
    *    as the reference's next-month catch-up), after which every further
    *    rerun is bit-identical. Guarded + sentinel-driven updates make the
    *    converged state stable: nothing double-inserts, no key re-mints. */
  test("month rerun: deterministic, and idempotent at the warehouse fixed point") {
    def rerunInputs(in: Monthly.Inputs,
                    out: Map[String, org.apache.spark.sql.DataFrame]) =
      in.copy(
        dimFingerprint = out("dim_fingerprint"),
        fact = out("fact_transaction"),
        dimPatron = out("dim_patron"),
        dimUniquePatron = out("dim_unique_patron"))
    // localCheckpoint pins each run's outputs so the next run's lineage
    // doesn't recompute (and possibly re-mint keys through) the previous
    def pin(r: Monthly.Result): Map[String, org.apache.spark.sql.DataFrame] =
      r.outputs.map { case (k, df) => k -> df.localCheckpoint() }
    def sameRows(k: String, a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.schema.map(f => (f.name, f.dataType)) ==
        b.schema.map(f => (f.name, f.dataType)), s"$k: schema drift")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty &&
        a.count() == b.count(), s"$k: row drift on rerun")
    }

    val in = monthInputs()
    // determinism: same inputs, bit-equal outputs
    val d1 = pin(Monthly.run(in))
    val d2 = pin(Monthly.run(in))
    d1.keys.foreach(k => sameRows(k, d1(k), d2(k)))

    // fixed point: run2 consumes run1's warehouse, run3 consumes run2's;
    // run2 == run3 exactly, and the probes stay at zero
    val o2 = pin(Monthly.run(rerunInputs(in, d1)))
    val r3 = Monthly.run(rerunInputs(in, o2))
    val o3 = pin(r3)
    o2.keys.foreach(k => sameRows(k, o2(k), o3(k)))
    assert(r3.unmappedPatrons == 0 && r3.unmappedUniquePatrons == 0)
  }

  /** SURVEY §7.3-7: with a KeyLedger the batch's max-key lookups read
    * metadata files instead of scanning dimension key columns — and the
    * ledger value is authoritative, so key minting continues from it. */
  test("keyLedger: outputs identical, ledger seeded on first contact, " +
      "a recorded max drives the next mint without a dim scan, and " +
      "recordFrom refreshes at publish time") {
    import graft.etl.KeyLedger
    val dir = Files.createTempDirectory("graft_ledger").toString
    val in = monthInputs()
    val base = Monthly.run(in).outputs
      .map { case (k, df) => k -> df.localCheckpoint() }
    val led = Monthly.run(in.copy(keyLedger = Some(dir))).outputs
    // same world, same keys: the ledger changes where the max comes
    // from, never what gets minted
    base.keys.foreach { k =>
      assert(led(k).exceptAll(base(k)).isEmpty &&
        base(k).exceptAll(led(k)).isEmpty, s"$k drifted under the ledger")
    }
    // first contact seeded all three tables from the fallback scans
    assert(KeyLedger.read(dir, "dimFingerprint").contains(10L))
    assert(KeyLedger.read(dir, "dimPatron").isDefined)
    assert(KeyLedger.read(dir, "dimUniquePatron").isDefined)
    // the full contract cycle: refresh from the published dims, then a
    // next run's mint CONTINUES past the published keys instead of
    // re-minting them — the collision a ledger-enabled deployment that
    // skipped refreshLedger would silently hit
    Monthly.refreshLedger(dir, base)
    assert(KeyLedger.read(dir, "dimFingerprint").contains(11L),
      "refreshLedger must record the post-mint max")
    val nextMax = Monthly.run(in.copy(keyLedger = Some(dir)))
      .outputs("dim_fingerprint")
      .agg(max(col("FingerprintID"))).first().getLong(0)
    assert(nextMax == 12L,
      s"post-refresh mint must continue at 12 (11 is published), " +
        s"got $nextMax")
    // the ledger is authoritative: bump dimFingerprint's recorded max and
    // the next run mints ABOVE it — proof the scan was skipped
    KeyLedger.record(dir, "dimFingerprint", 500L)
    val bumped = Monthly.run(in.copy(keyLedger = Some(dir)))
      .outputs("dim_fingerprint")
      .agg(max(col("FingerprintID"))).first().getLong(0)
    assert(bumped == 501L,
      s"expected the new fingerprint keyed 501 from the ledger max, got $bumped")
    // publish-time refresh: recordFrom scans the published dim once and
    // the ledger catches up
    val refreshed = KeyLedger.recordFrom(dir, "dimFingerprint",
      base("dim_fingerprint"), "FingerprintID")
    assert(refreshed == 11L && KeyLedger.read(dir, "dimFingerprint")
      .contains(11L))
  }

  /** The ledger's durability contract: post-mint maxima commit
    * WRITE-AHEAD of the warehouse swap (publishWithLedger records from
    * the staged parquet before anything becomes visible), so a crash in
    * ANY window leaves key GAPS on rerun — SQL Server IDENTITY-after-
    * rollback semantics — never duplicate keys. Plus the two repair
    * paths: a deleted ledger falls back to the first-contact re-scan,
    * and a failed record() leaves no temp-file residue. */
  test("publishWithLedger: write-ahead ledger survives a crash between " +
      "record and swap with gaps not duplicates; deleted-ledger re-scan " +
      "fallback; record() cleans its temp file on failure") {
    import graft.etl.{KeyLedger, Publish}
    import org.apache.spark.sql.functions.max
    val dir = Files.createTempDirectory("graft_ledger_crash").toString
    val root = Files.createTempDirectory("graft_pub_crash").toString
    val in = monthInputs().copy(keyLedger = Some(dir))
    val out1 = Monthly.run(in).outputs
      .map { case (k, df) => k -> df.localCheckpoint() }

    // happy path: ONE call stages, records post-mint maxima, swaps —
    // no separate refreshLedger step for the caller to forget
    assert(Monthly.publishWithLedger(spark, root, out1, dir).isSuccess)
    assert(KeyLedger.read(dir, "dimFingerprint").contains(11L),
      "publishWithLedger must record the post-mint max")
    assert(spark.read.parquet(s"$root/dim_fingerprint").count() == 2)

    // crash injection: the ledger records land (simulating a larger
    // run that minted up to 42), then the process dies BEFORE the swap.
    // publishAll's contract: nothing becomes visible.
    val bigger = out1 + ("dim_fingerprint" ->
      out1("dim_fingerprint").withColumn("FingerprintID",
        org.apache.spark.sql.functions.col("FingerprintID") + 31L)
        .localCheckpoint()) // max key now 42
    val boom = Publish.publishAll(root, bigger, staged => {
      KeyLedger.recordFrom(dir, "dimFingerprint",
        spark.read.parquet(staged("dim_fingerprint")), "FingerprintID")
      throw new RuntimeException("injected crash between record and swap")
    })
    assert(boom.isFailure, "the injected crash must abort the publish")
    // the warehouse still shows run 1 (max key 11)...
    assert(spark.read.parquet(s"$root/dim_fingerprint")
      .agg(max(col("FingerprintID"))).first().getLong(0) == 11L)
    // ...and the ledger is AHEAD at 42 — so the rerun mints 43: a gap
    // of 12..42 (burned, like IDENTITY after rollback), NO duplicate of
    // any key the crashed run staged
    assert(KeyLedger.read(dir, "dimFingerprint").contains(42L))
    val rerunMax = Monthly.run(in).outputs("dim_fingerprint")
      .agg(max(col("FingerprintID"))).first().getLong(0)
    assert(rerunMax == 43L,
      s"rerun after the crash must mint ABOVE the recorded max, got $rerunMax")

    // stale-ledger fallback: a deleted ledger file re-seeds from the
    // first-contact dimension scan (the documented re-scan path)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "dimFingerprint.maxkey"))
    val rescanMax = Monthly.run(in).outputs("dim_fingerprint")
      .agg(max(col("FingerprintID"))).first().getLong(0)
    assert(rescanMax == 11L && KeyLedger.read(dir, "dimFingerprint")
        .contains(10L),
      "a missing ledger entry must fall back to the dim scan and re-seed")

    // record() failure hygiene: moving onto a non-empty DIRECTORY named
    // like the ledger file fails — the temp file must not survive it
    val blocked = java.nio.file.Paths.get(dir, "blocked.maxkey")
    java.nio.file.Files.createDirectories(blocked.resolve("x"))
    intercept[Exception] { KeyLedger.record(dir, "blocked", 7L) }
    val residue = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith(".blocked-"))
      .count()
    assert(residue == 0L, "record() leaked a temp file on failure")
  }

  /** The sequencing inside the batch is the range-partitioned form: no
    * single-partition exchange may appear in any published output's
    * executed plan (the O39 scale posture, PlanSpec's discipline applied
    * to the pipeline composition). */
  test("monthly plans: no single-partition exchange in any output") {
    val result = Monthly.run(monthInputs())
    result.outputs.foreach { case (name, df) =>
      df.count()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange SinglePartition"),
        s"$name plan has a single-partition exchange:\n${p.take(2000)}")
    }
  }
}
