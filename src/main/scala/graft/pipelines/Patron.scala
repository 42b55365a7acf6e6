package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{Merge, Ops}

/** P-Pat + S2 — patron dimension conformance and fact mapping
  * (`0. stored procedures/[UpdateMapDimPatron]/UpdtMapDimPatron.sql`,
  * `2. Update and Map Patron Dimensions/script.sql`).
  *
  * Flow: stage per-proxy transaction counts, resolve duplicate proxies
  * (keep the highest-txn-count row), insert new patrons (incl. synthesized
  * proxy ids for card-only rows), insert unique patrons, then the guarded
  * multi-pass fact mapping (sentinel Patron_ID=1 / UniquePatronId=0 means
  * "not yet mapped").
  */
object Patron {

  /** P-Pat:30-41 — `Staging.ClProxy`: distinct proxy attributes with
    * transaction counts over the month window. */
  def stageClProxy(header: DataFrame, startDate: Column,
                   endDate: Column): DataFrame =
    header
      .filter(col("TransactionDate").between(startDate, endDate))
      .groupBy(col("clientcode"), col("proxyid"),
        col("cardmemberbillingzipcode"), col("cardmembercountrycode"),
        col("creditcardnum"))
      .agg(count(lit(1)).as("txncount"))

  /** P-Pat:48-62 — duplicate resolution: among rows sharing (proxyid,
    * clientcode), keep the one with the highest txncount (the reference's
    * theta self-join `th.txncount > t2.txncount` exclusion, expressed as
    * the equivalent rank-pick), then anti-join against existing patrons
    * and append. `geo` maps 5-digit billing zips to GeographyID
    * (P-Pat:56-57). */
  def insertNewPatrons(dimPatron: DataFrame, clProxy: DataFrame,
                       dimZip: DataFrame, dimClient: DataFrame): DataFrame = {
    val best = Merge.pickLatest(
      clProxy.filter(col("proxyid").isNotNull && !col("proxyid").contains("_")),
      Seq(col("proxyid"), col("clientcode")),
      Seq(col("txncount").desc, col("creditcardnum")))
    val fresh = best
      .join(broadcast(dimClient.select(col("clientcode"),
        col("ClientID"))), Seq("clientcode"), "left")
      .join(broadcast(dimZip.select(col("ZipCode").as("__zip"),
          col("GeographyID"))),
        substring(col("cardmemberbillingzipcode"), 1, 5) === col("__zip"),
        "left")
      .select(
        // P-Pat:51/69 defaults: isnull(clientid,0), isnull(geographyid,0),
        // isnull(LEFT(zip,5),'Unknown') — the unmatched-lookup sentinels
        // are 0/0/'Unknown' here, NOT the restaurant proc's 41802
        col("proxyid").as("ProxyID"),
        coalesce(col("ClientID"), lit(0L)).as("ClientID"),
        coalesce(col("GeographyID"), lit(0)).as("GeographyID"),
        coalesce(substring(col("cardmemberbillingzipcode"), 1, 5),
          lit("Unknown")).as("ZipCode"),
        Ops.padLast4(col("creditcardnum")).as("CC_Last4Digits"))
      .join(dimPatron.select(col("ProxyID")), Seq("ProxyID"), "left_anti")
      // deterministic candidate per new proxy (the reference resolves its
      // duplicates by the txncount self-join, UpdtMapDimPatron.sql:48-62)
      .transform(df => Merge.pickLatest(df, Seq(col("ProxyID")),
        df.columns.filter(_ != "ProxyID").map(c => col(c).asc).toSeq))
    dimPatron.unionByName(fresh, allowMissingColumns = true)
  }

  /** P-Pat:96-115 — synthesized proxies for card-only rows:
    * `ClientID + '_' + last-4-of-card` (P-Pat:98, 139). */
  def synthesizedProxy(clientId: Column, ccNum: Column): Column =
    concat(clientId.cast("string"), lit("_"), Ops.padLast4(ccNum))

  /** P-Pat:119-142 — two-pass fact mapping. Pass 1 joins on the natural
    * ProxyID; pass 2 on the synthesized proxy. Only rows with the
    * "not yet mapped" sentinel (Patron_ID=1, P-Pat:113/129/140) inside the
    * window are touched. `txnProxy` carries (TH_ID, proxyid, ClientID,
    * creditcardnum) per transaction. */
  def mapFactPatron(fact: DataFrame, txnProxy: DataFrame,
                    dimPatron: DataFrame, startKey: Long,
                    endKey: Long): DataFrame = {
    val window = fact("DateKey").between(startKey, endKey)
    val pass1Map = txnProxy
      .join(dimPatron.select(col("ProxyID").as("__dproxy1"),
          col("ID").as("__pid1")),
        txnProxy("proxyid") === col("__dproxy1"))
      .select(col("TH_ID").as("__tid1"), col("__pid1"))
      // several dim rows can match one fact row's key once proxy spaces
      // collide at scale; collapse to the MIN dim id — deterministic
      // across runs and partitionings (dropDuplicates is neither) and
      // recomputable by the oracle's min(). The reference resolves its
      // source duplicates with an explicit priority rule before updating
      // (UpdtMapDimPatron.sql:48-62); min-id is the fixture stand-in.
      .groupBy(col("__tid1")).agg(min(col("__pid1")).as("__pid1"))
    val pass1 = Merge.mapUpdate(fact, pass1Map,
      Seq(fact("TH_ID") === col("__tid1")),
      Map("Patron_ID" -> col("__pid1")),
      guard = fact("Patron_ID") === 1 && window)
    val pass2Map = txnProxy
      // P-Pat:141 guard: CC_Last4Digits IS NOT NULL — without it
      // padLast4(NULL) = '0000' would map card-less rows to whichever
      // patron's card ends in 0000
      .filter(txnProxy("creditcardnum").isNotNull)
      .join(dimPatron.select(col("ProxyID").as("__dproxy2"),
          col("ID").as("__pid2")),
        synthesizedProxy(txnProxy("ClientID"), txnProxy("creditcardnum"))
          === col("__dproxy2"))
      .select(col("TH_ID").as("__tid2"), col("__pid2"))
      .groupBy(col("__tid2")).agg(min(col("__pid2")).as("__pid2"))
    Merge.mapUpdate(pass1, pass2Map,
      Seq(pass1("TH_ID") === col("__tid2")),
      Map("Patron_ID" -> col("__pid2")),
      guard = pass1("Patron_ID") === 1 &&
        pass1("DateKey").between(startKey, endKey))
  }

  /** S2:23-28 / 97-107 — DimUniquePatron insert-if-absent on ProxyID; the
    * reference's read-own-writes hazard (S2:108) is resolved by chaining:
    * the returned frame is what later passes must join (SURVEY §7.3(3)). */
  def insertUniquePatrons(dimUnique: DataFrame, candidates: DataFrame): DataFrame =
    Merge.insertIfAbsent(dimUnique, candidates, Seq("ProxyID"))

  /** S2:31-37, 67-80, 111-116 — three-phase UniquePatronId mapping:
    * employee-id pass, card-number pass, catch-all remap; each pass only
    * touches rows still at the sentinel (isnull(UniquePatronId,0)=0) in
    * the window, and passes chain so pass N+1 sees pass N's result. */
  def mapFactUniquePatron(fact: DataFrame, txnKeys: DataFrame,
                          dimUnique: DataFrame, startKey: Long,
                          endKey: Long): DataFrame = {
    def pass(f: DataFrame, joinKey: (DataFrame, Column) => Column,
             tag: String): DataFrame = {
      val d = dimUnique.select(col("ProxyID").as(s"__proxy$tag"),
        col("UniquePatronId").as(s"__uid$tag"))
      val m = txnKeys.join(d, joinKey(txnKeys, col(s"__proxy$tag")))
        .select(col("DVHD_ID").as(s"__did$tag"), col(s"__uid$tag"))
        // deterministic min-id collapse, as in mapFactPatron
        .groupBy(col(s"__did$tag"))
        .agg(min(col(s"__uid$tag")).as(s"__uid$tag"))
      Merge.mapUpdate(f, m, Seq(f("DVHD_ID") === col(s"__did$tag")),
        Map("UniquePatronId" -> col(s"__uid$tag")),
        guard = coalesce(f("UniquePatronId"), lit(0L)) === 0 &&
          f("DateKey").between(startKey, endKey))
    }
    // T-SQL CONCAT renders NULL as '' but KEEPS the separators
    // (S2:70 concat(clientcode,'_',employeeid,'_',creditcardnum) gives
    // 'C5__123' for a NULL employeeid) — concat_ws would skip the slot
    // and produce 'C5_123', colliding with other key shapes
    def tsqlConcat(parts: Column*): Column =
      concat(parts.map(coalesce(_, lit(""))): _*)
    val p1 = pass(fact, (t, p) => tsqlConcat(t("clientcode"), lit("_"),
      t("employeeid"), lit("_"), t("creditcardnum")) === p, "1")
    val p2 = pass(p1, (t, p) => tsqlConcat(t("clientcode"), lit("_"),
      Ops.padLast4(t("creditcardnum"))) === p, "2")
    pass(p2, (t, p) => t("proxyid") === p, "3")
  }

  /** S2:90-94 — the validation invariant: unmapped rows in the window after
    * the passes; "a zero count indicates the mapping was successful". */
  def unmappedCount(fact: DataFrame, startKey: Long, endKey: Long): Long =
    fact.filter(coalesce(col("UniquePatronId"), lit(0L)) === 0 &&
      col("DateKey").between(startKey, endKey)).count()
}
