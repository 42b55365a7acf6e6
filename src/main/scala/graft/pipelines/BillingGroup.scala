package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{Merge, Ops}

/** S4 — billing-group conformance
  * (`4. Billing Group/BillingGroup_script.sql`).
  *
  * SCD-lite merge of per-(site, billing-group) validity intervals from
  * invoice history, surrogate-key insert into DimBillingGroup, and the
  * latest-row-per-site fact mapping.
  */
object BillingGroup {

  /** The 14-deep REPLACE canonicalization chain + RTRIM (S4:19-29, applied
    * identically to both join sides). */
  def cleanBillGroup(c: Column): Column =
    rtrim(Ops.cleanName(c, Seq(
      "'" -> "", "/" -> "-", "É" -> "E", "P. F." -> "P F",
      "B.GOOD" -> "BGOOD", "  " -> " ", "-TERMED" -> "", " - " -> "-",
      "-TERMINATED" -> "", "-TERM" -> "", "." -> "", "!" -> "",
      "_" -> " ", " -" -> "-")))

  /** S4:15-46 — MERGE BillingGroupLocations:
    * source = invoice detail since `since`, grouped per (SiteId, cleaned
    * BillGroup): ValidFrom = first-of-month of min(txndate), ValidTo =
    * end-of-month of max(txndate) or the open-row sentinel 9999-12-31 when
    * it reaches the current maximum date; back-office id resolved by a
    * left join on the cleaned billing_id, one row per key via rnk=1
    * (ORDER BY bg.ID DESC). Matched rows update ValidTo (+ conditional
    * BackOfficeBillingGroupId: a source of -1 keeps the target's, S4:37);
    * new rows insert with a fresh uuid. */
  def mergeLocations(target: DataFrame, invoiceDetail: DataFrame,
                     backOfficeGroups: DataFrame, since: Column): DataFrame = {
    val maxDate = invoiceDetail.agg(max(col("txndate"))).first().getDate(0)
    val joined = invoiceDetail
      .filter(col("txndate") >= since && col("SiteId").isNotNull)
      .withColumn("__name", cleanBillGroup(col("BillGroup")))
      .join(backOfficeGroups.select(col("ID").as("__boid"),
          cleanBillGroup(col("billing_id")).as("__boname")),
        col("__name") === col("__boname"), "left")
    val grouped = joined
      .groupBy(col("SiteId"), col("__name"), col("__boid"))
      .agg(min(col("txndate")).as("__minTxn"), max(col("txndate")).as("__maxTxn"))
    val source = Merge.pickLatest(grouped, Seq(col("SiteId"), col("__name")),
        Seq(col("__boid").desc_nulls_last))
      .select(
        col("SiteId"),
        col("__name").as("BillingGroupDisplayName"),
        coalesce(col("__boid"), lit(-1L)).as("BackOfficeBillingGroupId"),
        trunc(col("__minTxn"), "MM").as("ValidFrom"),
        // S4:22 IIF(EOMONTH(MAX(TXNDATE)) = @maxDate, '9999-12-31', ...)
        // — @maxDate is the RAW global max date, so the open-row sentinel
        // fires only when that max is itself a month-end date (the
        // reference runs right after a month closes, when it is)
        when(last_day(col("__maxTxn")) === lit(maxDate),
          lit("9999-12-31").cast("date"))
          .otherwise(last_day(col("__maxTxn"))).as("ValidTo"))
      .withColumn("Id", uuid())
    // the matched-update IIF (S4:37: source id -1 keeps the target's id) is
    // resolved against the target up front, so the merge itself updates
    // ValidTo and BackOfficeBillingGroupId unconditionally like S4:34-37
    val resolved = source.alias("src")
      .join(target.select(col("SiteId"), col("BillingGroupDisplayName"),
          col("BackOfficeBillingGroupId").as("__tboid")),
        Seq("SiteId", "BillingGroupDisplayName"), "left")
      .withColumn("BackOfficeBillingGroupId",
        when(col("BackOfficeBillingGroupId") === -1 && col("__tboid").isNotNull,
          col("__tboid")).otherwise(col("BackOfficeBillingGroupId")))
      .drop("__tboid")
    Merge.mergeUpsert(
      target, resolved,
      keys = Seq("SiteId", "BillingGroupDisplayName"),
      updateCols = Seq("ValidTo", "BackOfficeBillingGroupId"))
  }

  /** S4:60-70 — insert-if-absent into DimBillingGroup with surrogate keys
    * continuing from the current max (row_number + max-key, S4:65). Keys
    * continue from `maxKeyHint` when the caller holds one (a
    * [[graft.etl.KeyLedger]] read — no dimension scan); sequencing is
    * the range-partitioned [[Merge.sequenceKeysOrdered]] on
    * (name, back-office id) — the frame's distinct key, so assignment
    * is fully deterministic where the reference's name-only ORDER BY
    * left same-name ties to the engine. */
  def insertNewGroups(dim: DataFrame, locations: DataFrame,
                      maxKeyHint: Option[Long] = None): DataFrame = {
    val maxKey = maxKeyHint.getOrElse(
      dim.agg(coalesce(max(col("BillingGroupKey")), lit(0L)))
        .first().getLong(0))
    val fresh = locations
      .select(col("BillingGroupDisplayName").as("BillingGroupName"),
        coalesce(col("BackOfficeBillingGroupId"), lit(-1L))
          .as("BillingGroupBackOfficeId"))
      .distinct()
      .join(dim, Seq("BillingGroupName", "BillingGroupBackOfficeId"),
        "left_anti")
    dim.unionByName(
      Merge.sequenceKeysOrdered(fresh,
        Seq(col("BillingGroupName"), col("BillingGroupBackOfficeId")),
        "BillingGroupKey", maxKey)
        .select(dim.columns.map(col).toIndexedSeq: _*))
  }

  /** S4:75-93 — fact mapping: latest location row per site (rank by
    * ValidFrom desc), bridge fact→DimRestaurant(RLP_ID)→location→dim key;
    * update only unmapped (BillingGroupKey=0), VolumeTypeKey=1 rows at or
    * after `maxDateKey` (first of the snapshot month). */
  def updateFact(fact: DataFrame, dimRestaurant: DataFrame,
                 locations: DataFrame, dimBillingGroup: DataFrame,
                 maxDateKey: Long): DataFrame = {
    val latest = Merge.pickLatest(locations, Seq(col("SiteId")),
      Seq(col("ValidFrom").desc))
    val mapping = dimRestaurant
      .select(col("RestaurantKey").as("__rk"), col("RLP_ID"))
      .join(latest.select(col("SiteId"),
        col("BillingGroupDisplayName").as("__bgn")),
        col("RLP_ID") === col("SiteId"))
      .join(dimBillingGroup.select(
        col("BillingGroupName").as("__bgn"),
        col("BillingGroupKey").as("__bgk")), Seq("__bgn"))
      .select(col("__rk"), col("__bgk"))
      // deterministic pick when a restaurant matches several groups
      .transform(Merge.pickLatest(_, Seq(col("__rk")),
        Seq(col("__bgk").asc)))
    Merge.mapUpdate(fact, mapping,
      Seq(fact("RestaurantKey") === col("__rk")),
      Map("BillingGroupKey" -> col("__bgk")),
      guard = fact("VolumeTypeKey") === 1 && fact("BillingGroupKey") === 0 &&
        fact("DateKey") >= maxDateKey)
  }
}
