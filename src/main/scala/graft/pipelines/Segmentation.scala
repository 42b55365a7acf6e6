package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{Merge, Ops}

/** Seg — patron segmentation (`patching_scripts/patron_segmentation.sql`)
  * and Cui — cuisine-type imputation (`patching_scripts/cuisine_type.sql`).
  *
  * Personas (Seg:221-225):
  *   Road Warrior  — max-territory spend ratio < 0.8
  *   City person   — territory ratio >= 0.8 and max-minimarket ratio < 0.8
  *   Office manager— territory ratio > 0.8 and minimarket ratio >= 0.8
  *   Undefined     — every patron not otherwise classified (backfill)
  */
object Segmentation {

  /** Seg:127-136 — MinimarketSpend staging: high-value patrons' spend per
    * (patron, territory, minimarket) inside the trailing-12-month window. */
  def minimarketSpend(fact: DataFrame, dimZip: DataFrame,
                      dimUniquePatron: DataFrame,
                      startKey: Long, endKey: Long): DataFrame =
    fact
      .filter(col("DateKey").between(startKey, endKey))
      .join(dimZip.select(col("GeographyID"), col("SalesTerritory"),
        col("DIN_DisplayMiniMarketName")), Seq("GeographyID"))
      .join(dimUniquePatron.filter(col("IsHighValue") === 1)
        .select(col("UniquePatronId")), Seq("UniquePatronId"))
      .groupBy(col("UniquePatronId"), col("SalesTerritory"),
        col("DIN_DisplayMiniMarketName"))
      .agg(sum(col("Amount")).as("MinimarketAmount"),
        count(lit(1)).as("TxnCount"))

  /** Seg:144-182 — the ratio chain: total per patron; top territory and top
    * minimarket (row_number desc, rn=1); spend ratios vs the total. */
  def spendRatios(mmSpend: DataFrame): DataFrame = {
    val total = mmSpend.groupBy(col("UniquePatronId"))
      .agg(sum(col("MinimarketAmount")).as("TotalAmount"))
    val territory = mmSpend.groupBy(col("UniquePatronId"), col("SalesTerritory"))
      .agg(sum(col("MinimarketAmount")).as("TerritoryAmount"))
    val maxTerritory = Merge.pickLatest(territory, Seq(col("UniquePatronId")),
        Seq(col("TerritoryAmount").desc, col("SalesTerritory")))
    val maxMinimarket = Merge.pickLatest(mmSpend, Seq(col("UniquePatronId")),
        Seq(col("MinimarketAmount").desc, col("SalesTerritory"),
          col("DIN_DisplayMiniMarketName")))
    maxTerritory
      .join(total, Seq("UniquePatronId"))
      .join(maxMinimarket.select(col("UniquePatronId"),
        col("DIN_DisplayMiniMarketName"), col("MinimarketAmount")),
        Seq("UniquePatronId"))
      .select(col("UniquePatronId"), col("SalesTerritory"),
        col("DIN_DisplayMiniMarketName"),
        Ops.safeRatio(col("TerritoryAmount"), col("TotalAmount"))
          .as("TerritorySpendRatio"),
        Ops.safeRatio(col("MinimarketAmount"), col("TotalAmount"))
          .as("MMSpendRatio"))
  }

  /** Seg:184-217 — persona classification via the three UNION ALL branches
    * at the 0.8 thresholds, then the Undefined backfill for every patron in
    * the dimension not yet classified (anti-join, Seg:211-217). Returns
    * (UniquePatronId, PersonaName). */
  def classify(ratios: DataFrame, dimUniquePatron: DataFrame): DataFrame = {
    val rw = ratios.filter(col("TerritorySpendRatio") < 0.8)
      .select(col("UniquePatronId"), lit("Road Warrior").as("PersonaName"))
    val cp = ratios.filter(col("TerritorySpendRatio") >= 0.8 &&
        col("MMSpendRatio") < 0.8)
      .select(col("UniquePatronId"), lit("City person").as("PersonaName"))
    val om = ratios.filter(col("TerritorySpendRatio") > 0.8 &&
        col("MMSpendRatio") >= 0.8)
      .select(col("UniquePatronId"), lit("Office manager").as("PersonaName"))
    val classified = rw.unionByName(cp).unionByName(om).distinct()
    val undef = dimUniquePatron.select(col("UniquePatronId"))
      .join(classified, Seq("UniquePatronId"), "left_anti")
      .select(col("UniquePatronId"), lit("Undefined").as("PersonaName"))
    classified.unionByName(undef)
  }

  /** Seg:184-217 end-to-end into the bridge fact: join the persona names to
    * DimPatronSegmentation ids; unique (UniquePatronId, SegmentationId). */
  def factSegmentation(ratios: DataFrame, dimUniquePatron: DataFrame,
                       dimSegmentation: DataFrame): DataFrame =
    classify(ratios, dimUniquePatron)
      .join(broadcast(dimSegmentation.select(col("Id").as("SegmentationId"),
        col("PersonaName"))), Seq("PersonaName"))
      .select(col("UniquePatronId"), col("SegmentationId"))
      .distinct()

  /** Seg:391-399 — ClientMinimarketSpend top-10 snapshot: rank minimarkets
    * per (client, territory, persona) by spend share, keep MMRank <= 10. */
  def topMinimarkets(spend: DataFrame, k: Int = 10): DataFrame =
    spend.withColumn("MMRank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("ClientCode"), col("SalesTerritory"),
            col("PersonaName"))
          .orderBy(col("PercentOfSpend").desc,
            col("DIN_DisplayMiniMarketName"))))
      .filter(col("MMRank") <= k)

  /** Seg:405-426 — DinersCount: distinct diners and high-value diners per
    * client over the trailing window. */
  def dinersCount(fact: DataFrame, dimUniquePatron: DataFrame,
                  dimClient: DataFrame, startKey: Long,
                  endKey: Long): DataFrame =
    fact.filter(col("DateKey").between(startKey, endKey))
      .join(dimUniquePatron.select(col("UniquePatronId"), col("IsHighValue"),
        col("ClientID")), Seq("UniquePatronId"))
      .join(broadcast(dimClient.select(col("ClientID"), col("ClientName"))),
        Seq("ClientID"))
      .groupBy(col("ClientName"))
      .agg(countDistinct(col("UniquePatronId")).as("DinersCount"),
        countDistinct(when(col("IsHighValue") === 1, col("UniquePatronId")))
          .as("HighValueDiners"))

  /** Cui:11-67 — cuisine-type mode imputation for DimSalesForceRestaurant:
    * most frequent non-'N/A' cuisine per brand, preferring partner
    * restaurants' mode (Type='Partner') over the all-rows mode; rows with
    * CuisineType 'N/A' in brands below `rankCutoff` get the imputed value. */
  def imputeCuisine(dim: DataFrame, rankCutoff: Int = 1500): DataFrame = {
    val known = dim.filter(col("CuisineType").isNotNull &&
      col("CuisineType") =!= "N/A")
    val partnerMode = Merge.modePerGroup(
        known.filter(col("Type") === "Partner"), "Brand", "CuisineType")
      .withColumnRenamed("CuisineType_mode", "__partner_mode")
    val commonMode = Merge.modePerGroup(known, "Brand", "CuisineType")
      .withColumnRenamed("CuisineType_mode", "__common_mode")
    dim
      .join(broadcast(partnerMode), Seq("Brand"), "left")
      .join(broadcast(commonMode), Seq("Brand"), "left")
      .withColumn("CuisineType",
        when(col("CuisineType") === "N/A" && col("Rank") < rankCutoff &&
            coalesce(col("__partner_mode"), col("__common_mode")).isNotNull,
          coalesce(col("__partner_mode"), col("__common_mode")))
          .otherwise(col("CuisineType")))
      .drop("__partner_mode", "__common_mode")
  }
}
