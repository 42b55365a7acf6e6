package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.Merge

/** The P-SF dimension-sync shapes of the reference's
  * `spUpdateDimSalesForceRestaurantAndDimFingerprint` that previously rode
  * only on the generic Merge kit: the DimSalesForceBrand MERGE with
  * TRY_CAST'd thresholds + CASE-defaulted segment (spScript.sql:35-79) and
  * the parent-account self-link UPDATE (spScript.sql:205-212).
  *
  * Scale posture: both are single equi-joins on the dimension key — one
  * shuffle each, AQE-broadcastable, no driver collection.
  */
object SalesForce {

  /** spScript.sql:35-79 — DimSalesForceBrand MERGE.
    *
    * Source prep (spScript.sql:38-54): BrandProfile semi-joined to the
    * DISTINCT BrandProfileIds present in SfSync, rows with NULL/empty
    * BrandName dropped (`nullif(bp.BrandName,'') is not null`), the
    * DiningGroupSegment defaulted from RestaurantSegment when missing
    * (QSR/FAST CASUAL -> LSR; MIDSCALE/UPSCALE/FINE DINING/CASUAL -> FSR)
    * and the two free-text thresholds TRY_CAST to DECIMAL(18,4) — bad
    * strings become NULL, not errors.
    *
    * Merge (spScript.sql:55-79): update only when some field actually
    * differs under ISNULL-normalized compare; insert when absent.
    *
    * `brandProfile` columns: Id, BrandName, RestaurantSegment,
    * DiningGroupSegment, PrimaryCuisine, CateringAmountThreshold,
    * LargeEventThreshold (thresholds as strings). `sfSync` must carry
    * BrandProfileId. `target` has BrandProfileId + the six value columns.
    */
  def brandProfileSource(brandProfile: DataFrame, sfSync: DataFrame): DataFrame =
    brandProfile
      .join(sfSync.select(col("BrandProfileId")).distinct(),
        brandProfile("Id") === col("BrandProfileId"), "left_semi")
      .filter(col("BrandName").isNotNull && col("BrandName") =!= "")
      .select(
        col("Id").as("BrandProfileId"),
        col("BrandName"),
        col("RestaurantSegment"),
        when(col("DiningGroupSegment").isNull &&
            col("RestaurantSegment").isin("QSR", "FAST CASUAL"), "LSR")
          .when(col("DiningGroupSegment").isNull &&
            col("RestaurantSegment").isin("MIDSCALE", "UPSCALE",
              "FINE DINING", "CASUAL"), "FSR")
          .otherwise(col("DiningGroupSegment")).as("DiningGroupSegment"),
        col("PrimaryCuisine"),
        expr("try_cast(CateringAmountThreshold as decimal(18,4))")
          .as("CateringAmountThreshold"),
        expr("try_cast(LargeEventThreshold as decimal(18,4))")
          .as("LargeEventThreshold"))

  private val valueCols = Seq("BrandName", "RestaurantSegment",
    "DiningGroupSegment", "PrimaryCuisine", "CateringAmountThreshold",
    "LargeEventThreshold")

  def mergeBrandProfile(target: DataFrame, brandProfile: DataFrame,
                        sfSync: DataFrame): DataFrame = {
    val source = brandProfileSource(brandProfile, sfSync)
    // spScript.sql:56-63 — `ISNULL(t.x,'') <> ISNULL(s.x,'')` per string
    // field, `ISNULL(t.x,-1) <> ISNULL(s.x,-1)` per threshold
    val changed = Seq("BrandName", "RestaurantSegment", "DiningGroupSegment",
        "PrimaryCuisine")
      .map(c => coalesce(col(s"t.$c"), lit("")) =!=
                coalesce(col(s"s.$c"), lit("")))
      .++(Seq("CateringAmountThreshold", "LargeEventThreshold")
        .map(c => coalesce(col(s"t.$c"), lit(-1)) =!=
                  coalesce(col(s"s.$c"), lit(-1))))
      .reduce(_ || _)
    Merge.mergeUpsert(target, source, Seq("BrandProfileId"),
      updateCols = valueCols, updateCondition = Some(changed))
  }

  /** spScript.sql:205-212 — the parent-account self-link pass:
    *
    * {{{ UPDATE DFR SET DFR.SFParentRestaurantKey = DFR_parent.SFRestaurantKey
    *     FROM DimSalesForceRestaurant DFR
    *     JOIN SfSync s ON DFR.SFKey = s.AccountID
    *     LEFT JOIN DimSalesForceRestaurant DFR_parent
    *            ON DFR_parent.SFKey = s.ParentAccountID }}}
    *
    * Every dim row with a sync row is re-linked; a missing/NULL parent sets
    * the link to NULL (the LEFT JOIN semantics — NOT preserve-old, unlike
    * [[Merge.mapUpdate]]'s guarded contract). Rows without a sync row keep
    * their current link. The self-join is dim-vs-dim on the string key —
    * one shuffle (or broadcast) of the dimension only.
    *
    * `sync` must be unique per AccountID (the reference's UPDATE..FROM is
    * nondeterministic otherwise); enforce upstream with [[Merge.pickLatest]].
    */
  def linkParentAccounts(dim: DataFrame, sync: DataFrame): DataFrame = {
    val parents = dim.select(col("SFKey").as("__parent_key"),
      col("SFRestaurantKey").as("__parent_rk"))
    val resolved = sync
      .select(col("AccountID"), col("ParentAccountID"))
      .join(parents, col("ParentAccountID") === col("__parent_key"), "left")
      .select(col("AccountID").as("__acct"), col("__parent_rk"),
        lit(true).as("__synced"))
    val out = dim.columns.map {
      case "SFParentRestaurantKey" =>
        when(col("__synced").isNotNull, col("__parent_rk"))
          .otherwise(col("SFParentRestaurantKey")).as("SFParentRestaurantKey")
      case c => col(c)
    }
    dim.join(resolved, dim("SFKey") === col("__acct"), "left")
      .select(out.toIndexedSeq: _*)
  }
}
