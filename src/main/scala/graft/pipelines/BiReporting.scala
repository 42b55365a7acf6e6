package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.Merge

/** S5 — BI reporting definitions
  * (`5. BI Reporting Aggregations/BIReportingAgg_script.sql`).
  *
  * Two MERGEs (definitions dimension + restaurant↔group bridge) and the
  * DimRestaurant BiReportingId backfill.
  */
object BiReporting {

  /** S5:11-37 — MERGE DimBiReportingDefinitions from the back-office
    * definition source (keyed on BiBackofficeId; name/owner/parent
    * update on match, insert otherwise). */
  def mergeDefinitions(dim: DataFrame, source: DataFrame): DataFrame =
    Merge.mergeUpsert(dim, source, Seq("BiBackofficeId"),
      updateCols = Seq("BiReportingName", "BiReportingGroupOwner",
        "BiReportingParentId"))

  /** S5:54-67 — MERGE FactBiReportingRelationships: the (BiReportingId,
    * RestaurantKey) bridge; pure key pairs, insert-if-absent + delete
    * pairs gone from the source. */
  def mergeRelationships(bridge: DataFrame, source: DataFrame): DataFrame =
    Merge.mergeUpsert(bridge, source.dropDuplicates("BiReportingId",
        "RestaurantKey"),
      Seq("BiReportingId", "RestaurantKey"), updateCols = Seq(),
      deleteNotMatched = true)

  /** S5:41-45 — backfill DimRestaurant.BiReportingId from the definitions
    * via the bridge, only where not yet set. */
  def updateDimRestaurant(dim: DataFrame, bridge: DataFrame): DataFrame = {
    val m = bridge.select(col("RestaurantKey").as("__rk"),
      col("BiReportingId").as("__bid"))
      // deterministic pick when a restaurant belongs to several groups
      .transform(Merge.pickLatest(_, Seq(col("__rk")),
        Seq(col("__bid").asc)))
    Merge.mapUpdate(dim, m, Seq(dim("RestaurantKey") === col("__rk")),
      Map("BiReportingId" -> col("__bid")),
      guard = coalesce(dim("BiReportingId"), lit(0L)) === 0)
  }
}
