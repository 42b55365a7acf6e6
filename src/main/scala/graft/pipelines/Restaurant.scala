package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{Merge, Ops}

/** P-Rest — restaurant dimension conformance
  * (`0. stored procedures/[UpdateMapDimRestaurant]/UpdMapDimRest.sql`).
  *
  * Core semantics: priority-ranked matching of raw location names to the
  * canonical restaurant list, restaurant-group canonicalization with
  * word-order fixes, insert-if-absent groups, staged dimension sync, and
  * the guarded fact mapping (RestaurantKey=0 sentinel).
  */
object Restaurant {

  /** P-Rest:225-229 / 287-289 — restaurant-group name canonicalization:
    * accent/punctuation folds plus explicit word-order and spelling fixes. */
  def cleanGroupName(c: Column): Column =
    rtrim(Ops.cleanName(upper(c), Seq(
      "'" -> "", "É" -> "E", "." -> "", "," -> "",
      "BEDFORD THE" -> "THE BEDFORD",
      "DINOSAUR BAR-B-QUE" -> "DINOSAUR BBQ",
      "  " -> " ")))

  /** P-Rest:16-47 — RANK matches of billing sites to restaurant locations
    * by a 4-way CASE match-quality score between the site's location name
    * and the canonical list's name variants; ties survive (RANK), and only
    * ranking=1 rows are kept (the reference deletes ranking!=1,
    * P-Rest:65-66). `sites` carries (site_ID, rest_location_name);
    * `locations` carries (RLP_ID, RLP_restaurantName, RLP_DinName). */
  def rankSiteMatches(sites: DataFrame, locations: DataFrame): DataFrame = {
    val siteName = Ops.normPart(col("rest_location_name"))
    val rlpName = Ops.normPart(col("RLP_restaurantName"))
    val dinName = Ops.normPart(col("RLP_DinName"))
    val quality =
      when(siteName === rlpName, 1)
        .when(siteName === dinName, 2)
        .when(siteName.contains(rlpName) || rlpName.contains(siteName), 3)
        .otherwise(4)
    // OR-of-equijoins would plan as BroadcastNestedLoopJoin (O28 note);
    // the scale-preferred shape is a union of hash equi-joins + dedup
    val byRlp = sites.join(locations,
      substring(siteName, 1, 5) === substring(rlpName, 1, 5))
    val byDin = sites.join(locations,
      substring(siteName, 1, 5) === substring(dinName, 1, 5))
    val joined = byRlp.unionByName(byDin)
      .dropDuplicates("site_ID", "RLP_ID")
    Merge.rankPick(joined.withColumn("__quality", quality),
        Seq(col("site_ID")), col("__quality"))
      .drop("__quality")
  }

  /** P-Rest:221-235 — insert new restaurant groups: canonical names not yet
    * in the dimension (NOT IN on the cleaned name, P-Rest:228-229), with
    * program date range aggregated per group. Keys continue from
    * `maxKeyHint` when the caller holds one (a [[graft.etl.KeyLedger]]
    * read — no dimension scan) and from a scalar max scan otherwise;
    * sequencing is the range-partitioned [[Merge.sequenceKeysOrdered]]
    * (names are unique post-groupBy, so keys are byte-identical to the
    * reference's global row_number with no single-partition window). */
  def insertNewGroups(dimGroup: DataFrame, staging: DataFrame,
                      maxKeyHint: Option[Long] = None): DataFrame = {
    val maxKey = maxKeyHint.getOrElse(
      dimGroup.agg(coalesce(max(col("RestaurantGroupKey")), lit(0L)))
        .first().getLong(0))
    val fresh = staging
      .withColumn("__name", cleanGroupName(col("ChainName")))
      .filter(col("__name").isNotNull && col("__name") =!= "")
      .groupBy(col("__name"))
      .agg(min(col("ProgramStartDateKey")).as("RestaurantGroupStartDateKey"),
        max(col("ProgramEndDateKey")).as("RestaurantGroupEndDateKey"))
      .withColumnRenamed("__name", "RestaurantGroupName")
      .join(dimGroup.select(cleanGroupName(col("RestaurantGroupName"))
        .as("RestaurantGroupName")), Seq("RestaurantGroupName"), "left_anti")
    dimGroup.unionByName(
      Merge.sequenceKeysOrdered(fresh, Seq(col("RestaurantGroupName")),
        "RestaurantGroupKey", maxKey)
        .select(dimGroup.columns.map(col).toIndexedSeq: _*))
  }

  /** P-Rest:70-217 — staged dimension sync: latest row per RLP_ID
    * (PARTITION BY rlp_ID ORDER BY programEndDateKey DESC, P-Rest:243),
    * then a full MERGE into DimRestaurant keyed on RLP_ID with
    * delete-not-matched (staging_DimRestaurant truncate-reload semantics,
    * P-Rest:216-217) guarded to never drop the Unknown member (key 0). */
  def syncDimRestaurant(dim: DataFrame, staging: DataFrame,
                        updateCols: Seq[String]): DataFrame = {
    val latest = Merge.pickLatest(staging, Seq(col("RLP_ID")),
      Seq(col("ProgramEndDateKey").desc_nulls_last))
    Merge.mergeUpsert(dim, latest, Seq("RLP_ID"), updateCols,
      deleteNotMatched = true,
      deleteGuard = Some(col("t.RestaurantKey") === 0))
  }

  /** P-Rest:460-484 — guarded fact mapping: only rows in the current month
    * window with the RestaurantKey=0 sentinel and VolumeTypeKey in (1,2);
    * maps RestaurantKey and RestaurantGroupKey (default group 606 when the
    * restaurant has none, P-Rest:267). */
  def updateFact(fact: DataFrame, dimRestaurant: DataFrame,
                 siteOfTxn: DataFrame, startKey: Long,
                 endKey: Long): DataFrame = {
    val mapping = siteOfTxn
      .join(dimRestaurant.select(col("RLP_ID"),
        col("RestaurantKey").as("__rk"),
        coalesce(col("RestaurantGroupKey"), lit(606L)).as("__rgk")),
        siteOfTxn("site_ID") === col("RLP_ID"))
      .select(col("DIHD_ID").as("__did"), col("__rk"), col("__rgk"))
      // deterministic single mapping per fact row (dropDuplicates is
      // partition-order dependent once a site maps to several rows)
      .transform(Merge.pickLatest(_, Seq(col("__did")),
        Seq(col("__rk").asc, col("__rgk").asc)))
    Merge.mapUpdate(fact, mapping, Seq(fact("DIHD_ID") === col("__did")),
      Map("RestaurantKey" -> col("__rk"), "RestaurantGroupKey" -> col("__rgk")),
      guard = fact("RestaurantKey") === 0 &&
        fact("VolumeTypeKey").isin(1, 2) &&
        fact("DateKey").between(startKey, endKey))
  }

  /** S3:91-99 — residual validation: unmapped fact rows in the window
    * ("treba da vraca 0 rows", S3:41). */
  def unmappedCount(fact: DataFrame, startKey: Long, endKey: Long): Long =
    fact.filter((col("RestaurantKey") === 0 || col("SFRestaurantKey") === 1) &&
      col("VolumeTypeKey") === 1 &&
      col("DateKey").between(startKey, endKey)).count()
}
