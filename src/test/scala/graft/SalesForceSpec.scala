package graft

import org.apache.spark.sql.functions._
import graft.pipelines.SalesForce

/** P-SF dimension-sync semantics (spScript.sql:35-79, 205-212). */
class SalesForceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val brandProfile = Seq(
    ("B1", "Acme", "QSR", null, "burgers", "100.5", "2000"),
    ("B2", "Beta", "UPSCALE", "GIVEN", "steak", "N/A", ""),
    ("B3", "", "QSR", null, "x", "1", "1"),          // empty name -> dropped
    ("B4", null, "QSR", null, "x", "1", "1"),        // null name -> dropped
    ("B5", "Echo", "CASUAL", null, "pasta", "7.25", "9"), // not synced
    ("B6", "Zed", "MIDSCALE", null, null, "3", "4")
  ).toDF("Id", "BrandName", "RestaurantSegment", "DiningGroupSegment",
    "PrimaryCuisine", "CateringAmountThreshold", "LargeEventThreshold")

  private lazy val sfSync =
    Seq("B1", "B1", "B2", "B3", "B4", "B6").toDF("BrandProfileId")

  test("brandProfileSource: semi-join, name filter, segment default, try_cast") {
    val src = SalesForce.brandProfileSource(brandProfile, sfSync)
      .orderBy("BrandProfileId").collect()
    assert(src.map(_.getString(0)).toSeq == Seq("B1", "B2", "B6"))
    val b1 = src(0)
    assert(b1.getAs[String]("DiningGroupSegment") == "LSR")   // QSR default
    assert(b1.getAs[java.math.BigDecimal]("CateringAmountThreshold")
      .doubleValue() == 100.5)
    val b2 = src(1)
    assert(b2.getAs[String]("DiningGroupSegment") == "GIVEN") // given kept
    assert(b2.isNullAt(b2.fieldIndex("CateringAmountThreshold"))) // 'N/A'
    assert(b2.isNullAt(b2.fieldIndex("LargeEventThreshold")))     // ''
    assert(src(2).getAs[String]("DiningGroupSegment") == "FSR") // MIDSCALE
  }

  test("mergeBrandProfile: ISNULL-normalized change detection") {
    // target B1 matches source B1 except PrimaryCuisine ''-vs-null — the
    // ISNULL compare treats those equal, so the row must NOT update;
    // B2's stale name must update; B6 is absent -> insert
    val target = Seq(
      ("B1", "Acme", "QSR", "LSR", "", java.math.BigDecimal.valueOf(100.5),
        java.math.BigDecimal.valueOf(2000)),
      ("B2", "stale", "UPSCALE", "GIVEN", "steak",
        null.asInstanceOf[java.math.BigDecimal],
        null.asInstanceOf[java.math.BigDecimal])
    ).toDF("BrandProfileId", "BrandName", "RestaurantSegment",
      "DiningGroupSegment", "PrimaryCuisine", "CateringAmountThreshold",
      "LargeEventThreshold")
    // align B1 cuisine with target semantics: source has null there
    val bp = brandProfile.withColumn("PrimaryCuisine",
      when(col("Id") === "B1", lit(null).cast("string"))
        .otherwise(col("PrimaryCuisine")))
    val out = SalesForce.mergeBrandProfile(target, bp, sfSync)
      .orderBy("BrandProfileId").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("B1", "B2", "B6"))
    // B1 unchanged: target's '' PrimaryCuisine survives (not source's null)
    assert(out(0).getAs[String]("PrimaryCuisine") == "")
    // B2 updated: name refreshed, thresholds now null-vs-null unchanged?
    // no — target thresholds null, source null too ('N/A'/'') -> equal;
    // but BrandName differs -> whole row updates from source
    assert(out(1).getAs[String]("BrandName") == "Beta")
    // B6 inserted with its defaulted segment
    assert(out(2).getAs[String]("DiningGroupSegment") == "FSR")
  }

  test("mergeBrandProfile is idempotent (re-running the sync is a no-op)") {
    val target = Seq(
      ("B2", "stale", "UPSCALE", "GIVEN", "steak",
        null.asInstanceOf[java.math.BigDecimal],
        null.asInstanceOf[java.math.BigDecimal])
    ).toDF("BrandProfileId", "BrandName", "RestaurantSegment",
      "DiningGroupSegment", "PrimaryCuisine", "CateringAmountThreshold",
      "LargeEventThreshold")
    val once = SalesForce.mergeBrandProfile(target, brandProfile, sfSync)
    val twice = SalesForce.mergeBrandProfile(once, brandProfile, sfSync)
    assert(once.orderBy("BrandProfileId").collect().toSeq ==
      twice.orderBy("BrandProfileId").collect().toSeq)
  }

  private lazy val dim = Seq(
    (101L, "A1", "one", -1L),
    (102L, "A2", "two", -1L),
    (103L, "A3", "three", -1L),
    (104L, "A4", "four", -1L)
  ).toDF("SFRestaurantKey", "SFKey", "AccountName", "SFParentRestaurantKey")

  test("linkParentAccounts: parent key, NULL parent, missing parent, unsynced") {
    val sync = Seq(
      ("A1", "A3"),   // parent exists -> 103
      ("A2", null),   // NULL parent -> link set NULL
      ("A3", "ZZZ")   // parent absent from dim -> link set NULL
      // A4 unsynced -> keeps -1
    ).toDF("AccountID", "ParentAccountID")
    val out = SalesForce.linkParentAccounts(dim, sync)
      .orderBy("SFRestaurantKey").collect()
    assert(out(0).getAs[Long]("SFParentRestaurantKey") == 103L)
    assert(out(1).isNullAt(out(1).fieldIndex("SFParentRestaurantKey")))
    assert(out(2).isNullAt(out(2).fieldIndex("SFParentRestaurantKey")))
    assert(out(3).getAs[Long]("SFParentRestaurantKey") == -1L)
  }

  test("linkParentAccounts is idempotent on a stable sync") {
    val sync = Seq(("A1", "A3"), ("A2", null), ("A3", "ZZZ"))
      .toDF("AccountID", "ParentAccountID")
    val once = SalesForce.linkParentAccounts(dim, sync)
    val twice = SalesForce.linkParentAccounts(once, sync)
    assert(once.orderBy("SFRestaurantKey").collect().toSeq ==
      twice.orderBy("SFRestaurantKey").collect().toSeq)
  }
}
