package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.etl.{Merge, Ops, Tables => T}

/** Reference-parity operator queries (SURVEY.md §2) over the driver fixtures.
  *
  * Output discipline (drives the DuckDB hash-compare):
  *  - numeric outputs are long or double; aggregates of doubles accumulate
  *    as DECIMAL(18,4) then cast to double, so values are independent of
  *    partitioning/addition order and identical across engines;
  *  - no raw timestamps in outputs (cast to date / formatted string);
  *  - every query ends with an ORDER BY on non-null unique keys, mirrored
  *    verbatim in the oracle SQL.
  */
object CoreQueries {

  private def dec(c: Column, s: Int = 4) = c.cast(DecimalType(18, s))
  private def dsum(c: Column) = Ops.exactSum(c)

  type Q = (SparkSession, String) => DataFrame

  /** O14/O33/O34 — projection + multi-key hash aggregate (TPC-H Q1 shape;
    * ref S1:103-128 grouped merchant aggregate). */
  val q01PricingSummary: Q = (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** O15/O18 — IN-list + LIKE predicates (ref S1:94-98 country/MCC whitelist,
    * S3:57-58 LIKE patches). */
  val q02FilterInLike: Q = (s, d) =>
    T.part(s, d)
      .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#3") &&
        (col("p_name").like("%re%") || col("p_type").like("%ECO%")) &&
        !col("p_name").like("%_x%"))
      .select(col("p_partkey").cast("long").as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"))
      .orderBy(col("p_partkey"))

  /** O20/O32 — star join with broadcast dimension lookups
    * (fact ⋈ dim chains of S2:33-34, Seg:131-133). */
  val q03StarJoinAgg: Q = (s, d) =>
    T.lineitem(s, d)
      .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  /** O21/O17 — left outer enrich + null-state handling (ref S1:18-25). */
  val q04LeftJoinEnrich: Q = (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_f_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("f_spend"))
      .select(col("c_custkey").cast("long").as("c_custkey"), col("n_f_orders"),
        col("f_spend"))
      .orderBy(col("c_custkey"))

  /** O22 — anti-join idiom: customers with no 'F' order (insert-only-new
    * pattern, P-Pat:48-62). */
  val q05AntiJoin: Q = (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** O23 — semi-join (`IN` subquery, P-Rest:25): customers with >= 1 urgent
    * open order. */
  val q06SemiJoin: Q = (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** O24 + §2.8 hash surface — the flagship fingerprint pipeline (S1):
    * detail ⋈ header, canonical merchant fingerprint over normalized attrs,
    * join the fingerprint dimension on the recomputed hash, aggregate per
    * fingerprint. md5 here because the DuckDB oracle lacks sha1; the library
    * supports both (Ops.fingerprint). */
  val q07FingerprintPipeline: Q = (s, d) => {
    val sup = T.supplier(s, d).join(broadcast(T.nation(s, d)),
      col("s_nationkey") === col("n_nationkey"))
    val fpParts = Seq(col("s_name"), col("n_name"), col("s_nationkey").cast("string"))
    val fpDim = sup.select(Ops.fingerprint(fpParts, "md5").as("fp"),
      col("s_suppkey").cast("long").as("fp_suppkey"))
    // repartition before the hash derivation: with broadcast joins the
    // pipeline inherits the scan's parallelism (one split per row group),
    // serializing the CPU-dense md5 + distinct aggregate; a cheap row
    // shuffle spreads it — the same pattern a few-huge-gzip-files source
    // needs at cluster scale
    val detail = T.lineitem(s, d).join(T.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .repartition(col("l_suppkey"))
      .withColumn("fp", Ops.fingerprint(fpParts, "md5"))
    detail.join(broadcast(fpDim), Seq("fp"), "left")
      .groupBy(col("fp"), col("fp_suppkey"))
      .agg(count(lit(1)).as("n_txn"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        max(col("o_orderdate").cast("date")).as("last_order"))
      .orderBy(col("fp"))
  }

  /** O25 — join on concatenated composite key with the pad-last-4 idiom
    * (S2:70, P-Pat:139). */
  val q08CompositeKeyJoin: Q = (s, d) => {
    val cust = T.customer(s, d)
    val proxyDim = cust.select(
      concat_ws("_", col("c_mktsegment"),
        Ops.padLast4(col("c_custkey").cast("string"))).as("proxy_id"),
      col("c_custkey").cast("long").as("dim_custkey"))
    T.orders(s, d)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("proxy_id", concat_ws("_", col("c_mktsegment"),
        Ops.padLast4(col("o_custkey").cast("string"))))
      .join(proxyDim, Seq("proxy_id"))
      .groupBy(col("proxy_id"))
      .agg(countDistinct(col("dim_custkey")).as("n_dim_hits"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("proxy_id"))
  }

  /** O26 — theta self-join: per duplicate group, count dominated twins
    * (`th.txncount > t2.txncount` dup resolution, P-Pat:53-55). */
  val q09ThetaSelfJoin: Q = (s, d) => {
    val c1 = T.customer(s, d).alias("c1")
    val c2 = T.customer(s, d).alias("c2")
    c1.join(c2,
        col("c1.c_nationkey") === col("c2.c_nationkey") &&
        col("c1.c_mktsegment") === col("c2.c_mktsegment") &&
        col("c1.c_acctbal") > col("c2.c_acctbal"))
      .groupBy(col("c1.c_custkey"))
      .agg(count(lit(1)).as("n_dominated"))
      .select(col("c_custkey").cast("long").as("c_custkey"), col("n_dominated"))
      .orderBy(col("c_custkey"))
  }

  /** O27 — join on a CASE-derived key (P-Rest:113-125). */
  val q10CaseExprJoin: Q = (s, d) => {
    val grpDim = s.createDataFrame(Seq(
      ("INDUSTRY", 1L), ("CONSTRUCTION", 2L), ("OTHER", 3L)))
      .toDF("grp_name", "grp_id")
    T.customer(s, d)
      .withColumn("grp", when(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), "INDUSTRY")
        .when(col("c_mktsegment").isin("BUILDING", "FURNITURE"), "CONSTRUCTION")
        .otherwise("OTHER"))
      .join(broadcast(grpDim), col("grp") === col("grp_name"))
      .groupBy(col("grp_id"), col("grp_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("grp_id"))
  }

  /** O28 — multi-predicate OR fuzzy name join, rewritten as the
    * scale-preferred union of equi-joins + distinct (P-Rest:448-451). */
  val q11UnionFuzzyJoin: Q = (s, d) => {
    val sup = T.supplier(s, d)
    val dim = sup.select(col("s_suppkey").cast("long").as("clean_id"),
      when(col("s_suppkey") % 3 === 0, col("s_name"))
        .when(col("s_suppkey") % 3 === 1, regexp_replace(col("s_name"), "#", ""))
        .otherwise(regexp_replace(col("s_name"), "e", "é")).as("clean_name"))
    val left = sup.select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
    val b1 = left.join(dim, col("s_name") === col("clean_name"))
    val b2 = left.join(dim, regexp_replace(col("s_name"), "#", "") === col("clean_name"))
    val b3 = left.join(dim, col("s_name") === regexp_replace(col("clean_name"), "é", "e"))
    b1.unionByName(b2).unionByName(b3)
      .select(col("s_suppkey"), col("clean_id"))
      .distinct()
      .orderBy(col("s_suppkey"), col("clean_id"))
  }

  /** O4/O5 — MERGE upsert with conditional update (S4:15-46, P-SF:55-70). */
  val q12MergeUpsert: Q = (s, d) => {
    val sup = T.supplier(s, d)
    val target = sup.filter(col("s_suppkey") <= 80)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("s_acctbal"), lit("old").as("status"))
    val source = sup.filter(col("s_suppkey").between(41, 120))
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        (col("s_acctbal") + 1000.0).as("s_acctbal"), lit("new").as("status"))
    Merge.mergeUpsert(target, source, Seq("s_suppkey"),
        updateCols = Seq("s_acctbal", "status"),
        updateCondition = Some(col("t.s_acctbal") =!= col("s.s_acctbal")))
      .orderBy(col("s_suppkey"))
  }

  /** O6 — MERGE incl. NOT-MATCHED-BY-SOURCE delete with guard rows
    * (P-SF:201-202, 302-303). */
  val q13MergeDeleteGuard: Q = (s, d) => {
    val sup = T.supplier(s, d)
    val target = sup.filter(col("s_suppkey") <= 80)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("s_acctbal"), lit("old").as("status"))
    val source = sup.filter(col("s_suppkey").between(41, 120) && col("s_suppkey") % 2 === 0)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        (col("s_acctbal") + 1000.0).as("s_acctbal"), lit("new").as("status"))
    Merge.mergeUpsert(target, source, Seq("s_suppkey"),
        updateCols = Seq("s_acctbal", "status"),
        deleteNotMatched = true,
        deleteGuard = Some(col("t.s_suppkey") <= 10))
      .orderBy(col("s_suppkey"))
  }

  /** O3 — insert-if-absent (left-anti + union, P-Pat:48-62). */
  val q14InsertIfAbsent: Q = (s, d) => {
    val cust = T.customer(s, d)
    val existing = cust.filter(col("c_custkey") <= 500)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_mktsegment"))
    val incoming = cust
      .join(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_mktsegment"))
    Merge.insertIfAbsent(existing, incoming, Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** O7 — the correlated UPDATE..FROM workhorse: map unmapped fact rows
    * inside a date window, preserve everything else untouched
    * (S2:31-37, P-Rest:466-484). Sentinel 0 = unmapped. */
  val q15MapUpdateFact: Q = (s, d) => {
    val fact = T.orders(s, d).select(
      col("o_orderkey").cast("long").as("o_orderkey"),
      col("o_custkey"),
      Ops.dateKey(col("o_orderdate")).cast("long").as("datekey"),
      when(col("o_orderstatus") === "O", lit(0L))
        .otherwise(col("o_custkey").cast("long")).as("patron_key"))
    val mapping = T.customer(s, d)
      .select(col("c_custkey"), col("c_custkey").cast("long").as("mapped_key"))
    val guard = col("patron_key") === 0 &&
      col("datekey").between(19960101L, 19971231L)
    Merge.mapUpdate(fact, mapping, Seq(col("o_custkey") === col("c_custkey")),
        Map("patron_key" -> col("mapped_key")), guard)
      .select(col("o_orderkey"), col("datekey"), col("patron_key"))
      .orderBy(col("o_orderkey"))
  }

  /** O8 + §2.8 string chains — replace-chain canonicalization and U+FFFD
    * cleanup (S4:19-29, S3:19-23). */
  val q16StringClean: Q = (s, d) =>
    T.supplier(s, d).select(
      col("s_suppkey").cast("long").as("s_suppkey"),
      Ops.cleanName(col("s_name"),
        Seq("#" -> "-", "Supplier" -> "SUPP", "000" -> "")).as("cleaned"),
      Ops.stripReplacementChar(concat(col("s_name"), lit("�!�"))).as("stripped"),
      Ops.emptyToNull(when(col("s_suppkey") % 5 === 0, lit("  "))
        .otherwise(col("s_name"))).as("maybe_null"))
    .orderBy(col("s_suppkey"))

  /** O37 — rank-dedup pick-latest (S4:76; Cui passim). */
  val q17DedupRank: Q = (s, d) =>
    Merge.pickLatest(T.orders(s, d), Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("o_custkey"))

  /** O38 — RANK by CASE priority score, ties kept (P-Rest:22, 30-41). */
  val q18PriorityRank: Q = (s, d) =>
    Merge.rankPick(
        T.orders(s, d).withColumn("prio",
          substring(col("o_orderpriority"), 1, 1).cast("int")),
        Seq(col("o_custkey")), col("prio"))
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderpriority"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** O39 — surrogate-key sequencing from a max-key offset (S4:65). */
  val q19SequenceKeys: Q = (s, d) =>
    Merge.sequenceKeys(
        T.customer(s, d).select(col("c_mktsegment")).distinct(),
        Seq(col("c_mktsegment")), "segment_key", 100L)
      .select(col("segment_key"), col("c_mktsegment"))
      .orderBy(col("segment_key"))

  /** O40 — top-k per group (Seg:391-399 `MMRank <= 10`). */
  val q20TopKPerGroup: Q = (s, d) =>
    T.orders(s, d)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rnk") <= 5)
      .select(col("o_orderpriority"), col("rnk").cast("long").as("rnk"),
        col("o_orderkey").cast("long").as("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))

  /** O41 — most-frequent value per group (Cui:28-46 mode imputation). */
  val q21ModePerGroup: Q = (s, d) =>
    Merge.modePerGroup(T.part(s, d), "p_brand", "p_type")
      .withColumnRenamed("p_type_mode", "type_mode")
      .orderBy(col("p_brand"))

  /** O35/O36 — conditional aggregates + HAVING over them (Cui:199-203). */
  val q22HavingConditional: Q = (s, d) =>
    T.part(s, d)
      .groupBy(col("p_brand"))
      .agg(count(when(col("p_size") <= 5, 1)).as("n_small"),
        count(lit(1)).as("n_parts"))
      .filter(col("n_small") >= 5 && col("n_parts") > 10)
      .orderBy(col("p_brand"))

  /** O36b — SELECT DISTINCT projection. */
  val q23Distinct: Q = (s, d) =>
    T.customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  /** O36d — aggregate-of-aggregate ratio via two grouping levels joined on
    * the coarser key (Seg:144-169 TerritoryAmount/TotalAmount). */
  val q24AggRatio: Q = (s, d) => {
    val enriched = T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
    // the coarser level re-aggregates the finer one's DECIMAL partials
    // (exact, associative) instead of re-joining the base tables — the
    // identical fine-grained subtree under both join inputs lets Spark
    // reuse its exchange, so the 3-way join runs once
    val perNationDec = enriched.groupBy(col("c_mktsegment"), col("n_name"))
      .agg(sum(dec(col("o_totalprice"))).as("__spend"))
    val perSeg = perNationDec.groupBy(col("c_mktsegment"))
      .agg(sum(col("__spend")).cast("double").as("seg_spend"))
    perNationDec.withColumn("nation_spend", col("__spend").cast("double"))
      .join(perSeg, Seq("c_mktsegment"))
      .select(col("c_mktsegment"), col("n_name"), col("nation_spend"),
        round(Ops.safeRatio(col("nation_spend"), col("seg_spend")), 6).as("spend_ratio"))
      .orderBy(col("c_mktsegment"), col("n_name"))
  }

  /** O44 + Seg semantics — persona classification via UNION ALL branches at
    * the 0.8 spend-ratio threshold, plus the Undefined anti-join backfill
    * (Seg:184-217). */
  val q25PersonasUnion: Q = (s, d) => {
    val spend = T.orders(s, d)
      .withColumn("bucket",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent")
          .otherwise("rest"))
      .groupBy(col("o_custkey"), col("bucket"))
      .agg(sum(dec(col("o_totalprice"))).as("bucket_spend"))
    val total = spend.groupBy(col("o_custkey"))
      .agg(sum(col("bucket_spend")).as("total_spend"))
    val ratios = spend.join(total, Seq("o_custkey"))
      .withColumn("ratio", col("bucket_spend").cast("double") / col("total_spend").cast("double"))
    val urgent = ratios.filter(col("bucket") === "urgent" && col("ratio") >= 0.8)
      .select(col("o_custkey"), lit("URGENT_BUYER").as("persona"))
    val relaxed = ratios.filter(col("bucket") === "rest" && col("ratio") >= 0.8)
      .select(col("o_custkey"), lit("RELAXED_BUYER").as("persona"))
    val classified = urgent.unionByName(relaxed)
    val undefinedB = T.customer(s, d)
      .join(classified, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("o_custkey"), lit("UNDEFINED").as("persona"))
    classified.unionByName(undefinedB)
      .select(col("o_custkey").cast("long").as("custkey"), col("persona"))
      .orderBy(col("custkey"), col("persona"))
  }

  /** O16 + §2.8 date surface — DateKey math, month window, EOMONTH
    * (S2:14-18, S1:46-48) over the events table. */
  val q26DateKeyWindows: Q = (s, d) =>
    T.events(s, d)
      .withColumn("datekey", Ops.dateKey(col("ts")).cast("long"))
      .filter(col("datekey").between(20240105L, 20240120L))
      .groupBy(col("datekey"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        max(Ops.endOfMonth(col("ts"))).as("month_end"))
      .orderBy(col("datekey"), col("event_type"))

  /** O42/O43 — global sort + TOP-k (S3:46, 92). */
  val q27OrderLimit: Q = (s, d) =>
    T.lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .select(col("l_orderkey").cast("long").as("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_extendedprice"))

  /** O36c — scalar aggregate subquery pulled to the driver (S1:48, S4:55). */
  val q28ScalarSubquery: Q = (s, d) => {
    val maxPrice = T.orders(s, d).agg(max(col("o_totalprice"))).first().getDouble(0)
    T.orders(s, d)
      .filter(col("o_totalprice") > lit(maxPrice) * 0.9)
      .select(col("o_orderkey").cast("long").as("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** §2.8 scalar-function surface in one projection: empty->NULL, pad-last-4,
    * zip normalization, safe ratio, try-parse date. */
  val q29ScalarFuncs: Q = (s, d) =>
    T.customer(s, d).select(
      col("c_custkey").cast("long").as("c_custkey"),
      Ops.emptyToNull(when(col("c_custkey") % 7 === 0, lit("   "))
        .otherwise(col("c_mktsegment"))).as("seg_or_null"),
      Ops.padLast4(col("c_custkey").cast("string")).as("pad4"),
      Ops.normZip(
        when(col("c_custkey") % 3 === 0,
          concat(lpad((col("c_custkey") % 90000).cast("string"), 5, "0"), lit("-1234")))
          .when(col("c_custkey") % 3 === 1, lpad((col("c_custkey") % 9000).cast("string"), 4, "0"))
          .otherwise(lpad((col("c_custkey") % 90000).cast("string"), 5, "0"))).as("zip_norm"),
      round(coalesce(Ops.safeRatio(col("c_acctbal"), col("c_custkey") % 5), lit(-1.0)), 6).as("ratio"),
      Ops.tryDate(when(col("c_custkey") % 2 === 0, lit("2024-01-15"))
        .otherwise(lit("not-a-date"))).as("parsed_date"))
    .orderBy(col("c_custkey"))

  /** O31 — zip-normalization join: raw zip variants normalized then joined
    * to a zip dimension (P-SF:120-125, P-Pat:57). */
  val q30ZipNormalizeJoin: Q = (s, d) => {
    val cust = T.customer(s, d).withColumn("raw_zip",
      when(col("c_custkey") % 3 === 0,
        concat(lpad((col("c_custkey") % 100).cast("string"), 5, "0"), lit("-1234")))
        .when(col("c_custkey") % 3 === 1, lpad((col("c_custkey") % 100).cast("string"), 4, "0"))
        .otherwise(lpad((col("c_custkey") % 100).cast("string"), 5, "0")))
    val zipDim = cust.select(Ops.normZip(col("raw_zip")).as("zip"))
      .distinct()
      .withColumn("geo_id", row_number().over(Window.orderBy(col("zip"))).cast("long"))
    cust.join(broadcast(zipDim), Ops.normZip(col("raw_zip")) === col("zip"))
      .groupBy(col("zip"), col("geo_id"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("zip"))
  }

  /** O9 / entry-point-3 — the SQL surface: temp views + spark.sql, the
    * engine's analog of the reference's reporting views (Seg:243-296)
    * queried interactively. */
  val q31SqlView: Q = (s, d) => {
    T.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    T.supplier(s, d).createOrReplaceTempView("v_supplier")
    T.nation(s, d).createOrReplaceTempView("v_nation")
    s.sql("""
      SELECT n_name,
        cast(sum(cast(l_extendedprice as decimal(18,4))) as double) AS revenue,
        count(*) AS n_items
      FROM v_lineitem
      JOIN v_supplier ON l_suppkey = s_suppkey
      JOIN v_nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")
  }

  /** O10/O13 — the validation-invariant surface: after the guarded map
    * pass, report row conservation and residual unmapped rows in the
    * window (S2:90-94, S3:91-99 zero-expectation probes). */
  val q32ValidationUnmapped: Q = (s, d) => {
    val mapped = q15MapUpdateFact(s, d)
    mapped.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("patron_key") === 0 &&
        col("datekey").between(19960101L, 19971231L), 1L).otherwise(0L))
        .as("n_unmapped_in_window"))
  }

  /** O29 — fuzzy prefix join: contains-pattern filter + prefix-equality
    * equi-join (S3:54-59), re-expressed scale-safe as equi-join on the
    * derived prefix. */
  val q33FuzzyPrefixJoin: Q = (s, d) =>
    T.supplier(s, d)
      .join(T.customer(s, d).filter(col("c_name").contains("Customer")),
        substring(col("s_name"), -5, 5) === substring(col("c_name"), -5, 5))
      .select(col("s_suppkey").cast("long").as("s_suppkey"),
        col("c_custkey").cast("long").as("c_custkey"), col("c_mktsegment"))
      .orderBy(col("s_suppkey"), col("c_custkey"))

  /** Seg:144-217 — the real segmentation ratio chain over fixtures:
    * max-territory / max-minimarket spend ratios at the 0.8 thresholds,
    * Undefined backfill; exercises graft.pipelines.Segmentation end-to-end
    * with an exact DuckDB oracle. */
  /** Shared Seg staging for q34/q41: the fact/dimZip/dup frames and the
    * persisted MinimarketSpend staging table (Seg:127 TRUNCATE+INSERT
    * analog). ONE definition so the two queries' staging plans stay
    * structurally identical — the cross-query cache hit depends on plan
    * equality, which a shared builder makes guaranteed rather than
    * coincidental. Lazy persist: each query's first pass over mm writes
    * the cache; the other reads it warm. */
  /** Shared per-patron ratio staging for the Seg family (q34/q41/q43/q44):
    * `spendRatios(mm)` localCheckpointed once per (session, dir, fixture
    * version) — the in-process analog of the reference's persisted
    * PatronSpendRatios staging (Seg:144 TRUNCATE+INSERT). The four queries
    * would otherwise each re-run the two-level aggregate over mm; the
    * checkpoint is one row per spending patron. Same eviction contract as
    * DataQueries' pairs memo: mtime-keyed, superseded entries dropped,
    * [[clearStagingCache]] for cold starts (Bench calls it per pass). */
  private val ratiosMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long), DataFrame]

  /** Staleness key = max mtime over EVERY table the staging reads —
    * regenerating any one of them (not just orders) must invalidate the
    * checkpoint. */
  private def fixtureVersion(d: String): Long =
    Seq("lineitem", "orders", "supplier", "nation", "region", "customer")
      .map { t =>
        val f = new java.io.File(s"$d/$t.parquet")
        val nested = Option(f.listFiles()).getOrElse(Array.empty)
        (f.lastModified() +: nested.map(_.lastModified())).max
      }.max

  /** Eagerly free a memoized staging frame's storage. `Dataset.unpersist`
    * covers CacheManager entries; a `localCheckpoint` frame is backed by a
    * persisted internal RDD that only GC + ContextCleaner would reclaim,
    * so unpersist that RDD directly when the plan is a LogicalRDD. */
  private[graft] def releaseStaging(df: DataFrame): Unit =
    try {
      df.unpersist()
      df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case _: Throwable => () }

  def clearStagingCache(): Unit = {
    ratiosMemo.values.foreach(releaseStaging)
    ratiosMemo.clear()
  }

  /** Bench hook: fill the Seg-family shared staging (the persisted
    * MinimarketSpend frame + the ratios localCheckpoint) so the fill cost
    * is timed once as its own "seg_staging" entry instead of landing
    * inside whichever of q34/q41/q43/q44 happens to run first in a pass —
    * per-query numbers stay comparable across passes and rounds. */
  def warmSegStaging(s: SparkSession, d: String): Unit = {
    segStaging(s, d)._1.count()
    segRatios(s, d)
  }

  private def segRatios(s: SparkSession, d: String): DataFrame = {
    val key = (s, d, fixtureVersion(d))
    ratiosMemo.getOrElseUpdate(key, {
      // evict superseded same-(session,dir) entries AND entries whose
      // session has been stopped (they would otherwise pin checkpointed
      // blocks for the JVM lifetime); unpersist reclaims blocks eagerly
      // instead of waiting for GC + ContextCleaner
      ratiosMemo.keys
        .filter(k => (k._1 == s && k._2 == d && k != key) ||
          k._1.sparkContext.isStopped)
        .foreach(k => ratiosMemo.remove(k).foreach(releaseStaging))
      val (mm, _) = segStaging(s, d)
      graft.pipelines.Segmentation.spendRatios(mm).localCheckpoint()
    })
  }

  private def segStaging(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val fact = T.lineitem(s, d)
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("o_custkey").as("UniquePatronId"),
        col("s_nationkey").as("GeographyID"),
        Ops.dateKey(col("o_orderdate")).as("DateKey"),
        dec(col("l_extendedprice")).as("Amount"))
    val dimZip = T.nation(s, d).join(broadcast(T.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("GeographyID"),
        col("r_name").as("SalesTerritory"),
        col("n_name").as("DIN_DisplayMiniMarketName"))
    val dup = T.customer(s, d)
      .select(col("c_custkey").as("UniquePatronId"), lit(1).as("IsHighValue"))
    val mm = graft.pipelines.Segmentation
      .minimarketSpend(fact, dimZip, dup, 0L, 99999999L).persist()
    (mm, dup)
  }

  val q34SegPersonas: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val (_, dup) = segStaging(s, d)
    Segmentation.classify(segRatios(s, d), dup)
      .select(col("UniquePatronId").cast("long").as("custkey"),
        col("PersonaName").as("persona"))
      .orderBy(col("custkey"), col("persona"))
  }

  /** P-Pat:119-142 driven through graft.pipelines.Patron: sequential
    * two-pass guarded fact mapping (natural proxy, then synthesized
    * ClientID+'_'+last4) — pass 2 must see pass 1's result (SURVEY §7.3(2)).
    * Sentinel Patron_ID=1 = unmapped. */
  val q35PatronTwoPass: Q = (s, d) => {
    import graft.pipelines.Patron
    val orders = T.orders(s, d)
    val fact = orders.select(
      col("o_orderkey").cast("long").as("TH_ID"),
      Ops.dateKey(col("o_orderdate")).cast("long").as("DateKey"),
      when(col("o_orderstatus") === "O", lit(1L))
        .otherwise(col("o_custkey") + 5000L).as("Patron_ID"))
    val txnProxy = orders.select(
      col("o_orderkey").cast("long").as("TH_ID"),
      when(col("o_custkey") % 2 === 0,
        concat(lit("P"), col("o_custkey").cast("string")))
        .otherwise(lit("none")).as("proxyid"),
      (col("o_custkey") % 100).as("ClientID"),
      (col("o_custkey") * 7).cast("string").as("creditcardnum"))
    val cust = T.customer(s, d)
    val natural = cust.filter(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") + 5000L).as("ID"),
        concat(lit("P"), col("c_custkey").cast("string")).as("ProxyID"))
    val synthesized = cust.filter(col("c_custkey") % 5 === 0)
      .select((col("c_custkey") + 9000L).as("ID"),
        concat((col("c_custkey") % 100).cast("string"), lit("_"),
          Ops.padLast4((col("c_custkey") * 7).cast("string"))).as("ProxyID"))
    val dimPatron = natural.unionByName(synthesized)
    Patron.mapFactPatron(fact, txnProxy, dimPatron, 19960101L, 19971231L)
      .select(col("TH_ID"), col("DateKey"), col("Patron_ID"))
      .orderBy(col("TH_ID"))
  }

  /** S1:44-128 driven through graft.pipelines.Fingerprint: whitelist +
    * anti-join + normalized grouped aggregate of new merchant fingerprints
    * (md5 so the oracle can recompute; library default is sha1). */
  val q36NewFingerprints: Q = (s, d) => {
    import graft.pipelines.Fingerprint
    val header = T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("o_orderkey").as("id"),
        col("o_custkey").cast("string").as("MerchantNumber"),
        when(col("o_orderkey") % 7 === 0, concat(lit("REV:"), col("c_name")))
          .otherwise(col("c_name")).as("MerchantLegalName"),
        col("c_mktsegment").as("MerchantName"),
        concat(lit("addr "), col("c_custkey").cast("string")).as("AddressLine01"),
        col("n_name").as("CityName"),
        lit("ST").as("StateProvince"),
        lpad((col("c_custkey") % 10000).cast("string"), 5, "0").as("PostalCode"),
        when(col("c_nationkey") < 20, "US").otherwise("DE").as("CountryCode"),
        col("c_mktsegment").as("clientcode"),
        col("o_orderdate").as("TransactionDate"),
        (lit(5811) + col("o_orderkey") % 4).cast("string").as("MccCode"))
    // Hash once, materialize once: the 3-table join + md5 feed BOTH sides
    // of the anti-join (the `existing` fixture and the eligible set), so
    // evaluate the hashed header a single time and let both consumers read
    // the checkpoint — the in-process analog of the reference's staging
    // table (S1:5 TRUNCATE+INSERT). Re-deriving it per side doubled the
    // most expensive scan of the monthly load.
    // NO spread before the hash (round-17 A/B, REVERTED): the md5
    // simhash chain runs serial behind AQE's coalesce of the
    // orders x customer join (0.9 s one-task stage), but a keyed
    // repartition before the checkpoint (the q07 pattern) shipped
    // 11 MB of header to parallelize ~0.6 s of CPU — dev-flat and
    // 1.38 -> 1.62 s in the full protocol. fanOutReady cannot gate
    // here either (join-output stats are multiplicative estimates,
    // far past the ceiling).
    val hashed = Fingerprint.withHashes(header, "md5").localCheckpoint()
    val existing = hashed.filter(col("MerchantNumber").cast("long") % 2 === 0)
      .select(col("__simhash").as("SimHash"))
    Fingerprint.newFingerprints(hashed, existing,
        lit("1996-01-01"), lit("1997-12-31"),
        mccCodes = Seq("5811", "5812", "5813", "5814"), algo = "md5")
      .select(col("MerchantNumber"), col("MerchantLegalName"),
        col("MerchantName"), col("CityName"), col("PostalCode"),
        col("CountryCode"), col("SimHash"), col("SimHashNoMid"),
        col("ClientCount"), col("BankFeedCount"),
        col("AnalysisStartDate"), col("AnalysisEndDate"))
      .orderBy(col("SimHash"))
  }

  /** S4:15-46 driven through graft.pipelines.BillingGroup: the SCD-lite
    * location merge — 14-step name canonicalization, back-office id lookup
    * on the cleaned key, monthly validity intervals with the open-row
    * 9999-12-31 sentinel (uuid Id excluded: nondeterministic by design). */
  val q37BillingGroupScd: Q = (s, d) => {
    import graft.pipelines.BillingGroup
    val inv = T.orders(s, d).select(
      (col("o_custkey") % 200).as("SiteId"),
      concat(lit("GRP/"), (col("o_custkey") % 37).cast("string"),
        when(col("o_orderkey") % 5 === 0, "-TERMED")
          .when(col("o_orderkey") % 5 === 1, ".")
          .when(col("o_orderkey") % 5 === 2, "_")
          .when(col("o_orderkey") % 5 === 3, "'")
          .otherwise("")).as("BillGroup"),
      col("o_orderdate").cast("date").as("txndate"))
    val backOffice = T.customer(s, d).filter(col("c_custkey") < 37)
      .select((col("c_custkey") + 1000L).as("ID"),
        concat(lit("GRP-"), col("c_custkey").cast("string")).as("billing_id"))
    val emptyTarget = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("Id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("BackOfficeBillingGroupId",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("SiteId",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("BillingGroupDisplayName",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ValidFrom",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("ValidTo",
          org.apache.spark.sql.types.DateType))))
    BillingGroup.mergeLocations(emptyTarget, inv, backOffice,
        lit("1996-01-01"))
      .select(col("SiteId").cast("long").as("SiteId"),
        col("BillingGroupDisplayName"),
        col("BackOfficeBillingGroupId").cast("long")
          .as("BackOfficeBillingGroupId"),
        col("ValidFrom"), col("ValidTo"))
      .orderBy(col("SiteId"), col("BillingGroupDisplayName"))
  }

  /** P-Rest:16-47 driven through graft.pipelines.Restaurant: prefix-blocked
    * candidate join (union of equi-joins) + 4-way CASE match-quality RANK,
    * ties kept, rank-1 matches only. */
  val q38RestaurantRank: Q = (s, d) => {
    import graft.pipelines.Restaurant
    val cust = T.customer(s, d)
    val sites = cust.select(col("c_custkey").as("site_ID"),
      concat(substring(col("c_name"), -5, 5), lit(" shop"))
        .as("rest_location_name"))
    val base = concat(substring(col("c_name"), -5, 5), lit(" shop"))
    val locations = cust.select(
      (col("c_custkey") + 100000L).as("RLP_ID"),
      when(col("c_custkey") % 3 === 0, base)
        .when(col("c_custkey") % 3 === 1, concat(base, lit(" uptown")))
        .otherwise(concat(base, lit(" downtown"))).as("RLP_restaurantName"),
      when(col("c_custkey") % 3 === 1, base)
        .otherwise(concat(lit("zz "), base)).as("RLP_DinName"))
    Restaurant.rankSiteMatches(sites, locations)
      .select(col("site_ID").cast("long").as("site_id"),
        col("RLP_ID").cast("long").as("rlp_id"))
      .orderBy(col("site_id"), col("rlp_id"))
  }

  /** Cui:11-67 driven through graft.pipelines.Segmentation: cuisine mode
    * imputation — partner mode preferred over common mode, N/A rows under
    * the rank cutoff imputed, everything else untouched. */
  val q39CuisineImpute: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val dim = T.part(s, d).select(
      col("p_partkey").cast("long").as("SFRestaurantKey"),
      col("p_brand").as("Brand"),
      when(col("p_partkey") % 3 === 0, "Partner").otherwise("Common").as("Type"),
      when(col("p_partkey") % 7 === 0, "N/A").otherwise(col("p_type"))
        .as("CuisineType"),
      (col("p_size") * 40).cast("int").as("Rank"))
    Segmentation.imputeCuisine(dim, rankCutoff = 1500)
      .select(col("SFRestaurantKey"), col("Brand"), col("CuisineType"),
        col("Rank").cast("long").as("Rank"))
      .orderBy(col("SFRestaurantKey"))
  }

  /** S2:31-37/67-80/111-116 driven through graft.pipelines.Patron: the
    * three-phase UniquePatronId mapping (employee-key pass, card-number
    * pass, catch-all proxy pass), each pass seeing the previous pass's
    * result and touching only in-window sentinel rows. */
  val q40UniquePatronThreePhase: Q = (s, d) => {
    import graft.pipelines.Patron
    val orders = T.orders(s, d)
    val fact = orders.select(
      col("o_orderkey").cast("long").as("DVHD_ID"),
      Ops.dateKey(col("o_orderdate")).cast("long").as("DateKey"),
      when(col("o_orderstatus") === "O", lit(0L)).otherwise(9999L)
        .as("UniquePatronId"))
    val txnKeys = orders.select(
      col("o_orderkey").cast("long").as("DVHD_ID"),
      concat(lit("C"), (col("o_custkey") % 50).cast("string")).as("clientcode"),
      when(col("o_custkey") % 3 === 0, (col("o_custkey") % 500).cast("string"))
        .otherwise(lit("")).as("employeeid"),
      (col("o_custkey") * 9).cast("string").as("creditcardnum"),
      concat(lit("U"), col("o_custkey").cast("string")).as("proxyid"))
    val cust = T.customer(s, d)
    val k = col("c_custkey")
    val emp = cust.filter(k % 3 === 0 && k % 4 === 0).select(
      concat_ws("_", concat(lit("C"), (k % 50).cast("string")),
        (k % 500).cast("string"), (k * 9).cast("string")).as("ProxyID"),
      (k + 10000L).as("UniquePatronId"))
    val card = cust.filter(k % 6 === 0).select(
      concat_ws("_", concat(lit("C"), (k % 50).cast("string")),
        Ops.padLast4((k * 9).cast("string"))).as("ProxyID"),
      (k + 20000L).as("UniquePatronId"))
    val natural = cust.filter(k % 5 === 0).select(
      concat(lit("U"), k.cast("string")).as("ProxyID"),
      (k + 30000L).as("UniquePatronId"))
    val dimUnique = emp.unionByName(card).unionByName(natural)
    Patron.mapFactUniquePatron(fact, txnKeys, dimUnique, 19960101L, 19971231L)
      .select(col("DVHD_ID"), col("DateKey"), col("UniquePatronId"))
      .orderBy(col("DVHD_ID"))
  }

  /** Seg:344-400 driven through graft.pipelines.Segmentation: the
    * ClientMinimarketSpend reporting snapshot — per (client, territory,
    * persona) minimarket spend shares, top-10 by MMRank. */
  val q41ClientMinimarketTop: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val (mm, _) = segStaging(s, d)
    // ratios-only persona labeling: the spend join below is inner on mm's
    // patrons, so classify()'s dimension-wide Undefined backfill (full-outer
    // against 15k dim rows) is unobservable here — personaLabel is
    // value-identical and drops that join and the distinct.
    // NO broadcast hint on personas: it is one row per spending patron —
    // cardinality-unbounded (the reference runs it over ~9M patrons,
    // Seg:211) — so forcing a broadcast build would OOM the driver at
    // scale. AQE picks the strategy from the measured size instead.
    val personas = Segmentation.personaLabel(segRatios(s, d))
    val cli = T.customer(s, d)
      .select(col("c_custkey").as("UniquePatronId"),
        col("c_mktsegment").as("ClientCode"))
    val spend = mm
      .join(personas, Seq("UniquePatronId"))
      .join(cli, Seq("UniquePatronId"))
      .groupBy(col("ClientCode"), col("SalesTerritory"), col("PersonaName"),
        col("DIN_DisplayMiniMarketName"))
      .agg(sum(col("MinimarketAmount")).as("mmAmt"))
    // group total as a window sum over the same keys: one pass over spend
    // instead of agg + self-join (identical values — same-group summation),
    // and the rank window in topMinimarkets reuses the exchange
    val pct = spend.withColumn("totAmt",
        sum(col("mmAmt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("ClientCode"), col("SalesTerritory"),
            col("PersonaName"))))
      .withColumn("PercentOfSpend",
        col("mmAmt").cast("double") / col("totAmt").cast("double"))
    Segmentation.topMinimarkets(pct, 10)
      .select(col("ClientCode"), col("SalesTerritory"), col("PersonaName"),
        col("DIN_DisplayMiniMarketName").as("minimarket"),
        col("MMRank").cast("long").as("MMRank"),
        round(col("PercentOfSpend"), 6).as("pct"))
      .orderBy(col("ClientCode"), col("SalesTerritory"), col("PersonaName"),
        col("MMRank"))
  }

  /** S5:11-67 driven through graft.pipelines.BiReporting end to end: the
    * definitions MERGE (update name/owner/parent on BackOfficeId match,
    * insert otherwise), the DimRestaurant BiReportingId backfill via the
    * rlp bridge (only where unset), and the relationship-bridge MERGE with
    * delete-not-matched — output is the final bridge enriched with the
    * merged definition names, so every stage's effect is observable. */
  val q42BiReporting: Q = (s, d) => {
    import graft.pipelines.BiReporting
    val cust = T.customer(s, d)
    val k = col("c_custkey")
    val defsTarget = cust.filter(k >= 50 && k < 150).select(
      k.cast("long").as("BiBackofficeId"),
      (k + 5000L).as("BiReportingId"),
      concat(lit("old "), col("c_name")).as("BiReportingName"),
      concat(lit("own"), (k % 7).cast("string")).as("BiReportingGroupOwner"),
      col("c_nationkey").cast("long").as("BiReportingParentId"))
    // S5:19 `where bireportingparentid is not null` — fixture parents are
    // always set, the filter shape is what matters
    val defsSource = cust.filter(k < 100 && col("c_nationkey").isNotNull)
      .select(
        k.cast("long").as("BiBackofficeId"),
        col("c_name").as("BiReportingName"),
        col("c_mktsegment").as("BiReportingGroupOwner"),
        col("c_nationkey").cast("long").as("BiReportingParentId"))
    val defs = BiReporting.mergeDefinitions(defsTarget, defsSource)
    val dimRest = cust.select(
      k.cast("long").as("RestaurantKey"),
      (k + 100000L).as("RLP_ID"),
      when(k % 5 === 0, k + 5000L).otherwise(lit(0L)).as("BiReportingId"))
    val rlp = cust.select((k + 100000L).as("id"),
      (k % 150).cast("long").as("Bi_Reporting_Id"))
    // S5:41-45 — res ⋈ rlp ⋈ defs resolves each restaurant's reporting id
    val bridgeIn = dimRest.select(col("RestaurantKey"), col("RLP_ID"))
      .join(rlp, col("RLP_ID") === col("id"))
      .join(defs.select(col("BiBackofficeId"), col("BiReportingId")),
        col("Bi_Reporting_Id") === col("BiBackofficeId"))
      .select(col("RestaurantKey"), col("BiReportingId"))
    val updated = BiReporting.updateDimRestaurant(dimRest, bridgeIn)
    val factBridge = cust.filter(k % 3 === 0).select(
      (k + 5000L).as("BiReportingId"), k.cast("long").as("RestaurantKey"))
    val merged = BiReporting.mergeRelationships(factBridge,
      updated.select(col("BiReportingId"), col("RestaurantKey")))
    merged.join(defs.select(col("BiReportingId").as("__bid"),
        col("BiReportingName"), col("BiReportingGroupOwner")),
        col("BiReportingId") === col("__bid"), "left")
      .select(col("RestaurantKey").cast("long").as("RestaurantKey"),
        col("BiReportingId").cast("long").as("BiReportingId"),
        col("BiReportingName"), col("BiReportingGroupOwner"))
      .orderBy(col("RestaurantKey"), col("BiReportingId"))
  }

  /** Client dimension fixture shared by q43/q44/q45: 40 clients, industry
    * = client id mod 5; every patron maps to client (custkey mod 40). */
  private def clientDims(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val cust = T.customer(s, d)
    val dimPatron = cust.select(
      col("c_custkey").as("UniquePatronId"),
      (col("c_custkey") % 40).as("ClientID"),
      when(col("c_custkey") % 3 === 0, 1).otherwise(0).as("IsHighValue"))
    val dimClient = cust.filter(col("c_custkey") < 40).select(
      col("c_custkey").as("ClientID"),
      concat(lit("IND"), (col("c_custkey") % 5).cast("string"))
        .as("ClientIndustry"),
      concat(lit("C"), col("c_custkey").cast("string")).as("ClientCode"),
      concat(lit("client "), col("c_custkey").cast("string")).as("ClientName"))
    (dimPatron, dimClient)
  }

  /** Seg:243-265 driven through graft.pipelines.Segmentation: the
    * vw_IndustrySpend reporting view — per-(industry, persona) minimarket
    * spend and its share of the industry total. */
  val q43IndustrySpend: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val (mm, _) = segStaging(s, d)
    val personas = Segmentation.personaLabel(segRatios(s, d))
    val (dimPatron, dimClient) = clientDims(s, d)
    Segmentation.industrySpend(mm, personas, dimPatron, dimClient)
      .select(col("ClientIndustry"), col("PersonaName"),
        col("SpendbySegmentation").cast("double").as("SpendbySegmentation"),
        round(col("PercentOfSpend"), 6).as("PercentOfSpend"))
      .orderBy(col("ClientIndustry"), col("PersonaName"))
  }

  /** Seg:270-296 driven through graft.pipelines.Segmentation: the
    * vw_ClientSpend reporting view — per-(industry, client, persona) spend
    * against the client total. */
  val q44ClientSpend: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val (mm, _) = segStaging(s, d)
    val personas = Segmentation.personaLabel(segRatios(s, d))
    val (dimPatron, dimClient) = clientDims(s, d)
    Segmentation.clientSpend(mm, personas, dimPatron, dimClient)
      .select(col("ClientIndustry"), col("ClientCode"), col("ClientName"),
        col("PersonaName"),
        col("SpendbySegmentation").cast("double").as("SpendbySegmentation"),
        round(col("PercentOfSpend"), 6).as("PercentOfSpend"))
      .orderBy(col("ClientCode"), col("PersonaName"))
  }

  /** Seg:313-339 driven through graft.pipelines.Segmentation: the
    * Reporting.ClientTerritorySpend snapshot — per-(client, territory,
    * persona) spend against the client-territory total; closes out the
    * reference's named reporting outputs. */
  val q51ClientTerritorySpend: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val (mm, _) = segStaging(s, d)
    val personas = Segmentation.personaLabel(segRatios(s, d))
    val (dimPatron, dimClient) = clientDims(s, d)
    Segmentation.territorySpend(mm, personas, dimPatron, dimClient)
      .select(col("ClientCode"), col("ClientName"), col("SalesTerritory"),
        col("PersonaName"),
        col("SpendbySegmentation").cast("double").as("SpendbySegmentation"),
        round(col("PercentOfSpend"), 6).as("PercentOfSpend"))
      .orderBy(col("ClientCode"), col("SalesTerritory"), col("PersonaName"))
  }

  /** Seg:405-426 driven through graft.pipelines.Segmentation: DinersCount —
    * distinct diners and high-value diners per client in the window. */
  val q45DinersCount: Q = (s, d) => {
    import graft.pipelines.Segmentation
    val fact = T.orders(s, d).select(
      col("o_custkey").as("UniquePatronId"),
      Ops.dateKey(col("o_orderdate")).cast("long").as("DateKey"))
    val (dimPatron, dimClient) = clientDims(s, d)
    Segmentation.dinersCount(fact, dimPatron, dimClient,
        19960101L, 19981231L)
      .select(col("ClientName"),
        col("DinersCount").cast("long").as("DinersCount"),
        col("HighValueDiners").cast("long").as("HighValueDiners"))
      .orderBy(col("ClientName"))
  }

  /** spScript.sql:35-79 driven through graft.pipelines.SalesForce: the
    * DimSalesForceBrand MERGE — BrandProfile semi-joined to the distinct
    * synced ids, empty-name rows dropped, DiningGroupSegment CASE-defaulted
    * from RestaurantSegment, free-text thresholds TRY_CAST to
    * DECIMAL(18,4), and the ISNULL-normalized change-detection update.
    * The k%13 rows plant target='' vs source=NULL PrimaryCuisine: raw
    * values differ but the ISNULL compare says equal, so the target's ''
    * must survive — the spScript.sql:56-63 semantics made observable. */
  val q46BrandProfileMerge: Q = (s, d) => {
    import graft.pipelines.SalesForce
    val sup = T.supplier(s, d)
    val k = col("s_suppkey")
    val seg = when(k % 6 === 0, "QSR").when(k % 6 === 1, "FAST CASUAL")
      .when(k % 6 === 2, "MIDSCALE").when(k % 6 === 3, "UPSCALE")
      .when(k % 6 === 4, "CASUAL").otherwise("FINE DINING")
    val brandProfile = sup.select(
      concat(lit("BP"), k.cast("string")).as("Id"),
      when(k % 17 === 0, "").when(k % 19 === 0, lit(null).cast("string"))
        .otherwise(col("s_name")).as("BrandName"),
      seg.as("RestaurantSegment"),
      when(k % 3 === 0, lit(null).cast("string")).otherwise("GIVEN")
        .as("DiningGroupSegment"),
      when(k % 13 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("cuisine"), (k % 9).cast("string")))
        .as("PrimaryCuisine"),
      when(k % 7 === 0, "N/A")
        .otherwise(concat((k * 25).cast("string"), lit(".50")))
        .as("CateringAmountThreshold"),
      when(k % 11 === 0, "").otherwise((k * 40).cast("string"))
        .as("LargeEventThreshold"))
    // duplicated sync rows — the DISTINCT in brandProfileSource must collapse
    val syncIds = sup.filter(k % 4 =!= 3)
      .select(concat(lit("BP"), k.cast("string")).as("BrandProfileId"))
    val sfSync = syncIds.unionAll(syncIds)
    val target = sup.filter(k <= 60).select(
      concat(lit("BP"), k.cast("string")).as("BrandProfileId"),
      when(k % 5 === 0, "stale name").otherwise(col("s_name")).as("BrandName"),
      seg.as("RestaurantSegment"),
      when(k % 3 === 0, when(k % 6 <= 1, "LSR").otherwise("FSR"))
        .otherwise("GIVEN").as("DiningGroupSegment"),
      when(k % 13 === 0, "")
        .otherwise(concat(lit("cuisine"), (k % 9).cast("string")))
        .as("PrimaryCuisine"),
      when(k % 7 === 0, lit(null).cast("decimal(18,4)"))
        .otherwise((k * 25).cast("decimal(18,4)") + 0.5)
        .as("CateringAmountThreshold"),
      when(k % 11 === 0, lit(null).cast("decimal(18,4)"))
        .otherwise((k * 40).cast("decimal(18,4)"))
        .as("LargeEventThreshold"))
    SalesForce.mergeBrandProfile(target, brandProfile, sfSync)
      .select(col("BrandProfileId"), col("BrandName"),
        col("RestaurantSegment"), col("DiningGroupSegment"),
        col("PrimaryCuisine"),
        col("CateringAmountThreshold").cast("double")
          .as("CateringAmountThreshold"),
        col("LargeEventThreshold").cast("double").as("LargeEventThreshold"))
      .orderBy(col("BrandProfileId"))
  }

  /** spScript.sql:205-212 driven through graft.pipelines.SalesForce: the
    * parent-account self-link UPDATE..FROM. Synced rows re-link to their
    * parent's surrogate key; a NULL ParentAccountID (k%10) or a parent id
    * absent from the dimension (k%7 'Z' ids) sets the link NULL — the
    * LEFT-JOIN-update semantics, not preserve-old; unsynced rows (odd k)
    * keep the original -1. */
  val q47ParentSelfLink: Q = (s, d) => {
    import graft.pipelines.SalesForce
    val cust = T.customer(s, d)
    val k = col("c_custkey")
    val dim = cust.select(
      (k + 1000L).cast("long").as("SFRestaurantKey"),
      concat(lit("A"), k.cast("string")).as("SFKey"),
      col("c_name").as("AccountName"),
      lit(-1L).as("SFParentRestaurantKey"))
    val sync = cust.filter(k % 2 === 0).select(
      concat(lit("A"), k.cast("string")).as("AccountID"),
      when(k % 10 === 0, lit(null).cast("string"))
        .when(k % 7 === 0, concat(lit("Z"), k.cast("string")))
        .otherwise(concat(lit("A"), greatest(k % 50, lit(1)).cast("string")))
        .as("ParentAccountID"))
    SalesForce.linkParentAccounts(dim, sync)
      .orderBy(col("SFRestaurantKey"))
  }

  /** O1 beyond parquet — CSV source: the customer table re-materialized as
    * a headered CSV copy (written once per fixture version by Spark), read
    * back through the schema-explicit CSV reader, then aggregated; the
    * DuckDB oracle computes the same aggregate from the original parquet,
    * so any CSV round-trip corruption (quoting, nulls, number rendering)
    * breaks the hash. */
  val q48CsvSource: Q = (s, d) => {
    val path = T.exportedCopy(s, d, "customer", "csv",
      Seq("c_custkey", "c_mktsegment", "c_acctbal"))
    T.csv(s, path,
        "c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("sum_bal"),
        min(col("c_custkey")).as("min_key"))
      .orderBy(col("c_mktsegment"))
  }

  /** O1 beyond parquet — JSON-lines source: orders re-materialized as
    * JSON (the ms-timestamp order date serializes as an ISO-8601 string
    * and must parse back through the TIMESTAMP-typed schema, UTC session),
    * aggregated per order-month against the parquet oracle. */
  val q49JsonSource: Q = (s, d) => {
    val path = T.exportedCopy(s, d, "orders", "json",
      Seq("o_orderkey", "o_orderdate", "o_totalprice"))
    T.jsonLines(s, path,
        "o_orderkey BIGINT, o_orderdate TIMESTAMP, o_totalprice DOUBLE")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_total"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy(col("order_month"))
  }

  /** O1/O16 at fact layout — Hive-style partitioned-directory source: the
    * orders fixture re-materialized as month=yyyyMM directories, read back
    * through partition discovery with a month-window predicate that must
    * prune to the 12 matching directories (PlanSpec asserts the
    * PartitionFilters); aggregate hash-checked against the flat parquet
    * oracle. */
  val q50PartitionedSource: Q = (s, d) => {
    val path = T.exportedOrdersByMonth(s, d)
    s.read.parquet(path)
      .filter(col("month").between(199601, 199612))
      .groupBy(col("month").cast("long").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_total"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy(col("month"))
  }

  /** O2 symmetric egress — CSV: the q51 ClientTerritorySpend snapshot
    * written as a headered CSV (the reference's Excel-facing egress,
    * Seg:267) through [[graft.etl.Tables.writeSnapshot]], read back
    * through the schema-explicit CSV reader, and hash-checked against the
    * ORIGINAL computation's oracle — any round-trip loss (double
    * rendering, quoting, null encoding, column order) breaks the hash.
    * PercentOfSpend is nullable (zero-total territories), so the null
    * encoding is exercised, not just plain values. */
  val q52CsvEgress: Q = (s, d) =>
    T.egressRoundTrip(s, q51ClientTerritorySpend(s, d), "csv", "territory")
      .orderBy(col("ClientCode"), col("SalesTerritory"), col("PersonaName"))

  /** O2 symmetric egress — JSON-lines: same round-trip discipline as q52
    * on the JSON writer (null fields are DROPPED by the writer and must
    * come back as nulls through the explicit schema). */
  val q53JsonEgress: Q = (s, d) =>
    T.egressRoundTrip(s, q51ClientTerritorySpend(s, d), "json", "territory")
      .orderBy(col("ClientCode"), col("SalesTerritory"), col("PersonaName"))

  /** O2 symmetric egress — ORC: same round-trip discipline on the other
    * Spark-native columnar lake format (typed nulls and doubles survive
    * natively; the hash check proves it against the q51 oracle). */
  val q55OrcEgress: Q = (s, d) =>
    T.egressRoundTrip(s, q51ClientTerritorySpend(s, d), "orc", "territory")
      .orderBy(col("ClientCode"), col("SalesTerritory"), col("PersonaName"))

  /** O2 write-direction at fact layout — the write twin of q50: orders
    * (with a derived yyyyMMdd DateKey) written month-partitioned through
    * [[graft.etl.Scale.writeFactByMonth]] — the 100 TB fact layout — then
    * read back through partition discovery with the q50 month-window
    * predicate and aggregated against the flat-parquet oracle. A write
    * that drops rows across partition boundaries, mangles the partition
    * value, or double-writes a month breaks the hash; unlike q50 the
    * materialization is paid INSIDE the query, so the write path itself
    * is under the oracle. */
  val q54PartitionedEgress: Q = (s, d) => {
    val path = T.scratchDir("egress_orders_bymonth")
    graft.etl.Scale.writeFactByMonth(
      T.orders(s, d).select(col("o_orderkey"), col("o_totalprice"),
        Ops.dateKey(col("o_orderdate")).as("DateKey")),
      "DateKey", path)
    s.read.parquet(path)
      .filter(col("date_month").between(199601, 199612))
      .groupBy(col("date_month").cast("long").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_total"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy(col("month"))
  }

  /** O10/O32 — the S1:29-41 "Check what's left unmapped" problem-children
    * report, the reference's first inline validation artifact: unmapped
    * map rows inner-joined back to the transaction header, BOTH lookup
    * dimensions re-resolved BY DISPLAY NAME (the idiom the reference
    * uses for Lookups.BankTypes / lookups.creditcardtypes), the per-row
    * flags frame joined on id, and the known-problem
    * (client, card-type-id, bank-type-id) triples LEFT-joined so
    * `iif(pr.clientcode is null, 0, 1)` labels each residual row; sorted
    * problem-children-first then by the flags frame's fingerprint id,
    * exactly the analyst reading order of S1:40-41. Fixture cast:
    * orders = TransactionHeader (the customer's nation / region display
    * names standing in for BankType / CreditCardType), a lineitem
    * rollup = Staging.RecordFlags, negative-balance customers =
    * Staging.ProblemChildren, pending-status orders = the
    * fingerprint-less map residue.
    *
    * Scale: both display-name lookups broadcast (25 / 5 rows); the
    * flags rollup is one map-side-combined aggregate on the join key;
    * the problem-triple frame broadcasts (delinquent-client-sized); the
    * only fact-fact joins (residue x header x flags) are all keyed on
    * the order id. */
  val q56ProblemChildren: Q = (s, d) => {
    val bank = T.nation(s, d).select(
      col("n_nationkey").cast("long").as("bank_id"),
      col("n_name").as("bank_display"))
    val cct = T.region(s, d).select(
      col("r_regionkey").cast("long").as("cct_id"),
      col("r_name").as("cct_display"))
    val th = T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("o_orderkey").cast("long").as("id"),
        col("o_custkey").cast("long").as("clientcode"),
        col("n_name").as("bank_type"),
        col("r_name").as("creditcard_type"),
        col("o_totalprice"),
        Ops.dateKey(col("o_orderdate")).cast("long").as("datekey"))
    val p = T.orders(s, d).select(
      col("o_orderkey").cast("long").as("id"),
      when(col("o_orderstatus") === "P", lit(null).cast("long"))
        .otherwise(col("o_custkey").cast("long")).as("fingerprint_id"))
    val fl = T.lineitem(s, d)
      .groupBy(col("l_orderkey").cast("long").as("id"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"),
        min(col("l_suppkey").cast("long")).as("fl_fingerprint_id"))
    val pr = T.customer(s, d).filter(col("c_acctbal") < 0)
      .join(broadcast(T.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").cast("long").as("pr_clientcode"),
        col("n_nationkey").cast("long").as("pr_bank_id"),
        col("n_regionkey").cast("long").as("pr_cct_id"))
    p.filter(col("fingerprint_id").isNull)
      .join(th, Seq("id"))
      .join(broadcast(bank), col("bank_type") === col("bank_display"))
      .join(broadcast(cct), col("creditcard_type") === col("cct_display"))
      .join(fl, Seq("id"))
      .join(broadcast(pr),
        col("clientcode") === col("pr_clientcode") &&
          col("cct_id") === col("pr_cct_id") &&
          col("bank_id") === col("pr_bank_id"), "left")
      .select(
        when(col("pr_clientcode").isNull, 0L).otherwise(1L)
          .as("problemchild"),
        col("id"), col("clientcode"), col("bank_type"),
        col("creditcard_type"), col("datekey"), col("o_totalprice"),
        col("n_items"), col("n_returned"), col("fl_fingerprint_id"))
      .orderBy(col("problemchild"), col("fl_fingerprint_id"), col("id"))
  }

  val all: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_in_like" -> q02FilterInLike,
    "q03_star_join_agg" -> q03StarJoinAgg,
    "q04_left_join_enrich" -> q04LeftJoinEnrich,
    "q05_anti_join" -> q05AntiJoin,
    "q06_semi_join" -> q06SemiJoin,
    "q07_fingerprint_pipeline" -> q07FingerprintPipeline,
    "q08_composite_key_join" -> q08CompositeKeyJoin,
    "q09_theta_selfjoin" -> q09ThetaSelfJoin,
    "q10_case_expr_join" -> q10CaseExprJoin,
    "q11_union_fuzzy_join" -> q11UnionFuzzyJoin,
    "q12_merge_upsert" -> q12MergeUpsert,
    "q13_merge_delete_guard" -> q13MergeDeleteGuard,
    "q14_insert_if_absent" -> q14InsertIfAbsent,
    "q15_map_update_fact" -> q15MapUpdateFact,
    "q16_string_clean" -> q16StringClean,
    "q17_dedup_rank" -> q17DedupRank,
    "q18_priority_rank" -> q18PriorityRank,
    "q19_sequence_keys" -> q19SequenceKeys,
    "q20_topk_per_group" -> q20TopKPerGroup,
    "q21_mode_per_group" -> q21ModePerGroup,
    "q22_having_conditional" -> q22HavingConditional,
    "q23_distinct" -> q23Distinct,
    "q24_agg_ratio" -> q24AggRatio,
    "q25_personas_union" -> q25PersonasUnion,
    "q26_datekey_windows" -> q26DateKeyWindows,
    "q27_order_limit" -> q27OrderLimit,
    "q28_scalar_subquery" -> q28ScalarSubquery,
    "q29_scalar_funcs" -> q29ScalarFuncs,
    "q30_zip_normalize_join" -> q30ZipNormalizeJoin,
    "q31_sql_view" -> q31SqlView,
    "q32_validation_unmapped" -> q32ValidationUnmapped,
    "q33_fuzzy_prefix_join" -> q33FuzzyPrefixJoin,
    "q34_seg_personas" -> q34SegPersonas,
    "q35_patron_two_pass" -> q35PatronTwoPass,
    "q36_new_fingerprints" -> q36NewFingerprints,
    "q37_billing_group_scd" -> q37BillingGroupScd,
    "q38_restaurant_rank" -> q38RestaurantRank,
    "q39_cuisine_impute" -> q39CuisineImpute,
    "q40_unique_patron_three_phase" -> q40UniquePatronThreePhase,
    "q41_client_minimarket_top" -> q41ClientMinimarketTop,
    "q42_bi_reporting" -> q42BiReporting,
    "q43_industry_spend" -> q43IndustrySpend,
    "q44_client_spend" -> q44ClientSpend,
    "q45_diners_count" -> q45DinersCount,
    "q46_brand_profile_merge" -> q46BrandProfileMerge,
    "q47_parent_self_link" -> q47ParentSelfLink,
    "q48_csv_source" -> q48CsvSource,
    "q49_json_source" -> q49JsonSource,
    "q50_partitioned_source" -> q50PartitionedSource,
    "q51_client_territory_spend" -> q51ClientTerritorySpend,
    "q52_csv_egress" -> q52CsvEgress,
    "q53_json_egress" -> q53JsonEgress,
    "q55_orc_egress" -> q55OrcEgress,
    "q54_partitioned_egress" -> q54PartitionedEgress,
    "q56_problem_children" -> q56ProblemChildren,
  )
}
