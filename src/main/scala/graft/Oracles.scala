package graft

/** DuckDB oracle SQL, one entry per oracle-checkable query in
  * CoreQueries/DataQueries. Each statement is the semantic mirror of its
  * Spark query — identical column names/types (bigint/double/varchar/date),
  * identical decimal-accumulation of double aggregates, identical ORDER BY
  * on non-null unique keys. Queries with no entry here (LSH candidate
  * generation, simhash, media stubs) are checked rows-only by the driver.
  */
object Oracles {

  private val fpExpr =
    "md5(concat_ws('|', upper(trim(coalesce(s_name,''))), " +
      "upper(trim(coalesce(n_name,''))), " +
      "upper(trim(coalesce(cast(s_nationkey as varchar),'')))))"

  val core: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity as decimal(18,4))) as double) AS sum_qty,
        | cast(sum(cast(l_extendedprice as decimal(18,4))) as double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice*(1.0-l_discount) as decimal(18,4))) as double) AS sum_disc_price,
        | count(*) AS count_order,
        | count(distinct l_orderkey) AS n_orders
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q02_filter_in_like" ->
      """SELECT cast(p_partkey as bigint) AS p_partkey, p_name, p_brand, p_type
        |FROM part
        |WHERE p_brand IN ('Brand#11','Brand#22','Brand#3')
        |  AND (p_name LIKE '%re%' OR p_type LIKE '%ECO%')
        |  AND p_name NOT LIKE '%_x%'
        |ORDER BY p_partkey""".stripMargin,

    "q03_star_join_agg" ->
      """SELECT r_name, n_name,
        | cast(sum(cast(l_extendedprice*(1.0-l_discount) as decimal(18,4))) as double) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q04_left_join_enrich" ->
      """SELECT cast(c_custkey as bigint) AS c_custkey,
        | count(o_orderkey) AS n_f_orders,
        | cast(sum(cast(coalesce(o_totalprice,0.0) as decimal(18,4))) as double) AS f_spend
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus='F') o ON c_custkey=o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_anti_join" ->
      """SELECT cast(c_custkey as bigint) AS c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderstatus='F' AND o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT cast(c_custkey as bigint) AS c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderpriority='1-URGENT' AND o.o_orderstatus='O'
        |    AND o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q07_fingerprint_pipeline" ->
      s"""WITH sup AS (SELECT s_suppkey, s_name, s_nationkey, n_name
         |  FROM supplier JOIN nation ON s_nationkey=n_nationkey),
         |fpdim AS (SELECT $fpExpr AS fp, cast(s_suppkey as bigint) AS fp_suppkey FROM sup),
         |detail AS (SELECT o.o_orderkey AS ok, o.o_orderdate, $fpExpr AS fp
         |  FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
         |  JOIN sup ON l.l_suppkey=sup.s_suppkey
         |  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01')
         |SELECT d.fp, fpdim.fp_suppkey, count(*) AS n_txn,
         |  count(distinct d.ok) AS n_orders,
         |  max(cast(d.o_orderdate as date)) AS last_order
         |FROM detail d LEFT JOIN fpdim ON d.fp=fpdim.fp
         |GROUP BY 1,2 ORDER BY 1""".stripMargin,

    "q08_composite_key_join" ->
      """WITH proxy_dim AS (SELECT concat_ws('_', c_mktsegment,
        |    right(concat('0000', coalesce(cast(c_custkey as varchar),'')),4)) AS proxy_id,
        |  cast(c_custkey as bigint) AS dim_custkey FROM customer)
        |SELECT proxy_id, count(distinct dim_custkey) AS n_dim_hits, count(*) AS n_orders
        |FROM (SELECT concat_ws('_', c_mktsegment,
        |    right(concat('0000', coalesce(cast(o_custkey as varchar),'')),4)) AS proxy_id
        |  FROM orders JOIN customer ON o_custkey=c_custkey) o
        |JOIN proxy_dim USING (proxy_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_theta_selfjoin" ->
      """SELECT cast(c1.c_custkey as bigint) AS c_custkey, count(*) AS n_dominated
        |FROM customer c1 JOIN customer c2
        |  ON c1.c_nationkey=c2.c_nationkey AND c1.c_mktsegment=c2.c_mktsegment
        |  AND c1.c_acctbal>c2.c_acctbal
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_case_expr_join" ->
      """SELECT cast(grp_id as bigint) AS grp_id, grp_name, count(*) AS n_cust,
        | cast(sum(cast(c_acctbal as decimal(18,4))) as double) AS sum_bal
        |FROM (SELECT CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 'INDUSTRY'
        |   WHEN c_mktsegment IN ('BUILDING','FURNITURE') THEN 'CONSTRUCTION'
        |   ELSE 'OTHER' END AS grp, c_acctbal FROM customer) c
        |JOIN (VALUES ('INDUSTRY',1),('CONSTRUCTION',2),('OTHER',3)) g(grp_name, grp_id)
        |  ON grp=grp_name
        |GROUP BY 1,2 ORDER BY 1""".stripMargin,

    "q11_union_fuzzy_join" ->
      """WITH dim AS (SELECT cast(s_suppkey as bigint) AS clean_id,
        |  CASE WHEN s_suppkey%3=0 THEN s_name
        |       WHEN s_suppkey%3=1 THEN replace(s_name,'#','')
        |       ELSE replace(s_name,'e','é') END AS clean_name FROM supplier),
        |l AS (SELECT cast(s_suppkey as bigint) AS s_suppkey, s_name FROM supplier)
        |SELECT DISTINCT s_suppkey, clean_id FROM (
        |  SELECT l.s_suppkey, dim.clean_id FROM l JOIN dim ON l.s_name=dim.clean_name
        |  UNION ALL
        |  SELECT l.s_suppkey, dim.clean_id FROM l JOIN dim ON replace(l.s_name,'#','')=dim.clean_name
        |  UNION ALL
        |  SELECT l.s_suppkey, dim.clean_id FROM l JOIN dim ON l.s_name=replace(dim.clean_name,'é','e'))
        |ORDER BY s_suppkey, clean_id""".stripMargin,

    "q12_merge_upsert" ->
      """WITH t AS (SELECT cast(s_suppkey as bigint) AS s_suppkey, s_name, s_acctbal,
        |    'old' AS status FROM supplier WHERE s_suppkey<=80),
        |s AS (SELECT cast(s_suppkey as bigint) AS s_suppkey, s_name,
        |    s_acctbal+1000.0 AS s_acctbal, 'new' AS status FROM supplier
        |  WHERE s_suppkey BETWEEN 41 AND 120)
        |SELECT coalesce(t.s_suppkey, s.s_suppkey) AS s_suppkey,
        | CASE WHEN t.s_suppkey IS NULL THEN s.s_name ELSE t.s_name END AS s_name,
        | CASE WHEN s.s_suppkey IS NOT NULL AND t.s_suppkey IS NOT NULL AND t.s_acctbal<>s.s_acctbal THEN s.s_acctbal
        |      WHEN s.s_suppkey IS NOT NULL AND t.s_suppkey IS NULL THEN s.s_acctbal
        |      ELSE t.s_acctbal END AS s_acctbal,
        | CASE WHEN s.s_suppkey IS NOT NULL AND t.s_suppkey IS NOT NULL AND t.s_acctbal<>s.s_acctbal THEN s.status
        |      WHEN s.s_suppkey IS NOT NULL AND t.s_suppkey IS NULL THEN s.status
        |      ELSE t.status END AS status
        |FROM t FULL JOIN s ON t.s_suppkey=s.s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    "q13_merge_delete_guard" ->
      """WITH t AS (SELECT cast(s_suppkey as bigint) AS s_suppkey, s_name, s_acctbal,
        |    'old' AS status FROM supplier WHERE s_suppkey<=80),
        |s AS (SELECT cast(s_suppkey as bigint) AS s_suppkey, s_name,
        |    s_acctbal+1000.0 AS s_acctbal, 'new' AS status FROM supplier
        |  WHERE s_suppkey BETWEEN 41 AND 120 AND s_suppkey%2=0)
        |SELECT coalesce(t.s_suppkey, s.s_suppkey) AS s_suppkey,
        | CASE WHEN t.s_suppkey IS NULL THEN s.s_name ELSE t.s_name END AS s_name,
        | CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_acctbal ELSE t.s_acctbal END AS s_acctbal,
        | CASE WHEN s.s_suppkey IS NOT NULL THEN s.status ELSE t.status END AS status
        |FROM t FULL JOIN s ON t.s_suppkey=s.s_suppkey
        |WHERE s.s_suppkey IS NOT NULL OR t.s_suppkey<=10
        |ORDER BY s_suppkey""".stripMargin,

    "q14_insert_if_absent" ->
      """WITH existing AS (SELECT cast(c_custkey as bigint) AS c_custkey, c_name,
        |    c_mktsegment FROM customer WHERE c_custkey<=500),
        |incoming AS (SELECT DISTINCT cast(c_custkey as bigint) AS c_custkey, c_name,
        |    c_mktsegment FROM customer JOIN orders ON c_custkey=o_custkey
        |  WHERE o_orderpriority='1-URGENT')
        |SELECT * FROM existing
        |UNION ALL
        |SELECT * FROM incoming i WHERE NOT EXISTS
        |  (SELECT 1 FROM existing e WHERE e.c_custkey=i.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q15_map_update_fact" ->
      """WITH fact AS (SELECT cast(o_orderkey as bigint) AS o_orderkey, o_custkey,
        |  cast(cast(strftime(o_orderdate,'%Y%m%d') as int) as bigint) AS datekey,
        |  CASE WHEN o_orderstatus='O' THEN 0 ELSE cast(o_custkey as bigint) END AS patron_key
        |  FROM orders)
        |SELECT o_orderkey, datekey,
        | CASE WHEN patron_key=0 AND datekey BETWEEN 19960101 AND 19971231
        |        AND m.mapped_key IS NOT NULL
        |      THEN m.mapped_key ELSE patron_key END AS patron_key
        |FROM fact LEFT JOIN
        |  (SELECT c_custkey, cast(c_custkey as bigint) AS mapped_key FROM customer) m
        |  ON fact.o_custkey=m.c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q16_string_clean" ->
      """SELECT cast(s_suppkey as bigint) AS s_suppkey,
        | replace(replace(replace(s_name,'#','-'),'Supplier','SUPP'),'000','') AS cleaned,
        | replace(concat(s_name,'�!�'),'�','') AS stripped,
        | CASE WHEN trim(CASE WHEN s_suppkey%5=0 THEN '  ' ELSE s_name END)=''
        |      THEN NULL ELSE CASE WHEN s_suppkey%5=0 THEN '  ' ELSE s_name END
        |   END AS maybe_null
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q17_dedup_rank" ->
      """SELECT cast(o_custkey as bigint) AS o_custkey,
        | cast(o_orderkey as bigint) AS o_orderkey,
        | cast(o_orderdate as date) AS o_orderdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn=1 ORDER BY o_custkey""".stripMargin,

    "q18_priority_rank" ->
      """SELECT cast(o_custkey as bigint) AS o_custkey,
        | cast(o_orderkey as bigint) AS o_orderkey, o_orderpriority
        |FROM (SELECT *, rank() OVER (PARTITION BY o_custkey
        |    ORDER BY cast(substring(o_orderpriority,1,1) as int)) AS rk FROM orders)
        |WHERE rk=1 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q19_sequence_keys" ->
      """SELECT cast(row_number() OVER (ORDER BY c_mktsegment) as bigint)+100 AS segment_key,
        | c_mktsegment
        |FROM (SELECT DISTINCT c_mktsegment FROM customer)
        |ORDER BY segment_key""".stripMargin,

    "q20_topk_per_group" ->
      """SELECT o_orderpriority, cast(rnk as bigint) AS rnk,
        | cast(o_orderkey as bigint) AS o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders)
        |WHERE rnk<=5 ORDER BY o_orderpriority, rnk""".stripMargin,

    "q21_mode_per_group" ->
      """SELECT p_brand, p_type AS type_mode
        |FROM (SELECT p_brand, p_type, row_number() OVER (PARTITION BY p_brand
        |    ORDER BY cnt DESC, p_type) AS rn
        |  FROM (SELECT p_brand, p_type, count(*) AS cnt FROM part
        |    WHERE p_type IS NOT NULL GROUP BY 1,2))
        |WHERE rn=1 ORDER BY p_brand""".stripMargin,

    "q22_having_conditional" ->
      """SELECT p_brand, count(CASE WHEN p_size<=5 THEN 1 END) AS n_small,
        | count(*) AS n_parts
        |FROM part GROUP BY 1
        |HAVING count(CASE WHEN p_size<=5 THEN 1 END)>=5 AND count(*)>10
        |ORDER BY p_brand""".stripMargin,

    "q23_distinct" ->
      """SELECT DISTINCT c_mktsegment, cast(c_nationkey as bigint) AS c_nationkey
        |FROM customer ORDER BY 1,2""".stripMargin,

    "q24_agg_ratio" ->
      """WITH e AS (SELECT c_mktsegment, n_name, o_totalprice FROM orders
        |  JOIN customer ON o_custkey=c_custkey
        |  JOIN nation ON c_nationkey=n_nationkey),
        |pn AS (SELECT c_mktsegment, n_name,
        |  cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS nation_spend
        |  FROM e GROUP BY 1,2),
        |ps AS (SELECT c_mktsegment,
        |  cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS seg_spend
        |  FROM e GROUP BY 1)
        |SELECT pn.c_mktsegment, n_name, nation_spend,
        | round(CASE WHEN seg_spend=0 THEN NULL
        |   ELSE nation_spend/seg_spend END, 6) AS spend_ratio
        |FROM pn JOIN ps ON pn.c_mktsegment=ps.c_mktsegment
        |ORDER BY 1,2""".stripMargin,

    "q25_personas_union" ->
      """WITH spend AS (SELECT o_custkey,
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'urgent'
        |    ELSE 'rest' END AS bucket,
        |  sum(cast(o_totalprice as decimal(18,4))) AS bucket_spend
        |  FROM orders GROUP BY 1,2),
        |total AS (SELECT o_custkey, sum(bucket_spend) AS total_spend
        |  FROM spend GROUP BY 1),
        |ratios AS (SELECT s.o_custkey, bucket,
        |  cast(bucket_spend as double)/cast(total_spend as double) AS ratio
        |  FROM spend s JOIN total t ON s.o_custkey=t.o_custkey),
        |classified AS (
        |  SELECT o_custkey, 'URGENT_BUYER' AS persona FROM ratios
        |    WHERE bucket='urgent' AND ratio>=0.8
        |  UNION ALL
        |  SELECT o_custkey, 'RELAXED_BUYER' AS persona FROM ratios
        |    WHERE bucket='rest' AND ratio>=0.8)
        |SELECT cast(o_custkey as bigint) AS custkey, persona FROM classified
        |UNION ALL
        |SELECT cast(c_custkey as bigint) AS custkey, 'UNDEFINED' AS persona
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM classified cl WHERE cl.o_custkey=c_custkey)
        |ORDER BY custkey, persona""".stripMargin,

    "q26_datekey_windows" ->
      """SELECT datekey, event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,4))) as double) AS sum_value,
        | max(last_day(ts)) AS month_end
        |FROM (SELECT cast(cast(strftime(ts,'%Y%m%d') as int) as bigint) AS datekey,
        |  event_type, value, ts FROM events)
        |WHERE datekey BETWEEN 20240105 AND 20240120
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q27_order_limit" ->
      """SELECT cast(l_orderkey as bigint) AS l_orderkey,
        | cast(l_linenumber as bigint) AS l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q28_scalar_subquery" ->
      """SELECT cast(o_orderkey as bigint) AS o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders)*0.9
        |ORDER BY o_orderkey""".stripMargin,

    "q29_scalar_funcs" ->
      """SELECT cast(c_custkey as bigint) AS c_custkey,
        | CASE WHEN trim(CASE WHEN c_custkey%7=0 THEN '   ' ELSE c_mktsegment END)=''
        |   THEN NULL ELSE CASE WHEN c_custkey%7=0 THEN '   ' ELSE c_mktsegment END
        |   END AS seg_or_null,
        | right(concat('0000', coalesce(cast(c_custkey as varchar),'')),4) AS pad4,
        | CASE WHEN length(z)=10 AND contains(z,'-') THEN split_part(z,'-',1)
        |      WHEN length(z)=4 THEN lpad(z,5,'0') ELSE z END AS zip_norm,
        | round(coalesce(CASE WHEN c_custkey%5=0 THEN NULL
        |   ELSE cast(c_acctbal as double)/cast(c_custkey%5 as double) END, -1.0),6) AS ratio,
        | cast(try_strptime(CASE WHEN c_custkey%2=0 THEN '2024-01-15'
        |   ELSE 'not-a-date' END, '%Y-%m-%d') as date) AS parsed_date
        |FROM (SELECT *, CASE
        |   WHEN c_custkey%3=0 THEN concat(lpad(cast(c_custkey%90000 as varchar),5,'0'),'-1234')
        |   WHEN c_custkey%3=1 THEN lpad(cast(c_custkey%9000 as varchar),4,'0')
        |   ELSE lpad(cast(c_custkey%90000 as varchar),5,'0') END AS z FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q30_zip_normalize_join" ->
      """WITH cust AS (SELECT *, CASE
        |   WHEN c_custkey%3=0 THEN concat(lpad(cast(c_custkey%100 as varchar),5,'0'),'-1234')
        |   WHEN c_custkey%3=1 THEN lpad(cast(c_custkey%100 as varchar),4,'0')
        |   ELSE lpad(cast(c_custkey%100 as varchar),5,'0') END AS raw_zip FROM customer),
        |norm AS (SELECT *, CASE WHEN length(raw_zip)=10 AND contains(raw_zip,'-')
        |    THEN split_part(raw_zip,'-',1)
        |   WHEN length(raw_zip)=4 THEN lpad(raw_zip,5,'0') ELSE raw_zip END AS zip_n FROM cust),
        |dim AS (SELECT zip, cast(row_number() OVER (ORDER BY zip) as bigint) AS geo_id
        |  FROM (SELECT DISTINCT zip_n AS zip FROM norm))
        |SELECT zip, geo_id, count(*) AS n_cust
        |FROM norm JOIN dim ON zip_n=zip
        |GROUP BY 1,2 ORDER BY zip""".stripMargin,

    "q31_sql_view" ->
      """SELECT n_name,
        | cast(sum(cast(l_extendedprice as decimal(18,4))) as double) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q32_validation_unmapped" ->
      """WITH fact AS (SELECT cast(o_orderkey as bigint) AS o_orderkey, o_custkey,
        |  cast(cast(strftime(o_orderdate,'%Y%m%d') as int) as bigint) AS datekey,
        |  CASE WHEN o_orderstatus='O' THEN 0 ELSE cast(o_custkey as bigint) END AS patron_key
        |  FROM orders),
        |mapped AS (SELECT o_orderkey, datekey,
        |  CASE WHEN patron_key=0 AND datekey BETWEEN 19960101 AND 19971231
        |         AND m.mapped_key IS NOT NULL
        |       THEN m.mapped_key ELSE patron_key END AS patron_key
        |  FROM fact LEFT JOIN
        |    (SELECT c_custkey, cast(c_custkey as bigint) AS mapped_key FROM customer) m
        |    ON fact.o_custkey=m.c_custkey)
        |SELECT count(*) AS n_rows,
        | cast(sum(CASE WHEN patron_key=0 AND datekey BETWEEN 19960101 AND 19971231
        |   THEN 1 ELSE 0 END) as bigint) AS n_unmapped_in_window
        |FROM mapped""".stripMargin,

    "q33_fuzzy_prefix_join" ->
      """SELECT cast(s_suppkey as bigint) AS s_suppkey,
        | cast(c_custkey as bigint) AS c_custkey, c_mktsegment
        |FROM supplier JOIN customer
        |  ON right(s_name,5)=right(c_name,5) AND contains(c_name,'Customer')
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    "q34_seg_personas" ->
      ("WITH " + segCtes + "\n" +
        """SELECT cast(pid as bigint) AS custkey, persona FROM cl
          |UNION ALL
          |SELECT cast(c_custkey as bigint) AS custkey, 'Undefined' AS persona
          |FROM customer WHERE NOT EXISTS (SELECT 1 FROM cl WHERE cl.pid=c_custkey)
          |ORDER BY custkey, persona""".stripMargin),

    "q41_client_minimarket_top" ->
      ("WITH " + segCtes + ",\n" +
        """cli AS (SELECT c_custkey AS pid2, c_mktsegment AS ClientCode
          |  FROM customer),
          |spend AS (SELECT ClientCode, mm.terr AS SalesTerritory,
          |  cl.persona AS PersonaName, mm.mm_name, sum(amt) AS mmAmt
          |  FROM mm JOIN cl ON mm.pid=cl.pid JOIN cli ON mm.pid=cli.pid2
          |  GROUP BY 1,2,3,4),
          |tot2 AS (SELECT ClientCode, SalesTerritory, PersonaName,
          |  sum(mmAmt) AS t FROM spend GROUP BY 1,2,3),
          |pct AS (SELECT s.*, cast(mmAmt as double)/cast(t as double) AS p
          |  FROM spend s JOIN tot2 ON s.ClientCode=tot2.ClientCode
          |  AND s.SalesTerritory=tot2.SalesTerritory
          |  AND s.PersonaName=tot2.PersonaName),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY ClientCode,
          |  SalesTerritory, PersonaName ORDER BY p DESC, mm_name) AS MMRank
          |  FROM pct)
          |SELECT ClientCode, SalesTerritory, PersonaName,
          |  mm_name AS minimarket, cast(MMRank as bigint) AS MMRank,
          |  round(p,6) AS pct
          |FROM rk WHERE MMRank<=10
          |ORDER BY ClientCode, SalesTerritory, PersonaName, MMRank""".stripMargin),

    // S5 end-to-end mirror: definitions MERGE (full outer), restaurant
    // backfill (left join + guarded CASE), bridge MERGE with
    // delete-not-matched (= exactly the distinct source pairs)
    "q42_bi_reporting" ->
      """WITH defs_t AS (SELECT cast(c_custkey as bigint) AS boid,
        |  cast(c_custkey+5000 as bigint) AS brid,
        |  concat('old ', c_name) AS name,
        |  concat('own', cast(c_custkey%7 as varchar)) AS owner
        |  FROM customer WHERE c_custkey>=50 AND c_custkey<150),
        |defs_s AS (SELECT cast(c_custkey as bigint) AS boid, c_name AS name,
        |  c_mktsegment AS owner FROM customer WHERE c_custkey<100),
        |defs AS (SELECT coalesce(t.boid, s.boid) AS boid, t.brid AS brid,
        |  CASE WHEN s.boid IS NOT NULL THEN s.name ELSE t.name END AS name,
        |  CASE WHEN s.boid IS NOT NULL THEN s.owner ELSE t.owner END AS owner
        |  FROM defs_t t FULL OUTER JOIN defs_s s ON t.boid=s.boid),
        |res AS (SELECT cast(c_custkey as bigint) AS rk,
        |  cast(c_custkey+100000 as bigint) AS rlp_id,
        |  CASE WHEN c_custkey%5=0 THEN cast(c_custkey+5000 as bigint)
        |    ELSE 0 END AS bi
        |  FROM customer),
        |rlp AS (SELECT cast(c_custkey+100000 as bigint) AS id,
        |  cast(c_custkey%150 as bigint) AS bo_bi FROM customer),
        |bridge AS (SELECT r.rk, d.brid FROM res r JOIN rlp ON r.rlp_id=rlp.id
        |  JOIN defs d ON d.boid=rlp.bo_bi),
        |upd AS (SELECT res.rk,
        |  CASE WHEN coalesce(res.bi,0)=0 AND b.brid IS NOT NULL THEN b.brid
        |    ELSE res.bi END AS bi
        |  FROM res LEFT JOIN bridge b ON res.rk=b.rk),
        |merged AS (SELECT DISTINCT bi, rk FROM upd)
        |SELECT m.rk AS RestaurantKey, m.bi AS BiReportingId,
        |  d.name AS BiReportingName, d.owner AS BiReportingGroupOwner
        |FROM merged m LEFT JOIN defs d ON d.brid=m.bi
        |ORDER BY RestaurantKey, BiReportingId""".stripMargin,

    "q43_industry_spend" ->
      ("WITH " + segCtes + ",\n" + clientDimCtes + ",\n" +
        """sp AS (SELECT industry, persona, sum(amt) AS spend
          |  FROM mm JOIN cl ON mm.pid=cl.pid JOIN dimp ON mm.pid=dimp.pid2
          |  JOIN dimc ON dimp.cid=dimc.cid2
          |  GROUP BY 1,2),
          |ind_tot AS (SELECT industry, sum(spend) AS t FROM sp GROUP BY 1)
          |SELECT sp.industry AS ClientIndustry, sp.persona AS PersonaName,
          |  cast(sp.spend as double) AS SpendbySegmentation,
          |  round(CASE WHEN ind_tot.t=0 THEN NULL
          |    ELSE cast(sp.spend as double)/cast(ind_tot.t as double) END, 6)
          |    AS PercentOfSpend
          |FROM sp JOIN ind_tot ON sp.industry=ind_tot.industry
          |ORDER BY ClientIndustry, PersonaName""".stripMargin),

    "q44_client_spend" ->
      ("WITH " + segCtes + ",\n" + clientDimCtes + ",\n" +
        """sp AS (SELECT industry, code, cname, persona, sum(amt) AS spend
          |  FROM mm JOIN cl ON mm.pid=cl.pid JOIN dimp ON mm.pid=dimp.pid2
          |  JOIN dimc ON dimp.cid=dimc.cid2
          |  GROUP BY 1,2,3,4),
          |ctot AS (SELECT code, sum(spend) AS t FROM sp GROUP BY 1)
          |SELECT sp.industry AS ClientIndustry, sp.code AS ClientCode,
          |  sp.cname AS ClientName, sp.persona AS PersonaName,
          |  cast(sp.spend as double) AS SpendbySegmentation,
          |  round(CASE WHEN ctot.t=0 THEN NULL
          |    ELSE cast(sp.spend as double)/cast(ctot.t as double) END, 6)
          |    AS PercentOfSpend
          |FROM sp JOIN ctot ON sp.code=ctot.code
          |ORDER BY ClientCode, PersonaName""".stripMargin),

    // Seg:313-339 Reporting.ClientTerritorySpend mirror: the TotalSpend
    // CTE joins back on (code, territory) — ClientName rides along
    // functionally, exactly as the reference's GROUP BY allows
    "q51_client_territory_spend" ->
      ("WITH " + segCtes + ",\n" + clientDimCtes + ",\n" +
        """sp AS (SELECT code, cname, mm.terr AS territory, persona,
          |  sum(amt) AS spend
          |  FROM mm JOIN cl ON mm.pid=cl.pid JOIN dimp ON mm.pid=dimp.pid2
          |  JOIN dimc ON dimp.cid=dimc.cid2
          |  GROUP BY 1,2,3,4),
          |ttot AS (SELECT code, territory, sum(spend) AS t
          |  FROM sp GROUP BY 1,2)
          |SELECT sp.code AS ClientCode, sp.cname AS ClientName,
          |  sp.territory AS SalesTerritory, sp.persona AS PersonaName,
          |  cast(sp.spend as double) AS SpendbySegmentation,
          |  round(CASE WHEN ttot.t=0 THEN NULL
          |    ELSE cast(sp.spend as double)/cast(ttot.t as double) END, 6)
          |    AS PercentOfSpend
          |FROM sp JOIN ttot ON sp.code=ttot.code
          |  AND sp.territory=ttot.territory
          |ORDER BY ClientCode, SalesTerritory, PersonaName""".stripMargin),

    "q45_diners_count" ->
      ("WITH " + clientDimCtes + ",\n" +
        """fact AS (SELECT o_custkey AS pid,
          |  cast(strftime(o_orderdate,'%Y%m%d') as int) AS dk FROM orders)
          |SELECT cname AS ClientName,
          |  cast(count(distinct pid) as bigint) AS DinersCount,
          |  cast(count(distinct CASE WHEN hv=1 THEN pid END) as bigint)
          |    AS HighValueDiners
          |FROM fact JOIN dimp ON pid=dimp.pid2 JOIN dimc ON dimp.cid=dimc.cid2
          |WHERE dk BETWEEN 19960101 AND 19981231
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // P-SF DimSalesForceBrand MERGE mirror (spScript.sql:35-79): the
    // dup-union'd sync semi-join reduces to the k%4<>3 membership test;
    // the ISNULL-normalized change flag is precomputed once in `j`
    "q46_brand_profile_merge" ->
      """WITH bp AS (SELECT s_suppkey AS k,
        |  concat('BP', cast(s_suppkey as varchar)) AS id,
        |  CASE WHEN s_suppkey%17=0 THEN '' WHEN s_suppkey%19=0 THEN NULL
        |    ELSE s_name END AS bn,
        |  CASE WHEN s_suppkey%6=0 THEN 'QSR' WHEN s_suppkey%6=1 THEN 'FAST CASUAL'
        |    WHEN s_suppkey%6=2 THEN 'MIDSCALE' WHEN s_suppkey%6=3 THEN 'UPSCALE'
        |    WHEN s_suppkey%6=4 THEN 'CASUAL' ELSE 'FINE DINING' END AS seg,
        |  CASE WHEN s_suppkey%3=0 THEN NULL ELSE 'GIVEN' END AS dgs,
        |  CASE WHEN s_suppkey%13=0 THEN NULL
        |    ELSE concat('cuisine', cast(s_suppkey%9 as varchar)) END AS pc,
        |  CASE WHEN s_suppkey%7=0 THEN 'N/A'
        |    ELSE concat(cast(s_suppkey*25 as varchar), '.50') END AS cat_s,
        |  CASE WHEN s_suppkey%11=0 THEN ''
        |    ELSE cast(s_suppkey*40 as varchar) END AS lg_s
        |  FROM supplier),
        |src AS (SELECT id, bn, seg,
        |  CASE WHEN dgs IS NULL AND seg IN ('QSR','FAST CASUAL') THEN 'LSR'
        |    WHEN dgs IS NULL AND seg IN ('MIDSCALE','UPSCALE','FINE DINING','CASUAL')
        |      THEN 'FSR'
        |    ELSE dgs END AS dgs,
        |  pc, TRY_CAST(cat_s AS DECIMAL(18,4)) AS cat,
        |  TRY_CAST(lg_s AS DECIMAL(18,4)) AS lg
        |  FROM bp WHERE nullif(bn,'') IS NOT NULL AND k%4<>3),
        |tgt AS (SELECT concat('BP', cast(s_suppkey as varchar)) AS id,
        |  CASE WHEN s_suppkey%5=0 THEN 'stale name' ELSE s_name END AS bn,
        |  CASE WHEN s_suppkey%6=0 THEN 'QSR' WHEN s_suppkey%6=1 THEN 'FAST CASUAL'
        |    WHEN s_suppkey%6=2 THEN 'MIDSCALE' WHEN s_suppkey%6=3 THEN 'UPSCALE'
        |    WHEN s_suppkey%6=4 THEN 'CASUAL' ELSE 'FINE DINING' END AS seg,
        |  CASE WHEN s_suppkey%3=0 THEN
        |    (CASE WHEN s_suppkey%6 IN (0,1) THEN 'LSR' ELSE 'FSR' END)
        |    ELSE 'GIVEN' END AS dgs,
        |  CASE WHEN s_suppkey%13=0 THEN ''
        |    ELSE concat('cuisine', cast(s_suppkey%9 as varchar)) END AS pc,
        |  CASE WHEN s_suppkey%7=0 THEN NULL
        |    ELSE cast(s_suppkey*25 as decimal(18,4))+0.5 END AS cat,
        |  CASE WHEN s_suppkey%11=0 THEN NULL
        |    ELSE cast(s_suppkey*40 as decimal(18,4)) END AS lg
        |  FROM supplier WHERE s_suppkey<=60),
        |j AS (SELECT t.id AS tid, s.id AS sid,
        |  t.bn AS tbn, t.seg AS tseg, t.dgs AS tdgs, t.pc AS tpc,
        |  t.cat AS tcat, t.lg AS tlg,
        |  s.bn AS sbn, s.seg AS sseg, s.dgs AS sdgs, s.pc AS spc,
        |  s.cat AS scat, s.lg AS slg,
        |  (coalesce(t.bn,'')<>coalesce(s.bn,'')
        |   OR coalesce(t.seg,'')<>coalesce(s.seg,'')
        |   OR coalesce(t.dgs,'')<>coalesce(s.dgs,'')
        |   OR coalesce(t.pc,'')<>coalesce(s.pc,'')
        |   OR coalesce(t.cat,-1)<>coalesce(s.cat,-1)
        |   OR coalesce(t.lg,-1)<>coalesce(s.lg,-1)) AS chg
        |  FROM tgt t FULL OUTER JOIN src s ON t.id=s.id)
        |SELECT coalesce(tid, sid) AS BrandProfileId,
        |  CASE WHEN sid IS NOT NULL AND (tid IS NULL OR chg) THEN sbn
        |    ELSE tbn END AS BrandName,
        |  CASE WHEN sid IS NOT NULL AND (tid IS NULL OR chg) THEN sseg
        |    ELSE tseg END AS RestaurantSegment,
        |  CASE WHEN sid IS NOT NULL AND (tid IS NULL OR chg) THEN sdgs
        |    ELSE tdgs END AS DiningGroupSegment,
        |  CASE WHEN sid IS NOT NULL AND (tid IS NULL OR chg) THEN spc
        |    ELSE tpc END AS PrimaryCuisine,
        |  cast(CASE WHEN sid IS NOT NULL AND (tid IS NULL OR chg) THEN scat
        |    ELSE tcat END as double) AS CateringAmountThreshold,
        |  cast(CASE WHEN sid IS NOT NULL AND (tid IS NULL OR chg) THEN slg
        |    ELSE tlg END as double) AS LargeEventThreshold
        |FROM j ORDER BY BrandProfileId""".stripMargin,

    // P-SF parent self-link mirror (spScript.sql:205-212): synced rows take
    // the parent's key through the LEFT JOIN (NULL when absent), unsynced
    // rows keep the original -1
    "q47_parent_self_link" ->
      """WITH dim AS (SELECT cast(c_custkey+1000 as bigint) AS rk,
        |  concat('A', cast(c_custkey as varchar)) AS sfkey,
        |  c_name AS an, cast(-1 as bigint) AS prk FROM customer),
        |sync AS (SELECT concat('A', cast(c_custkey as varchar)) AS acct,
        |  CASE WHEN c_custkey%10=0 THEN NULL
        |    WHEN c_custkey%7=0 THEN concat('Z', cast(c_custkey as varchar))
        |    ELSE concat('A', cast(greatest(c_custkey%50,1) as varchar))
        |  END AS parent
        |  FROM customer WHERE c_custkey%2=0)
        |SELECT d.rk AS SFRestaurantKey, d.sfkey AS SFKey, d.an AS AccountName,
        |  CASE WHEN s.acct IS NOT NULL THEN p.rk ELSE d.prk END
        |    AS SFParentRestaurantKey
        |FROM dim d LEFT JOIN sync s ON d.sfkey=s.acct
        |LEFT JOIN dim p ON p.sfkey=s.parent
        |ORDER BY SFRestaurantKey""".stripMargin,

    // non-parquet-source checks: the Spark side reads a CSV / JSON copy of
    // the fixture, the oracle the original parquet — a round-trip
    // corruption on either side breaks the hash
    "q48_csv_source" ->
      """SELECT c_mktsegment, cast(count(*) as bigint) AS n_cust,
        |  cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_bal,
        |  cast(min(c_custkey) as bigint) AS min_key
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_json_source" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |  cast(count(*) as bigint) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_total,
        |  cast(min(o_orderkey) as bigint) AS min_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // the Spark side reads month=yyyyMM partition directories with a
    // pruning predicate; the oracle computes the same aggregate from the
    // flat parquet
    "q50_partitioned_source" ->
      """SELECT cast(strftime(o_orderdate, '%Y%m') as bigint) AS month,
        |  cast(count(*) as bigint) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_total,
        |  cast(min(o_orderkey) as bigint) AS min_key
        |FROM orders
        |WHERE cast(strftime(o_orderdate, '%Y%m') as int) BETWEEN 199601 AND 199612
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // S1:29-41 problem-children report replay: unmapped map residue
    // joined back to the header, lookups re-resolved BY DISPLAY NAME,
    // flags joined on id, known-problem triples left-joined for the
    // iif(pr.clientcode is null, 0, 1) label
    "q56_problem_children" ->
      """WITH th AS (SELECT cast(o_orderkey as bigint) AS id,
        |    cast(o_custkey as bigint) AS clientcode,
        |    n_name AS bank_type, r_name AS creditcard_type,
        |    o_totalprice,
        |    cast(cast(strftime(o_orderdate,'%Y%m%d') as int) as bigint)
        |      AS datekey
        |  FROM orders JOIN customer ON o_custkey=c_custkey
        |  JOIN nation ON c_nationkey=n_nationkey
        |  JOIN region ON n_regionkey=r_regionkey),
        |p AS (SELECT cast(o_orderkey as bigint) AS id,
        |    CASE WHEN o_orderstatus='P' THEN NULL
        |         ELSE cast(o_custkey as bigint) END AS fingerprint_id
        |  FROM orders),
        |fl AS (SELECT cast(l_orderkey as bigint) AS id,
        |    cast(count(*) as bigint) AS n_items,
        |    cast(sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)
        |      as bigint) AS n_returned,
        |    cast(min(l_suppkey) as bigint) AS fl_fingerprint_id
        |  FROM lineitem GROUP BY 1),
        |bank AS (SELECT cast(n_nationkey as bigint) AS bank_id,
        |    n_name AS bank_display FROM nation),
        |cct AS (SELECT cast(r_regionkey as bigint) AS cct_id,
        |    r_name AS cct_display FROM region),
        |pr AS (SELECT cast(c_custkey as bigint) AS pr_clientcode,
        |    cast(n_nationkey as bigint) AS pr_bank_id,
        |    cast(n_regionkey as bigint) AS pr_cct_id
        |  FROM customer JOIN nation ON c_nationkey=n_nationkey
        |  WHERE c_acctbal < 0)
        |SELECT cast(CASE WHEN pr.pr_clientcode IS NULL THEN 0 ELSE 1 END
        |    as bigint) AS problemchild,
        |  th.id, th.clientcode, th.bank_type, th.creditcard_type,
        |  th.datekey, th.o_totalprice, fl.n_items, fl.n_returned,
        |  fl.fl_fingerprint_id
        |FROM p JOIN th ON p.id=th.id
        |JOIN bank ON th.bank_type=bank.bank_display
        |JOIN cct ON th.creditcard_type=cct.cct_display
        |JOIN fl ON th.id=fl.id
        |LEFT JOIN pr ON th.clientcode=pr.pr_clientcode
        |  AND cct.cct_id=pr.pr_cct_id AND bank.bank_id=pr.pr_bank_id
        |WHERE p.fingerprint_id IS NULL
        |ORDER BY 1, fl.fl_fingerprint_id, th.id""".stripMargin,
  )

  /** Client-dimension fixture CTEs shared by q43/q44/q45 — mirrors
    * CoreQueries.clientDims: 40 clients, industry = id mod 5, patron →
    * client via custkey mod 40, high-value = custkey mod 3 = 0. */
  private lazy val clientDimCtes: String =
    """dimp AS (SELECT c_custkey AS pid2, c_custkey%40 AS cid,
      |  CASE WHEN c_custkey%3=0 THEN 1 ELSE 0 END AS hv FROM customer),
      |dimc AS (SELECT c_custkey AS cid2,
      |  concat('IND', cast(c_custkey%5 as varchar)) AS industry,
      |  concat('C', cast(c_custkey as varchar)) AS code,
      |  concat('client ', cast(c_custkey as varchar)) AS cname
      |  FROM customer WHERE c_custkey<40)""".stripMargin

  /** The p=9 raw-estimate numerator as the engine's EXACT double (same
    * expression order as Stats.hllDistinctBy's rawNum), so the t116
    * oracle's raw estimate is bit-identical before the correction. */
  private lazy val hllRawNum9: Double =
    0.7213 / (1.0 + 1.079 / 512) * 512 * 512 * math.pow(2.0, 52)

  /** Shared CTE chain of the segmentation oracle (Seg:144-217 mirror):
    * minimarket spend, totals, max-territory/max-minimarket ratios, and the
    * three persona branches. */
  private lazy val segCtes: String =
    """mm AS (SELECT o_custkey AS pid, r_name AS terr, n_name AS mm_name,
      |  sum(cast(l_extendedprice as decimal(18,4))) AS amt
      |  FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      |  JOIN supplier ON l_suppkey=s_suppkey
      |  JOIN nation ON s_nationkey=n_nationkey
      |  JOIN region ON n_regionkey=r_regionkey
      |  GROUP BY 1,2,3),
      |tot AS (SELECT pid, sum(amt) AS total FROM mm GROUP BY 1),
      |terr AS (SELECT pid, terr, sum(amt) AS tamt FROM mm GROUP BY 1,2),
      |maxt AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY pid
      |  ORDER BY tamt DESC, terr) AS rn FROM terr) WHERE rn=1),
      |maxm AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY pid
      |  ORDER BY amt DESC, terr, mm_name) AS rn FROM mm) WHERE rn=1),
      |r AS (SELECT t.pid,
      |  CASE WHEN tot.total=0 THEN NULL
      |    ELSE cast(t.tamt as double)/cast(tot.total as double) END AS tr,
      |  CASE WHEN tot.total=0 THEN NULL
      |    ELSE cast(m.amt as double)/cast(tot.total as double) END AS mr
      |  FROM maxt t JOIN tot ON t.pid=tot.pid JOIN maxm m ON m.pid=t.pid),
      |cl AS (SELECT pid, coalesce(
      |  CASE WHEN tr<0.8 THEN 'Road Warrior'
      |       WHEN tr>=0.8 AND mr<0.8 THEN 'City person'
      |       WHEN tr>0.8 AND mr>=0.8 THEN 'Office manager' END,
      |  'Undefined') AS persona FROM r)""".stripMargin

  /** The S4 name-canonicalization chain as nested SQL replace() calls,
    * generated from the same (from, to) list the Spark side uses. */
  private def billGroupCleanSql(col: String): String = {
    val chain = Seq("'" -> "", "/" -> "-", "É" -> "E", "P. F." -> "P F",
      "B.GOOD" -> "BGOOD", "  " -> " ", "-TERMED" -> "", " - " -> "-",
      "-TERMINATED" -> "", "-TERM" -> "", "." -> "", "!" -> "",
      "_" -> " ", " -" -> "-")
      .foldLeft(col) { case (acc, (f, t)) =>
        s"replace($acc,'${f.replace("'", "''")}','${t.replace("'", "''")}')"
      }
    s"rtrim($chain)"
  }

  private val coreExtra: Map[String, String] = Map(
    "q40_unique_patron_three_phase" ->
      """WITH fact AS (SELECT cast(o_orderkey as bigint) AS DVHD_ID,
        |  cast(cast(strftime(o_orderdate,'%Y%m%d') as int) as bigint) AS DateKey,
        |  CASE WHEN o_orderstatus='O' THEN 0 ELSE 9999 END AS UniquePatronId
        |  FROM orders),
        |tk AS (SELECT cast(o_orderkey as bigint) AS DVHD_ID,
        |  concat('C', cast(o_custkey%50 as varchar)) AS cc,
        |  CASE WHEN o_custkey%3=0 THEN cast(o_custkey%500 as varchar)
        |    ELSE '' END AS emp,
        |  cast(o_custkey*9 as varchar) AS ccnum,
        |  concat('U', cast(o_custkey as varchar)) AS proxyid FROM orders),
        |demp AS (SELECT concat('C', cast(c_custkey%50 as varchar), '_',
        |    cast(c_custkey%500 as varchar), '_',
        |    cast(c_custkey*9 as varchar)) AS ProxyID,
        |  cast(c_custkey+10000 as bigint) AS uid FROM customer
        |  WHERE c_custkey%3=0 AND c_custkey%4=0),
        |dcard AS (SELECT concat('C', cast(c_custkey%50 as varchar), '_',
        |    right(concat('0000', cast(c_custkey*9 as varchar)),4)) AS ProxyID,
        |  cast(c_custkey+20000 as bigint) AS uid FROM customer
        |  WHERE c_custkey%6=0),
        |dnat AS (SELECT concat('U', cast(c_custkey as varchar)) AS ProxyID,
        |  cast(c_custkey+30000 as bigint) AS uid FROM customer
        |  WHERE c_custkey%5=0),
        |dim AS (SELECT * FROM demp UNION ALL SELECT * FROM dcard
        |  UNION ALL SELECT * FROM dnat),
        |m1 AS (SELECT tk.DVHD_ID, min(d.uid) AS mid FROM tk
        |  JOIN dim d ON concat(tk.cc,'_',tk.emp,'_',tk.ccnum)=d.ProxyID
        |  GROUP BY tk.DVHD_ID),
        |m2 AS (SELECT tk.DVHD_ID, min(d.uid) AS mid FROM tk
        |  JOIN dim d ON concat(tk.cc,'_',
        |    right(concat('0000',tk.ccnum),4))=d.ProxyID
        |  GROUP BY tk.DVHD_ID),
        |m3 AS (SELECT tk.DVHD_ID, min(d.uid) AS mid FROM tk
        |  JOIN dim d ON tk.proxyid=d.ProxyID GROUP BY tk.DVHD_ID),
        |p1 AS (SELECT f.DVHD_ID, f.DateKey,
        |  CASE WHEN coalesce(f.UniquePatronId,0)=0
        |         AND f.DateKey BETWEEN 19960101 AND 19971231
        |         AND m1.mid IS NOT NULL THEN m1.mid
        |       ELSE f.UniquePatronId END AS UniquePatronId
        |  FROM fact f LEFT JOIN m1 ON f.DVHD_ID=m1.DVHD_ID),
        |p2 AS (SELECT p1.DVHD_ID, p1.DateKey,
        |  CASE WHEN coalesce(p1.UniquePatronId,0)=0
        |         AND p1.DateKey BETWEEN 19960101 AND 19971231
        |         AND m2.mid IS NOT NULL THEN m2.mid
        |       ELSE p1.UniquePatronId END AS UniquePatronId
        |  FROM p1 LEFT JOIN m2 ON p1.DVHD_ID=m2.DVHD_ID),
        |p3 AS (SELECT p2.DVHD_ID, p2.DateKey,
        |  CASE WHEN coalesce(p2.UniquePatronId,0)=0
        |         AND p2.DateKey BETWEEN 19960101 AND 19971231
        |         AND m3.mid IS NOT NULL THEN m3.mid
        |       ELSE p2.UniquePatronId END AS UniquePatronId
        |  FROM p2 LEFT JOIN m3 ON p2.DVHD_ID=m3.DVHD_ID)
        |SELECT DVHD_ID, DateKey, UniquePatronId FROM p3
        |ORDER BY DVHD_ID""".stripMargin,

    "q38_restaurant_rank" ->
      """WITH sites AS (SELECT c_custkey AS site_id,
        |  concat(right(c_name,5),' shop') AS sname FROM customer),
        |locs AS (SELECT c_custkey+100000 AS rlp_id,
        |  CASE WHEN c_custkey%3=0 THEN concat(right(c_name,5),' shop')
        |       WHEN c_custkey%3=1 THEN concat(right(c_name,5),' shop uptown')
        |       ELSE concat(right(c_name,5),' shop downtown') END AS rname,
        |  CASE WHEN c_custkey%3=1 THEN concat(right(c_name,5),' shop')
        |       ELSE concat('zz ', right(c_name,5),' shop') END AS dname
        |  FROM customer),
        |cand AS (
        |  SELECT s.site_id, l.rlp_id, s.sname, l.rname, l.dname
        |  FROM sites s JOIN locs l
        |    ON substring(upper(trim(coalesce(s.sname,''))),1,5)
        |      =substring(upper(trim(coalesce(l.rname,''))),1,5)
        |  UNION
        |  SELECT s.site_id, l.rlp_id, s.sname, l.rname, l.dname
        |  FROM sites s JOIN locs l
        |    ON substring(upper(trim(coalesce(s.sname,''))),1,5)
        |      =substring(upper(trim(coalesce(l.dname,''))),1,5)),
        |q AS (SELECT site_id, rlp_id,
        |  CASE WHEN ns=nr THEN 1 WHEN ns=nd THEN 2
        |       WHEN contains(ns,nr) OR contains(nr,ns) THEN 3 ELSE 4 END AS qual
        |  FROM (SELECT site_id, rlp_id,
        |    upper(trim(coalesce(sname,''))) AS ns,
        |    upper(trim(coalesce(rname,''))) AS nr,
        |    upper(trim(coalesce(dname,''))) AS nd FROM cand)),
        |r AS (SELECT site_id, rlp_id,
        |  rank() OVER (PARTITION BY site_id ORDER BY qual) AS rk FROM q)
        |SELECT cast(site_id as bigint) AS site_id,
        |  cast(rlp_id as bigint) AS rlp_id
        |FROM r WHERE rk=1 ORDER BY site_id, rlp_id""".stripMargin,

    "q39_cuisine_impute" ->
      """WITH dim AS (SELECT cast(p_partkey as bigint) AS k, p_brand AS Brand,
        |  CASE WHEN p_partkey%3=0 THEN 'Partner' ELSE 'Common' END AS typ,
        |  CASE WHEN p_partkey%7=0 THEN 'N/A' ELSE p_type END AS ct,
        |  p_size*40 AS rnk FROM part),
        |known AS (SELECT * FROM dim WHERE ct IS NOT NULL AND ct<>'N/A'),
        |pm AS (SELECT Brand, ct AS pmode FROM (SELECT Brand, ct,
        |  row_number() OVER (PARTITION BY Brand ORDER BY cnt DESC, ct) AS rn
        |  FROM (SELECT Brand, ct, count(*) AS cnt FROM known
        |    WHERE typ='Partner' GROUP BY 1,2)) WHERE rn=1),
        |cm AS (SELECT Brand, ct AS cmode FROM (SELECT Brand, ct,
        |  row_number() OVER (PARTITION BY Brand ORDER BY cnt DESC, ct) AS rn
        |  FROM (SELECT Brand, ct, count(*) AS cnt FROM known GROUP BY 1,2))
        |  WHERE rn=1)
        |SELECT k AS SFRestaurantKey, dim.Brand,
        |  CASE WHEN ct='N/A' AND rnk<1500 AND coalesce(pmode,cmode) IS NOT NULL
        |    THEN coalesce(pmode,cmode) ELSE ct END AS CuisineType,
        |  cast(rnk as bigint) AS "Rank"
        |FROM dim LEFT JOIN pm ON dim.Brand=pm.Brand
        |LEFT JOIN cm ON dim.Brand=cm.Brand
        |ORDER BY SFRestaurantKey""".stripMargin,

    "q37_billing_group_scd" ->
      s"""WITH src AS (SELECT o_custkey%200 AS SiteId,
         |  concat('GRP/', cast(o_custkey%37 as varchar),
         |    CASE WHEN o_orderkey%5=0 THEN '-TERMED'
         |         WHEN o_orderkey%5=1 THEN '.'
         |         WHEN o_orderkey%5=2 THEN '_'
         |         WHEN o_orderkey%5=3 THEN ${"''''"}
         |         ELSE '' END) AS BillGroup,
         |  cast(o_orderdate as date) AS txndate FROM orders),
         |maxd AS (SELECT max(txndate) AS m FROM src),
         |cleaned AS (SELECT SiteId, ${billGroupCleanSql("BillGroup")} AS name,
         |  txndate FROM src
         |  WHERE txndate >= DATE '1996-01-01' AND SiteId IS NOT NULL),
         |bo AS (SELECT cast(c_custkey+1000 as bigint) AS ID,
         |  ${billGroupCleanSql("concat('GRP-', cast(c_custkey as varchar))")}
         |    AS boname FROM customer WHERE c_custkey<37),
         |grouped AS (SELECT SiteId, name, ID, min(txndate) AS mn,
         |  max(txndate) AS mx
         |  FROM cleaned LEFT JOIN bo ON name=boname GROUP BY 1,2,3),
         |picked AS (SELECT * FROM (SELECT *, row_number() OVER
         |  (PARTITION BY SiteId, name ORDER BY ID DESC NULLS LAST) AS rn
         |  FROM grouped) WHERE rn=1)
         |SELECT cast(SiteId as bigint) AS SiteId,
         |  name AS BillingGroupDisplayName,
         |  coalesce(ID,-1) AS BackOfficeBillingGroupId,
         |  cast(date_trunc('month', mn) as date) AS ValidFrom,
         |  CASE WHEN last_day(mx) = (SELECT m FROM maxd)
         |    THEN DATE '9999-12-31' ELSE last_day(mx) END AS ValidTo
         |FROM picked
         |ORDER BY SiteId, BillingGroupDisplayName""".stripMargin,

    "q35_patron_two_pass" ->
      """WITH fact AS (SELECT cast(o_orderkey as bigint) AS TH_ID,
        |  cast(cast(strftime(o_orderdate,'%Y%m%d') as int) as bigint) AS DateKey,
        |  CASE WHEN o_orderstatus='O' THEN 1
        |    ELSE cast(o_custkey+5000 as bigint) END AS Patron_ID FROM orders),
        |tp AS (SELECT cast(o_orderkey as bigint) AS TH_ID,
        |  CASE WHEN o_custkey%2=0 THEN concat('P', cast(o_custkey as varchar))
        |    ELSE 'none' END AS proxyid,
        |  o_custkey%100 AS ClientID, cast(o_custkey*7 as varchar) AS ccnum
        |  FROM orders),
        |nat AS (SELECT cast(c_custkey+5000 as bigint) AS ID,
        |  concat('P', cast(c_custkey as varchar)) AS ProxyID
        |  FROM customer WHERE c_custkey%3=0),
        |syn AS (SELECT cast(c_custkey+9000 as bigint) AS ID,
        |  concat(cast(c_custkey%100 as varchar), '_',
        |    right(concat('0000', cast(c_custkey*7 as varchar)),4)) AS ProxyID
        |  FROM customer WHERE c_custkey%5=0),
        |dim AS (SELECT * FROM nat UNION ALL SELECT * FROM syn),
        |m1 AS (SELECT tp.TH_ID, min(d.ID) AS mid FROM tp
        |  JOIN dim d ON tp.proxyid=d.ProxyID GROUP BY tp.TH_ID),
        |p1 AS (SELECT f.TH_ID, f.DateKey,
        |  CASE WHEN f.Patron_ID=1 AND f.DateKey BETWEEN 19960101 AND 19971231
        |         AND m1.mid IS NOT NULL THEN m1.mid ELSE f.Patron_ID END AS Patron_ID
        |  FROM fact f LEFT JOIN m1 ON f.TH_ID=m1.TH_ID),
        |m2 AS (SELECT tp.TH_ID, min(d2.ID) AS mid FROM tp
        |  JOIN dim d2 ON concat(cast(tp.ClientID as varchar), '_',
        |    right(concat('0000', tp.ccnum),4))=d2.ProxyID GROUP BY tp.TH_ID),
        |p2 AS (SELECT p1.TH_ID, p1.DateKey,
        |  CASE WHEN p1.Patron_ID=1 AND p1.DateKey BETWEEN 19960101 AND 19971231
        |         AND m2.mid IS NOT NULL THEN m2.mid ELSE p1.Patron_ID END AS Patron_ID
        |  FROM p1 LEFT JOIN m2 ON p1.TH_ID=m2.TH_ID)
        |SELECT TH_ID, DateKey, Patron_ID FROM p2 ORDER BY TH_ID""".stripMargin,

    "q36_new_fingerprints" ->
      """WITH header AS (SELECT o_orderkey AS id,
        |  cast(o_custkey as varchar) AS MerchantNumber,
        |  CASE WHEN o_orderkey%7=0 THEN concat('REV:', c_name) ELSE c_name
        |    END AS MerchantLegalName,
        |  c_mktsegment AS MerchantName,
        |  concat('addr ', cast(c_custkey as varchar)) AS AddressLine01,
        |  n_name AS CityName, 'ST' AS StateProvince,
        |  lpad(cast(c_custkey%10000 as varchar),5,'0') AS PostalCode,
        |  CASE WHEN c_nationkey<20 THEN 'US' ELSE 'DE' END AS CountryCode,
        |  c_mktsegment AS clientcode, o_orderdate AS TransactionDate,
        |  cast(5811 + o_orderkey%4 as varchar) AS MccCode
        |  FROM orders JOIN customer ON o_custkey=c_custkey
        |  JOIN nation ON c_nationkey=n_nationkey),
        |hashed AS (SELECT *,
        |  md5(concat_ws('|',
        |    upper(trim(coalesce(MerchantNumber,''))),
        |    upper(trim(coalesce(CASE WHEN upper(MerchantLegalName) LIKE 'REV:%'
        |      THEN substring(MerchantLegalName,5) ELSE MerchantLegalName END,''))),
        |    upper(trim(coalesce(MerchantName,''))),
        |    upper(trim(coalesce(AddressLine01,''))),
        |    upper(trim(coalesce(CityName,''))),
        |    upper(trim(coalesce(StateProvince,''))),
        |    upper(trim(coalesce(PostalCode,''))),
        |    upper(trim(coalesce(CountryCode,''))))) AS fp,
        |  md5(concat_ws('|',
        |    upper(trim(coalesce(CASE WHEN upper(MerchantLegalName) LIKE 'REV:%'
        |      THEN substring(MerchantLegalName,5) ELSE MerchantLegalName END,''))),
        |    upper(trim(coalesce(MerchantName,''))),
        |    upper(trim(coalesce(AddressLine01,''))),
        |    upper(trim(coalesce(CityName,''))),
        |    upper(trim(coalesce(StateProvince,''))),
        |    upper(trim(coalesce(PostalCode,''))),
        |    upper(trim(coalesce(CountryCode,''))))) AS fpnomid
        |  FROM header),
        |existing AS (SELECT fp FROM hashed
        |  WHERE cast(MerchantNumber as bigint)%2=0),
        |eligible AS (SELECT * FROM hashed
        |  WHERE TransactionDate BETWEEN TIMESTAMP '1996-01-01'
        |    AND TIMESTAMP '1997-12-31'
        |  AND ((CountryCode IN ('US','PR','VI','GU','CA','MX','AS','MP','UM')
        |    AND MccCode IN ('5811','5812','5813','5814'))
        |    OR clientcode='MC')
        |  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.fp=hashed.fp))
        |SELECT upper(trim(coalesce(MerchantNumber,''))) AS MerchantNumber,
        |  upper(trim(coalesce(CASE WHEN upper(MerchantLegalName) LIKE 'REV:%'
        |    THEN substring(MerchantLegalName,5) ELSE MerchantLegalName END,'')))
        |    AS MerchantLegalName,
        |  upper(trim(coalesce(MerchantName,''))) AS MerchantName,
        |  upper(trim(coalesce(CityName,''))) AS CityName,
        |  upper(trim(coalesce(PostalCode,''))) AS PostalCode,
        |  upper(trim(coalesce(CountryCode,''))) AS CountryCode,
        |  fp AS SimHash, fpnomid AS SimHashNoMid,
        |  count(distinct clientcode) AS ClientCount,
        |  count(*) AS BankFeedCount,
        |  cast(min(TransactionDate) as date) AS AnalysisStartDate,
        |  cast(max(TransactionDate) as date) AS AnalysisEndDate
        |FROM eligible
        |GROUP BY 1,2,3,4,5,6,7,8,
        |  upper(trim(coalesce(AddressLine01,''))),
        |  upper(trim(coalesce(StateProvince,'')))
        |ORDER BY SimHash""".stripMargin,
  )

  /** The RHP hyperplane weights used by Similarity.rhpBucket are
    * data-independent constants — ±1 from xxhash64(dim_idx, plane) & 1 —
    * so the oracle recomputes buckets exactly from these inlined
    * matrices (dumped from the Spark expression; 64 dims × 8 planes). */
  private val rhpPlanes: Seq[String] = Seq(
    "-1,1,1,1,-1,-1,-1,-1,1,1,-1,-1,1,-1,1,1,1,1,1,1,-1,1,1,1,-1,-1,1,-1,-1,-1,-1,1,-1,1,-1,-1,-1,-1,1,1,1,-1,-1,1,-1,-1,1,1,1,-1,1,1,-1,1,-1,-1,-1,1,-1,-1,-1,1,1,1",
    "1,-1,-1,-1,-1,-1,1,1,1,1,-1,-1,1,1,-1,1,-1,1,-1,-1,1,1,-1,-1,1,-1,1,-1,-1,-1,1,1,-1,1,1,-1,-1,-1,1,-1,1,-1,1,1,1,1,-1,1,-1,1,-1,-1,1,1,-1,1,-1,-1,1,-1,1,-1,1,1",
    "1,1,-1,1,1,-1,1,-1,-1,-1,1,1,1,1,-1,-1,1,1,-1,1,-1,1,1,1,-1,-1,1,-1,1,-1,1,-1,-1,1,-1,1,1,-1,-1,1,-1,1,1,1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,1,1,-1,-1,1,-1,1,-1",
    "1,-1,1,1,1,1,1,1,-1,1,-1,1,1,1,-1,1,1,-1,-1,-1,1,1,1,-1,-1,-1,-1,1,-1,-1,1,1,1,-1,-1,1,-1,1,-1,-1,1,-1,1,-1,-1,1,1,1,1,1,-1,-1,-1,1,1,-1,1,1,1,-1,-1,1,-1,1",
    "1,1,1,1,1,-1,-1,-1,1,-1,-1,-1,1,-1,-1,1,-1,1,1,-1,1,-1,1,-1,1,-1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,1,-1,-1,1,-1,1,1,1,1,1,1,1,1,-1,-1,-1,1,-1,1,-1,1,1,-1,1,-1,-1",
    "-1,1,-1,1,-1,-1,-1,-1,1,1,-1,-1,-1,-1,1,1,1,-1,1,-1,-1,-1,-1,-1,1,1,1,1,1,-1,1,-1,1,1,1,1,1,-1,1,1,1,1,-1,1,-1,-1,1,1,-1,1,-1,1,1,1,-1,-1,-1,-1,1,-1,-1,1,1,1",
    "-1,-1,-1,-1,1,-1,1,-1,1,-1,1,-1,1,1,-1,1,1,-1,1,-1,1,1,-1,-1,1,-1,-1,-1,-1,-1,-1,-1,-1,1,-1,1,1,1,-1,-1,-1,-1,1,1,1,1,-1,-1,-1,-1,1,-1,1,1,-1,-1,1,1,-1,1,1,-1,1,1",
    "1,1,-1,1,-1,1,-1,-1,1,-1,-1,-1,1,-1,1,1,-1,1,-1,1,1,-1,1,-1,1,-1,-1,-1,-1,-1,-1,1,-1,-1,-1,1,-1,1,-1,1,1,-1,-1,1,-1,1,-1,1,1,1,-1,1,-1,-1,-1,-1,1,-1,1,1,1,1,1,1")

  /** DuckDB list literal of probe buckets over a bucket column `b0`:
    * own bucket + Hamming-1 xors (+ Hamming-2 when `probe2`) — mirrors
    * Similarity.probeSet exactly. */
  private def probeListSql(b0: String, bits: Int, probe2: Boolean): String = {
    val h1 = (0 until bits).map(p => s"xor($b0, ${1 << p})")
    val h2 =
      if (probe2)
        for { i <- 0 until bits; j <- (i + 1) until bits }
          yield s"xor($b0, ${(1 << i) | (1 << j)})"
      else Nil
    (b0 +: (h1 ++ h2)).mkString("[", ", ", "]")
  }

  /** `bucket` column SQL over column `vcol` for the first `bits` planes. */
  private def rhpBucketSql(vcol: String, bits: Int): String =
    (0 until bits).map { p =>
      s"""(CASE WHEN list_dot_product(cast($vcol as double[]),
         |   [${rhpPlanes(p)}]::double[]) >= 0 THEN ${1 << p} ELSE 0 END)"""
        .stripMargin
    }.mkString(" + ")

  /** Shared CTE chain of the md5 MinHash-LSH recomputation (docs with
    * planted dups -> distinct 3-gram shingles -> 32-hash signatures ->
    * 8x4 bands -> bucket-collision pairs -> exact Jaccard numerator ii /
    * denominator uu in `j`). t03 selects the >= 0.5 pairs from `j`; t14
    * closes the same edge set under transitivity. */
  /** The TextOps.qualityScore formula over a text column `t` with
    * token count `n` — shared by the t50 drift mirror (t01 carries its
    * own inline copy, kept verbatim for hash stability). */
  private def qualitySql(t: String, n: String): String =
    s"""round(least(1.0, greatest(0.0,
       |   (CASE WHEN length($t)=0 THEN 0.0
       |     ELSE cast(length(regexp_replace($t,'[^A-Za-z ]','','g')) as double)/length($t) END)*0.5
       |   + (CASE WHEN $n BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.5 END)*0.3
       |   + (1.0 - least(1.0, (CASE WHEN length($t)=0 THEN 0.0
       |     ELSE cast(length(regexp_replace($t,'[^.,;:!?]','','g')) as double)/length($t) END)*10))*0.1
       |   + (CASE WHEN (CASE WHEN $n=0 THEN 0.0
       |     ELSE cast(length($t) as double)/$n END) BETWEEN 2 AND 12
       |     THEN 0.1 ELSE 0.0 END))),4)""".stripMargin

  private lazy val minhashLshCtes: String =
    """d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, array_to_string(
      |    (regexp_split_to_array(trim(text),'\s+'))[2:], ' ') AS text
      |  FROM documents),
      |tok AS (SELECT doc_id,
      |  regexp_split_to_array(lower(trim(text)),'\s+') AS t FROM d),
      |sh AS (SELECT doc_id, unnest(list_distinct(%SH%)) AS s FROM tok),
      |x AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::bigint AS x FROM sh),
      |hi AS (SELECT doc_id, i,
      |    min((((2654435761*(i+1)) % 2147483647) * x
      |      + ((40503*(i+1)) % 2147483647)) % 2147483647) AS h
      |  FROM x CROSS JOIN range(0,32) r(i) GROUP BY 1,2),
      |sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM hi GROUP BY 1),
      |banded AS (SELECT doc_id, b, md5(array_to_string(list_transform(
      |    sig[b*4+1 : b*4+4], y -> y::varchar), ',')) AS bh
      |  FROM sig CROSS JOIN range(0,8) r(b)),
      |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      |  FROM banded l JOIN banded r
      |    ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (SELECT p.id_a, p.id_b, count(*) AS i FROM pairs p
      |  JOIN sh a ON a.doc_id = p.id_a
      |  JOIN sh b2 ON b2.doc_id = p.id_b AND b2.s = a.s
      |  GROUP BY 1, 2),
      |j AS (SELECT p.id_a, p.id_b,
      |    coalesce(i.i, 0)::double AS ii,
      |    (coalesce(na.n, 0) + coalesce(nb.n, 0))::double
      |      - coalesce(i.i, 0) AS uu
      |  FROM pairs p
      |  LEFT JOIN sz na ON na.doc_id = p.id_a
      |  LEFT JOIN sz nb ON nb.doc_id = p.id_b
      |  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b)""".stripMargin
      .replace("%SH%", shingleSql.format("t", "t"))

  private val shingleSql =
    """list_distinct(list_filter(list_transform(range(1, greatest(len(%s)-2,0)+1),
      | i -> array_to_string(%s[i:i+2],' ')),
      | s -> len(string_split(s,' '))=3))""".stripMargin

  val data: Map[String, String] = Map(
    "t01_doc_stats" ->
      """WITH tok AS (SELECT doc_id, text, lower(trim(text)) AS lt,
        |  CASE WHEN length(trim(text))=0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS n_tokens,
        |  regexp_split_to_array(lower(trim(text)),'\s+') AS toks
        |  FROM documents),
        |scored AS (SELECT *,
        |  len(list_filter(toks, x -> x='the'))+len(list_filter(toks, x -> x='and'))+len(list_filter(toks, x -> x='of'))+len(list_filter(toks, x -> x='to'))+len(list_filter(toks, x -> x='in'))+len(list_filter(toks, x -> x='is'))+len(list_filter(toks, x -> x='that'))+len(list_filter(toks, x -> x='it')) AS s_en,
        |  len(list_filter(toks, x -> x='der'))+len(list_filter(toks, x -> x='die'))+len(list_filter(toks, x -> x='und'))+len(list_filter(toks, x -> x='das'))+len(list_filter(toks, x -> x='ist'))+len(list_filter(toks, x -> x='nicht'))+len(list_filter(toks, x -> x='ein'))+len(list_filter(toks, x -> x='mit')) AS s_de,
        |  len(list_filter(toks, x -> x='le'))+len(list_filter(toks, x -> x='la'))+len(list_filter(toks, x -> x='et'))+len(list_filter(toks, x -> x='les'))+len(list_filter(toks, x -> x='des'))+len(list_filter(toks, x -> x='est'))+len(list_filter(toks, x -> x='pas'))+len(list_filter(toks, x -> x='une')) AS s_fr,
        |  len(list_filter(toks, x -> x='el'))+len(list_filter(toks, x -> x='la'))+len(list_filter(toks, x -> x='de'))+len(list_filter(toks, x -> x='que'))+len(list_filter(toks, x -> x='los'))+len(list_filter(toks, x -> x='es'))+len(list_filter(toks, x -> x='una'))+len(list_filter(toks, x -> x='por')) AS s_es,
        |  len(list_filter(toks, x -> x='il'))+len(list_filter(toks, x -> x='di'))+len(list_filter(toks, x -> x='che'))+len(list_filter(toks, x -> x='la'))+len(list_filter(toks, x -> x='per'))+len(list_filter(toks, x -> x='con'))+len(list_filter(toks, x -> x='una'))+len(list_filter(toks, x -> x='sono')) AS s_it
        |  FROM tok)
        |SELECT doc_id, cast(n_tokens as bigint) AS n_tokens,
        | cast(len(regexp_extract_all(text,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) as bigint) AS n_bpe_tokens,
        | cast(length(text) as bigint) AS n_chars_measured,
        | round(least(1.0, greatest(0.0,
        |   (CASE WHEN length(text)=0 THEN 0.0
        |     ELSE cast(length(regexp_replace(text,'[^A-Za-z ]','','g')) as double)/length(text) END)*0.5
        |   + (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.5 END)*0.3
        |   + (1.0 - least(1.0, (CASE WHEN length(text)=0 THEN 0.0
        |     ELSE cast(length(regexp_replace(text,'[^.,;:!?]','','g')) as double)/length(text) END)*10))*0.1
        |   + (CASE WHEN (CASE WHEN n_tokens=0 THEN 0.0
        |     ELSE cast(length(text) as double)/n_tokens END) BETWEEN 2 AND 12
        |     THEN 0.1 ELSE 0.0 END))),4) AS quality,
        | CASE WHEN s_it>0 AND s_it>=s_fr AND s_it>=s_es AND s_it>=s_en AND s_it>=s_de THEN 'it'
        |      WHEN s_fr>0 AND s_fr>=s_es AND s_fr>=s_en AND s_fr>=s_de THEN 'fr'
        |      WHEN s_es>0 AND s_es>=s_en AND s_es>=s_de THEN 'es'
        |      WHEN s_en>0 AND s_en>=s_de THEN 'en'
        |      WHEN s_de>0 THEN 'de' ELSE 'und' END AS lang_pred,
        | md5(regexp_replace(lt,'\s+',' ','g')) AS fingerprint
        |FROM scored ORDER BY doc_id""".stripMargin,

    "t02_exact_dedup" ->
      """SELECT fp, min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM (SELECT doc_id, md5(array_to_string(
        |  (regexp_split_to_array(lower(trim(text)),'\s+'))[1:2],' ')) AS fp
        |  FROM documents)
        |GROUP BY 1 HAVING count(*)>1 ORDER BY fp""".stripMargin,

    // exact recomputation of the MinHash-LSH pipeline: md5-derived 32-hash
    // signatures (h_i(x) = (a_i*x+b_i) mod 2^31-1 over the first 32 bits of
    // md5(shingle)), 8 bands x 4 rows keyed by md5 of the joined minima,
    // bucket-collision pairs, then exact 3-gram Jaccard >= 0.5
    "t03_minhash_lsh" ->
      ("WITH " + minhashLshCtes + """
        |SELECT cast(id_a as bigint) AS id_a, cast(id_b as bigint) AS id_b,
        | round(CASE WHEN uu = 0 THEN 0.0 ELSE ii/uu END, 4) AS jaccard
        |FROM j WHERE (CASE WHEN uu = 0 THEN 0.0 ELSE ii/uu END) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin),

    // the t03 edge set closed under transitivity: min-reachable-id
    // connected components via a recursive CTE — recomputes exactly the
    // clusters Spark derives by iterative min-label propagation
    "t14_neardup_clusters" ->
      ("WITH RECURSIVE " + minhashLshCtes + """,
        |edges AS (SELECT id_a, id_b FROM j
        |  WHERE (CASE WHEN uu = 0 THEN 0.0 ELSE ii/uu END) >= 0.5),
        |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION SELECT id_b, id_a FROM edges),
        |reach AS (SELECT src AS node, dst AS r FROM sym
        |  UNION SELECT reach.node, s.dst FROM reach
        |    JOIN sym s ON s.src = reach.r),
        |comp AS (SELECT node, least(node, min(r)) AS comp
        |  FROM reach GROUP BY node)
        |SELECT cast(node as bigint) AS doc_id, cast(comp as bigint) AS cluster_id,
        | cast(CASE WHEN node = comp THEN 1 ELSE 0 END as bigint) AS is_canonical
        |FROM comp ORDER BY doc_id""".stripMargin),

    // t14's recursive clusters + keep-the-longest survivorship: rank by
    // (token count DESC, id) within each cluster; unpaired docs are
    // their own single-member cluster via the LEFT JOIN coalesce
    "t49_retain_best" ->
      ("WITH RECURSIVE " + minhashLshCtes + """,
        |edges AS (SELECT id_a, id_b FROM j
        |  WHERE (CASE WHEN uu = 0 THEN 0.0 ELSE ii/uu END) >= 0.5),
        |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION SELECT id_b, id_a FROM edges),
        |reach AS (SELECT src AS node, dst AS r FROM sym
        |  UNION SELECT reach.node, s.dst FROM reach
        |    JOIN sym s ON s.src = reach.r),
        |comp AS (SELECT node, least(node, min(r)) AS comp
        |  FROM reach GROUP BY node),
        |nt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |    AS n_tokens FROM d),
        |m AS (SELECT d2.doc_id, coalesce(c.comp, d2.doc_id) AS cluster_id
        |  FROM (SELECT doc_id FROM d) d2
        |  LEFT JOIN comp c ON d2.doc_id = c.node),
        |r AS (SELECT m.doc_id, cluster_id, row_number() OVER (
        |    PARTITION BY cluster_id ORDER BY n_tokens DESC, m.doc_id)
        |    AS rk
        |  FROM m JOIN nt ON m.doc_id = nt.doc_id)
        |SELECT cast(doc_id as bigint) AS doc_id,
        | cast(cluster_id as bigint) AS cluster_id,
        | cast(CASE WHEN rk = 1 THEN 1 ELSE 0 END as bigint) AS is_kept
        |FROM r ORDER BY doc_id""".stripMargin),

    // exact recomputation of the drift monitor: per-doc round-4 quality
    // (the t01 formula), decimal-exact means for the even-id reference
    // profile and the full-corpus monitor, drift on the ROUND-4 means
    // vs the tight tolerances (0.005 quality / 1.0 tokens); a source
    // absent from the profile would flag unconditionally
    "t50_drift_monitor" ->
      (s"""WITH q AS (SELECT doc_id, source,
        |  ${qualitySql("text", "nt")} AS q, nt FROM (
        |    SELECT doc_id, source, text,
        |      CASE WHEN length(trim(text))=0 THEN 0
        |        ELSE len(regexp_split_to_array(trim(text),'\\s+')) END AS nt
        |    FROM documents)),
        |ref AS (SELECT source,
        |    cast(sum(cast(q as decimal(18,4))) as double)/count(*) AS rq,
        |    cast(sum(nt) as double)/count(*) AS rt
        |  FROM q WHERE doc_id % 2 = 0 GROUP BY 1),
        |cur AS (SELECT source, count(*) AS n_docs,
        |    round(cast(sum(cast(q as decimal(18,4))) as double)/count(*), 4)
        |      AS mean_quality,
        |    round(cast(sum(nt) as double)/count(*), 4) AS mean_tokens
        |  FROM q GROUP BY 1)
        |SELECT cur.source, cast(n_docs as bigint) AS n_docs,
        | mean_quality, mean_tokens,
        | cast(CASE WHEN ref.source IS NULL
        |   OR abs(mean_quality - round(rq, 4)) > 0.005
        |   OR abs(mean_tokens - round(rt, 4)) > 1.0
        |   THEN 1 ELSE 0 END as bigint) AS drift
        |FROM cur LEFT JOIN ref ON cur.source = ref.source
        |ORDER BY cur.source""".stripMargin),

    // exact recomputation of corpus-wide line dedup: same synthetic
    // multi-line docs, md5-keyed first-occurrence survivorship on the
    // composite doc_id*1e6+line_no key, blank lines pass through
    "t15_line_dedup" ->
      """WITH d AS (SELECT doc_id,
        |  concat_ws(chr(10), 'promo: subscribe now', text, '',
        |    'copyright footer',
        |    (regexp_split_to_array(trim(text),'\s+'))[1]) AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM d),
        |l AS (SELECT doc_id, generate_subscripts(a, 1) AS line_no,
        |  unnest(a) AS ln FROM ls),
        |occ AS (SELECT *, doc_id*1000000 + line_no AS occ FROM l),
        |w AS (SELECT *, min(occ) OVER (PARTITION BY md5(ln)) AS min_occ
        |  FROM occ),
        |kept AS (SELECT * FROM w WHERE trim(ln) = '' OR occ = min_occ)
        |SELECT doc_id,
        | array_to_string(list(ln ORDER BY line_no), chr(10)) AS clean_text,
        | cast(count(*) as bigint) AS n_kept
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // exact recomputation of the md5-threshold stratified sample: dyadic
    // rates (0.75/0.25) make rate*2^32 integer-exact, so floor == the
    // engine's cast-truncation and both sides select identical rows
    "t16_hash_sample" ->
      """SELECT doc_id,
        | CASE WHEN length(text) >= 300 THEN 'long' ELSE 'short' END AS band
        |FROM documents
        |WHERE ('0x'||substr(md5('mix1'||cast(doc_id as varchar)),1,8))::bigint
        |  < cast(floor((CASE WHEN length(text) >= 300 THEN 0.75 ELSE 0.25 END)
        |      * 4294967296.0) as bigint)
        |ORDER BY doc_id""".stripMargin,

    "t04_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)),'\s+') AS t FROM documents),
        |sh AS (SELECT doc_id, %SH_A% AS sha FROM d),
        |shp AS (SELECT doc_id, %SH_B% AS shb
        |  FROM (SELECT doc_id, t[2:] AS t2 FROM d))
         |SELECT cast(a.doc_id as bigint) AS id_a,
         | cast(a.doc_id+100000 as bigint) AS id_b,
         | round(CASE WHEN len(list_distinct(list_concat(sha,shb)))=0 THEN 0.0
         |   ELSE cast(len(list_intersect(sha,shb)) as double)
         |     /len(list_distinct(list_concat(sha,shb))) END,4) AS jaccard
         |FROM sh a JOIN shp b ON a.doc_id=b.doc_id
         |ORDER BY id_a""".stripMargin
        .replace("%SH_A%", shingleSql.format("t", "t"))
        .replace("%SH_B%", shingleSql.format("t2", "t2")),

    // exact recomputation of the SimHash pipeline: word-bigram shingles,
    // per-shingle 64-bit hash from two md5 chunks, per-bit +/-1 votes,
    // 16-bit block collisions, exact Hamming <= 6
    "t05_simhash" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, array_to_string(
        |    (regexp_split_to_array(trim(text),'\s+'))[2:], ' ') AS text
        |  FROM documents),
        |tok AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)),'\s+') AS t FROM d),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    list_filter(list_transform(range(1, greatest(len(t)-1,0)+1),
        |      i -> array_to_string(t[i:i+1],' ')),
        |      s -> len(string_split(s,' '))=2))) AS s FROM tok),
        |hx AS (SELECT doc_id, md5(s) AS m FROM sh),
        |bits AS (SELECT doc_id, b, CASE WHEN
        |      ((('0x'||substr(m, 1+8*(b//32), 8))::bigint >> (b%32)) & 1) = 1
        |    THEN 1 ELSE -1 END AS v
        |  FROM hx CROSS JOIN range(0,64) r(b)),
        |bitvals AS (SELECT doc_id, b,
        |    CASE WHEN sum(v) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM bits GROUP BY 1,2),
        |blk AS (SELECT doc_id, b//16 AS blk,
        |    sum(bit * (1::bigint << (b%16))) AS bv
        |  FROM bitvals GROUP BY 1,2),
        |cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        |  FROM blk l JOIN blk r
        |    ON l.blk = r.blk AND l.bv = r.bv AND l.doc_id < r.doc_id),
        |ham AS (SELECT c.id_a, c.id_b,
        |    sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
        |  FROM cand c
        |  JOIN bitvals x ON x.doc_id = c.id_a
        |  JOIN bitvals y ON y.doc_id = c.id_b AND y.b = x.b
        |  GROUP BY 1,2)
        |SELECT cast(id_a as bigint) AS id_a, cast(id_b as bigint) AS id_b,
        | cast(hamming as bigint) AS hamming
        |FROM ham WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin,

    "t06_ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id<8),
        |c AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
        |s AS (SELECT qid, nid,
        |  list_cosine_similarity(cast(qe as double[]), cast(ce as double[])) AS cos
        |  FROM q JOIN c ON qid<>nid),
        |r AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid
        |  ORDER BY cos DESC, nid) AS rnk FROM s)
        |SELECT cast(qid as bigint) AS query_id, cast(rnk as bigint) AS "rank",
        | cast(nid as bigint) AS neighbor_id, round(cos,4) AS cosine
        |FROM r WHERE rnk<=5 ORDER BY query_id, "rank"""".stripMargin,

    "t08_media_meta" ->
      """WITH a AS (SELECT doc_id,
        |  CASE doc_id%3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
        |    END AS modality,
        |  strlen(text) AS n_bytes,
        |  ('0x'||substr(md5(text),1,8))::bigint AS h
        |  FROM documents)
        |SELECT cast(doc_id as bigint) AS asset_id, modality,
        | cast(n_bytes as bigint) AS n_bytes,
        | cast(CASE WHEN modality='audio' THEN 0 ELSE 64 + h%1024 END
        |   as bigint) AS width,
        | cast(CASE WHEN modality='audio' THEN 0 ELSE 64 + (h//1024)%1024 END
        |   as bigint) AS height,
        | cast(CASE WHEN modality='image' THEN 0 ELSE 1000 + h%600000 END
        |   as bigint) AS duration_ms
        |FROM a ORDER BY asset_id""".stripMargin,

    // exact recomputation of the resize plan: same md5-derived dims as
    // t08, integer-division fit to 256, md5-derived resized-payload hash
    "t17_media_resize" ->
      """WITH a AS (SELECT doc_id,
        |  CASE doc_id%3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
        |    END AS modality,
        |  ('0x'||substr(md5(text),1,8))::bigint AS h,
        |  ('0x'||substr(md5(text),1,15))::bigint AS ch
        |  FROM documents),
        |m AS (SELECT doc_id, modality,
        |  CASE WHEN modality='audio' THEN 0 ELSE 64 + h%1024 END AS width,
        |  CASE WHEN modality='audio' THEN 0 ELSE 64 + (h//1024)%1024 END AS height,
        |  ch FROM a WHERE modality <> 'audio'),
        |r AS (SELECT *,
        |  CASE WHEN greatest(width,height) <= 256 THEN width
        |    ELSE greatest(1, (width*256) // greatest(width,height)) END AS new_w,
        |  CASE WHEN greatest(width,height) <= 256 THEN height
        |    ELSE greatest(1, (height*256) // greatest(width,height)) END AS new_h
        |  FROM m)
        |SELECT cast(doc_id as bigint) AS asset_id, modality,
        | cast(width as bigint) AS width, cast(height as bigint) AS height,
        | cast(new_w as bigint) AS new_w, cast(new_h as bigint) AS new_h,
        | ('0x'||substr(md5(concat(cast(ch as varchar), '_',
        |    cast(new_w as varchar), 'x', cast(new_h as varchar))),1,8))::bigint
        |   AS resized_hash
        |FROM r ORDER BY asset_id""".stripMargin,

    // the salted two-phase rollup is value-identical to the plain
    // GROUP BY (decimal addition associative) — the oracle IS the
    // single-phase formulation
    "t18_salted_rollup" ->
      """SELECT l_returnflag,
        | cast(sum(cast(l_extendedprice as decimal(18,4))) as double)
        |   AS sum_rev
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // exact recomputation of hash-bucketed sequence packing: same token
    // count as t01, per-bucket running sum, floor-division bin id
    "t19_doc_packing" ->
      """WITH nt AS (SELECT doc_id,
        |  CASE WHEN length(trim(text))=0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS n_tokens
        |  FROM documents)
        |SELECT doc_id, cast(doc_id%8 as bigint) AS bucket,
        | cast(coalesce(sum(n_tokens) OVER (PARTITION BY doc_id%8
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |   0) // 2000 as bigint) AS bin,
        | cast(n_tokens as bigint) AS n_tokens
        |FROM nt ORDER BY doc_id""".stripMargin,

    "t09_frame_plan" ->
      """WITH v AS (SELECT doc_id,
        |  1000 + (('0x'||substr(md5(text),1,8))::bigint % 600000) AS dur
        |  FROM documents WHERE doc_id%3=2),
        |f AS (SELECT doc_id AS asset_id,
        |  unnest(range(0, least(dur//1000, 31)+1)) AS frame_idx FROM v)
        |SELECT cast(asset_id as bigint) AS asset_id,
        | cast(frame_idx as bigint) AS frame_idx,
        | cast(frame_idx*1000 as bigint) AS ts_ms
        |FROM f ORDER BY asset_id, frame_idx""".stripMargin,

    // exact recomputation of the two-sided knn-join: every vector is a
    // query, buckets from the inlined hyperplane weights (bits=8),
    // multi-probe at Hamming distance 1, per-query top-3 among candidates
    "t29_knn_join" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 8)} AS bucket FROM embeddings),
        |probes AS (SELECT vec_id AS query_id, embedding AS qv,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |    xor(bucket, 8), xor(bucket, 16), xor(bucket, 32),
        |    xor(bucket, 64), xor(bucket, 128)]) AS bucket FROM b),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(c.embedding as double[])) AS cos
        |  FROM probes JOIN b c USING (bucket)
        |  WHERE query_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the adaptive-probe knn-join: integer
    // Hamming-1 candidate census (sum of probed bucket sizes minus
    // self), queries under k re-probe with the Hamming-2 set, disjoint
    // populations union before the per-query top-5
    "t30_knn_adaptive" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 8)} AS bucket FROM embeddings),
        |sizes AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
        |q0 AS (SELECT vec_id, embedding, bucket AS b0 FROM b),
        |p1 AS (SELECT vec_id AS query_id, embedding AS qv,
        |  unnest(${probeListSql("b0", 8, probe2 = false)}) AS bucket
        |  FROM q0),
        |cand AS (SELECT query_id, coalesce(sum(n), 0) - 1 AS c
        |  FROM p1 LEFT JOIN sizes USING (bucket) GROUP BY 1),
        |starved AS (SELECT query_id FROM cand WHERE c < 5),
        |probes AS (
        |  SELECT query_id, qv, bucket FROM p1
        |  WHERE query_id NOT IN (SELECT query_id FROM starved)
        |  UNION ALL
        |  SELECT vec_id AS query_id, embedding AS qv,
        |    unnest(${probeListSql("b0", 8, probe2 = true)}) AS bucket
        |  FROM q0 WHERE vec_id IN (SELECT query_id FROM starved)),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(c.embedding as double[])) AS cos
        |  FROM probes JOIN b c USING (bucket)
        |  WHERE query_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the graded probe-budget knn-join: own-bucket
    // census c0 and Hamming-1 census c1 (both minus self), tier CASE
    // (c0>=k -> own bucket only; c1>=k -> Hamming-1 set; else Hamming-2
    // set), disjoint populations union before the per-query top-5
    "t32_knn_budget" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 8)} AS bucket FROM embeddings),
        |sizes AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
        |q0 AS (SELECT vec_id, embedding, bucket AS b0 FROM b),
        |c0 AS (SELECT q.vec_id AS query_id, coalesce(s.n, 0) - 1 AS c
        |  FROM b q LEFT JOIN sizes s USING (bucket)),
        |p1 AS (SELECT vec_id AS query_id,
        |  unnest(${probeListSql("b0", 8, probe2 = false)}) AS bucket
        |  FROM q0),
        |c1 AS (SELECT query_id, coalesce(sum(n), 0) - 1 AS c
        |  FROM p1 LEFT JOIN sizes USING (bucket) GROUP BY 1),
        |tier AS (SELECT c0.query_id,
        |  CASE WHEN c0.c >= 8 THEN 0 WHEN c1.c >= 8 THEN 1 ELSE 2 END AS t
        |  FROM c0 JOIN c1 USING (query_id)),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS qv, b0 AS bucket FROM q0
        |  WHERE vec_id IN (SELECT query_id FROM tier WHERE t = 0)
        |  UNION ALL
        |  SELECT vec_id AS query_id, embedding AS qv,
        |    unnest(${probeListSql("b0", 8, probe2 = false)}) AS bucket
        |  FROM q0 WHERE vec_id IN (SELECT query_id FROM tier WHERE t = 1)
        |  UNION ALL
        |  SELECT vec_id AS query_id, embedding AS qv,
        |    unnest(${probeListSql("b0", 8, probe2 = true)}) AS bucket
        |  FROM q0 WHERE vec_id IN (SELECT query_id FROM tier WHERE t = 2)),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(c.embedding as double[])) AS cos
        |  FROM probes JOIN b c USING (bucket)
        |  WHERE query_id <> c.vec_id),
        |rk AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM rk WHERE rnk <= 8 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the disjoint-corpora knn-join
    // (selfJoin=false): left = vec_id < 250, right = the re-keyed high
    // half (vec_id - 250, same id range, different vectors). No
    // query<>neighbor filter anywhere — equal-id pairs are genuine
    // neighbors here, so a wrongly-applied self-exclusion breaks the hash
    "t31_knn_disjoint" ->
      s"""WITH l AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 250),
        |r AS (SELECT vec_id - 250 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id >= 250),
        |rb AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 8)} AS bucket FROM r),
        |lb AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 8)} AS bucket FROM l),
        |probes AS (SELECT vec_id AS query_id, embedding AS qv,
        |  unnest(${probeListSql("bucket", 8, probe2 = false)}) AS bucket
        |  FROM lb),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(c.embedding as double[])) AS cos
        |  FROM probes JOIN rb c USING (bucket)),
        |rk AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM rk WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the RHP-LSH ANN path: buckets from the
    // inlined hyperplane weights (bits=4), multi-probe at Hamming
    // distance 1, per-query top-5 among candidates
    "t07_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 4)} AS bucket FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS b0
        |  FROM b WHERE vec_id < 8),
        |probes AS (SELECT query_id, qv, unnest([b0, xor(b0, 1), xor(b0, 2),
        |  xor(b0, 4), xor(b0, 8)]) AS bucket FROM q),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(c.embedding as double[])) AS cos
        |  FROM probes JOIN b c USING (bucket)
        |  WHERE query_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the embedding near-dup path: corpus ∪
    // float32-perturbed copies, RHP buckets (bits=8) from the inlined
    // weights, same-bucket pairs with cosine >= 0.99
    "t12_embedding_neardup" ->
      s"""WITH allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_concat([embedding[1] + 0.001::REAL], embedding[2:])
        |      AS embedding
        |  FROM embeddings),
        |b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 8)} AS bucket FROM allv),
        |p AS (SELECT l.vec_id AS id_a, r.vec_id AS id_b,
        |    list_cosine_similarity(cast(l.embedding as double[]),
        |      cast(r.embedding as double[])) AS cos
        |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
        |SELECT cast(id_a as bigint) AS id_a, cast(id_b as bigint) AS id_b,
        | round(cos, 4) AS cosine
        |FROM p WHERE cos >= 0.99 ORDER BY id_a, id_b""".stripMargin,

    // exact recomputation of the IVF path: centroid set (every 250th
    // vector), nearest-centroid assignment (cosine desc, centroid_id
    // tiebreak), per-list top-5 — deterministic end to end
    "t11_ann_ivf" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 250 = 0),
        |sc AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings CROSS JOIN c),
        |asg AS (SELECT vec_id, embedding, centroid_id FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id
        |  FROM asg WHERE vec_id < 8),
        |s AS (SELECT query_id, n.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(n.embedding as double[])) AS cos
        |  FROM q JOIN asg n USING (centroid_id) WHERE query_id <> n.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the end-to-end IVF search: ONE
    // centroid-distance ranking CTE serves both the corpus assignment
    // (rn = 1, t11's rule) and the query probe set (rn <= nprobe=3, the
    // SAME -cosine/centroid_id ordering); candidates = members of the
    // probed lists, then the standard top-5 contract
    "t33_ivf_topk" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings CROSS JOIN c),
        |asg AS (SELECT vec_id, embedding, centroid_id FROM sc WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id
        |  FROM sc WHERE vec_id < 8 AND rn <= 3),
        |s AS (SELECT query_id, n.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv as double[]),
        |      cast(n.embedding as double[])) AS cos
        |  FROM qp JOIN asg n USING (centroid_id) WHERE query_id <> n.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the Gopher-style repetition screens over the
    // planted-repetition corpus (body + first-4-token prefix twice +
    // unique footer): line metrics from the list functions, modal-bigram
    // fraction from the unnested bigram counts
    "t34_repetition_stats" ->
      """WITH p AS (SELECT doc_id, text,
        |    array_to_string((regexp_split_to_array(trim(text),'\s+'))[1:4],
        |      ' ') AS pfx FROM documents),
        |d AS (SELECT doc_id, concat_ws(chr(10), text, pfx, pfx,
        |    'footer ' || cast(doc_id as varchar)) AS text FROM p),
        |l AS (SELECT doc_id,
        |    list_filter(string_split(text, chr(10)),
        |      x -> trim(x) <> '') AS lines,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM d),
        |ls AS (SELECT doc_id,
        |    len(lines) AS n_lines,
        |    len(list_distinct(lines)) AS n_distinct,
        |    coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
        |      AS tot_chars,
        |    coalesce(list_sum(list_transform(list_distinct(lines),
        |      x -> length(x))), 0) AS uniq_chars
        |  FROM l),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bg
        |  FROM l WHERE len(toks) >= 2),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |tb AS (SELECT doc_id, max(c) AS max_c, sum(c) AS n_bg
        |  FROM bc GROUP BY 1)
        |SELECT cast(ls.doc_id as bigint) AS doc_id,
        | cast(n_lines as bigint) AS n_lines,
        | round(CASE WHEN n_lines = 0 THEN 0.0
        |   ELSE cast(n_lines - n_distinct as double)/n_lines END, 4)
        |   AS dup_line_frac,
        | round(CASE WHEN tot_chars = 0 THEN 0.0
        |   ELSE cast(tot_chars - uniq_chars as double)/tot_chars END, 4)
        |   AS dup_line_char_frac,
        | coalesce(round(cast(max_c as double)/n_bg, 4), 0.0)
        |   AS top_bigram_frac
        |FROM ls LEFT JOIN tb ON ls.doc_id = tb.doc_id
        |ORDER BY doc_id""".stripMargin,

    // exact recomputation of the per-source cap: same md5-u32 sample
    // order (salt 'cap1'), same doc_id tie-break, same cap of 20
    "t35_cap_per_source" ->
      """SELECT cast(doc_id as bigint) AS doc_id, source,
        | cast(rk as bigint) AS rk
        |FROM (SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source ORDER BY
        |      ('0x'||substr(md5('cap1'||cast(doc_id as varchar)),1,8))::bigint,
        |      doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    // exact recomputation of the corpus heavy hitters: unnested word
    // bigrams, exact counts, count-desc / bigram-asc total order
    "t36_top_ngrams" ->
      """WITH d AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+')
        |    AS t FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram FROM d WHERE len(t) >= 2),
        |c AS (SELECT ngram, count(*) AS cnt FROM g GROUP BY 1),
        |r AS (SELECT ngram, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, ngram) AS rk FROM c)
        |SELECT cast(rk as bigint) AS rk, ngram, cast(cnt as bigint) AS cnt
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,

    // byte-for-byte replay of the PII scrub on the planted corpus: cards
    // masked first, phones counted on the card-masked text (so a
    // separator-free digit run is never double-claimed), e-mails last —
    // the same chain as TextOps.scrubPii; patterns are in the
    // Java-regex/RE2 common subset
    "t37_pii_scrub" ->
      """WITH d AS (SELECT doc_id, text ||
        |    ' contact user' || cast(doc_id as varchar) ||
        |    '@example.com or 555-' ||
        |    lpad(cast(doc_id % 1000 as varchar), 3, '0') || '-' ||
        |    lpad(cast((doc_id * 7) % 10000 as varchar), 4, '0') ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' card 4111111111111111'
        |      ELSE '' END AS text FROM documents),
        |s AS (SELECT doc_id, text,
        |    regexp_replace(text, '\b[0-9]{13,16}\b', '<CARD>', 'g') AS t1
        |  FROM d)
        |SELECT cast(doc_id as bigint) AS doc_id,
        | regexp_replace(
        |   regexp_replace(t1, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b',
        |     '<PHONE>', 'g'),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |   '<EMAIL>', 'g') AS clean_text,
        | cast(len(regexp_extract_all(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint)
        |   AS n_emails,
        | cast(len(regexp_extract_all(t1,
        |   '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) as bigint) AS n_phones,
        | cast(len(regexp_extract_all(text, '\b[0-9]{13,16}\b')) as bigint)
        |   AS n_cards
        |FROM s ORDER BY doc_id""".stripMargin,

    // exact recomputation of the PQ encode: same every-25th-vector
    // codebooks, same 4x16 subvector slices, squared-L2 argmin on the
    // DECIMAL(27,12) truncation (ties -> code_id), mirrored slice by
    // slice
    "t38_pq_encode" ->
      """WITH sp AS (SELECT unnest(range(0, 4)) AS subspace),
        |cw AS (SELECT sp.subspace, vec_id AS code_id,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS w
        |  FROM embeddings CROSS JOIN sp WHERE vec_id % 25 = 0),
        |v AS (SELECT vec_id, sp.subspace,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS sub
        |  FROM embeddings CROSS JOIN sp),
        |d AS (SELECT vec_id, v.subspace, code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dist
        |  FROM v JOIN cw ON v.subspace = cw.subspace),
        |r AS (SELECT vec_id, subspace, code_id, row_number() OVER (
        |    PARTITION BY vec_id, subspace ORDER BY dist, code_id) AS rn
        |  FROM d)
        |SELECT cast(vec_id as bigint) AS vec_id,
        | cast(subspace as bigint) AS subspace,
        | cast(code_id as bigint) AS code_id
        |FROM r WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin,

    // exact recomputation of the PQ asymmetric-distance search: the t38
    // code assignment, the per-query distance table against the same
    // codebooks, ADC = sum of the m DECIMAL(27,12) table entries (exact
    // arithmetic, so the RANKING itself is engine-portable), top-5
    // ascending with neighbor_id tiebreak
    "t39_pq_adc" ->
      """WITH sp AS (SELECT unnest(range(0, 4)) AS subspace),
        |cw AS (SELECT sp.subspace, vec_id AS code_id,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS w
        |  FROM embeddings CROSS JOIN sp WHERE vec_id % 25 = 0),
        |v AS (SELECT vec_id, sp.subspace,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS sub
        |  FROM embeddings CROSS JOIN sp),
        |d AS (SELECT vec_id, v.subspace, code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dist
        |  FROM v JOIN cw ON v.subspace = cw.subspace),
        |r AS (SELECT vec_id, subspace, code_id, row_number() OVER (
        |    PARTITION BY vec_id, subspace ORDER BY dist, code_id) AS rn
        |  FROM d),
        |code AS (SELECT vec_id AS neighbor_id, subspace, code_id
        |  FROM r WHERE rn = 1),
        |qt AS (SELECT vec_id AS query_id, cw.subspace, cw.code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dq
        |  FROM v JOIN cw ON v.subspace = cw.subspace
        |  WHERE vec_id < 8),
        |adc AS (SELECT query_id, neighbor_id, sum(dq) AS adc_d
        |  FROM code JOIN qt ON code.subspace = qt.subspace
        |    AND code.code_id = qt.code_id
        |  WHERE query_id <> neighbor_id GROUP BY 1, 2),
        |rk AS (SELECT query_id, neighbor_id, adc_d, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc_d, neighbor_id) AS rnk
        |  FROM adc)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cast(adc_d as double), 6) AS adc
        |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the IVF-PQ composition: t33's centroid
    // ranking CTE serves assignment (rn = 1) and the query probe set
    // (rn <= 3); t38's codebook CTEs assign codes; candidates = members
    // of probed lists; ADC = decimal sum of the per-query table entries
    "t40_ivf_pq" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT vec_id, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings CROSS JOIN c),
        |asg AS (SELECT vec_id AS neighbor_id, centroid_id
        |  FROM sc WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, centroid_id
        |  FROM sc WHERE vec_id < 8 AND rn <= 3),
        |sp AS (SELECT unnest(range(0, 4)) AS subspace),
        |cw AS (SELECT sp.subspace, vec_id AS code_id,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS w
        |  FROM embeddings CROSS JOIN sp WHERE vec_id % 25 = 0),
        |v AS (SELECT vec_id, sp.subspace,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS sub
        |  FROM embeddings CROSS JOIN sp),
        |pd AS (SELECT vec_id, v.subspace, code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dist
        |  FROM v JOIN cw ON v.subspace = cw.subspace),
        |pr AS (SELECT vec_id, subspace, code_id, row_number() OVER (
        |    PARTITION BY vec_id, subspace ORDER BY dist, code_id) AS prn
        |  FROM pd),
        |code AS (SELECT vec_id AS neighbor_id, subspace, code_id
        |  FROM pr WHERE prn = 1),
        |qt AS (SELECT vec_id AS query_id, cw.subspace, cw.code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dq
        |  FROM v JOIN cw ON v.subspace = cw.subspace
        |  WHERE vec_id < 8),
        |cand AS (SELECT query_id, neighbor_id
        |  FROM qp JOIN asg USING (centroid_id)
        |  WHERE query_id <> neighbor_id),
        |adc AS (SELECT cand.query_id, cand.neighbor_id, sum(dq) AS adc_d
        |  FROM cand
        |  JOIN code ON cand.neighbor_id = code.neighbor_id
        |  JOIN qt ON qt.query_id = cand.query_id
        |    AND qt.subspace = code.subspace AND qt.code_id = code.code_id
        |  GROUP BY 1, 2),
        |rk AS (SELECT query_id, neighbor_id, adc_d, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc_d, neighbor_id) AS rnk
        |  FROM adc)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cast(adc_d as double), 6) AS adc
        |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the one-step L2-Lloyd PQ codebook
    // refinement: t38's code assignment, then per-(subspace, code, dim)
    // decimal-accumulated means (t22's discipline) over the assigned
    // subvectors
    "t41_pq_kmeans" ->
      """WITH sp AS (SELECT unnest(range(0, 4)) AS subspace),
        |cw AS (SELECT sp.subspace, vec_id AS code_id,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS w
        |  FROM embeddings CROSS JOIN sp WHERE vec_id % 25 = 0),
        |v AS (SELECT vec_id, sp.subspace,
        |    (cast(embedding as double[]))
        |      [sp.subspace*16+1 : sp.subspace*16+16] AS sub
        |  FROM embeddings CROSS JOIN sp),
        |pd AS (SELECT vec_id, v.subspace, code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dist
        |  FROM v JOIN cw ON v.subspace = cw.subspace),
        |pr AS (SELECT vec_id, subspace, code_id, row_number() OVER (
        |    PARTITION BY vec_id, subspace ORDER BY dist, code_id) AS prn
        |  FROM pd),
        |code AS (SELECT vec_id, subspace, code_id FROM pr WHERE prn = 1),
        |dims AS (SELECT code.subspace, code.code_id, g.i AS pos,
        |    cast(sub[g.i + 1] as double) AS x
        |  FROM code JOIN v ON v.vec_id = code.vec_id
        |    AND v.subspace = code.subspace
        |  CROSS JOIN generate_series(0, 15) AS g(i))
        |SELECT cast(subspace as bigint) AS subspace,
        | cast(code_id as bigint) AS code_id,
        | cast(pos as bigint) AS pos,
        | round(cast(sum(cast(x as decimal(27,12))) as double) / count(*), 6)
        |   AS val
        |FROM dims GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // exact recomputation of the training-mix egress: the t35 cap rule
    // under salt 'mix2:cap', the t16 banded sample rule under 'mix2:mix'
    // (dyadic rates -> integer-exact threshold), the t19 running-sum
    // packing over the survivors
    "t42_training_mix" ->
      """WITH capd AS (SELECT doc_id, source, text FROM (
        |    SELECT doc_id, source, text, row_number() OVER (
        |      PARTITION BY source ORDER BY
        |        ('0x'||substr(md5('mix2:cap'||cast(doc_id as varchar)),1,8))
        |          ::bigint, doc_id) AS rk
        |    FROM documents) WHERE rk <= 30),
        |samp AS (SELECT doc_id, source, text FROM capd
        |  WHERE ('0x'||substr(md5('mix2:mix'||cast(doc_id as varchar)),1,8))
        |      ::bigint
        |    < cast(floor((CASE WHEN length(text) >= 300 THEN 0.75
        |        ELSE 0.25 END) * 4294967296.0) as bigint)),
        |nt AS (SELECT doc_id, source,
        |  CASE WHEN length(trim(text))=0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS n_tokens
        |  FROM samp)
        |SELECT cast(doc_id as bigint) AS doc_id, source,
        | cast(doc_id%8 as bigint) AS bucket,
        | cast(coalesce(sum(n_tokens) OVER (PARTITION BY doc_id%8
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |   0) // 2000 as bigint) AS bin,
        | cast(n_tokens as bigint) AS n_tokens
        |FROM nt ORDER BY doc_id""".stripMargin,

    // exact recomputation of the packed-sequence payloads: t19's
    // running-sum packing, then an id-ordered string_agg per bin —
    // any concatenation-order or membership drift breaks the hash
    "t43_packed_sequences" ->
      """WITH nt AS (SELECT doc_id, text,
        |  CASE WHEN length(trim(text))=0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, text, doc_id%8 AS bucket,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY doc_id%8
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |   0) // 2000 AS bin,
        |  n_tokens FROM nt)
        |SELECT cast(bucket as bigint) AS bucket, cast(bin as bigint) AS bin,
        | count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS n_tokens,
        | string_agg(text, '<|eos|>' ORDER BY doc_id) AS seq_text
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // exact recomputation of the SemDeDup screen: the t12 perturbed-twin
    // corpus, the t33 centroid-assignment CTE (same -cosine/centroid_id
    // ordering), then the lower-id dominance flag from WITHIN-cluster
    // pairs only — a flag sourced from outside the cluster, or a twin
    // landing in a different list than its original, breaks the hash
    "t44_semantic_dedup" ->
      """WITH allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_concat([embedding[1] + 0.001::REAL], embedding[2:])
        |      AS embedding
        |  FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM allv CROSS JOIN c),
        |asg AS (SELECT vec_id, embedding, centroid_id FROM sc WHERE rn = 1),
        |d AS (SELECT DISTINCT r.vec_id FROM asg l JOIN asg r
        |  ON l.centroid_id = r.centroid_id AND l.vec_id < r.vec_id
        |  WHERE list_cosine_similarity(cast(l.embedding as double[]),
        |    cast(r.embedding as double[])) >= 0.99)
        |SELECT cast(a.vec_id as bigint) AS vec_id,
        | cast(a.centroid_id as bigint) AS centroid_id,
        | cast(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END as bigint)
        |   AS is_semantic_dup
        |FROM asg a LEFT JOIN d ON a.vec_id = d.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    // exact recomputation of the residual-encoded IVF-PQ search: t40's
    // assignment + probe CTEs, but codes/codebooks over (vector − assigned
    // centroid) computed per element in double, and the query distance
    // table per PROBED LIST against the query's residual in that list's
    // frame — the ADC join matches on centroid_id too, so a candidate
    // scored against the wrong list's query residual breaks the hash
    "t45_ivf_pq_residual" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT vec_id, embedding, centroid_id, cvec,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings CROSS JOIN c),
        |res AS (SELECT vec_id, centroid_id,
        |    list_transform(range(1, 65), i ->
        |      (cast(embedding as double[]))[i]
        |        - (cast(cvec as double[]))[i]) AS r
        |  FROM sc WHERE rn = 1),
        |sp AS (SELECT unnest(range(0, 4)) AS subspace),
        |cw AS (SELECT sp.subspace, vec_id AS code_id,
        |    r[sp.subspace*16+1 : sp.subspace*16+16] AS w
        |  FROM res CROSS JOIN sp WHERE vec_id % 25 = 0),
        |v AS (SELECT vec_id, sp.subspace,
        |    r[sp.subspace*16+1 : sp.subspace*16+16] AS sub
        |  FROM res CROSS JOIN sp),
        |pd AS (SELECT vec_id, v.subspace, code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dist
        |  FROM v JOIN cw ON v.subspace = cw.subspace),
        |pr AS (SELECT vec_id, subspace, code_id, row_number() OVER (
        |    PARTITION BY vec_id, subspace ORDER BY dist, code_id) AS prn
        |  FROM pd),
        |code AS (SELECT vec_id AS neighbor_id, subspace, code_id
        |  FROM pr WHERE prn = 1),
        |qp AS (SELECT vec_id AS query_id, centroid_id,
        |    list_transform(range(1, 65), i ->
        |      (cast(embedding as double[]))[i]
        |        - (cast(cvec as double[]))[i]) AS qr
        |  FROM sc WHERE vec_id < 8 AND rn <= 3),
        |qv AS (SELECT query_id, centroid_id, sp.subspace,
        |    qr[sp.subspace*16+1 : sp.subspace*16+16] AS sub
        |  FROM qp CROSS JOIN sp),
        |qt AS (SELECT query_id, centroid_id, cw.subspace, cw.code_id,
        |    cast(list_sum(list_transform(range(1, 17),
        |      i -> (sub[i]-w[i])^2)) as decimal(27,12)) AS dq
        |  FROM qv JOIN cw ON qv.subspace = cw.subspace),
        |cand AS (SELECT query_id, qp.centroid_id, res.vec_id AS neighbor_id
        |  FROM qp JOIN res ON qp.centroid_id = res.centroid_id
        |  WHERE query_id <> res.vec_id),
        |adc AS (SELECT cand.query_id, cand.neighbor_id, sum(dq) AS adc_d
        |  FROM cand
        |  JOIN code ON cand.neighbor_id = code.neighbor_id
        |  JOIN qt ON qt.query_id = cand.query_id
        |    AND qt.centroid_id = cand.centroid_id
        |    AND qt.subspace = code.subspace AND qt.code_id = code.code_id
        |  GROUP BY 1, 2),
        |rk AS (SELECT query_id, neighbor_id, adc_d, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc_d, neighbor_id) AS rnk
        |  FROM adc)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rnk as bigint) AS "rank",
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cast(adc_d as double), 6) AS adc
        |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // exact recomputation of the batch-parity near-dup ingest gate: the
    // t03 banded CTEs cover originals AND twins; index = originals'
    // (band, hash) set, incoming = twins, flag = any band collision.
    // Unshingleable docs never reach `banded` (both engines), so they
    // pass with flag 0 through the LEFT JOIN
    "t46_neardup_gate" ->
      ("WITH " + minhashLshCtes + """,
        |hits AS (SELECT DISTINCT l.doc_id FROM banded l JOIN banded r
        |  ON l.b = r.b AND l.bh = r.bh AND r.doc_id < 100000
        |  WHERE l.doc_id >= 100000),
        |inc AS (SELECT doc_id FROM d WHERE doc_id >= 100000)
        |SELECT cast(inc.doc_id as bigint) AS doc_id,
        | cast(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END as bigint)
        |   AS is_near_dup
        |FROM inc LEFT JOIN hits h ON inc.doc_id = h.doc_id
        |ORDER BY inc.doc_id""".stripMargin),

    // exact recomputation of the repeated-substring removal: the planted
    // corpus, positional 5-gram md5 digests, document frequency >= 3,
    // coverage = union of flagged [pos, pos+4] windows, reassembly of
    // uncovered tokens in order — token-for-token
    "t54_repeated_substring" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'this software is provided as is without any express or implied warranty of merchantability' || chr(10) || text
        |         WHEN doc_id % 3 = 1 THEN text || ' ' || 'this software is provided as is without any express or implied warranty of merchantability'
        |         ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS lt FROM d),
        |p AS (SELECT doc_id, lt,
        |    unnest(range(1, greatest(len(lt) - 4, 0) + 1)) AS pos FROM tok),
        |g AS (SELECT doc_id, pos,
        |    ('0x'||substr(md5(array_to_string(lt[pos:pos+4], ' ')),
        |      1,15))::bigint AS dg FROM p),
        |f AS (SELECT dg FROM g GROUP BY dg HAVING count(DISTINCT doc_id) >= 3),
        |cov AS (SELECT DISTINCT g.doc_id, g.pos + j AS cp
        |  FROM g JOIN f USING (dg) CROSS JOIN range(0,5) r(j)),
        |tp AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p2 FROM tok),
        |kt AS (SELECT tp.doc_id, p2, tp.t[p2] AS w FROM tp
        |  LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.cp = tp.p2
        |  WHERE cov.cp IS NULL),
        |a AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p2) AS clean_text,
        |    count(*) AS nk FROM kt GROUP BY 1)
        |SELECT cast(tok.doc_id as bigint) AS doc_id,
        | coalesce(a.clean_text, '') AS clean_text,
        | cast(coalesce(a.nk, 0) as bigint) AS n_kept,
        | cast(len(tok.t) - coalesce(a.nk, 0) as bigint) AS n_removed
        |FROM tok LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // exact recomputation of the shard shuffle: global rank over the
    // salted md5 permutation, then the floor(i*S/n) contiguous cuts and
    // the ceil(s*n/S) shard starts — all integer division, so both
    // engines agree on every boundary
    "t55_shard_shuffle" ->
      """WITH b AS (SELECT doc_id, source,
        |  row_number() OVER (
        |    ORDER BY md5('shuffle'||cast(doc_id as varchar)), doc_id) AS rn,
        |  count(*) OVER () AS n
        |  FROM documents)
        |SELECT cast(doc_id as bigint) AS doc_id, source,
        | cast(((rn - 1) * 8) // n as bigint) AS shard,
        | cast((rn - 1) -
        |   (((((rn - 1) * 8) // n) * n + 7) // 8) as bigint) AS pos_in_shard
        |FROM b ORDER BY doc_id""".stripMargin,

    // t46 through the Bloom pre-filter, replayed end to end: the index's
    // distinct k=3 position set (first-32-bits-of-md5(band:hash:i) mod
    // 2^16), the incoming bands' all-positions-present probe, then the
    // exact band-keyed membership — flags must equal t46's exactly (a
    // Bloom filter has no false negatives; false positives only admit
    // extra bands to the exact join)
    "t56_neardup_gate_bloom" ->
      ("WITH " + minhashLshCtes + """,
        |idx AS (SELECT DISTINCT b, bh FROM banded WHERE doc_id < 100000),
        |bpos AS (SELECT DISTINCT
        |    ('0x'||substr(md5(b::varchar||':'||bh||':'||i::varchar),1,8))::bigint
        |      % 65536 AS p
        |  FROM idx CROSS JOIN range(0,3) r(i)),
        |probe AS (SELECT doc_id, b, bh,
        |    ('0x'||substr(md5(b::varchar||':'||bh||':'||i::varchar),1,8))::bigint
        |      % 65536 AS p
        |  FROM banded CROSS JOIN range(0,3) r(i) WHERE doc_id >= 100000),
        |pre AS (SELECT doc_id, b, bh FROM probe JOIN bpos USING (p)
        |  GROUP BY 1, 2, 3 HAVING count(*) = 3),
        |hits AS (SELECT DISTINCT pre.doc_id FROM pre
        |  JOIN idx ON pre.b = idx.b AND pre.bh = idx.bh),
        |inc AS (SELECT doc_id FROM d WHERE doc_id >= 100000)
        |SELECT cast(inc.doc_id as bigint) AS doc_id,
        | cast(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END as bigint)
        |   AS is_near_dup
        |FROM inc LEFT JOIN hits h ON inc.doc_id = h.doc_id
        |ORDER BY inc.doc_id""".stripMargin),

    // exact recomputation of the semantic ingest gate (the s07 stream's
    // per-microbatch screen): the frozen index = t44's corpus-assignment
    // CTE (same -cosine/centroid_id argmin), the incoming batch (t44
    // twins at +100000 UNION negated vectors at +200000) assigned by the
    // SAME rule, then the within-list >= 0.99 screen — a flag sourced
    // from outside the incoming vector's list, or an incoming vector
    // probing a different list than the gate assigns, breaks the hash
    "t57_semantic_gate" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings CROSS JOIN c),
        |idx AS (SELECT vec_id, embedding, centroid_id FROM sc WHERE rn = 1),
        |inc AS (
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_concat([embedding[1] + 0.001::REAL], embedding[2:])
        |      AS embedding
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 200000 AS vec_id,
        |    list_transform(embedding, x -> -x) AS embedding
        |  FROM embeddings),
        |qs AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM inc CROSS JOIN c),
        |qa AS (SELECT vec_id, embedding, centroid_id FROM qs WHERE rn = 1),
        |h AS (SELECT DISTINCT q.vec_id FROM qa q JOIN idx i
        |  ON q.centroid_id = i.centroid_id
        |  WHERE list_cosine_similarity(cast(q.embedding as double[]),
        |    cast(i.embedding as double[])) >= 0.99)
        |SELECT cast(a.vec_id as bigint) AS vec_id,
        | cast(CASE WHEN h.vec_id IS NULL THEN 0 ELSE 1 END as bigint)
        |   AS is_semantic_dup
        |FROM qa a LEFT JOIN h ON a.vec_id = h.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    // the probed gate on the planted boundary corpus: each incoming
    // vector = its original pulled toward centroid 0 (float blend both
    // engines compute identically), whose nearest list holds nothing
    // >= tau while its true mate sits in the SECOND-ranked list — so
    // the flags are decided by the probe ranking (rn <= 2) itself; one
    // probe too many or too few, or a wrong tiebreak, moves dozens of
    // flags and breaks the hash
    "t58_semantic_gate_probed" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |c0 AS (SELECT embedding AS d FROM embeddings WHERE vec_id = 0),
        |sc AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings CROSS JOIN c),
        |idx AS (SELECT vec_id, embedding, centroid_id FROM sc WHERE rn = 1),
        |inc AS (SELECT vec_id + 300000 AS vec_id,
        |    list_transform(range(1, 65),
        |      i -> cast(embedding[i] + 0.75::REAL * d[i] as REAL))
        |      AS embedding
        |  FROM embeddings CROSS JOIN c0),
        |qs AS (SELECT vec_id, embedding, centroid_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM inc CROSS JOIN c),
        |qp AS (SELECT vec_id, embedding, centroid_id FROM qs WHERE rn <= 2),
        |h AS (SELECT DISTINCT q.vec_id FROM qp q JOIN idx i
        |  ON q.centroid_id = i.centroid_id
        |  WHERE list_cosine_similarity(cast(q.embedding as double[]),
        |    cast(i.embedding as double[])) >= 0.75)
        |SELECT cast(a.vec_id as bigint) AS vec_id,
        | cast(CASE WHEN h.vec_id IS NULL THEN 0 ELSE 1 END as bigint)
        |   AS is_semantic_dup
        |FROM inc a LEFT JOIN h ON a.vec_id = h.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    // exact replay of the context-length chunking: token split, the
    // ceil((n-40)/32) last-chunk boundary (clamped at 0 — div vs //
    // only differ where the clamp wins), every 40-token slice at
    // stride 32 and the per-chunk counts
    "t64_chunk_documents" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents),
        |n AS (SELECT doc_id, tk, len(tk) AS n FROM d),
        |c AS (SELECT doc_id, tk, n,
        |    unnest(range(0, greatest((n - 40 + 31) // 32, 0) + 1))
        |      AS chunk_no
        |  FROM n)
        |SELECT cast(doc_id as bigint) AS doc_id,
        | cast(chunk_no as bigint) AS chunk_no,
        | array_to_string(tk[chunk_no*32+1 : chunk_no*32+40], ' ')
        |   AS chunk_text,
        | cast(least(40, n - chunk_no*32) as bigint) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_no""".stripMargin,

    // exact replay of the SQ8 encode + search: every element's
    // round(127·x/maxabs) integer code, then the t06 ranking contract
    // (cosine desc, neighbor tiebreak, round-4) on the codes
    "t63_sq_topk" ->
      """WITH enc AS (SELECT vec_id,
        |    list_transform(embedding, x -> CASE WHEN ma > 0
        |      THEN cast(round(cast(x as double) * 127.0 / ma) as int)
        |      ELSE 0 END) AS codes
        |  FROM (SELECT vec_id, embedding,
        |      list_max(list_transform(embedding,
        |        x -> abs(cast(x as double)))) AS ma
        |    FROM embeddings)),
        |q AS (SELECT vec_id AS query_id, cast(embedding as double[]) AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |cand AS (SELECT query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv, cast(codes as double[])) AS cos
        |  FROM q JOIN enc e ON q.query_id <> e.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM cand)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rank as bigint) AS rank,
        | cast(neighbor_id as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // binary-quantization search recomputed INDEPENDENTLY of the packed
    // representation: Hamming distance is re-derived straight from the
    // sign definition (count of dimensions whose signs differ), then the
    // (hamming, neighbor_id) shortlist rank, the exact-cosine rerank and
    // the round-4 output are replayed — a packing bug that changed any
    // popcount anywhere breaks the hash
    "t65_bq_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |ham AS (SELECT query_id, e.vec_id AS neighbor_id,
        |    cast(list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> CASE WHEN (qv[i] > 0) <> (e.embedding[i] > 0)
        |           THEN 1 ELSE 0 END)) as bigint) AS hamming
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
        |sl AS (SELECT query_id, neighbor_id, hamming, row_number() OVER (
        |    PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hr
        |  FROM ham),
        |cand AS (SELECT query_id, neighbor_id, hamming,
        |    list_cosine_similarity(cast(eq.embedding as double[]),
        |      cast(en.embedding as double[])) AS cos
        |  FROM sl JOIN embeddings eq ON eq.vec_id = sl.query_id
        |  JOIN embeddings en ON en.vec_id = sl.neighbor_id
        |  WHERE hr <= 20),
        |r AS (SELECT query_id, neighbor_id, hamming, cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM cand)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rank as bigint) AS rank,
        | cast(neighbor_id as bigint) AS neighbor_id, hamming,
        | round(cos, 4) AS cosine
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // DSIR importance weights: the bigram construction, the md5 bucket
    // of every gram occurrence, both 512-bucket count tables, the two
    // totals and every add-one-smoothed ln() term (factors cast to
    // double BEFORE multiplying, decimal accumulation, round 6) are all
    // replayed — a single gram landing in the wrong bucket on either
    // side breaks the hash
    "t66_dsir_weights" ->
      """WITH d AS (SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram
        |  FROM d WHERE len(t) >= 2),
        |bk AS (SELECT doc_id, lang,
        |    ('0x'||substr(md5('dsir'||ngram),1,8))::bigint % 512 AS b
        |  FROM g),
        |tc AS (SELECT b, count(*) AS ct FROM bk WHERE lang = 'en'
        |  GROUP BY 1),
        |rc AS (SELECT b, count(*) AS cr FROM bk GROUP BY 1),
        |tot AS (SELECT coalesce((SELECT sum(ct) FROM tc), 0) AS nt,
        |    coalesce((SELECT sum(cr) FROM rc), 0) AS nr),
        |s AS (SELECT doc_id, cast(ln(
        |      ((coalesce(tc.ct, 0) + 1)::double * (tot.nr + 512)::double)
        |      / ((coalesce(rc.cr, 0) + 1)::double
        |         * (tot.nt + 512)::double)) as decimal(27,12)) AS lw
        |  FROM bk LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)
        |  CROSS JOIN tot),
        |a AS (SELECT doc_id, count(*) AS n_grams,
        |    round(cast(sum(lw) as double), 6) AS w FROM s GROUP BY 1)
        |SELECT cast(d.doc_id as bigint) AS doc_id,
        | cast(coalesce(a.n_grams, 0) as bigint) AS n_grams,
        | a.w AS log_weight
        |FROM d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // graph-ANN beam search, both rounds unrolled: the degree-4 exact
    // graph, the fixed 10-node md5-order entry sample (salt 'entry' —
    // both engines hash the identical string), round 1's expand/
    // rescore/re-rank, round 2's, and the final top-4 — one edge
    // ranked differently anywhere reroutes the walk and breaks the hash
    "t69_graph_search" ->
      """WITH v AS (SELECT vec_id, cast(embedding as double[]) AS ev
        |  FROM embeddings WHERE vec_id < 1024),
        |gall AS (SELECT a.vec_id AS node_id, b.vec_id AS nbr_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_cosine_similarity(a.ev, b.ev) DESC, b.vec_id) AS rnk
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        |g AS (SELECT node_id, nbr_id FROM gall WHERE rnk <= 4),
        |q AS (SELECT vec_id AS query_id, ev AS qv FROM v
        |  WHERE vec_id < 8),
        |e AS (SELECT vec_id FROM v
        |  ORDER BY md5('entry' || cast(vec_id AS varchar)), vec_id
        |  LIMIT 10),
        |s0 AS (SELECT query_id, n.vec_id AS nid,
        |    list_cosine_similarity(qv, n.ev) AS cos
        |  FROM q JOIN v n ON n.vec_id IN (SELECT vec_id FROM e)
        |    AND n.vec_id <> q.query_id),
        |f0 AS (SELECT query_id, nid, cos FROM (SELECT s0.*,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, nid) AS rn FROM s0) WHERE rn <= 4),
        |x1 AS (SELECT DISTINCT query_id, g.nbr_id AS nid
        |  FROM f0 JOIN g ON g.node_id = f0.nid),
        |s1 AS (SELECT query_id, nid,
        |    list_cosine_similarity(qv, n.ev) AS cos
        |  FROM x1 JOIN v n ON n.vec_id = x1.nid JOIN q USING (query_id)
        |  WHERE nid <> query_id),
        |c1 AS (SELECT query_id, nid, cos FROM s1
        |  UNION SELECT query_id, nid, cos FROM f0),
        |f1 AS (SELECT query_id, nid, cos FROM (SELECT c1.*,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, nid) AS rn FROM c1) WHERE rn <= 4),
        |x2 AS (SELECT DISTINCT query_id, g.nbr_id AS nid
        |  FROM f1 JOIN g ON g.node_id = f1.nid),
        |s2 AS (SELECT query_id, nid,
        |    list_cosine_similarity(qv, n.ev) AS cos
        |  FROM x2 JOIN v n ON n.vec_id = x2.nid JOIN q USING (query_id)
        |  WHERE nid <> query_id),
        |c2 AS (SELECT query_id, nid, cos FROM s2
        |  UNION SELECT query_id, nid, cos FROM f1),
        |f2 AS (SELECT query_id, nid, cos FROM (SELECT c2.*,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, nid) AS rn FROM c2) WHERE rn <= 4)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(rn as bigint) AS rank, cast(nid as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM (SELECT f2.*, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, nid) AS rn FROM f2)
        |WHERE rn <= 4
        |ORDER BY query_id, rank""".stripMargin,

    // per-row grace as-of: the tier CASE, the range join bounded by
    // each row's own grace (filter-then-top-1 == void-after-pick for
    // the backward carry: distance is monotone looking back) and the
    // (vts desc, view_id desc) pick replayed
    "t83_asof_graced" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS pts,
        |    CASE WHEN user_id % 3 = 0 THEN 900
        |      WHEN user_id % 3 = 1 THEN 3600 ELSE 7200 END AS grace_s
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, ts AS vts
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.purchase_id, p.user_id, p.grace_s, p.pts,
        |    v.view_id, v.vts, row_number() OVER (
        |      PARTITION BY p.purchase_id
        |      ORDER BY v.vts DESC NULLS LAST, v.view_id DESC NULLS LAST)
        |      AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.user_id
        |    AND v.vts <= p.pts
        |    AND epoch_us(p.pts) - epoch_us(v.vts) <=
        |      cast(grace_s AS bigint) * 1000000)
        |SELECT cast(purchase_id as bigint) AS purchase_id,
        | cast(user_id as bigint) AS user_id,
        | cast(grace_s as bigint) AS grace_s,
        | cast(epoch_us(pts) as bigint) AS purchase_us,
        | cast(view_id as bigint) AS view_id,
        | cast(epoch_us(vts) as bigint) AS view_us
        |FROM j WHERE rn = 1
        |ORDER BY purchase_id""".stripMargin,

    // backward as-of join: the oracle deliberately uses the OTHER
    // formulation — range left-join + per-left top-1 (nearest prior
    // view, ties by highest view_id) — so a match proves the union+
    // running-window carry implements exactly the textbook semantics
    "t70_asof_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, ts AS vts, value
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.purchase_id, p.user_id, p.pts, v.view_id, v.vts,
        |    v.value, row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY v.vts DESC NULLS LAST, v.view_id DESC NULLS LAST)
        |      AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.vts <= p.pts)
        |SELECT cast(purchase_id as bigint) AS purchase_id,
        | cast(user_id as bigint) AS user_id,
        | cast(epoch_us(pts) as bigint) AS purchase_us,
        | cast(view_id as bigint) AS view_id,
        | cast(epoch_us(vts) as bigint) AS view_us,
        | round(value, 4) AS view_value
        |FROM j WHERE rn = 1
        |ORDER BY purchase_id""".stripMargin,

    // KMV distinct sketch: the estimate is an exact function of the
    // md5-derived hash set, so the oracle sorts the same 60-bit hashes,
    // reads the 64th smallest, and replays (k-1)*2^60/kth term-for-term
    // (below-fill groups take the exact sketch size)
    "t71_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x'||substr(md5(cast(user_id as varchar)),1,15))::bigint
        |      AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h, row_number() OVER (
        |      PARTITION BY event_type ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h),
        |c AS (SELECT event_type, count(*) AS n_rows FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1),
        |k AS (SELECT event_type,
        |    max(CASE WHEN rn = 64 THEN h END) AS kth,
        |    least(max(nd), 64) AS n_kmv, max(nd) AS nd
        |  FROM r WHERE rn <= 64 GROUP BY event_type)
        |SELECT k.event_type, c.n_rows,
        | cast(n_kmv as bigint) AS n_kmv,
        | cast(kth as bigint) AS kth_min,
        | round(CASE WHEN nd < 64 THEN nd::double
        |   ELSE 63.0 * 1152921504606846976.0 / kth::double END, 4)
        |   AS est_distinct
        |FROM k JOIN c USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // forward as-of with tolerance: nearest NEXT click within 30 min
    // (ties by lowest click_id), unmatched errors kept — again the
    // range-join formulation against the union+window implementation
    "t72_asof_forward" ->
      """WITH e AS (SELECT event_id AS error_id, user_id, ts AS ets
        |  FROM events WHERE event_type = 'error'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS cts
        |  FROM events WHERE event_type = 'click'),
        |j AS (SELECT e.error_id, e.user_id, e.ets, c.click_id, c.cts,
        |    row_number() OVER (PARTITION BY e.error_id
        |      ORDER BY c.cts ASC NULLS LAST, c.click_id ASC NULLS LAST)
        |      AS rn
        |  FROM e LEFT JOIN c ON e.user_id = c.user_id AND c.cts >= e.ets
        |    AND c.cts <= e.ets + INTERVAL '30 minutes')
        |SELECT cast(error_id as bigint) AS error_id,
        | cast(user_id as bigint) AS user_id,
        | cast(epoch_us(ets) as bigint) AS error_us,
        | cast(click_id as bigint) AS click_id,
        | cast(epoch_us(cts) as bigint) AS click_us
        |FROM j WHERE rn = 1
        |ORDER BY error_id""".stripMargin,

    // priority sampling: u from the same salted md5, priority = w/u in
    // pure IEEE division (no pow/ln), so the oracle reproduces the
    // exact sample membership AND the per-row priorities
    "t73_priority_sample" ->
      """WITH w AS (SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS n_tokens
        |  FROM documents),
        |p AS (SELECT *, cast(n_tokens as double) /
        |    (((('0x'||substr(md5('psamp'||cast(doc_id as varchar)),
        |        1,15))::bigint) + 1) / 1152921504606846976.0) AS pri
        |  FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY pri DESC, doc_id) AS rn FROM p)
        |SELECT source, doc_id, cast(n_tokens as bigint) AS n_tokens,
        | round(pri, 4) AS priority
        |FROM r WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,

    // nucleus selection: the t01 quality expression, the per-source
    // (quality desc, doc_id) sort, and the integer-exact preceding-mass
    // boundary all replayed
    "t74_topp_mass" ->
      """WITH tok AS (SELECT doc_id, source, text,
        |  CASE WHEN length(trim(text))=0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text),'\s+')) END
        |    AS n_tokens
        |  FROM documents),
        |q AS (SELECT doc_id, source, n_tokens,
        |  round(least(1.0, greatest(0.0,
        |   (CASE WHEN length(text)=0 THEN 0.0
        |     ELSE cast(length(regexp_replace(text,'[^A-Za-z ]','','g'))
        |       as double)/length(text) END)*0.5
        |   + (CASE WHEN n_tokens BETWEEN 10 AND 100000
        |       THEN 1.0 ELSE 0.5 END)*0.3
        |   + (1.0 - least(1.0, (CASE WHEN length(text)=0 THEN 0.0
        |     ELSE cast(length(regexp_replace(text,'[^.,;:!?]','','g'))
        |       as double)/length(text) END)*10))*0.1
        |   + (CASE WHEN (CASE WHEN n_tokens=0 THEN 0.0
        |     ELSE cast(length(text) as double)/n_tokens END)
        |       BETWEEN 2 AND 12 THEN 0.1 ELSE 0.0 END))),4) AS quality
        |  FROM tok),
        |r AS (SELECT *,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumprev,
        |    sum(n_tokens) OVER (PARTITION BY source) AS total
        |  FROM q)
        |SELECT doc_id, source, cast(n_tokens as bigint) AS n_tokens,
        | quality,
        | cast(CASE WHEN cumprev * 2 < total * 1 THEN 1 ELSE 0 END
        |   as bigint) AS is_kept
        |FROM r ORDER BY doc_id""".stripMargin,

    // KMV overlap: per-language k-min sketches rebuilt from the same
    // md5 hashes, the pairwise merged k-min, the shared count and all
    // three estimators replayed division-for-division
    "t75_kmv_overlap" ->
      """WITH d AS (SELECT lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram
        |  FROM d WHERE len(t) >= 2),
        |h AS (SELECT DISTINCT lang,
        |    ('0x'||substr(md5(ngram),1,15))::bigint AS h FROM g),
        |r AS (SELECT lang, h, row_number() OVER (
        |    PARTITION BY lang ORDER BY h) AS rn FROM h),
        |sk AS (SELECT lang, h FROM r WHERE rn <= 64),
        |langs AS (SELECT DISTINCT lang FROM sk),
        |p AS (SELECT a.lang AS g_a, b.lang AS g_b
        |  FROM langs a JOIN langs b ON a.lang < b.lang),
        |md AS (SELECT DISTINCT p.g_a, p.g_b, s.h
        |  FROM p JOIN sk s ON s.lang IN (p.g_a, p.g_b)),
        |mr AS (SELECT g_a, g_b, h, row_number() OVER (
        |    PARTITION BY g_a, g_b ORDER BY h) AS rn FROM md),
        |mm AS (SELECT * FROM mr WHERE rn <= 64),
        |ms AS (SELECT g_a, g_b, count(*) AS msize,
        |    max(CASE WHEN rn = 64 THEN h END) AS kth
        |  FROM mm GROUP BY 1, 2),
        |sh AS (SELECT mm.g_a, mm.g_b, count(*) AS shared
        |  FROM mm
        |  JOIN sk sa ON sa.lang = mm.g_a AND sa.h = mm.h
        |  JOIN sk sb ON sb.lang = mm.g_b AND sb.h = mm.h
        |  GROUP BY 1, 2)
        |SELECT ms.g_a, ms.g_b,
        | cast(coalesce(sh.shared, 0) as bigint) AS n_shared_kmin,
        | round(CASE WHEN msize < 64 THEN msize::double
        |   ELSE 63.0 * 1152921504606846976.0 / kth::double END, 4)
        |   AS est_union,
        | round(coalesce(sh.shared, 0)::double / msize::double, 4)
        |   AS est_jaccard,
        | round((coalesce(sh.shared, 0)::double / msize::double) *
        |   (CASE WHEN msize < 64 THEN msize::double
        |    ELSE 63.0 * 1152921504606846976.0 / kth::double END), 4)
        |   AS est_intersection
        |FROM ms LEFT JOIN sh USING (g_a, g_b)
        |ORDER BY g_a, g_b""".stripMargin,

    // decontamination-by-retrieval gate: the benchmark-subset index
    // arithmetic (all stats over the every-10th-doc corpus), each
    // incoming doc's pair sums, the max and the >= 9.0 flag replayed;
    // no-shared-term docs surface with a null top and flag 0
    "t84_bm25_gate" ->
      """WITH bench AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |tok AS (SELECT doc_id, unnest(regexp_split_to_array(
        |    lower(trim(text)), '\s+')) AS term FROM bench),
        |t AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE length(term) >= 3 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS nd FROM bench),
        |lt AS (SELECT sum(tf) AS lt FROM t),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM t GROUP BY 1),
        |dfreq AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |p AS (SELECT t.term, t.doc_id AS did,
        |    ln(1.0::double + (nd - df + 0.5::double) /
        |        (df + 0.5::double)) *
        |      (tf * (1.2::double + 1.0::double)) /
        |      (tf + 1.2::double * ((1.0::double - 0.75::double) +
        |        0.75::double *
        |        (cast(dl.dl * nd AS double) / lt))) AS s
        |  FROM t JOIN dl USING (doc_id) JOIN dfreq USING (term)
        |    CROSS JOIN n CROSS JOIN lt),
        |inc AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 5 = 0 AND doc_id < 2500),
        |q AS (SELECT DISTINCT doc_id AS qid, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(
        |      lower(trim(text)), '\s+')) AS term FROM inc)
        |  WHERE length(term) >= 3),
        |sc AS (SELECT q.qid, p.did,
        |    cast(sum(cast(s AS decimal(27,12))) AS double) AS score
        |  FROM q JOIN p ON q.term = p.term GROUP BY 1, 2),
        |tp AS (SELECT qid, max(score) AS top FROM sc GROUP BY 1)
        |SELECT cast(inc.doc_id AS bigint) AS doc_id,
        | round(top, 4) AS bm25_top,
        | cast(coalesce(top >= 9.0, false) AS bigint) AS is_contaminated
        |FROM inc LEFT JOIN tp ON inc.doc_id = tp.qid
        |ORDER BY doc_id""".stripMargin,

    // rank-biased overlap: the weight table's iterated-multiplication
    // powers (recursive CTE — the same left fold as the engine, no
    // libm pow), both rankings, the per-item max-rank lookup and the
    // decimal sums all replayed
    "t82_rbo" ->
      s"""WITH RECURSIVE pw(d, pwv) AS (
        |  SELECT 1, 1.0::double
        |  UNION ALL
        |  SELECT d + 1, pwv * (9::double / 10::double) FROM pw
        |  WHERE d < 5),
        |terms AS (SELECT d, (1.0::double - (9::double / 10::double)) *
        |    pwv / cast(d AS double) AS term FROM pw),
        |wt AS (SELECT m, sum(cast(term AS decimal(27,12))) AS w
        |  FROM (SELECT unnest(range(1, 6)) AS m) JOIN terms
        |    ON d >= m GROUP BY m),
        |b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 4)} AS bucket FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS b0
        |  FROM b WHERE vec_id % 50 = 0),
        |probes AS (SELECT query_id, qv, unnest([b0, xor(b0, 1),
        |  xor(b0, 2), xor(b0, 4), xor(b0, 8)]) AS bucket FROM q),
        |ss AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv AS double[]),
        |      cast(c.embedding AS double[])) AS cos
        |  FROM probes JOIN b c USING (bucket)
        |  WHERE query_id <> c.vec_id),
        |sr0 AS (SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS ra FROM ss),
        |sa AS (SELECT query_id, neighbor_id, ra FROM sr0
        |  WHERE ra <= 5),
        |tc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv AS double[]),
        |      cast(c.embedding AS double[])) AS cos
        |  FROM q JOIN b c ON query_id <> c.vec_id),
        |tr AS (SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS rb FROM tc),
        |sb AS (SELECT query_id, neighbor_id, rb FROM tr WHERE rb <= 5),
        |mt AS (SELECT sa.query_id, count(*) AS n, sum(w) AS rbo
        |  FROM sa JOIN sb USING (query_id, neighbor_id)
        |  JOIN wt ON wt.m = greatest(ra, rb)
        |  GROUP BY 1),
        |uni AS (SELECT DISTINCT query_id FROM (
        |  SELECT query_id FROM sa UNION ALL SELECT query_id FROM sb))
        |SELECT cast(uni.query_id AS bigint) AS query_id,
        | cast(coalesce(n, 0) AS bigint) AS overlap_k,
        | round(coalesce(cast(rbo AS double), 0.0), 6) AS rbo
        |FROM uni LEFT JOIN mt ON uni.query_id = mt.query_id
        |ORDER BY query_id""".stripMargin,

    // retrieval eval metrics: the LSH system ranking (RHP buckets +
    // Hamming-1 probes), the exact truth ranking, the hits join, DCG /
    // ideal-DCG term sums and all three per-query metrics replayed
    "t81_ranking_metrics" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |  ${rhpBucketSql("embedding", 4)} AS bucket FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS b0
        |  FROM b WHERE vec_id % 50 = 0),
        |probes AS (SELECT query_id, qv, unnest([b0, xor(b0, 1),
        |  xor(b0, 2), xor(b0, 4), xor(b0, 8)]) AS bucket FROM q),
        |ss AS (SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv AS double[]),
        |      cast(c.embedding AS double[])) AS cos
        |  FROM probes JOIN b c USING (bucket)
        |  WHERE query_id <> c.vec_id),
        |sr0 AS (SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS sr FROM ss),
        |sys AS (SELECT query_id, neighbor_id, sr FROM sr0
        |  WHERE sr <= 5),
        |tc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(cast(qv AS double[]),
        |      cast(c.embedding AS double[])) AS cos
        |  FROM q JOIN b c ON query_id <> c.vec_id),
        |tr AS (SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS rnk FROM tc),
        |tru AS (SELECT query_id, neighbor_id FROM tr WHERE rnk <= 5),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM tru
        |  GROUP BY 1),
        |h AS (SELECT sys.query_id, count(*) AS hits, min(sr) AS minr,
        |    sum(cast(ln(2.0) / ln(cast(sr + 1 AS double))
        |      AS decimal(27,12))) AS dcg
        |  FROM sys JOIN tru USING (query_id, neighbor_id)
        |  GROUP BY 1),
        |iseq AS (SELECT query_id, unnest(range(1,
        |    least(n_rel, 5) + 1)) AS i FROM nrel),
        |id AS (SELECT query_id, sum(cast(ln(2.0) /
        |    ln(cast(i + 1 AS double)) AS decimal(27,12))) AS idcg
        |  FROM iseq GROUP BY 1)
        |SELECT cast(nrel.query_id AS bigint) AS query_id,
        | cast(n_rel AS bigint) AS n_rel,
        | cast(coalesce(hits, 0) AS bigint) AS hits,
        | round(cast(coalesce(hits, 0) AS double) /
        |   cast(n_rel AS double), 6) AS recall,
        | round(coalesce(1.0 / cast(minr AS double), 0.0), 6) AS mrr,
        | round(coalesce(cast(dcg AS double), 0.0) /
        |   cast(idcg AS double), 6) AS ndcg
        |FROM nrel LEFT JOIN h ON nrel.query_id = h.query_id
        | JOIN id ON nrel.query_id = id.query_id
        |ORDER BY query_id""".stripMargin,

    // margin-based bitext mining: both direction's full cosine
    // rankings at k=4, the round-4 retriever contract, neighborhood
    // half-means, every ratio margin, both rank windows and the
    // mutual-best flag replayed — one flipped neighbor anywhere moves
    // a margin or a rank and breaks the hash
    "t80_margin_mine" ->
      """WITH src AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 2 = 0),
        |tgt AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 2 = 1),
        |fc AS (SELECT s.vec_id AS qid, t.vec_id AS nid,
        |    list_cosine_similarity(cast(s.embedding AS double[]),
        |      cast(t.embedding AS double[])) AS cos
        |  FROM src s CROSS JOIN tgt t),
        |fr AS (SELECT qid, nid, round(cos, 4) AS cos4,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rnk FROM fc),
        |fwd AS (SELECT qid, nid, cos4 FROM fr WHERE rnk <= 4),
        |bc AS (SELECT t.vec_id AS qid, s.vec_id AS nid,
        |    list_cosine_similarity(cast(t.embedding AS double[]),
        |      cast(s.embedding AS double[])) AS cos
        |  FROM tgt t CROSS JOIN src s),
        |br AS (SELECT qid, nid, round(cos, 4) AS cos4,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid) AS rnk FROM bc),
        |bwd AS (SELECT qid, nid, cos4 FROM br WHERE rnk <= 4),
        |hs AS (SELECT qid AS src_id,
        |    cast(sum(cast(cos4 AS decimal(27,12))) AS double) /
        |      (2.0 * cast(count(*) AS double)) AS hsrc
        |  FROM fwd GROUP BY 1),
        |ht AS (SELECT qid AS tgt_id,
        |    cast(sum(cast(cos4 AS decimal(27,12))) AS double) /
        |      (2.0 * cast(count(*) AS double)) AS htgt
        |  FROM bwd GROUP BY 1),
        |pairs AS (SELECT src_id, tgt_id, max(cos4) AS cos FROM (
        |    SELECT qid AS src_id, nid AS tgt_id, cos4 FROM fwd
        |    UNION ALL SELECT nid AS src_id, qid AS tgt_id, cos4
        |      FROM bwd) GROUP BY 1, 2),
        |m AS (SELECT src_id, tgt_id,
        |    cos / (hsrc + htgt) AS mg
        |  FROM pairs JOIN hs USING (src_id) JOIN ht USING (tgt_id)),
        |r AS (SELECT src_id, tgt_id, mg,
        |    row_number() OVER (PARTITION BY src_id
        |      ORDER BY mg DESC, tgt_id) AS src_rank,
        |    row_number() OVER (PARTITION BY tgt_id
        |      ORDER BY mg DESC, src_id) AS tgt_rank
        |  FROM m)
        |SELECT cast(src_id AS bigint) AS src_id,
        | cast(tgt_id AS bigint) AS tgt_id,
        | round(mg, 6) AS margin,
        | cast(src_rank AS bigint) AS src_rank,
        | cast(tgt_rank AS bigint) AS tgt_rank,
        | cast(src_rank = 1 AND tgt_rank = 1 AS bigint) AS is_mutual
        |FROM r ORDER BY src_id, tgt_id""".stripMargin,

    // t80's margin arithmetic on BUCKETED shortlists: both directions'
    // candidates come from the t29 sign-LSH derivation (bucket +
    // Hamming-1 probes, per-query top-4 on unrounded cosines, id
    // tie-break) instead of the exact cross join; the margin tail is
    // t80's verbatim — a single shortlist difference moves an average
    // and breaks the hash
    "t120_margin_mine_bucketed" ->
      s"""WITH src AS (SELECT vec_id, embedding,
         |    ${rhpBucketSql("embedding", 8)} AS b0
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |tgt AS (SELECT vec_id, embedding,
         |    ${rhpBucketSql("embedding", 8)} AS b0
         |  FROM embeddings WHERE vec_id % 2 = 1),
         |fp AS (SELECT s.vec_id AS qid, s.embedding AS qv,
         |    unnest(${probeListSql("s.b0", 8, probe2 = false)}) AS bucket
         |  FROM src s),
         |fs AS (SELECT qid, t.vec_id AS nid,
         |    list_cosine_similarity(cast(qv as double[]),
         |      cast(t.embedding as double[])) AS cos
         |  FROM fp JOIN tgt t ON t.b0 = fp.bucket),
         |fr AS (SELECT qid, nid, round(cos, 4) AS cos4,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, nid) AS rnk FROM fs),
         |fwd AS (SELECT qid, nid, cos4 FROM fr WHERE rnk <= 4),
         |bp AS (SELECT t.vec_id AS qid, t.embedding AS qv,
         |    unnest(${probeListSql("t.b0", 8, probe2 = false)}) AS bucket
         |  FROM tgt t),
         |bs AS (SELECT qid, s.vec_id AS nid,
         |    list_cosine_similarity(cast(qv as double[]),
         |      cast(s.embedding as double[])) AS cos
         |  FROM bp JOIN src s ON s.b0 = bp.bucket),
         |br AS (SELECT qid, nid, round(cos, 4) AS cos4,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, nid) AS rnk FROM bs),
         |bwd AS (SELECT qid, nid, cos4 FROM br WHERE rnk <= 4),
         |hs AS (SELECT qid AS src_id,
         |    cast(sum(cast(cos4 AS decimal(27,12))) AS double) /
         |      (2.0 * cast(count(*) AS double)) AS hsrc
         |  FROM fwd GROUP BY 1),
         |ht AS (SELECT qid AS tgt_id,
         |    cast(sum(cast(cos4 AS decimal(27,12))) AS double) /
         |      (2.0 * cast(count(*) AS double)) AS htgt
         |  FROM bwd GROUP BY 1),
         |pairs AS (SELECT src_id, tgt_id, max(cos4) AS cos FROM (
         |    SELECT qid AS src_id, nid AS tgt_id, cos4 FROM fwd
         |    UNION ALL SELECT nid AS src_id, qid AS tgt_id, cos4
         |      FROM bwd) GROUP BY 1, 2),
         |m AS (SELECT src_id, tgt_id,
         |    cos / (hsrc + htgt) AS mg
         |  FROM pairs JOIN hs USING (src_id) JOIN ht USING (tgt_id)),
         |r AS (SELECT src_id, tgt_id, mg,
         |    row_number() OVER (PARTITION BY src_id
         |      ORDER BY mg DESC, tgt_id) AS src_rank,
         |    row_number() OVER (PARTITION BY tgt_id
         |      ORDER BY mg DESC, src_id) AS tgt_rank
         |  FROM m)
         |SELECT cast(src_id AS bigint) AS src_id,
         | cast(tgt_id AS bigint) AS tgt_id,
         | round(mg, 6) AS margin,
         | cast(src_rank AS bigint) AS src_rank,
         | cast(tgt_rank AS bigint) AS tgt_rank,
         | cast(src_rank = 1 AND tgt_rank = 1 AS bigint) AS is_mutual
         |FROM r ORDER BY src_id, tgt_id""".stripMargin,

    // keyless point-in-interval range join: the oracle is the NAIVE
    // theta join the bucketed form exists to avoid — two independent
    // formulations (|P|·|I| comparisons here, bucket equi-join in the
    // engine), every overlapping pair, inclusive both ends
    "t121_range_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |i AS (SELECT event_id AS error_id, ts AS inc_start,
        |    ts + INTERVAL '30 minutes' AS inc_end
        |  FROM events WHERE event_type = 'error')
        |SELECT cast(p.purchase_id as bigint) AS purchase_id,
        | cast(i.error_id as bigint) AS error_id,
        | cast(epoch_us(p.ts) as bigint) AS purchase_us,
        | cast(epoch_us(i.inc_start) as bigint) AS inc_start_us
        |FROM p JOIN i
        |  ON p.ts >= i.inc_start AND p.ts <= i.inc_end
        |ORDER BY purchase_id, error_id""".stripMargin,

    // interval-overlap join: the naive theta overlap join the bucketed
    // form avoids — every (session, incident) pair with
    // vs <= ie AND is <= ve, inclusive closed intervals
    "t124_interval_join" ->
      """WITH v AS (SELECT event_id AS view_id, ts AS vs,
        |    ts + INTERVAL '20 minutes' AS ve
        |  FROM events WHERE event_type = 'view'),
        |i AS (SELECT event_id AS error_id, ts AS ist,
        |    ts + INTERVAL '30 minutes' AS ie
        |  FROM events WHERE event_type = 'error')
        |SELECT cast(v.view_id as bigint) AS view_id,
        | cast(i.error_id as bigint) AS error_id,
        | cast(epoch_us(v.vs) as bigint) AS v_start_us,
        | cast(epoch_us(i.ist) as bigint) AS i_start_us
        |FROM v JOIN i ON v.vs <= i.ie AND i.ist <= v.ve
        |ORDER BY view_id, error_id""".stripMargin,

    // keep-one-copy substring dedup: t54's excision chain plus an
    // independently-derived canonical pick (row_number over
    // (dg, doc, pos) — the engine uses a min-struct aggregate; two
    // formulations, one winner) and the canonical-coverage save
    "t122_keepfirst_dedup" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS t,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS lt
        |  FROM documents),
        |p AS (SELECT doc_id, lt,
        |    unnest(range(1, greatest(len(lt) - 4, 0) + 1)) AS pos FROM tok),
        |g AS (SELECT doc_id, pos,
        |    ('0x'||substr(md5(array_to_string(lt[pos:pos+4], ' ')),
        |      1,15))::bigint AS dg FROM p),
        |f AS (SELECT dg FROM g GROUP BY dg
        |  HAVING count(DISTINCT doc_id) >= 2),
        |o AS (SELECT g.doc_id, g.pos, g.dg,
        |    row_number() OVER (PARTITION BY g.dg
        |      ORDER BY g.doc_id, g.pos) AS rn
        |  FROM g JOIN f USING (dg)),
        |cov AS (SELECT doc_id, pos + j AS cp,
        |    CASE WHEN rn = 1 THEN 1 ELSE 0 END AS canon
        |  FROM o CROSS JOIN range(0,5) r(j)),
        |rm AS (SELECT doc_id, cp FROM cov GROUP BY doc_id, cp
        |  HAVING max(canon) = 0),
        |tp AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p2
        |  FROM tok),
        |kt AS (SELECT tp.doc_id, p2, tp.t[p2] AS w FROM tp
        |  LEFT JOIN rm ON rm.doc_id = tp.doc_id AND rm.cp = tp.p2
        |  WHERE rm.cp IS NULL),
        |a AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p2) AS clean_text,
        |    count(*) AS nk FROM kt GROUP BY 1)
        |SELECT cast(tok.doc_id as bigint) AS doc_id,
        | coalesce(a.clean_text, '') AS clean_text,
        | cast(coalesce(a.nk, 0) as bigint) AS n_kept,
        | cast(len(tok.t) - coalesce(a.nk, 0) as bigint) AS n_removed
        |FROM tok LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // duplicated-span audit: the interval merge over flagged window
    // starts replayed as the same running-covered-end + break-flag
    // running-sum construction
    "t123_dup_spans" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS lt
        |  FROM documents),
        |p AS (SELECT doc_id, lt,
        |    unnest(range(1, greatest(len(lt) - 4, 0) + 1)) AS pos FROM tok),
        |g AS (SELECT doc_id, pos,
        |    ('0x'||substr(md5(array_to_string(lt[pos:pos+4], ' ')),
        |      1,15))::bigint AS dg FROM p),
        |f AS (SELECT dg FROM g GROUP BY dg
        |  HAVING count(DISTINCT doc_id) >= 2),
        |s AS (SELECT g.doc_id, g.pos AS p FROM g JOIN f USING (dg)),
        |m AS (SELECT doc_id, p,
        |    max(p) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 4
        |      AS prev_end
        |  FROM s),
        |b AS (SELECT doc_id, p, CASE WHEN prev_end IS NULL
        |    OR p > prev_end + 1 THEN 1 ELSE 0 END AS brk FROM m),
        |i AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id
        |    ORDER BY p) AS isl FROM b)
        |SELECT cast(doc_id as bigint) AS doc_id,
        | cast(min(p) as bigint) AS span_start,
        | cast(max(p) + 4 as bigint) AS span_end,
        | cast(max(p) + 4 - min(p) + 1 as bigint) AS span_tokens,
        | cast(count(*) as bigint) AS n_windows
        |FROM i GROUP BY doc_id, isl
        |ORDER BY doc_id, span_start""".stripMargin,

    // hybrid dense+sparse RRF: the full brute-cosine ranking, the full
    // BM25 ranking (both at k=10) and the 1/(60+rank) fusion replayed —
    // a single rank flipped in either modality moves a fused score and
    // breaks the hash
    "t79_hybrid_rrf" ->
      """WITH qv AS (SELECT vec_id AS qid, embedding AS qe
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1250),
        |cv AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
        |ds AS (SELECT qid, nid, list_cosine_similarity(
        |    cast(qe AS double[]), cast(ce AS double[])) AS cos
        |  FROM qv JOIN cv ON qid <> nid),
        |dr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos DESC, nid) AS rnk FROM ds),
        |dense AS (SELECT qid, nid, rnk FROM dr WHERE rnk <= 10),
        |tok AS (SELECT doc_id, unnest(regexp_split_to_array(
        |    lower(trim(text)), '\s+')) AS term FROM documents),
        |t AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE length(term) >= 3 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS nd FROM documents),
        |lt AS (SELECT sum(tf) AS lt FROM t),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM t GROUP BY 1),
        |dfreq AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |p AS (SELECT t.term, t.doc_id AS did,
        |    ln(1.0::double + (nd - df + 0.5::double) /
        |        (df + 0.5::double)) *
        |      (tf * (1.2::double + 1.0::double)) /
        |      (tf + 1.2::double * ((1.0::double - 0.75::double) +
        |        0.75::double *
        |        (cast(dl.dl * nd AS double) / lt))) AS s
        |  FROM t JOIN dl USING (doc_id) JOIN dfreq USING (term)
        |    CROSS JOIN n CROSS JOIN lt),
        |q AS (SELECT DISTINCT doc_id AS qid, term FROM tok
        |  WHERE doc_id % 50 = 0 AND doc_id < 1250
        |    AND length(term) >= 3),
        |sc AS (SELECT q.qid, p.did,
        |    cast(sum(cast(s AS decimal(27,12))) AS double) AS score
        |  FROM q JOIN p ON q.term = p.term GROUP BY 1, 2),
        |sr AS (SELECT qid, did, row_number() OVER (
        |    PARTITION BY qid ORDER BY score DESC, did) AS rnk
        |  FROM sc),
        |sparse AS (SELECT qid, did AS nid, rnk FROM sr WHERE rnk <= 10),
        |u AS (SELECT qid, nid, rnk FROM dense
        |  UNION ALL SELECT qid, nid, rnk FROM sparse),
        |f AS (SELECT qid, nid,
        |    cast(sum(cast(1.0 / cast(60 + rnk AS double)
        |      AS decimal(27,12))) AS double) AS score,
        |    count(*) AS n_lists
        |  FROM u GROUP BY 1, 2),
        |r AS (SELECT qid, nid, score, n_lists, row_number() OVER (
        |    PARTITION BY qid ORDER BY score DESC, nid) AS rank
        |  FROM f)
        |SELECT cast(qid AS bigint) AS query_id,
        | cast(rank AS bigint) AS rank,
        | cast(nid AS bigint) AS neighbor_id,
        | cast(n_lists AS bigint) AS n_lists,
        | round(score, 6) AS rrf_score
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // BM25 retrieval: tokenization, tf/df/dl, the corpus token total,
    // the Lucene idf, the saturation/length-normalization term (same
    // literal arithmetic shapes — both engines fold identical IEEE
    // constants), the decimal-accumulated per-pair sum and the
    // (score desc, doc) ranking all replayed; a single term weight
    // off anywhere breaks the hash
    "t78_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(
        |    lower(trim(text)), '\s+')) AS term FROM documents),
        |t AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE length(term) >= 3 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS nd FROM documents),
        |lt AS (SELECT sum(tf) AS lt FROM t),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM t GROUP BY 1),
        |dfreq AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |p AS (SELECT t.term, t.doc_id AS did,
        |    ln(1.0::double + (nd - df + 0.5::double) /
        |        (df + 0.5::double)) *
        |      (tf * (1.2::double + 1.0::double)) /
        |      (tf + 1.2::double * ((1.0::double - 0.75::double) +
        |        0.75::double *
        |        (cast(dl.dl * nd AS double) / lt))) AS s
        |  FROM t JOIN dl USING (doc_id) JOIN dfreq USING (term)
        |    CROSS JOIN n CROSS JOIN lt),
        |q AS (SELECT DISTINCT doc_id AS qid, term FROM tok
        |  WHERE doc_id % 50 = 0 AND doc_id < 1250
        |    AND length(term) >= 3),
        |sc AS (SELECT q.qid, p.did,
        |    cast(sum(cast(s AS decimal(27,12))) AS double) AS score
        |  FROM q JOIN p ON q.term = p.term GROUP BY 1, 2),
        |r AS (SELECT qid, did, score, row_number() OVER (
        |    PARTITION BY qid ORDER BY score DESC, did) AS rank
        |  FROM sc)
        |SELECT cast(qid AS bigint) AS query_id,
        | cast(rank AS bigint) AS rank,
        | cast(did AS bigint) AS doc_id,
        | round(score, 4) AS score
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // sparse tf-idf cosine: tokenization, tf/df, the same ln(N/df)
    // weights as t25, decimal-accumulated norms and pair dots, the
    // df-pruned postings join and the per-query ranking all replayed
    "t77_sparse_cosine" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(
        |    lower(trim(text)), '\s+')) AS term FROM documents),
        |t AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE length(term) >= 3 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS nd FROM documents),
        |dfreq AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |w AS (SELECT t.doc_id, t.term, dfreq.df,
        |    t.tf * ln(nd::double / df) AS w
        |  FROM t JOIN dfreq USING (term) CROSS JOIN n),
        |nrm AS (SELECT doc_id,
        |    sqrt(cast(sum(cast(w * w AS decimal(27,12))) as double))
        |      AS nrm
        |  FROM w GROUP BY 1),
        |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    cast(sum(cast(a.w * b.w AS decimal(27,12))) as double)
        |      AS dot
        |  FROM w a JOIN w b ON a.term = b.term
        |    AND a.doc_id <> b.doc_id
        |  CROSS JOIN n
        |  WHERE a.df * 10 <= nd * 1 AND b.df * 10 <= nd * 1
        |  GROUP BY 1, 2),
        |c AS (SELECT ida, idb, dot / (na.nrm * nb.nrm) AS cos
        |  FROM p JOIN nrm na ON na.doc_id = ida
        |    JOIN nrm nb ON nb.doc_id = idb),
        |r AS (SELECT ida, idb, cos, row_number() OVER (
        |    PARTITION BY ida ORDER BY cos DESC, idb) AS rank FROM c)
        |SELECT cast(ida as bigint) AS query_id,
        | cast(rank as bigint) AS rank,
        | cast(idb as bigint) AS neighbor_id,
        | round(cos, 4) AS cosine
        |FROM r WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,

    // nearest-either-direction as-of: single range join over the
    // 2-hour window, ranked by (distance, backward-first, the
    // per-direction id rule) — the oracle's candidate ranking must
    // reproduce the two-carry choice exactly
    "t76_asof_nearest" ->
      """WITH su AS (SELECT event_id AS signup_id, user_id, ts AS sts
        |  FROM events WHERE event_type = 'signup'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS cts
        |  FROM events WHERE event_type = 'click'),
        |j AS (SELECT su.signup_id, su.user_id, su.sts, c.click_id,
        |    c.cts,
        |    abs(epoch_us(c.cts) - epoch_us(su.sts)) AS dist,
        |    CASE WHEN c.cts <= su.sts THEN 0 ELSE 1 END AS fwd
        |  FROM su LEFT JOIN c ON su.user_id = c.user_id
        |    AND c.cts >= su.sts - INTERVAL '2 hours'
        |    AND c.cts <= su.sts + INTERVAL '2 hours'),
        |r AS (SELECT *, row_number() OVER (PARTITION BY signup_id
        |    ORDER BY dist ASC NULLS LAST, fwd ASC NULLS LAST,
        |      CASE WHEN fwd = 0 THEN -click_id ELSE click_id END
        |        ASC NULLS LAST) AS rn
        |  FROM j)
        |SELECT cast(signup_id as bigint) AS signup_id,
        | cast(user_id as bigint) AS user_id,
        | cast(epoch_us(sts) as bigint) AS signup_us,
        | cast(click_id as bigint) AS click_id,
        | cast(epoch_us(cts) as bigint) AS click_us,
        | CASE WHEN click_id IS NULL THEN NULL
        |   WHEN fwd = 0 THEN 'b' ELSE 'f' END AS matched_dir
        |FROM r WHERE rn = 1
        |ORDER BY signup_id""".stripMargin,

    // kNN label propagation: the exact cosine ranking (t06's contract),
    // the label join, every per-label vote count and the
    // (votes desc, label asc) winner tiebreak all replayed — a single
    // neighbor ranked differently flips a vote and breaks the hash
    "t68_knn_predict" ->
      """WITH q AS (SELECT vec_id AS query_id, cast(embedding as double[])
        |    AS qv FROM embeddings WHERE vec_id < 8),
        |cand AS (SELECT query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv, cast(e.embedding as double[]))
        |      AS cos
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS rank
        |  FROM cand),
        |v AS (SELECT query_id, e2.label AS lbl, count(*) AS votes
        |  FROM r JOIN embeddings e2 ON r.neighbor_id = e2.vec_id
        |  WHERE rank <= 5 GROUP BY 1, 2),
        |w AS (SELECT query_id, lbl, votes, row_number() OVER (
        |    PARTITION BY query_id ORDER BY votes DESC, lbl) AS rn
        |  FROM v)
        |SELECT cast(query_id as bigint) AS query_id,
        | cast(lbl as bigint) AS predicted_label,
        | cast(votes as bigint) AS votes
        |FROM w WHERE rn = 1
        |ORDER BY query_id""".stripMargin,

    // DSIR against a frozen profile: both count tables rebuilt from
    // their sub-corpora (raw model = even ids, target model = English
    // odd ids), the full corpus scored — unseen buckets take the pure
    // smoothing ratio; every term replayed as in t66
    "t67_dsir_frozen" ->
      """WITH d AS (SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram
        |  FROM d WHERE len(t) >= 2),
        |bk AS (SELECT doc_id, lang,
        |    ('0x'||substr(md5('dsir'||ngram),1,8))::bigint % 512 AS b
        |  FROM g),
        |tc AS (SELECT b, count(*) AS ct FROM bk
        |  WHERE lang = 'en' AND doc_id % 2 = 1 GROUP BY 1),
        |rc AS (SELECT b, count(*) AS cr FROM bk
        |  WHERE doc_id % 2 = 0 GROUP BY 1),
        |tot AS (SELECT coalesce((SELECT sum(ct) FROM tc), 0) AS nt,
        |    coalesce((SELECT sum(cr) FROM rc), 0) AS nr),
        |s AS (SELECT doc_id, cast(ln(
        |      ((coalesce(tc.ct, 0) + 1)::double * (tot.nr + 512)::double)
        |      / ((coalesce(rc.cr, 0) + 1)::double
        |         * (tot.nt + 512)::double)) as decimal(27,12)) AS lw
        |  FROM bk LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)
        |  CROSS JOIN tot),
        |a AS (SELECT doc_id, count(*) AS n_grams,
        |    round(cast(sum(lw) as double), 6) AS w FROM s GROUP BY 1)
        |SELECT cast(d.doc_id as bigint) AS doc_id,
        | cast(coalesce(a.n_grams, 0) as bigint) AS n_grams,
        | a.w AS log_weight
        |FROM d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // exact recomputation of the embedding drift monitor: the t44
    // assignment CTE with the winning cosine kept, the even-id-half
    // profile and the full-corpus means both decimal-accumulated, and
    // the round-4 flag comparison — a list flagged from the wrong
    // population or a mean off by one rounding step breaks the hash
    "t62_embedding_drift" ->
      """WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT e.vec_id, centroid_id,
        |    list_cosine_similarity(cast(e.embedding as double[]),
        |      cast(cvec as double[])) AS cos,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      -list_cosine_similarity(cast(e.embedding as double[]),
        |        cast(cvec as double[])), centroid_id) AS rn
        |  FROM embeddings e CROSS JOIN c),
        |a AS (SELECT vec_id, centroid_id, cos FROM sc WHERE rn = 1),
        |prof AS (SELECT centroid_id,
        |    cast(sum(cast(cos as decimal(18,4))) as double) / count(*)
        |      AS ref_cos
        |  FROM a WHERE vec_id % 2 = 0 GROUP BY 1),
        |m AS (SELECT centroid_id, count(*) AS n_vecs,
        |    round(cast(sum(cast(cos as decimal(18,4))) as double)
        |      / count(*), 4) AS mean_cos
        |  FROM a GROUP BY 1)
        |SELECT cast(m.centroid_id as bigint) AS centroid_id,
        | cast(n_vecs as bigint) AS n_vecs, mean_cos,
        | cast(CASE WHEN p.ref_cos IS NULL
        |   OR abs(mean_cos - round(p.ref_cos, 4)) > 0.012
        |   THEN 1 ELSE 0 END as bigint) AS drift
        |FROM m LEFT JOIN prof p ON m.centroid_id = p.centroid_id
        |ORDER BY m.centroid_id""".stripMargin,

    // t27's construction scored as fractions: per-doc DISTINCT 5-gram
    // hashes, eval membership counts, and the exact long/long division
    // — a single extra or missing gram on either side of any doc
    // breaks the hash
    "t61_decontamination_report" ->
      """WITH ev AS (SELECT doc_id, text FROM documents),
        |train AS (
        |  SELECT doc_id + 100000 AS doc_id, array_to_string(
        |      (regexp_split_to_array(trim(text), '\s+'))[2:], ' ') AS text
        |    FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 300000, concat('zzq ', cast(doc_id as varchar),
        |      ' alpha beta gamma delta') FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000, array_to_string(
        |      (regexp_split_to_array(trim(text), '\s+'))[1:8], ' ')
        |      || ' zzq mixa mixb mixc mixd mixe' FROM documents),
        |evg AS (SELECT DISTINCT md5(g) AS gh FROM (
        |  SELECT unnest([array_to_string(tk[i:i+4], ' ')
        |      for i in range(1, cast(len(tk)-3 as bigint))]) AS g
        |  FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        |    FROM ev))),
        |tg AS (SELECT DISTINCT doc_id, md5(g) AS gh FROM (
        |  SELECT doc_id, unnest([array_to_string(tk[i:i+4], ' ')
        |      for i in range(1, cast(len(tk)-3 as bigint))]) AS g
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)),
        |      '\s+') AS tk FROM train))),
        |cnt AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1),
        |hit AS (SELECT doc_id, count(*) AS n_cont FROM tg
        |  WHERE gh IN (SELECT gh FROM evg) GROUP BY 1)
        |SELECT cast(t.doc_id as bigint) AS doc_id,
        | cast(coalesce(cnt.n_grams, 0) as bigint) AS n_grams,
        | cast(coalesce(hit.n_cont, 0) as bigint) AS n_contaminated,
        | CASE WHEN coalesce(cnt.n_grams, 0) > 0
        |   THEN cast(coalesce(hit.n_cont, 0) as double) / cnt.n_grams
        |   ELSE 0.0 END AS overlap_frac
        |FROM (SELECT doc_id FROM train) t
        |LEFT JOIN cnt ON t.doc_id = cnt.doc_id
        |LEFT JOIN hit ON t.doc_id = hit.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // exact replay of the per-source rank cut: the t01 quality score
    // (round-4 — rank ties resolve identically), the per-source
    // (quality desc, doc_id) rank, the group size, and the integer
    // rank*4 <= n*3 keep rule — one row on the wrong side of any
    // source's boundary breaks the hash
    "t60_quality_prune" ->
      (s"""WITH q AS (SELECT doc_id, source,
        |  ${qualitySql("text",
            "(CASE WHEN length(trim(text))=0 THEN 0 " +
              "ELSE len(regexp_split_to_array(trim(text),'\\s+')) END)")}
        |    AS quality
        |  FROM documents),
        |r AS (SELECT doc_id, source, quality,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS grp_rank,
        |    count(*) OVER (PARTITION BY source) AS grp_n
        |  FROM q)
        |SELECT cast(doc_id as bigint) AS doc_id, source, quality,
        | cast(grp_rank as bigint) AS grp_rank,
        | cast(grp_n as bigint) AS grp_n,
        | cast(CASE WHEN grp_rank * 4 <= grp_n * 3 THEN 1 ELSE 0 END
        |   as bigint) AS is_kept
        |FROM r ORDER BY doc_id""".stripMargin),

    // exact replay of the C4 line rules on the planted corpus: the
    // same concatenated construction, then per line — last character
    // in the terminal set, >= 5 whitespace tokens, no blocklist phrase
    // — plus the page-level lorem-ipsum/brace screens; reassembly and
    // counts must match byte-for-byte
    "t59_c4_line_filter" ->
      """WITH d AS (SELECT doc_id,
        |    'Shared promo header with no terminal punctuation' || chr(10) ||
        |    trim(text) || '.' || chr(10) ||
        |    'too short.' || chr(10) ||
        |    'This line mentions javascript so the blocklist must drop it.'
        |      || chr(10) ||
        |    CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum {' || chr(10)
        |      ELSE '' END ||
        |    'A final good line with enough words to survive the filter.'
        |      AS text
        |  FROM documents),
        |l AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls
        |  FROM d),
        |k AS (SELECT doc_id, text, len(ls) AS n_lines,
        |    list_filter(ls, x ->
        |      right(trim(x), 1) IN ('.', '!', '?', '"')
        |      AND len(regexp_split_to_array(trim(x), '\s+')) >= 5
        |      AND NOT contains(lower(trim(x)), 'javascript')
        |      AND NOT contains(lower(trim(x)), 'cookie policy')) AS kept
        |  FROM l)
        |SELECT cast(doc_id as bigint) AS doc_id,
        | array_to_string(kept, chr(10)) AS clean_text,
        | cast(len(kept) as bigint) AS n_kept,
        | cast(n_lines - len(kept) as bigint) AS n_removed,
        | cast(CASE WHEN NOT contains(lower(text), 'lorem ipsum')
        |   AND NOT contains(text, '{') THEN 1 ELSE 0 END as bigint)
        |   AS page_ok
        |FROM k ORDER BY doc_id""".stripMargin,

    // exact recomputation of the stratified split: per-source rank over
    // the salted md5 permutation, stratum size, and the dyadic floor
    // boundaries (0.75 / 0.875 — integer-exact in double for any n)
    "t47_stratified_split" ->
      """WITH b AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('split'||cast(doc_id as varchar)), doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT cast(doc_id as bigint) AS doc_id, source,
        | CASE WHEN rn <= floor(0.75*n) THEN 'train'
        |      WHEN rn <= floor(0.875*n) THEN 'val'
        |      ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // exact recomputation of the bigram-LM score: t36's bigram builder,
    // add-one smoothing over prefix counts + token vocabulary, each ln()
    // term cast DECIMAL(27,12) before the order-independent sum, mean in
    // double rounded to 6 (ln round-trips across engines — t25 precedent)
    "t48_lm_score" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram
        |  FROM d WHERE len(t) >= 2),
        |c2 AS (SELECT ngram, count(*) AS c2 FROM g GROUP BY 1),
        |c1 AS (SELECT string_split(ngram, ' ')[1] AS w1, count(*) AS c1
        |  FROM g GROUP BY 1),
        |v AS (SELECT count(DISTINCT u) AS v FROM
        |  (SELECT unnest(t) AS u FROM d) WHERE u <> ''),
        |s AS (SELECT g.doc_id,
        |    cast(ln((c2.c2 + 1)::double / (c1.c1 + v.v)::double)
        |      as decimal(27,12)) AS lp
        |  FROM g JOIN c2 USING (ngram)
        |  JOIN c1 ON string_split(g.ngram, ' ')[1] = c1.w1
        |  CROSS JOIN v),
        |a AS (SELECT doc_id, count(*) AS n_bigrams,
        |    cast(sum(lp) as double) / count(*) AS avg FROM s GROUP BY 1)
        |SELECT cast(d.doc_id as bigint) AS doc_id,
        | cast(coalesce(a.n_bigrams, 0) as bigint) AS n_bigrams,
        | round(a.avg, 6) AS avg_logp
        |FROM d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // t48 per language: every count table and the vocabulary carry the
    // lang key, so each doc scores against its own language's model
    "t51_lm_by_lang" ->
      """WITH d AS (SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram
        |  FROM d WHERE len(t) >= 2),
        |c2 AS (SELECT lang, ngram, count(*) AS c2 FROM g GROUP BY 1, 2),
        |c1 AS (SELECT lang, string_split(ngram, ' ')[1] AS w1,
        |    count(*) AS c1 FROM g GROUP BY 1, 2),
        |v AS (SELECT lang, count(DISTINCT u) AS v FROM
        |  (SELECT lang, unnest(t) AS u FROM d) WHERE u <> '' GROUP BY 1),
        |s AS (SELECT g.doc_id,
        |    cast(ln((c2.c2 + 1)::double / (c1.c1 + v.v)::double)
        |      as decimal(27,12)) AS lp
        |  FROM g JOIN c2 ON g.lang = c2.lang AND g.ngram = c2.ngram
        |  JOIN c1 ON g.lang = c1.lang
        |    AND string_split(g.ngram, ' ')[1] = c1.w1
        |  JOIN v ON g.lang = v.lang),
        |a AS (SELECT doc_id, count(*) AS n_bigrams,
        |    cast(sum(lp) as double) / count(*) AS avg FROM s GROUP BY 1)
        |SELECT cast(d.doc_id as bigint) AS doc_id, d.lang,
        | cast(coalesce(a.n_bigrams, 0) as bigint) AS n_bigrams,
        | round(a.avg, 6) AS avg_logp
        |FROM d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // exact recomputation of the UniMax epoch allocation: per-source
    // token sums, epochs = least(cap, budget/tokens) in double, integer
    // part replicates, fractional part picks by the md5 threshold with
    // t16's floor-then-cast rule (Spark's double->long cast truncates;
    // a bare DuckDB cast would round)
    "t52_epoch_allocation" ->
      """WITH t AS (SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt
        |  FROM documents),
        |s AS (SELECT source, sum(nt) AS st FROM t GROUP BY 1),
        |e AS (SELECT source, least(4.0, 5000.0 / st) AS ep FROM s),
        |j AS (SELECT t.doc_id, t.source, nt, floor(ep) AS fe,
        |    ep - floor(ep) AS fr
        |  FROM t JOIN e USING (source))
        |SELECT cast(doc_id as bigint) AS doc_id, source,
        | cast(nt as bigint) AS n_tokens,
        | cast(fe + CASE WHEN
        |     ('0x'||substr(md5('epochs'||cast(doc_id as varchar)),1,8))::bigint
        |       < cast(floor(fr * 4294967296.0) as bigint)
        |   THEN 1 ELSE 0 END as bigint) AS n_copies
        |FROM j ORDER BY doc_id""".stripMargin,

    // t52 generalized by temperature: source shares pow(tokens, 1/T)
    // normalized by a DECIMAL(27,12)-accumulated sum (order-independent,
    // so both engines compute the same z), then the same epoch/threshold
    // tail as t52
    "t53_temperature_allocation" ->
      """WITH t AS (SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt
        |  FROM documents),
        |s AS (SELECT source, sum(nt) AS st FROM t GROUP BY 1),
        |w AS (SELECT source, st, pow(cast(st as double), 0.5) AS pw FROM s),
        |z AS (SELECT cast(sum(cast(pw as decimal(27,12))) as double) AS z
        |  FROM w),
        |e AS (SELECT source,
        |    least(4.0, 20000.0 * pw / z / st) AS ep
        |  FROM w CROSS JOIN z),
        |j AS (SELECT t.doc_id, t.source, nt, floor(ep) AS fe,
        |    ep - floor(ep) AS fr
        |  FROM t JOIN e USING (source))
        |SELECT cast(doc_id as bigint) AS doc_id, source,
        | cast(nt as bigint) AS n_tokens,
        | cast(fe + CASE WHEN
        |     ('0x'||substr(md5('epochs'||cast(doc_id as varchar)),1,8))::bigint
        |       < cast(floor(fr * 4294967296.0) as bigint)
        |   THEN 1 ELSE 0 END as bigint) AS n_copies
        |FROM j ORDER BY doc_id""".stripMargin,

    "t10_event_hourly" ->
      """SELECT strftime(ts,'%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // gaps-and-islands: new session when the inactivity gap reaches 30 min
    // (strict merge-if-closer, matching Spark session_window); bounds as
    // epoch micros, end = last event + gap
    "t13_sessions" ->
      """WITH m AS (SELECT user_id, ts, value,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT cast(user_id as bigint) AS user_id,
        | cast(epoch_us(min(ts)) as bigint) AS session_start_us,
        | cast(epoch_us(max(ts)) + 1800000000 as bigint) AS session_end_us,
        | count(*) AS n_events,
        | cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    // batch twin of the stream-stream interval join: latest same-user
    // click in the hour before each purchase
    "t20_click_attribution" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type='click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type='purchase'),
        |j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |    c.click_id, c.click_ts
        |  FROM p JOIN c ON p.user_id=c.user_id
        |  AND c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL '1 hour'),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY purchase_id
        |    ORDER BY click_ts DESC, click_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY purchase_id) AS n_candidates
        |  FROM j)
        |SELECT cast(purchase_id as bigint) AS purchase_id,
        |  cast(user_id as bigint) AS user_id,
        |  cast(epoch_us(purchase_ts) as bigint) AS purchase_us,
        |  cast(click_id as bigint) AS attributed_click,
        |  cast(epoch_us(click_ts) as bigint) AS click_us,
        |  cast(n_candidates as bigint) AS n_candidates
        |FROM r WHERE rn=1 ORDER BY purchase_id""".stripMargin,

    // t20's left-outer form: unattributed purchases survive with NULL
    // click columns (the streaming twin emits them on watermark expiry)
    "t21_attribution_outer" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type='click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type='purchase'),
        |j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |    c.click_id, c.click_ts
        |  FROM p LEFT JOIN c ON p.user_id=c.user_id
        |  AND c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL '1 hour'),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY purchase_id
        |    ORDER BY click_ts DESC NULLS LAST, click_id DESC NULLS LAST) AS rn,
        |  count(click_id) OVER (PARTITION BY purchase_id) AS n_candidates
        |  FROM j)
        |SELECT cast(purchase_id as bigint) AS purchase_id,
        |  cast(user_id as bigint) AS user_id,
        |  cast(epoch_us(purchase_ts) as bigint) AS purchase_us,
        |  cast(click_id as bigint) AS attributed_click,
        |  cast(epoch_us(click_ts) as bigint) AS click_us,
        |  cast(n_candidates as bigint) AS n_candidates
        |FROM r WHERE rn=1 ORDER BY purchase_id""".stripMargin,

    // one Lloyd step: nearest-centroid assignment (same rule as t11),
    // then per-(centroid, dim) decimal-accumulated means; 64 dims fixed
    // by the fixture schema
    "t22_kmeans_step" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 250 = 0),
        |sc AS (SELECT vec_id, embedding, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), cid) AS rn
        |  FROM embeddings CROSS JOIN c),
        |asg AS (SELECT vec_id, embedding, cid FROM sc WHERE rn = 1),
        |dims AS (SELECT cid, g.i AS pos,
        |    cast(embedding[g.i + 1] as double) AS v
        |  FROM asg CROSS JOIN generate_series(0, 63) AS g(i))
        |SELECT cast(cid as bigint) AS centroid_id, cast(pos as bigint) AS pos,
        |  round(cast(sum(cast(v as decimal(27,12))) as double) / count(*), 6)
        |    AS val
        |FROM dims GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // two unrolled Lloyd iterations (t22's step twice): round-1 means
    // re-enter assignment after the double->float->real alignment cast
    // (cast(cast(val as real) as double) mirrors Similarity.scala:147's
    // element-wise downcast); decimal-exact means at every round
    "t28_kmeans_train" ->
      """WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
        |  FROM embeddings WHERE vec_id % 250 = 0),
        |sc1 AS (SELECT vec_id, embedding, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY
        |      -list_cosine_similarity(cast(embedding as double[]),
        |        cast(cvec as double[])), cid) AS rn
        |  FROM embeddings CROSS JOIN c0),
        |asg1 AS (SELECT vec_id, embedding, cid FROM sc1 WHERE rn = 1),
        |dims1 AS (SELECT cid, g.i AS pos,
        |    cast(embedding[g.i + 1] as double) AS v
        |  FROM asg1 CROSS JOIN generate_series(0, 63) AS g(i)),
        |m1 AS (SELECT cid, pos,
        |    cast(sum(cast(v as decimal(27,12))) as double) / count(*) AS val
        |  FROM dims1 GROUP BY 1, 2),
        |c1 AS (SELECT cid,
        |    list(cast(cast(val as real) as double) ORDER BY pos) AS cvec
        |  FROM m1 GROUP BY 1),
        |sc2 AS (SELECT e.vec_id, e.embedding, c1.cid, row_number() OVER (
        |    PARTITION BY e.vec_id ORDER BY
        |      -list_cosine_similarity(cast(e.embedding as double[]),
        |        c1.cvec), c1.cid) AS rn
        |  FROM embeddings e CROSS JOIN c1),
        |asg2 AS (SELECT vec_id, embedding, cid FROM sc2 WHERE rn = 1),
        |dims2 AS (SELECT cid, g.i AS pos,
        |    cast(embedding[g.i + 1] as double) AS v
        |  FROM asg2 CROSS JOIN generate_series(0, 63) AS g(i))
        |SELECT cast(cid as bigint) AS centroid_id, cast(pos as bigint) AS pos,
        |  round(cast(sum(cast(v as decimal(27,12))) as double) / count(*), 6)
        |    AS val
        |FROM dims2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // exact linear-interpolation percentiles: Spark `percentile` ==
    // DuckDB quantile_cont; token count = whitespace split like the
    // Spark side (split on \s+ of trimmed text)
    "t23_token_quantiles" ->
      """WITH d AS (SELECT
        |  CASE WHEN length(text) >= 300 THEN 'long' ELSE 'short' END AS band,
        |  cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint)
        |    AS n_tokens
        |  FROM documents)
        |SELECT band,
        |  round(quantile_cont(n_tokens, 0.25), 6) AS p_25,
        |  round(quantile_cont(n_tokens, 0.5), 6) AS p_50,
        |  round(quantile_cont(n_tokens, 0.9), 6) AS p_90,
        |  cast(count(*) as bigint) AS n
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // histogram arithmetic mirrored term-for-term:
    // floor((x - min) * 20 / (max - min)), capped into the last bucket
    // degenerate-range guard (mn = mx → bucket 0) mirrored from
    // Stats.histogram: without it the 0/0 bucket expression resolves
    // differently per engine (Spark long-cast of NaN → 0, DuckDB → 19)
    "t24_histogram" ->
      """WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM orders)
        |SELECT CASE WHEN mx = mn THEN 0
        |    ELSE cast(least(floor((o_totalprice - mn) * 20 / (mx - mn)), 19)
        |      as bigint) END AS bucket,
        |  cast(count(*) as bigint) AS n_orders
        |FROM orders CROSS JOIN b
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // TF-IDF mirror: integer tf/df, score = tf * ln(N/df) with one double
    // division, ties by term ascending
    "t25_tfidf" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE length(term) >= 3 GROUP BY 1, 2),
        |dfr AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT t.doc_id, t.term,
        |    t.tf * ln(cast(n.n as double) / dfr.df) AS score
        |  FROM t JOIN dfr USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS term_rank FROM sc)
        |SELECT cast(doc_id as bigint) AS doc_id,
        |  cast(term_rank as bigint) AS term_rank, term,
        |  round(score, 6) AS score
        |FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,

    // z-score mirror: decimal-accumulated sum/sumsq, double mean/sd,
    // sample stddev; sd=0 or singleton group -> NULL
    "t26_zscore" ->
      """WITH src AS (SELECT o_orderkey, o_totalprice,
        |    strftime(o_orderdate, '%Y-%m') AS month FROM orders),
        |st AS (SELECT month,
        |    cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS s,
        |    cast(sum(cast(o_totalprice as decimal(18,2)) *
        |      cast(o_totalprice as decimal(18,2))) as double) AS sq,
        |    count(*) AS n
        |  FROM src GROUP BY 1)
        |SELECT cast(src.o_orderkey as bigint) AS o_orderkey, src.month,
        |  round(CASE WHEN n > 1 AND sqrt((sq - s*s/n) / (n-1)) <> 0
        |    THEN (o_totalprice - s/n) / sqrt((sq - s*s/n) / (n-1))
        |  END, 6) AS zscore
        |FROM src JOIN st USING (month)
        |ORDER BY o_orderkey""".stripMargin,

    // decontamination mirror: same train-corpus construction, md5 of the
    // normalized text for exact, md5 of word 5-grams (list comprehension
    // over the token array) for the collision screen
    "t27_decontaminate" ->
      """WITH ev AS (SELECT doc_id, text FROM documents),
        |train AS (
        |  SELECT doc_id + 100000 AS doc_id, array_to_string(
        |      (regexp_split_to_array(trim(text), '\s+'))[2:], ' ') AS text
        |    FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 300000, concat('zzq ', cast(doc_id as varchar),
        |      ' alpha beta gamma delta') FROM documents),
        |evh AS (SELECT DISTINCT md5(lower(regexp_replace(trim(text),
        |    '\s+', ' ', 'g'))) AS h FROM ev),
        |evg AS (SELECT DISTINCT md5(g) AS gh FROM (
        |  SELECT unnest([array_to_string(tk[i:i+4], ' ')
        |      for i in range(1, cast(len(tk)-3 as bigint))]) AS g
        |  FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        |    FROM ev))),
        |tg AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_id, unnest([array_to_string(tk[i:i+4], ' ')
        |      for i in range(1, cast(len(tk)-3 as bigint))]) AS g
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)),
        |      '\s+') AS tk FROM train))
        |  WHERE md5(g) IN (SELECT gh FROM evg)),
        |tx AS (SELECT DISTINCT doc_id FROM train
        |  WHERE md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |    IN (SELECT h FROM evh))
        |SELECT cast(t.doc_id as bigint) AS doc_id,
        |  cast(CASE WHEN tx.doc_id IS NOT NULL THEN 1 ELSE 0 END as bigint)
        |    AS exact_dup,
        |  cast(CASE WHEN tg.doc_id IS NOT NULL THEN 1 ELSE 0 END as bigint)
        |    AS ngram_contaminated
        |FROM train t LEFT JOIN tx ON t.doc_id = tx.doc_id
        |LEFT JOIN tg ON t.doc_id = tg.doc_id
        |ORDER BY doc_id""".stripMargin,

    // HyperLogLog distinct sketch: registers are exact integer functions
    // of the md5-derived 60-bit hashes (top 9 bits route, rank = 52 -
    // bitlength of the 51-bit suffix), so the oracle rebuilds every
    // register max, the scaled harmonic sum S = sum(2^(52-M_j)) and the
    // zero count V as exact bigints and replays both estimator branches
    // (raw harmonic on event_id ~2000/group; linear counting on user_id
    // ~150/group) term-for-term
    "t85_hll_distinct" ->
      """WITH reg AS (
        |  SELECT event_type, fam, h // 2251799813685248 AS j,
        |    max(CASE WHEN h % 2251799813685248 = 0 THEN 52
        |      ELSE 52 - length(ltrim(bin(h % 2251799813685248),'0')) END)
        |      AS mr
        |  FROM (
        |    SELECT DISTINCT event_type, 'u' AS fam,
        |      ('0x'||substr(md5(cast(user_id as varchar)),1,15))::bigint
        |        AS h
        |    FROM events WHERE user_id IS NOT NULL
        |    UNION ALL
        |    SELECT DISTINCT event_type, 'e' AS fam,
        |      ('0x'||substr(md5(cast(event_id as varchar)),1,15))::bigint
        |        AS h
        |    FROM events WHERE event_id IS NOT NULL)
        |  GROUP BY 1, 2, 3),
        |agg AS (SELECT event_type, fam,
        |    cast(512 - count(*) as bigint) AS v,
        |    cast((512 - count(*)) * (1::bigint << 52)
        |      + sum((1::bigint << (52 - mr))) as bigint) AS s
        |  FROM reg GROUP BY 1, 2),
        |est AS (SELECT event_type, fam, v, s,
        |    round(CASE WHEN 0.7213/(1+1.079/512)*512*512*pow(2.0,52)/s
        |        <= 1280.0 AND v > 0
        |      THEN 512*ln(512.0/v)
        |      ELSE 0.7213/(1+1.079/512)*512*512*pow(2.0,52)/s END, 4)
        |      AS e
        |  FROM agg),
        |n AS (SELECT event_type, count(*) AS n_rows FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT n.event_type, n.n_rows,
        | u.v AS users_v, u.s AS users_s, u.e AS est_users,
        | ev.v AS events_v, ev.s AS events_s, ev.e AS est_events
        |FROM n
        |JOIN est u ON u.event_type = n.event_type AND u.fam = 'u'
        |JOIN est ev ON ev.event_type = n.event_type AND ev.fam = 'e'
        |ORDER BY n.event_type""".stripMargin,

    // t85's event-id family with the HLL++ band correction: registers
    // rebuilt from the same md5 hashes; the correction CASE chain is
    // GENERATED from the engine's own anchor array (Stats.hllBiasSqlCase)
    // so the table cannot drift between engine and oracle; the raw
    // numerator is the engine's exact double literal
    "t116_hll_bias_corrected" ->
      s"""WITH reg AS (
         |  SELECT event_type, h // 2251799813685248 AS j,
         |    max(CASE WHEN h % 2251799813685248 = 0 THEN 52
         |      ELSE 52 - length(ltrim(bin(h % 2251799813685248),'0')) END)
         |      AS mr
         |  FROM (SELECT DISTINCT event_type,
         |      ('0x'||substr(md5(cast(event_id as varchar)),1,15))::bigint
         |        AS h
         |    FROM events WHERE event_id IS NOT NULL)
         |  GROUP BY 1, 2),
         |agg AS (SELECT event_type,
         |    cast(512 - count(*) as bigint) AS hll_v,
         |    cast((512 - count(*)) * (1::bigint << 52)
         |      + sum((1::bigint << (52 - mr))) as bigint) AS hll_s
         |  FROM reg GROUP BY 1),
         |rawe AS (SELECT event_type, hll_v, hll_s,
         |    $hllRawNum9 / hll_s AS rw FROM agg),
         |est AS (SELECT event_type, hll_v, hll_s,
         |    round(CASE WHEN rw <= 1280.0 AND hll_v > 0
         |      THEN 512*ln(512.0/hll_v)
         |      ELSE rw - (${graft.ops.Stats.hllBiasSqlCase(9, "rw")})
         |      END, 4) AS est_distinct
         |  FROM rawe),
         |n AS (SELECT event_type, count(*) AS n_rows FROM events
         |  WHERE event_id IS NOT NULL GROUP BY 1)
         |SELECT n.event_type, n.n_rows, e.hll_v, e.hll_s, e.est_distinct
         |FROM n JOIN est e ON e.event_type = n.event_type
         |ORDER BY n.event_type""".stripMargin,

    // decayed CMS: cells are exact decimal sums of 2^dayBucket forward
    // mass (replayed cell-for-cell from the same md5 buckets); the 2^-30
    // as-of rescale and the exactly-computed decayed true counts are
    // exact exponent shifts, so estimates and overcounts reproduce
    "t117_cms_decayed" ->
      """WITH ev AS (SELECT event_type, cast(user_id as varchar) AS uid, ts
        |  FROM events WHERE user_id IS NOT NULL),
        |bk AS (SELECT event_type, uid,
        |    cast(floor((epoch_us(ts) - 1704067200000000)
        |      / 86400000000.0) as bigint) AS b
        |  FROM ev),
        |cells AS (SELECT event_type, r.i AS row,
        |    ('0x'||substr(md5('cms:'||cast(r.i as varchar)||':'||uid),1,15))
        |      ::bigint % 32 AS bucket,
        |    sum(cast(pow(2.0, b) as decimal(38,0))) AS mass
        |  FROM bk CROSS JOIN range(4) r(i)
        |  GROUP BY 1, 2, 3),
        |probes AS (SELECT DISTINCT event_type, uid AS probe FROM ev
        |  WHERE cast(uid as bigint) < 40),
        |est AS (SELECT p.event_type, p.probe,
        |    round(cast(min(coalesce(c.mass, 0)) as double)
        |      / 1073741824.0, 4) AS est_decayed
        |  FROM probes p CROSS JOIN range(4) r(i)
        |  LEFT JOIN cells c ON c.event_type = p.event_type AND c.row = r.i
        |    AND c.bucket = ('0x'||substr(md5('cms:'||cast(r.i as varchar)
        |      ||':'||p.probe),1,15))::bigint % 32
        |  GROUP BY 1, 2),
        |tru AS (SELECT event_type, uid AS probe,
        |    round(cast(sum(cast(pow(2.0, b) as decimal(38,0))) as double)
        |      / 1073741824.0, 4) AS true_decayed
        |  FROM bk WHERE cast(uid as bigint) < 40 GROUP BY 1, 2)
        |SELECT e.event_type, e.probe, e.est_decayed, t.true_decayed,
        |  round(e.est_decayed - t.true_decayed, 4) AS overcount
        |FROM est e JOIN tru t ON e.event_type = t.event_type
        |  AND e.probe = t.probe
        |ORDER BY e.event_type, e.probe""".stripMargin,

    // decayed HLL: per-day registers rebuilt from the same md5 hashes,
    // suffix unions merged by register max (exact integers), estimates
    // fixed-pointed at x10^4 and forward-weighted by 2^day as exact
    // decimals (the t117 mass discipline applied to ESTIMATES; the
    // double products m4*2^e / cnt*2^b are integer-times-power-of-2, so
    // they are exact shifts far under 2^53) — one final division chain
    // lands the round-4 values. true_decayed weights each user by
    // 2^(last_day - 30) exactly.
    "t119_hll_decayed" ->
      s"""WITH ev AS (SELECT event_type, cast(user_id as varchar) AS uid,
         |    ts FROM events WHERE user_id IS NOT NULL),
         |bk AS (SELECT event_type, uid,
         |    cast(floor((epoch_us(ts) - 1704067200000000)
         |      / 86400000000.0) as bigint) AS b
         |  FROM ev),
         |reg AS (SELECT event_type, b, h // 2251799813685248 AS j,
         |    max(CASE WHEN h % 2251799813685248 = 0 THEN 52
         |      ELSE 52 - length(ltrim(bin(h % 2251799813685248),'0')) END)
         |      AS mr
         |  FROM (SELECT DISTINCT event_type, b,
         |      ('0x'||substr(md5(uid),1,15))::bigint AS h FROM bk)
         |  GROUP BY 1, 2, 3),
         |epochs AS (SELECT DISTINCT event_type, b AS e FROM reg),
         |suf AS (SELECT ep.event_type, ep.e, r.j, max(r.mr) AS mr
         |  FROM epochs ep JOIN reg r ON r.event_type = ep.event_type
         |    AND r.b >= ep.e
         |  GROUP BY 1, 2, 3),
         |agg AS (SELECT event_type, e,
         |    cast(512 - count(*) as bigint) AS v,
         |    cast((512 - count(*)) * (1::bigint << 52)
         |      + sum((1::bigint << (52 - mr))) as bigint) AS s
         |  FROM suf GROUP BY 1, 2),
         |est AS (SELECT event_type, e,
         |    round((CASE WHEN $hllRawNum9 / s <= 1280.0 AND v > 0
         |      THEN 512*ln(512.0/v)
         |      ELSE $hllRawNum9 / s END) * 10000.0, 0)::bigint AS s4
         |  FROM agg),
         |diffs AS (SELECT event_type, e, s4,
         |    greatest(s4 - lead(s4, 1, 0)
         |      OVER (PARTITION BY event_type ORDER BY e), 0) AS m4
         |  FROM est),
         |card AS (SELECT event_type, count(*) AS n_epochs,
         |    sum(cast(m4 * pow(2.0, e) as decimal(38,0))) AS cm
         |  FROM diffs GROUP BY 1),
         |rowsm AS (SELECT event_type,
         |    sum(cast(cnt * pow(2.0, b) as decimal(38,0))) AS rm
         |  FROM (SELECT event_type, b, count(*) AS cnt FROM bk
         |    GROUP BY 1, 2) GROUP BY 1),
         |tru AS (SELECT event_type,
         |    round(cast(sum(cast(pow(2.0, lb) as decimal(38,0)))
         |        as double) / 1073741824.0, 4) AS true_decayed
         |  FROM (SELECT event_type, uid, max(b) AS lb FROM bk
         |    GROUP BY 1, 2) GROUP BY 1)
         |SELECT c.event_type, c.n_epochs,
         |  round(cast(r.rm as double) / 1073741824.0, 4) AS rows_decayed,
         |  round(cast(c.cm as double) / 1073741824.0 / 10000.0, 4)
         |    AS est_decayed,
         |  t.true_decayed
         |FROM card c
         |JOIN rowsm r ON r.event_type = c.event_type
         |JOIN tru t ON t.event_type = c.event_type
         |ORDER BY c.event_type""".stripMargin,

    // Morton z-value: bit i of x lands at 2i, of y at 2i+1 — the oracle
    // replays the interleave shift-for-shift with integer bit ops
    "t86_zvalue" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber,
        |    cast(l_partkey % 256 as bigint) AS x,
        |    cast(l_suppkey % 256 as bigint) AS y
        |  FROM lineitem WHERE l_orderkey < 600)
        |SELECT cast(l_orderkey as bigint) AS l_orderkey, l_linenumber,
        | x, y,
        | cast((((x >> 0) & 1) << 0)|(((x >> 1) & 1) << 2)
        |  |(((x >> 2) & 1) << 4)|(((x >> 3) & 1) << 6)
        |  |(((x >> 4) & 1) << 8)|(((x >> 5) & 1) << 10)
        |  |(((x >> 6) & 1) << 12)|(((x >> 7) & 1) << 14)
        |  |(((y >> 0) & 1) << 1)|(((y >> 1) & 1) << 3)
        |  |(((y >> 2) & 1) << 5)|(((y >> 3) & 1) << 7)
        |  |(((y >> 4) & 1) << 9)|(((y >> 5) & 1) << 11)
        |  |(((y >> 6) & 1) << 13)|(((y >> 7) & 1) << 15) as bigint)
        |  AS zvalue
        |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // JL sign projection: the ±1 matrix rebuilds from md5(seed:i:j) and
    // list_dot_product's sequential loop reproduces the Spark fold's
    // double accumulation order exactly (the t06 discipline)
    "t87_random_projection" ->
      """WITH sj AS (SELECT j,
        |    [CASE WHEN ('0x'||substr(md5('jl:'||cast(i as varchar)||':'
        |        ||cast(j as varchar)),1,15))::bigint % 2 = 0
        |      THEN 1.0 ELSE -1.0 END for i in range(64)] AS sgns
        |  FROM (SELECT unnest(range(16)) AS j)),
        |q AS (SELECT vec_id, cast(embedding as double[]) AS e
        |  FROM embeddings WHERE vec_id < 100)
        |SELECT cast(q.vec_id as bigint) AS vec_id, cast(sj.j as int) AS j,
        | round(list_dot_product(q.e, sj.sgns)/sqrt(16.0), 4) AS proj_value
        |FROM q CROSS JOIN sj ORDER BY vec_id, j""".stripMargin,

    // funnel: stage k = the earliest stage-k event STRICTLY after the
    // user's stage k-1 time — replayed as a chain of correlated
    // min-joins (the range-join formulation against the one-exchange
    // running-window implementation, the t70 discipline)
    "t88_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t0
        |  WHERE e.event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'error' GROUP BY 1)
        |SELECT cast(s0.user_id as bigint) AS user_id,
        | cast(epoch_us(t0) as bigint) AS signup_us,
        | cast(epoch_us(t1) as bigint) AS view_us,
        | cast(epoch_us(t2) as bigint) AS purchase_us,
        | cast(epoch_us(t3) as bigint) AS error_us,
        | cast(1 + (t1 IS NOT NULL)::int + (t2 IS NOT NULL)::int
        |   + (t3 IS NOT NULL)::int as int) AS stages_reached
        |FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
        |LEFT JOIN s2 ON s0.user_id = s2.user_id
        |LEFT JOIN s3 ON s0.user_id = s3.user_id
        |ORDER BY user_id""".stripMargin,

    // sampled quantiles: the bottom-128-by-md5-hash sample is exactly
    // reproducible (same hashes, min-value tiebreak on collisions), and
    // DuckDB's quantile_cont interpolates identically to Spark's
    // percentile (the t36 contract) — so an approximate percentile
    // checks exactly
    "t89_sample_quantiles" ->
      """WITH h AS (SELECT event_type,
        |    ('0x'||substr(md5(cast(event_id as varchar)),1,15))::bigint
        |      AS h,
        |    min(value) AS v
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT event_type, h, v, row_number() OVER (
        |    PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |c AS (SELECT event_type, count(*) AS n_rows FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL GROUP BY 1),
        |q AS (SELECT event_type, count(*) AS n_sample,
        |    quantile_cont(v, [0.25, 0.5, 0.9]) AS qs
        |  FROM r WHERE rn <= 128 GROUP BY 1)
        |SELECT q.event_type, c.n_rows,
        | cast(n_sample as bigint) AS n_sample,
        | round(qs[1], 4) AS p_25, round(qs[2], 4) AS p_50,
        | round(qs[3], 4) AS p_90
        |FROM q JOIN c USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // CUBE: all four grouping combinations; GROUPING() shares the
    // first-column-in-the-MSB bit convention with Spark's
    // grouping_id (verified empirically, both engines)
    "t90_cube_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(GROUPING(l_returnflag, l_linestatus) as bigint) AS gid,
        | count(*) AS n,
        | round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 4)
        |   AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    // the analytic-window surface over one shared (partition, order)
    "t91_window_surface" ->
      """SELECT event_type, cast(event_id as bigint) AS event_id,
        | cast(epoch_us(ts) as bigint) AS ts_us,
        | cast(row_number() OVER w as int) AS rn,
        | cast(ntile(4) OVER w as int) AS tile,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd,
        | round(lag(value, 1) OVER w, 4) AS prev_value,
        | round(lead(value, 1) OVER w, 4) AS next_value,
        | round(first_value(value) OVER w, 4) AS first_value
        |FROM events WHERE user_id <= 3
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |ORDER BY event_type, rn""".stripMargin,

    // PIVOT = the conditional aggregate it compiles to
    "t92_pivot" ->
      """SELECT cast(user_id as bigint) AS user_id,
        | round(cast(sum(CASE WHEN event_type = 'click'
        |   THEN cast(value as decimal(18,4)) END) as double), 4) AS click,
        | round(cast(sum(CASE WHEN event_type = 'error'
        |   THEN cast(value as decimal(18,4)) END) as double), 4) AS error,
        | round(cast(sum(CASE WHEN event_type = 'purchase'
        |   THEN cast(value as decimal(18,4)) END) as double), 4)
        |   AS purchase,
        | round(cast(sum(CASE WHEN event_type = 'signup'
        |   THEN cast(value as decimal(18,4)) END) as double), 4) AS signup,
        | round(cast(sum(CASE WHEN event_type = 'view'
        |   THEN cast(value as decimal(18,4)) END) as double), 4) AS view
        |FROM events WHERE user_id <= 30
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // calendar gap-fill + forward fill: dense date grid x types, daily
    // sums left-joined on, missing days carry last_value IGNORE NULLS
    "t93_gap_fill" ->
      """WITH daily AS (SELECT event_type, ts::date AS day,
        |    cast(sum(cast(value as decimal(18,4))) as double) AS rev
        |  FROM events WHERE user_id <= 3 GROUP BY 1, 2),
        |cal AS (SELECT unnest(generate_series(
        |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
        |    INTERVAL 1 DAY))::date AS day),
        |grid AS (SELECT t.event_type, cal.day
        |  FROM cal CROSS JOIN (SELECT DISTINCT event_type FROM daily) t)
        |SELECT g.event_type, strftime(g.day, '%Y-%m-%d') AS day,
        | round(d.rev, 4) AS rev,
        | round(last_value(d.rev IGNORE NULLS) OVER (
        |   PARTITION BY g.event_type ORDER BY g.day), 4) AS rev_filled
        |FROM grid g LEFT JOIN daily d
        |  ON g.event_type = d.event_type AND g.day = d.day
        |ORDER BY g.event_type, g.day""".stripMargin,

    // pivot round trip: unpivot(pivot(x)) must equal the direct
    // two-key aggregate — so the oracle IS that aggregate
    "t94_unpivot" ->
      """SELECT cast(user_id as bigint) AS user_id, event_type,
        | round(cast(sum(cast(value as decimal(18,4))) as double), 4)
        |   AS spend
        |FROM events WHERE user_id <= 30
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // blocked fuzzy join: the composite (3-char prefix,
    // floor(length/4) bucket) key with the probe side expanded to
    // adjacent buckets, then the same levenshtein (classic unit-cost
    // edit distance in both engines) — the anchor side carries one key
    // and the three expanded keys are distinct, so each pair matches
    // exactly once. DELIBERATELY replayed at the id level with no
    // distinct-name collapse: a hash match proves the Spark side's
    // distinct-names-then-id-reconstruction is lossless
    "t95_edit_distance_join" ->
      """WITH base AS (SELECT p_partkey AS id, lower(p_name) AS name
        |  FROM part WHERE p_partkey % 4 = 0),
        |pl AS (SELECT id + 100000 AS id,
        |    substr(name, 1, 3) || substr(name, 5) AS name FROM base),
        |k AS (SELECT id, name, substr(name, 1, 3) AS pfx,
        |    length(name) // 4 AS lb
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM pl)),
        |b AS (SELECT k.id, k.name, k.pfx, k.lb + d.d AS lbk
        |  FROM k CROSS JOIN (VALUES (-1), (0), (1)) d(d))
        |SELECT cast(x.id as bigint) AS id_a, cast(y.id as bigint) AS id_b,
        | cast(levenshtein(x.name, y.name) as int) AS edit_dist
        |FROM k x JOIN b y ON x.pfx = y.pfx AND x.lb = y.lbk
        |  AND x.id < y.id
        |  AND levenshtein(x.name, y.name) BETWEEN 1 AND 2
        |ORDER BY id_a, id_b""".stripMargin,

    // JSON extraction: DuckDB's json_extract replays the same path
    "t96_json_extract" ->
      """SELECT cast(json_extract(props, '$.k')::int % 10 as int)
        |   AS k_bucket,
        | count(*) AS n,
        | round(cast(sum(cast(value as decimal(18,4))) as double), 4)
        |   AS spend,
        | cast(min(json_extract(props, '$.k')::int) as int) AS k_min,
        | cast(max(json_extract(props, '$.k')::int) as int) AS k_max
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // cohort retention: first-signup week x weeks-since activity —
    // date_trunc('week') is Monday-start in both engines
    "t97_cohort_retention" ->
      """WITH c AS (SELECT user_id, min(date_trunc('week', ts)) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
        |  FROM events)
        |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
        | cast(date_diff('day', c.cw::date, a.aw::date) // 7 as int)
        |   AS weeks_since,
        | count(distinct c.user_id) AS n_users
        |FROM c JOIN a ON c.user_id = a.user_id AND a.aw >= c.cw
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // degree-ordered triangle counting on the co-purchase graph: the
    // oracle replays the orientation and the three-way path join
    "t98_triangles" ->
      """WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  WHERE a.l_orderkey < 600 AND b.l_orderkey < 600),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u, count(*) AS deg FROM und GROUP BY 1),
        |ori AS (SELECT
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
        |      THEN e.u ELSE e.v END AS s,
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
        |      THEN e.v ELSE e.u END AS t
        |  FROM e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u),
        |tri AS (SELECT p1.s AS a, p1.t AS b, p2.t AS c
        |  FROM ori p1 JOIN ori p2 ON p1.t = p2.s
        |  JOIN ori p3 ON p3.s = p1.s AND p3.t = p2.t)
        |SELECT cast(node as bigint) AS node, count(*) AS n_triangles
        |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // quantized PageRank, 3 unrolled iterations: contributions
    // TRUNCATION-quantized onto the 1e-9 grid and summed as exact
    // bigints — trunc, not round (quantized inputs land on rounding
    // midpoints constantly and engines' tie-breaking diverges) and
    // trunc, not floor (Spark's floor(double) is BigDecimal/toString-
    // based and can round UP across an integer boundary; binary
    // truncation is identical in both engines)
    "t99_pagerank" ->
      """WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  WHERE a.l_orderkey < 600 AND b.l_orderkey < 600),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u, count(*) AS deg FROM und GROUP BY 1),
        |pr0 AS (SELECT u AS node, cast(1.0 as double) AS pr FROM deg),
        |it1 AS (SELECT d.u AS node,
        |    cast(cast(trunc((0.15::double + 0.85::double *
        |      (cast(coalesce(s.si, 0) as double) / 1e9)) * 1e9)
        |      as bigint) as double) / 1e9 AS pr
        |  FROM deg d LEFT JOIN (
        |    SELECT und.v AS node,
        |      sum(cast(trunc(p.pr / dg.deg * 1e9) as bigint)) AS si
        |    FROM und JOIN pr0 p ON und.u = p.node
        |    JOIN deg dg ON und.u = dg.u
        |    GROUP BY 1) s ON d.u = s.node),
        |it2 AS (SELECT d.u AS node,
        |    cast(cast(trunc((0.15::double + 0.85::double *
        |      (cast(coalesce(s.si, 0) as double) / 1e9)) * 1e9)
        |      as bigint) as double) / 1e9 AS pr
        |  FROM deg d LEFT JOIN (
        |    SELECT und.v AS node,
        |      sum(cast(trunc(p.pr / dg.deg * 1e9) as bigint)) AS si
        |    FROM und JOIN it1 p ON und.u = p.node
        |    JOIN deg dg ON und.u = dg.u
        |    GROUP BY 1) s ON d.u = s.node),
        |it3 AS (SELECT d.u AS node,
        |    cast(cast(trunc((0.15::double + 0.85::double *
        |      (cast(coalesce(s.si, 0) as double) / 1e9)) * 1e9)
        |      as bigint) as double) / 1e9 AS pr
        |  FROM deg d LEFT JOIN (
        |    SELECT und.v AS node,
        |      sum(cast(trunc(p.pr / dg.deg * 1e9) as bigint)) AS si
        |    FROM und JOIN it2 p ON und.u = p.node
        |    JOIN deg dg ON und.u = dg.u
        |    GROUP BY 1) s ON d.u = s.node)
        |SELECT cast(node as bigint) AS node, pr FROM it3
        |ORDER BY node""".stripMargin,

    // Hilbert index: the oracle replays the per-bit reflect/transpose
    // state machine as a recursive CTE (one iteration per bit level,
    // s = 128 … 1); the quadrant digit (3·rx)^ry is spelled as a CASE
    // so neither engine needs an xor operator
    "t100_hilbert" ->
      """WITH RECURSIVE b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    cast(l_partkey % 256 as bigint) AS x0,
        |    cast(l_suppkey % 256 as bigint) AS y0
        |  FROM lineitem WHERE l_orderkey < 600),
        |h AS (
        |  SELECT l_orderkey, l_linenumber, x0, y0, x0 AS x, y0 AS y,
        |    cast(0 as bigint) AS d, cast(128 as bigint) AS s
        |  FROM b
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, x0, y0,
        |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - y ELSE y END)
        |         ELSE x END,
        |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - x ELSE x END)
        |         ELSE y END,
        |    d + s * s * (CASE WHEN rx = 0 AND ry = 0 THEN 0
        |                      WHEN rx = 0 AND ry = 1 THEN 1
        |                      WHEN rx = 1 AND ry = 1 THEN 2 ELSE 3 END),
        |    s // 2
        |  FROM (SELECT *,
        |      CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
        |      CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
        |    FROM h WHERE s > 0) t)
        |SELECT cast(l_orderkey as bigint) AS l_orderkey, l_linenumber,
        |  x0 AS x, y0 AS y, d AS hvalue
        |FROM h WHERE s = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Count-Min: every counter is an exact integer — the oracle rebuilds
    // the 4x32 grid from the same md5-derived buckets and replays the
    // min-of-rows estimate cell-for-cell
    "t101_count_min" ->
      """WITH ev AS (SELECT event_type, cast(user_id as varchar) AS uid
        |  FROM events WHERE user_id IS NOT NULL),
        |cells AS (SELECT event_type, r.i AS row,
        |    ('0x'||substr(md5('cms:'||cast(r.i as varchar)||':'||uid),1,15))
        |      ::bigint % 32 AS bucket,
        |    count(*) AS cnt
        |  FROM ev CROSS JOIN range(4) r(i)
        |  GROUP BY 1, 2, 3),
        |probes AS (SELECT DISTINCT event_type, uid AS probe FROM ev
        |  WHERE cast(uid as bigint) < 40),
        |est AS (SELECT p.event_type, p.probe,
        |    min(coalesce(c.cnt, 0)) AS est_count
        |  FROM probes p CROSS JOIN range(4) r(i)
        |  LEFT JOIN cells c ON c.event_type = p.event_type AND c.row = r.i
        |    AND c.bucket = ('0x'||substr(md5('cms:'||cast(r.i as varchar)
        |      ||':'||p.probe),1,15))::bigint % 32
        |  GROUP BY 1, 2),
        |tru AS (SELECT event_type, uid AS probe, count(*) AS true_count
        |  FROM ev GROUP BY 1, 2)
        |SELECT e.event_type, e.probe, e.est_count, t.true_count,
        |  e.est_count - t.true_count AS overcount
        |FROM est e JOIN tru t ON e.event_type = t.event_type
        |  AND e.probe = t.probe
        |ORDER BY e.event_type, e.probe""".stripMargin,

    // linear classifier inference: the md5-derived weight table rebuilds
    // term-for-term; tf*weight products are exact decimals, the sigmoid
    // runs in double on the exact sum and rounds to 6 (exp/log parity —
    // the t85 precedent)
    "t102_linear_score" ->
      """WITH toks AS (SELECT d.doc_id, t.tok AS term
        |  FROM documents d, unnest(string_split_regex(lower(trim(d.text)),
        |    '\s+')) AS t(tok)
        |  WHERE t.tok <> ''),
        |w AS (SELECT DISTINCT term,
        |    cast(cast(('0x'||substr(md5(term),1,8))::bigint % 2001 - 1000
        |      as decimal(18,9)) / 1000 as decimal(18,9)) AS weight
        |  FROM toks WHERE doc_id < 20),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE doc_id < 300 GROUP BY 1, 2),
        |sc AS (SELECT tf.doc_id, count(*) AS n_hit_terms,
        |    sum(cast(tf.tf * w.weight as decimal(27,12))) AS raw
        |  FROM tf JOIN w USING (term) GROUP BY 1)
        |SELECT d.doc_id, coalesce(sc.n_hit_terms, 0) AS n_hit_terms,
        |  round(coalesce(cast(sc.raw as double), 0) + 0.25, 6) AS score,
        |  round(1.0 / (1.0 + exp(-(coalesce(cast(sc.raw as double), 0)
        |    + 0.25))), 6) AS prob
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |WHERE d.doc_id < 300
        |ORDER BY d.doc_id""".stripMargin,

    // hard negatives: rank, margin and the semi-hard flag all derive
    // from 4-dp ROUNDED cosines (ties broken by neighbor id), so no
    // unrounded last-ulp comparison can flip a row cross-engine
    "t103_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS nid, embedding AS ce, label AS cl
        |  FROM embeddings),
        |s AS (SELECT qid, nid, cl, ql,
        |    round(list_cosine_similarity(cast(qe as double[]),
        |      cast(ce as double[])), 4) AS cos
        |  FROM q JOIN c ON qid <> nid),
        |p AS (SELECT qid, max(cos) AS pos_cosine FROM s WHERE cl = ql
        |  GROUP BY 1),
        |r AS (SELECT qid, nid, cl, cos, row_number() OVER (
        |    PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        |  FROM s WHERE cl <> ql)
        |SELECT cast(r.qid as bigint) AS query_id,
        |  cast(r.rnk as bigint) AS "rank",
        |  cast(r.nid as bigint) AS neighbor_id,
        |  cast(r.cl as bigint) AS neighbor_label,
        |  r.cos AS cosine, p.pos_cosine,
        |  round(p.pos_cosine - r.cos, 4) AS margin,
        |  p.pos_cosine > r.cos AS semihard
        |FROM r LEFT JOIN p ON r.qid = p.qid
        |WHERE r.rnk <= 5
        |ORDER BY query_id, "rank"""".stripMargin,

    // script profile: one char per class match, so length-minus-replaced
    // IS the count; explicit BMP ranges count identically in Java regex
    // and RE2 (DuckDB needs the 'g' flag — default replaces first only)
    "t104_script_profile" ->
      """WITH p AS (SELECT doc_id,
        |  cast(coalesce(length(text) - length(regexp_replace(text,
        |    '[A-Za-z\x{C0}-\x{D6}\x{D8}-\x{F6}\x{F8}-\x{24F}\x{1E00}-\x{1EFF}]',
        |    '', 'g')), 0) as bigint) AS n_latin,
        |  cast(coalesce(length(text) - length(regexp_replace(text,
        |    '[\x{4E00}-\x{9FFF}]', '', 'g')), 0) as bigint) AS n_cjk,
        |  cast(coalesce(length(text) - length(regexp_replace(text,
        |    '[\x{0400}-\x{04FF}]', '', 'g')), 0) as bigint) AS n_cyrillic,
        |  cast(coalesce(length(text) - length(regexp_replace(text,
        |    '[\x{0600}-\x{06FF}]', '', 'g')), 0) as bigint) AS n_arabic,
        |  cast(coalesce(length(text) - length(regexp_replace(text,
        |    '[0-9]', '', 'g')), 0) as bigint) AS n_digit,
        |  cast(coalesce(length(text) - length(regexp_replace(text,
        |    '[ \t\n\x{0B}\f\r]', '', 'g')), 0) as bigint) AS n_space,
        |  cast(coalesce(length(text), 0) as bigint) AS n_chars
        |  FROM documents),
        |g AS (SELECT *, greatest(n_latin, n_cjk, n_cyrillic, n_arabic)
        |    AS m FROM p)
        |SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_arabic, n_digit,
        |  n_space, n_chars,
        |  n_chars - n_latin - n_cjk - n_cyrillic - n_arabic - n_digit
        |    - n_space AS n_other,
        |  CASE WHEN m = 0 THEN 'none'
        |       WHEN n_latin = m THEN 'latin'
        |       WHEN n_cjk = m THEN 'cjk'
        |       WHEN n_cyrillic = m THEN 'cyrillic'
        |       ELSE 'arabic' END AS dominant_script
        |FROM g ORDER BY doc_id""".stripMargin,

    // positive pairs: t14's recursive connected components, self-joined
    // within cluster (anchor < positive) with the cluster size
    "t105_positive_pairs" ->
      ("WITH RECURSIVE " + minhashLshCtes + """,
        |edges AS (SELECT id_a, id_b FROM j
        |  WHERE (CASE WHEN uu = 0 THEN 0.0 ELSE ii/uu END) >= 0.5),
        |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION SELECT id_b, id_a FROM edges),
        |reach AS (SELECT src AS node, dst AS r FROM sym
        |  UNION SELECT reach.node, s.dst FROM reach
        |    JOIN sym s ON s.src = reach.r),
        |comp AS (SELECT node, least(node, min(r)) AS comp
        |  FROM reach GROUP BY node),
        |cs AS (SELECT comp, count(*) AS cluster_size FROM comp
        |  GROUP BY 1)
        |SELECT cast(a.node as bigint) AS anchor_id,
        |  cast(b.node as bigint) AS positive_id,
        |  cast(a.comp as bigint) AS cluster_id,
        |  cast(cs.cluster_size as bigint) AS cluster_size
        |FROM comp a JOIN comp b ON a.comp = b.comp AND a.node < b.node
        |JOIN cs ON cs.comp = a.comp
        |ORDER BY anchor_id, positive_id""".stripMargin),

    // behavior sequences: recency cut + position + gap all rank on the
    // FULL-precision timestamp (ties by event_id); only the exported
    // epoch/gap floor to seconds (floor, not cast — double->bigint
    // casts round half-even where Spark's unix_timestamp floors)
    "t106_user_sequences" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
        |    cast(floor(epoch(ts)) as bigint) AS sec
        |  FROM events
        |  WHERE user_id IS NOT NULL AND user_id < 50 AND ts IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM e),
        |k AS (SELECT * FROM r WHERE rn <= 5),
        |p AS (SELECT user_id, event_type, sec,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS pos,
        |    sec - lag(sec) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS gap_seconds
        |  FROM k)
        |SELECT cast(user_id as bigint) AS user_id,
        |  cast(pos as bigint) AS pos, event_type AS value,
        |  sec AS ts_epoch, gap_seconds
        |FROM p ORDER BY user_id, pos""".stripMargin,

    // volume anomaly: integer daily counts make the trailing moments
    // exact — n*sumsq - sum^2 is an exact integer, sd/z are single IEEE
    // ops on it, and FALSE AND NULL = FALSE keeps warm-up rows unflagged
    // in both engines
    "t107_volume_anomaly" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n_events,
        |    count(n_events) OVER win AS n_prior,
        |    sum(n_events) OVER win AS s,
        |    sum(n_events * n_events) OVER win AS sq
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |c AS (SELECT *,
        |    CASE WHEN n_prior > 0
        |      THEN cast(s as double) / n_prior END AS mean,
        |    CASE WHEN n_prior > 1
        |      THEN sqrt(cast(n_prior * sq - s * s as double) /
        |        (n_prior * (n_prior - 1))) END AS sd
        |  FROM w)
        |SELECT event_type, day, n_events, cast(n_prior as bigint)
        |    AS n_prior,
        |  CASE WHEN sd > 0 THEN round((n_events - mean) / sd, 4) END AS z,
        |  (n_prior >= 3 AND CASE WHEN sd > 0
        |     THEN abs(n_events - mean) > 3.0 * sd
        |     ELSE n_events <> mean END) AS anomaly,
        |  round(mean, 4) AS mean_prior
        |FROM c ORDER BY event_type, day""".stripMargin,

    // transition matrix: lag over the same (ts, event_id) total order,
    // exact integer counts, one IEEE division per row
    "t108_transition_matrix" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |p AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM e),
        |c AS (SELECT prev_type, next_type, count(*) AS n_transitions
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, sum(n_transitions) AS total FROM c
        |  GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n_transitions,
        |  round(cast(c.n_transitions as double) / t.total, 6) AS prob
        |FROM c JOIN t ON c.prev_type = t.prev_type
        |ORDER BY c.prev_type, c.next_type""".stripMargin,

    // next-event examples: t106's recency cut + a running string_agg
    // prefix over the same total order — both engines concatenate the
    // identical ordered values
    "t109_next_event_examples" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts
        |  FROM events
        |  WHERE user_id IS NOT NULL AND user_id < 50 AND ts IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM e),
        |k AS (SELECT * FROM r WHERE rn <= 5),
        |p AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS pos,
        |    string_agg(event_type, '>') OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix
        |  FROM k)
        |SELECT cast(user_id as bigint) AS user_id,
        |  cast(pos as bigint) AS pos, prefix, event_type AS label
        |FROM p WHERE pos >= 2
        |ORDER BY user_id, pos""".stripMargin,

    // ancestor closure: the level iteration replayed as a recursive CTE
    // with the same min-depth canonicalization; ancestors chain only
    // through nodes that exist as children (both engines build the edge
    // set from the same customer rows)
    "t110_ancestor_closure" ->
      """WITH RECURSIVE e AS (SELECT cast(c_custkey as bigint) AS node,
        |    cast(c_custkey // 10 as bigint) AS anc
        |  FROM customer WHERE c_custkey >= 10),
        |cl AS (SELECT node, anc AS ancestor, cast(1 as bigint) AS depth
        |  FROM e
        |  UNION ALL
        |  SELECT cl.node, e.anc, cl.depth + 1
        |  FROM cl JOIN e ON cl.ancestor = e.node)
        |SELECT node, ancestor, min(depth) AS depth
        |FROM cl GROUP BY 1, 2
        |ORDER BY node, ancestor""".stripMargin,

    // subtree rollup: the t110 closure + self-membership, decimal-exact
    // sums, double cast + round only at export (the q01 discipline)
    "t111_subtree_rollup" ->
      """WITH RECURSIVE e AS (SELECT cast(c_custkey as bigint) AS node,
        |    cast(c_custkey // 10 as bigint) AS anc
        |  FROM customer WHERE c_custkey >= 10),
        |cl AS (SELECT node, anc AS ancestor, cast(1 as bigint) AS depth
        |  FROM e
        |  UNION ALL
        |  SELECT cl.node, e.anc, cl.depth + 1
        |  FROM cl JOIN e ON cl.ancestor = e.node),
        |mind AS (SELECT node, ancestor FROM cl GROUP BY 1, 2),
        |v AS (SELECT cast(c_custkey as bigint) AS vid,
        |    cast(c_acctbal as decimal(27,4)) AS val FROM customer),
        |m AS (SELECT vid AS ancestor, vid FROM v
        |  UNION ALL SELECT ancestor, node AS vid FROM mind)
        |SELECT m.ancestor, count(*) AS n_members,
        |  round(cast(sum(v.val) as double), 4) AS total
        |FROM m JOIN v ON m.vid = v.vid
        |GROUP BY 1 ORDER BY m.ancestor""".stripMargin,

    // retention labels: lead over the same full-precision total order,
    // label arithmetic on floored seconds (the t106 discipline)
    "t112_retention_labels" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    cast(floor(epoch(ts)) as bigint) AS sec
        |  FROM events
        |  WHERE user_id IS NOT NULL AND user_id < 50 AND ts IS NOT NULL),
        |l AS (SELECT user_id, event_id, sec,
        |    lead(sec) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM e)
        |SELECT cast(user_id as bigint) AS user_id,
        |  cast(event_id as bigint) AS event_id, sec AS ts_epoch,
        |  (nxt IS NOT NULL AND nxt - sec <= 21600) AS label
        |FROM l ORDER BY user_id, event_id""".stripMargin,

    // KMV set difference: the t75 sketch CTEs, then per pair the
    // merged-sample elements seen only in one side's k-min set, scaled
    // by the union estimate — same membership rule, same two IEEE
    // divisions, exact below fill
    "t113_kmv_difference" ->
      """WITH d AS (SELECT lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS ngram
        |  FROM d WHERE len(t) >= 2),
        |h AS (SELECT DISTINCT lang,
        |    ('0x'||substr(md5(ngram),1,15))::bigint AS h FROM g),
        |r AS (SELECT lang, h, row_number() OVER (
        |    PARTITION BY lang ORDER BY h) AS rn FROM h),
        |sk AS (SELECT lang, h FROM r WHERE rn <= 64),
        |langs AS (SELECT DISTINCT lang FROM sk),
        |p AS (SELECT a.lang AS g_a, b.lang AS g_b
        |  FROM langs a JOIN langs b ON a.lang < b.lang),
        |md AS (SELECT DISTINCT p.g_a, p.g_b, s.h
        |  FROM p JOIN sk s ON s.lang IN (p.g_a, p.g_b)),
        |mr AS (SELECT g_a, g_b, h, row_number() OVER (
        |    PARTITION BY g_a, g_b ORDER BY h) AS rn FROM md),
        |mm AS (SELECT * FROM mr WHERE rn <= 64),
        |ms AS (SELECT g_a, g_b, count(*) AS msize,
        |    max(CASE WHEN rn = 64 THEN h END) AS kth
        |  FROM mm GROUP BY 1, 2),
        |ao AS (SELECT mm.g_a, mm.g_b, count(*) AS aonly
        |  FROM mm
        |  JOIN sk sa ON sa.lang = mm.g_a AND sa.h = mm.h
        |  WHERE NOT EXISTS (SELECT 1 FROM sk sb
        |    WHERE sb.lang = mm.g_b AND sb.h = mm.h)
        |  GROUP BY 1, 2),
        |bo AS (SELECT mm.g_a, mm.g_b, count(*) AS bonly
        |  FROM mm
        |  JOIN sk sb ON sb.lang = mm.g_b AND sb.h = mm.h
        |  WHERE NOT EXISTS (SELECT 1 FROM sk sa
        |    WHERE sa.lang = mm.g_a AND sa.h = mm.h)
        |  GROUP BY 1, 2)
        |SELECT ms.g_a, ms.g_b,
        | cast(coalesce(ao.aonly, 0) as bigint) AS n_a_only_kmin,
        | cast(coalesce(bo.bonly, 0) as bigint) AS n_b_only_kmin,
        | round(coalesce(ao.aonly, 0)::double / msize::double *
        |   (CASE WHEN msize < 64 THEN msize::double
        |    ELSE 63.0 * 1152921504606846976.0 / kth::double END), 4)
        |   AS est_a_minus_b,
        | round(coalesce(bo.bonly, 0)::double / msize::double *
        |   (CASE WHEN msize < 64 THEN msize::double
        |    ELSE 63.0 * 1152921504606846976.0 / kth::double END), 4)
        |   AS est_b_minus_a
        |FROM ms LEFT JOIN ao USING (g_a, g_b)
        |LEFT JOIN bo USING (g_a, g_b)
        |ORDER BY g_a, g_b""".stripMargin,

    // near-name canonicalization: the t95 composite blocking on
    // distinct names, the recursive reachability closure (the t105
    // discipline on names), min-name-including-self canonical labels,
    // and the id-level mapping — all replayed
    "t114_canonical_names" ->
      """WITH RECURSIVE base AS (
        |  SELECT p_partkey AS id, lower(p_name) AS name
        |  FROM part WHERE p_partkey % 4 = 0),
        |pl AS (SELECT id + 100000 AS id,
        |    substr(name, 1, 3) || substr(name, 5) AS name FROM base),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        |k AS (SELECT name, substr(name, 1, 3) AS pfx,
        |    length(name) // 4 AS lb
        |  FROM (SELECT DISTINCT name FROM u)),
        |b AS (SELECT k.name, k.pfx, k.lb + d.d AS lbk
        |  FROM k CROSS JOIN (VALUES (-1), (0), (1)) d(d)),
        |e AS (SELECT x.name AS na, y.name AS nb
        |  FROM k x JOIN b y ON x.pfx = y.pfx AND x.lb = y.lbk
        |    AND x.name < y.name
        |    AND levenshtein(x.name, y.name) BETWEEN 1 AND 2),
        |sym AS (SELECT na AS src, nb AS dst FROM e
        |  UNION SELECT nb, na FROM e),
        |reach AS (SELECT src AS node, dst AS r FROM sym
        |  UNION SELECT reach.node, s.dst FROM reach
        |    JOIN sym s ON s.src = reach.r),
        |comp AS (SELECT node, least(node, min(r)) AS canon
        |  FROM reach GROUP BY node)
        |SELECT cast(u.id as bigint) AS id, u.name,
        | coalesce(comp.canon, u.name) AS canonical_name
        |FROM u LEFT JOIN comp ON comp.node = u.name
        |ORDER BY id""".stripMargin,
  )

  val all: Map[String, String] = {
    val base = core ++ coreExtra ++ data
    // q52/q53 write the q51 snapshot out as CSV / JSON-lines and read it
    // back, so a lossless round trip hashes equal to q51's own oracle —
    // the oracle SQL is deliberately the same; only the Spark side pays
    // the egress trip
    base ++ Map(
      "q52_csv_egress" -> base("q51_client_territory_spend"),
      "q53_json_egress" -> base("q51_client_territory_spend"),
      // t115 runs t70's semantics through the chunked carry — the
      // oracle is DELIBERATELY t70's independent range-join + top-1
      // SQL verbatim: a hash match proves chunking changes nothing
      "t115_asof_chunked" -> base("t70_asof_join"),
      // t118 runs t110's closure through path doubling — the oracle is
      // DELIBERATELY t110's recursive-CTE SQL verbatim: a hash match
      // proves the log-rounds form agrees pair-for-pair, depth-for-depth
      "t118_closure_doubling" -> base("t110_ancestor_closure"),
      // q55 writes the same snapshot as ORC and reads it back — the
      // typed-columnar round trip must hash equal to q51's own oracle
      "q55_orc_egress" -> base("q51_client_territory_spend"),
      // q54 writes orders month-partitioned and re-aggregates the q50
      // window from the partition tree — same oracle as the read twin
      "q54_partitioned_egress" -> base("q50_partitioned_source"))
  }
}
