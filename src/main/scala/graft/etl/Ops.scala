package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar column-function library — the §2.8 surface of SURVEY.md.
  *
  * Everything here is a composition of built-in, codegen-friendly
  * `org.apache.spark.sql.functions` — no UDF closures, so whole-stage
  * codegen and parquet pushdown stay intact at 100 TB scale.
  *
  * Reference citations point into /root/reference (read-only T-SQL).
  */
object Ops {

  /** `IIF(LTRIM(RTRIM(x))='',NULL,x)` — empty-after-trim strings become NULL.
    * Ref: 1. Prepare POS to Txn Mapping/PreparePOStoTxnMap_script.sql:71-78. */
  def emptyToNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(c)

  /** Normalize one fingerprint component: `UPPER(LTRIM(RTRIM(ISNULL(x,''))))`.
    * Ref: PreparePOStoTxnMap_script.sql:7-14. */
  def normPart(c: Column): Column = upper(trim(coalesce(c, lit(""))))

  /** Canonical merchant fingerprint — the load-bearing hash of the reference,
    * repeated 7x verbatim there (PreparePOStoTxnMap_script.sql:7-14, 18-25,
    * 54-69, 85-92, 112-127): hash of the concatenation of normalized
    * components. NULL behaves as '' (T-SQL CONCAT/ISNULL semantics).
    *
    * `algo` = "sha1" (reference semantics, HASHBYTES('SHA1',..)) or "md5".
    * Both return lowercase hex — a deterministic join key either way.
    */
  def fingerprint(parts: Seq[Column], algo: String = "sha1"): Column = {
    val canon = concat_ws("|", parts.map(normPart): _*)
    algo match {
      case "sha1" => sha1(canon)
      case "md5"  => md5(canon)
      case other  => sys.error(s"unsupported fingerprint algo: $other")
    }
  }

  /** Strip a leading marker such as the reference's `'REV:'` prefix before
    * fingerprinting (PreparePOStoTxnMap_script.sql:9). */
  def stripPrefix(c: Column, prefix: String): Column =
    when(upper(c).startsWith(prefix.toUpperCase),
      substring(c, prefix.length + 1, Int.MaxValue)).otherwise(c)

  /** Chained literal REPLACEs — billing-group / restaurant-group name
    * canonicalization (BillingGroup_script.sql:19-29,
    * UpdMapDimRest.sql:225-229: 14-deep nested REPLACE chains).
    *
    * Literal `replace` (StringReplace), NOT `regexp_replace`: T-SQL REPLACE
    * is fully literal, and a 14-deep regex chain evaluated on join + group
    * keys was the hottest expression in the whole bench (regex compilation
    * state is also JIT-sensitive — the chain swung 3x between runs). A
    * chained memcmp-style scan is both exact-semantics and several times
    * cheaper per row. */
  def cleanName(c: Column, replacements: Seq[(String, String)]): Column =
    replacements.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** Strip the U+FFFD replacement character
    * (3. Mapping and Cleanup/script.sql:19-23 `REPLACE(col,nchar(65533),'')`). */
  def stripReplacementChar(c: Column): Column =
    replace(c, lit("�"), lit(""))

  /** `RIGHT(CONCAT('0000', x), 4)` — last-4 zero-pad idiom for card numbers
    * (Update and Map Patron Dimensions/script.sql:47, UpdtMapDimPatron.sql:51).
    * NULL input yields '0000' (T-SQL CONCAT treats NULL as ''). */
  def padLast4(c: Column): Column =
    substring(concat(lit("0000"), coalesce(c, lit(""))), -4, 4)

  /** Normalize US zips: '12345-678' -> '12345', 4-digit -> zero-pad to 5,
    * else unchanged (spScript.sql:120-125; UpdMapDimRest.sql:285). */
  def normZip(c: Column): Column =
    when(length(c) === 10 && c.contains("-"), substring_index(c, "-", 1))
      .when(length(c) === 4, lpad(c, 5, "0"))
      .otherwise(c)

  /** Integer DateKey `yyyyMMdd` from a date/timestamp column
    * (script.sql S2:17-18 `cast(format(@date,'yyyyMM01') as int)`).
    * Pure date-field arithmetic, not date_format: the formatter goes
    * through a per-row string render, while year/month/day are integer
    * reads off the internal days-since-epoch representation — same
    * value, several times cheaper on a 100 TB fact scan. */
  def dateKey(c: Column): Column =
    (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("int")

  /** First day of the month of `c`, as DateKey int (yyyyMM01). */
  def monthStartKey(c: Column): Column =
    (year(c) * 10000 + month(c) * 100 + 1).cast("int")

  /** Last day of the month of `c` (T-SQL EOMONTH, S1:47, Seg:74-75). */
  def endOfMonth(c: Column): Column = last_day(c)

  /** Integer-safe ratio `x*1.0/NULLIF(y,0)` (patron_segmentation.sql:166,
    * 178, 257): NULL when the denominator is zero, double otherwise. */
  def safeRatio(num: Column, den: Column): Column =
    when(den === 0, lit(null)).otherwise(num.cast("double") / den.cast("double"))

  /** Validation parse: NULL on unparseable date strings, like
    * `IIF(ISDATE(x)=1, CONVERT(datetime,x), NULL)` (UpdMapDimRest.sql:91-94). */
  def tryDate(c: Column, fmt: String = "yyyy-MM-dd"): Column =
    try_to_timestamp(c, lit(fmt)).cast("date")

  /** Exact-sum helper for doubles: accumulate as DECIMAL(18,4) so the result
    * is independent of partitioning / addition order, then surface as double.
    * At 100 TB a double `sum()` is nondeterministic across runs; decimal
    * accumulation is exact and still whole-stage-codegen'd. */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean via exact decimal sum / count. */
  def exactAvg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)
}
