package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Morton (Z-order) clustering for multi-dimensional
  * file skipping. At 100 TB a table is read through its file/row-group
  * min-max statistics; a linear sort gives perfect pruning on ONE column
  * and none on the others, while a Z-order layout interleaves the bits of
  * k columns so every file covers a small hyper-rectangle — point and box
  * queries on ANY of the k dimensions then touch O(few) files (the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`; Morton 1966).
  *
  * The z-value is pure bit arithmetic on non-negative integer ranks
  * (shift / and / or), so it stays in whole-stage codegen and an external
  * engine replays it term-for-term — and the write path is one
  * `repartitionByRange` exchange (Spark samples range bounds) plus an
  * in-partition sort: no skew pileup because z-values of real keys spread
  * uniformly across the curve.
  */
object Layout {

  /** Morton z-value of `cols`, taking the low `bits` bits of each:
    * bit i of cols(c) lands at interleaved position i*k + c. Inputs
    * MUST already be non-negative integer ranks below 2^bits (callers
    * bucket/rank real keys first — e.g. `pmod(key, 1 << bits)` or a
    * quantile rank); bits*k must stay ≤ 63. The expression is a flat
    * OR-chain of shift/mask terms: fully codegen'd, constant-width,
    * and bit-replayable by any engine with integer shifts. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      "need 1+ cols and bits*k <= 63")
    val k = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as `numFiles` parquet files clustered on the z-value of
    * `zCols` (each reduced mod 2^bits — the caller picks columns whose
    * low bits carry locality, or pre-ranks them). One range exchange on
    * the z-value + an in-partition sort: every output file covers a
    * compact curve segment, so its min-max footer stats are tight on
    * EVERY zCol at once. Returns the read-back frame. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int, numFiles: Int): DataFrame = {
    val z = zValue(zCols.map(c => pmod(col(c), lit(1L << bits))), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Hilbert curve position of two columns (each reduced mod 2^bits):
    * [[graft.functions.CurveKernels.hilbertD]] as a codegen'd native
    * expression. Same contract as [[zValue]] — non-negative ranks in,
    * one long sort key out — but consecutive curve positions are always
    * grid-adjacent (no Morton diagonal seams), so range-partitioned
    * files cover tighter boxes; ScaleSpec measures the difference on
    * the same fixture rather than asserting folklore. 2-D only: the
    * reflect/transpose state machine is dimension-specific, and two
    * clustered dimensions is the common lakehouse case. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "hilbertValue needs bits in [1, 31]")
    graft.functions.HilbertIndexExpr.hilbert_d(
      x.cast("long"), y.cast("long"), bits)
  }

  /** [[writeZOrdered]] with the Hilbert key instead of Morton: one range
    * exchange on the curve position + an in-partition sort. */
  def writeHilbertOrdered(df: DataFrame, path: String, xCol: String,
                          yCol: String, bits: Int, numFiles: Int): DataFrame = {
    val h = hilbertValue(pmod(col(xCol), lit(1L << bits)),
      pmod(col(yCol), lit(1L << bits)), bits)
    df.withColumn("__h", h)
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Per-file min-max stats of `cols` for a written layout — the
    * file-skipping model: a reader prunes any file whose [min, max]
    * range misses the predicate. Grouping key is the physical file
    * (`input_file_name`), so this measures exactly what a footer-stats
    * reader sees. */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("__f", input_file_name())
      .groupBy(col("__f"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
}
