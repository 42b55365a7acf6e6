package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-table max-surrogate-key metadata files — the SURVEY §7.3-7
  * replacement for the reference's scalar max-key subqueries
  * (`@logId = (select max(logid) from ...)` S1:48, `max(BillingGroupKey)`
  * S4:65): at 100 TB a dimension max is still a full column scan per run,
  * and it is the ONE driver-side collect the pipelines kept. The ledger
  * records each table's current max key as a one-line text file
  * (`<dir>/<table>.maxkey`), written atomically (temp + ATOMIC_MOVE, the
  * [[Publish]] discipline) so a concurrent reader never sees a torn
  * value. Reads are O(1); the fallback scan runs only on first contact,
  * and [[recordFrom]] refreshes the ledger from the published dimension
  * at publish time — off the mapping critical path.
  *
  * The ledger is advisory metadata, not a lock: single-writer-per-table
  * scheduling (the monthly batch) is assumed, exactly as the reference's
  * scalar subquery assumes no concurrent identity insert.
  *
  * Paths are local-filesystem, the same seam as [[Publish]]'s staging
  * swap (this environment is single-JVM); a multi-node deployment swaps
  * java.nio for the Hadoop FileSystem API — atomic rename is the only
  * primitive either class needs. */
object KeyLedger {

  private def fileOf(dir: String, table: String) = {
    require(table.matches("[A-Za-z0-9_.-]+"),
      s"KeyLedger table name must be filesystem-safe: '$table'")
    Paths.get(dir, s"$table.maxkey")
  }

  /** The recorded max key for `table`, if the ledger has one. */
  def read(dir: String, table: String): Option[Long] = {
    val f = fileOf(dir, table)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        .trim.toLong)
    else None
  }

  /** Record `v` as `table`'s current max key (atomic replace). A failed
    * write or move deletes the dot-prefixed temp file before rethrowing —
    * a disk-full / permission failure must not leave residue in the
    * ledger directory (review finding). */
  def record(dir: String, table: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val f = fileOf(dir, table)
    val tmp = Files.createTempFile(Paths.get(dir), s".$table-", ".maxkey")
    try {
      Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case e: Throwable =>
        try Files.deleteIfExists(tmp) catch { case _: Throwable => () }
        throw e
    }
  }

  /** The ledger value for `table`, or — on first contact — the result of
    * `scan` (the legacy scalar max lookup), recorded for next time. */
  def maxKey(dir: String, table: String)(scan: => Long): Long =
    read(dir, table).getOrElse {
      val v = scan
      record(dir, table, v)
      v
    }

  /** Refresh `table`'s ledger entry from a published dimension frame —
    * one scalar aggregate, meant to run at publish time. Returns the
    * recorded max (0 for an empty / all-null key column, matching the
    * pipelines' `coalesce(max(key), 0)` convention). */
  def recordFrom(dir: String, table: String, dim: DataFrame,
                 keyCol: String): Long = {
    val v = dim.agg(coalesce(max(col(keyCol)), lit(0L)).cast("long"))
      .first().getLong(0)
    record(dir, table, v)
    v
  }
}
