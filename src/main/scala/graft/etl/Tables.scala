package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StructType}

/** Fixture / warehouse readers.
  *
  * The reference reaches tables through SQL Server linked-server four-part
  * names (`Dindb.db.schema.table`, reference S3:11, S4:62); here a "database"
  * is just a directory of parquet files and a table is one file. One
  * SparkSession spans what the reference splits across servers.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events fixture's `ts` physical type has varied across driver
    * generations: TIMESTAMP(NANOS) (arrives as a nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS) with no
    * timezone (arrives as TIMESTAMP_NTZ). Normalize both to TIMESTAMP so
    * downstream `unix_micros`/`window`/watermark code sees one type. The
    * NTZ→TZ cast reinterprets wall-clock in the session timezone — every
    * entrypoint pins UTC, so the instant is exact and matches what DuckDB
    * computes on the same naive values. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** O1 width beyond parquet: CSV / JSON-lines sources with an explicit
    * schema (DDL string). Schema-explicit reads skip the inference scan —
    * at 100 TB a schema-inference pass is a full extra read of the input —
    * and both formats stay splittable (single-line records), so a
    * 1000-executor scan parallelizes exactly like parquet, minus the
    * column pruning/statistics parquet would add.
    */
  def csv(s: SparkSession, path: String, ddl: String): DataFrame =
    s.read.schema(StructType.fromDDL(ddl)).option("header", "true").csv(path)

  def jsonLines(s: SparkSession, path: String, ddl: String): DataFrame =
    s.read.schema(StructType.fromDDL(ddl)).json(path)

  private val exportMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String, String, Long), String]

  private def fixtureMtime(d: String, name: String): Long = {
    val f = new java.io.File(s"$d/$name.parquet")
    val nested = Option(f.listFiles()).getOrElse(Array.empty)
    (f.lastModified() +: nested.map(_.lastModified())).max
  }

  /** Cache root for re-materialized fixture copies: repo-relative (the
    * JVM's working directory), overridable via SPARK_GRAFT_CACHE_DIR. */
  private def cacheRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_CACHE_DIR",
      s"${sys.props("user.dir")}/target/fixture-cache")

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Publish a generated fixture directory atomically. The path is keyed
    * by fixture mtime, so its CONTENT is deterministic — but two
    * concurrent JVMs (test + bench) used to overwrite-write the same
    * directory while the other read it. Now: if a complete copy already
    * exists (_SUCCESS marker), adopt it; otherwise write to a
    * process-unique tmp dir and rename into place — the loser of the
    * rename race discards its tmp and adopts the winner's directory, and
    * a reader never observes a half-written path. */
  private def materialize(path: String)(write: String => Unit): String = {
    val target = new java.io.File(path)
    if (target.isDirectory && new java.io.File(target, "_SUCCESS").exists())
      return path
    val tmp = path + ".tmp-" + ProcessHandle.current().pid() +
      "-" + java.lang.Long.toHexString(System.nanoTime())
    write(tmp)
    try
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
        java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException =>
        deleteRecursively(new java.io.File(tmp))
    }
    path
  }

  /** Re-materialize the orders fixture as a Hive-style month-partitioned
    * directory tree (`.../month=199601/part-*.parquet`) — the layout a
    * 100 TB fact table actually lives in, where a DateKey-window predicate
    * must prune whole directories instead of scanning them. Written once
    * per fixture version; returns the root path for
    * `spark.read.parquet(root)` partition discovery. */
  def exportedOrdersByMonth(s: SparkSession, d: String): String = {
    val key = (d, "orders", "month-parquet", fixtureMtime(d, "orders"))
    exportMemo.getOrElseUpdate(key, {
      exportMemo.keys
        .filter(k => k._1 == d && k._2 == "orders" &&
          k._3 == "month-parquet" && k != key)
        .foreach(exportMemo.remove)
      val path = s"$cacheRoot/orders_bymonth_${key._4.toHexString}_" +
        Integer.toHexString(d.hashCode)
      materialize(path) { tmp =>
        table(s, d, "orders")
          .withColumn("month",
            (expr("year(o_orderdate)") * 100 + expr("month(o_orderdate)"))
              .cast("int"))
          .repartition(col("month"))
          .write.mode("overwrite").partitionBy("month").parquet(tmp)
      }
    })
  }

  /** Re-materialize selected columns of a parquet fixture as a CSV or
    * JSON-lines copy (the non-parquet-source test bed: the copy is written
    * by Spark once per fixture version, then read back through [[csv]] /
    * [[jsonLines]] while the DuckDB oracle reads the original parquet).
    * Lives under target/ so nothing outside the repo is touched. */
  def exportedCopy(s: SparkSession, d: String, name: String, fmt: String,
                   cols: Seq[String]): String = {
    val key = (d, name, fmt, fixtureMtime(d, name))
    exportMemo.getOrElseUpdate(key, {
      exportMemo.keys
        .filter(k => k._1 == d && k._2 == name && k._3 == fmt && k != key)
        .foreach(exportMemo.remove)
      val path = s"$cacheRoot/${name}_${fmt}_${key._4.toHexString}_" +
        Integer.toHexString(d.hashCode)
      materialize(path) { tmp =>
        val w = table(s, d, name).select(cols.map(col).toIndexedSeq: _*)
          .coalesce(4).write.mode("overwrite")
        fmt match {
          case "csv"  => w.option("header", "true").csv(tmp)
          case "json" => w.json(tmp)
          case other  => throw new IllegalArgumentException(s"format: $other")
        }
      }
    })
  }
}
