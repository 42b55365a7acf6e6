package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import scala.util.{Failure, Success, Try}

/** O12 — transactional multi-table publish
  * (spScript.sql:20-22/345-357 `BEGIN TRY BEGIN TRANSACTION … ROLLBACK`).
  *
  * Spark has no cross-table transactions; the equivalent commit protocol is
  * stage-then-publish: write every output to a temp directory, and only
  * after all writes succeed atomically move each into place. On failure
  * nothing is published (the temp staging area is discarded) — the
  * observable all-or-nothing behavior of the reference's transaction.
  */
object Publish {

  /** Write all `outputs` (name -> DataFrame) under `root`. Returns the
    * published paths on success; publishes nothing if any write fails. */
  def publishAll(root: String, outputs: Map[String, DataFrame]): Try[Seq[String]] = {
    val rootPath = Paths.get(root)
    Files.createDirectories(rootPath)
    val staging = Files.createTempDirectory(rootPath, ".staging-")
    val staged = Try {
      outputs.toSeq.map { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$staging/$name")
        name
      }
    }
    staged match {
      case Success(names) =>
        Try {
          names.map { name =>
            val target = rootPath.resolve(name)
            deleteRecursively(target)
            Files.move(staging.resolve(name), target,
              StandardCopyOption.ATOMIC_MOVE)
            target.toString
          }
        }.map { published => deleteRecursively(staging); published }
      case Failure(e) =>
        deleteRecursively(staging)
        Failure(e)
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
