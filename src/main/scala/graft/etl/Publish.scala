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
    * published paths on success; publishes nothing if any write fails.
    *
    * `onStaged` runs after EVERY output is staged and before any swap,
    * receiving name -> staged path; if it throws, the publish aborts
    * with nothing swapped in (the staging area is discarded). This is
    * the write-ahead seam for metadata that must commit BEFORE the data
    * becomes visible — [[graft.pipelines.Monthly.publishWithLedger]]
    * records post-mint key-ledger maxima here, so a crash at any point
    * can only leave the ledger AHEAD of the published warehouse (key
    * gaps on rerun, the IDENTITY-rollback semantics), never behind it
    * (duplicate keys). */
  def publishAll(root: String, outputs: Map[String, DataFrame],
                 onStaged: Map[String, String] => Unit = _ => ())
      : Try[Seq[String]] = {
    val rootPath = Paths.get(root)
    Files.createDirectories(rootPath)
    val staging = Files.createTempDirectory(rootPath, ".staging-")
    val staged = Try {
      val names = outputs.toSeq.map { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$staging/$name")
        name
      }
      onStaged(names.map(n => n -> s"$staging/$n").toMap)
      names
    }
    staged match {
      case Success(names) =>
        // Swap protocol: rename each existing target aside first, then move
        // staging in. Only after EVERY swap succeeds are the set-aside old
        // versions deleted; on any failure the renames are rolled back, so a
        // mid-loop crash never leaves a table deleted without a replacement.
        val aside = scala.collection.mutable.ListBuffer.empty[(Path, Path)]
        val swappedIn = scala.collection.mutable.ListBuffer.empty[Path]
        val swap = Try {
          names.map { name =>
            val target = rootPath.resolve(name)
            if (Files.exists(target)) {
              val old = rootPath.resolve(s".old-${staging.getFileName}-$name")
              Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
              aside += ((target, old))
            }
            Files.move(staging.resolve(name), target,
              StandardCopyOption.ATOMIC_MOVE)
            swappedIn += target
            target.toString
          }
        }
        swap match {
          case Success(published) =>
            aside.foreach { case (_, old) => deleteRecursively(old) }
            deleteRecursively(staging)
            Success(published)
          case Failure(e) =>
            // Roll back: remove any new versions moved in, restore the olds.
            swappedIn.foreach(deleteRecursively)
            aside.foreach { case (target, old) =>
              Try(Files.move(old, target, StandardCopyOption.ATOMIC_MOVE))
            }
            deleteRecursively(staging)
            Failure(e)
        }
      case Failure(e) =>
        deleteRecursively(staging)
        Failure(e)
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close() // unclosed walk leaks a directory fd per call
    }
}
