package graft.operators

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-stage store for the dedup pipeline — how a 100 TB
  * pipeline actually runs a multi-consumer subtree: the expensive
  * shared relations (LSH bands, verified near-dup pairs, cluster
  * labels) are computed ONCE per corpus and staged as parquet; every
  * downstream query reads the staged table instead of re-deriving
  * shingles→signatures→bands from scratch. Locally that collapses the
  * q23/q24/q46/q50/q52 family from five derivations of the same subtree
  * to one; at scale it is the difference between one pass over the
  * corpus and five.
  *
  * Mechanics:
  *   - stage path = GRAFT_STAGE_DIR (default /tmp/graft_stage)
  *     / <derivation version + constants> / <sf dir + input fingerprint>
  *     / <stage name>. The version segment bakes in the constants the
  *     derivations depend on, the fingerprint (size + mtime of
  *     documents.parquet) the input data — either changing invalidates
  *     the stage automatically; no stale reads across rounds or corpus
  *     regenerations.
  *   - writes go to a pid-suffixed temp dir then ATOMIC_MOVE into
  *     place, so a concurrent writer (two benches racing) can never
  *     yield a half-written stage: losers see the winner's complete
  *     stage and just read it.
  *   - staging is an OPTIMIZATION: any failure to write (read-only
  *     /tmp, disk full) logs and falls back to returning the computed
  *     DataFrame directly — correctness never depends on the store.
  *
  * Parquet paths rather than catalog tables (`Scale.writeBucketed`)
  * because the driver's Verify and Bench run in separate JVMs and this
  * session catalog is in-memory — bucket metadata would not survive to
  * the next run, while the parquet files do. On a deployment with a
  * persistent metastore the same stages would be written bucketed by
  * doc_id (Scale.writeBucketed) so the downstream pair⋈docset sort-merge
  * joins are exchange-free as well.
  */
object Staged {

  /** Backstop version for derivation-logic changes the plan hash can't
    * see (e.g. the imperative loop inside `dedupClusters`, whose stage
    * token hashes only its INPUT plan). Declarative derivation changes
    * invalidate automatically via [[planHash]]. */
  private val Version = 1

  private def root: String =
    sys.props.get("graft.stage.dir")
      .orElse(sys.env.get("GRAFT_STAGE_DIR"))
      .getOrElse("/tmp/graft_stage")

  private def versionSeg(constants: String): String = s"v$Version-$constants"

  private def sfTag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+|_+$", "")

  private def stagePath(sfDir: String, constants: String, name: String): Path = {
    val doc = Paths.get(sfDir, "documents.parquet")
    val fp =
      if (Files.exists(doc))
        s"${Files.size(doc)}-${Files.getLastModifiedTime(doc).toMillis}"
      else "nodocs"
    Paths.get(root, versionSeg(constants), s"${sfTag(sfDir)}-$fp", name)
  }

  /** Code-derived stage token: md5 of the CANONICALIZED analyzed plan,
    * so the staged path changes whenever the derivation's expressions,
    * constants, or upstream staged inputs change — the mandated
    * Verify/check feedback loop then re-executes edited dedup code
    * instead of reading a stale stage from a previous code version.
    * Canonicalization normalizes expression ids, keeping the hash
    * stable across JVMs; any residual instability only costs a
    * recompute, never a stale read. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  def planHash(df: DataFrame): String =
    md5hex(df.queryExecution.analyzed.canonicalized.toString)

  /** Combine a derivation's own plan hash with its UPSTREAM stages'
    * tokens. Necessary because a parquet scan's canonicalized plan
    * string shows only the format name, never the file path — a plan
    * that reads a staged relation does NOT change when that stage's
    * derivation (and hence path) changes, so transitive invalidation
    * must be spliced in explicitly. */
  def combine(tokens: String*): String = md5hex(tokens.mkString("|"))

  /** Remove an entire RUN-PRIVATE stage store (Bench cold runs point
    * `graft.stage.dir` at a pid-suffixed dir and wipe it on exit). Only
    * ever called on a store this process created for itself — the
    * shared store is never bulk-deleted (a concurrent Verify/Bench may
    * be mid-read there; its staleness is handled by the age-gated
    * per-stage reaper in [[orCompute]]). */
  def wipeStore(storeRoot: Path): Unit = synchronized {
    require(storeRoot.getFileName.toString.startsWith("graft_stage_"),
      s"refusing to wipe non-stage dir $storeRoot")
    deleteRecursively(storeRoot)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(p)
      val all = try s.iterator().asScala.toSeq.reverse finally s.close()
      all.foreach(Files.delete)
    }

  private def listDir(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Read the named stage for `sfDir`, computing and materializing it
    * first if absent. `token` is the code-derived invalidation key
    * (usually [[planHash]] of the derivation, or of its input when the
    * derivation itself is imperative). Synchronized (stage computations
    * can nest — clusters stages pairs stages bands — and re-entrant
    * locking is what a single driver needs; cross-JVM races are settled
    * by the atomic rename). */
  def orCompute(s: SparkSession, sfDir: String, constants: String,
      name: String, token: String)(compute: => DataFrame): DataFrame = synchronized {
    val path = stagePath(sfDir, constants, s"$name-$token")
    val success = path.resolve("_SUCCESS")
    if (!Files.exists(success)) {
      val df = compute
      val tmp = path.resolveSibling(
        s"${path.getFileName}.tmp-${ProcessHandle.current().pid()}")
      try {
        df.write.mode("overwrite").parquet(tmp.toString)
        Files.createDirectories(path.getParent)
        // a stage under the same name but an OLD plan token is stale by
        // definition (the derivation changed) — reap it so /tmp doesn't
        // accumulate one copy per code iteration. Age-gated: a stage
        // modified in the last 30 min might still be mid-read by a
        // concurrently-launched JVM running the previous code version,
        // so only clearly-abandoned copies are deleted (the next run
        // reaps the rest)
        locally {
          val cutoff = System.currentTimeMillis() - 30 * 60 * 1000L
          val stale = listDir(path.getParent)
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith(s"$name-") && n != path.getFileName.toString &&
                !n.contains(".tmp-") &&
                Files.getLastModifiedTime(p).toMillis < cutoff
            }
          stale.foreach(p => try deleteRecursively(p)
            catch { case scala.util.control.NonFatal(_) => () })
        }
        try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: FileAlreadyExistsException | _: java.nio.file.DirectoryNotEmptyException =>
            // a concurrent writer won the race with an identical
            // (deterministic) stage — use theirs
            deleteRecursively(tmp)
        }
      } catch {
        // NonFatal only: an OutOfMemoryError / interrupt during the
        // stage write must propagate, not silently continue unstaged
        // with the JVM in an unknown state
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[stage] could not materialize $name at $path (${e.getMessage}) - running unstaged")
          try deleteRecursively(tmp)
          catch { case scala.util.control.NonFatal(_) => () }
          return df
      }
    }
    s.read.parquet(path.toString)
  }
}
