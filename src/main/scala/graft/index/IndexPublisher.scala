package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic index publish/swap — the ReplaceIndex analogue (reference
  * `internal/sourcebackend/sourcebackend.go:198-251` and the importer's
  * `.tmp`→rename discipline, `importer.go:452-465`): a new index version
  * is built into a staging directory, then atomically made current via a
  * `CURRENT` pointer-file swap. Readers resolve the pointer at load time,
  * so a crash mid-build never corrupts the serving index, and the old
  * version stays on disk until explicitly vacuumed (Iceberg-style
  * snapshot discipline without the Iceberg runtime).
  */
object IndexPublisher {

  private def currentFile(root: String) = java.nio.file.Paths.get(s"$root/CURRENT")

  /** Build (or resume) a new version into staging, then swap. Returns the
    * new version directory. */
  def publish(spark: SparkSession, docs: DataFrame, root: String,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      version: String = null): String = {
    new java.io.File(root).mkdirs()
    val ver = Option(version).getOrElse(nextVersion(root))
    val dir = s"$root/$ver"
    IndexBuilder.buildPersistent(spark, docs, dir, cfg)
    swap(root, ver)
    dir
  }

  /** Next monotone version name (resume-friendly: deterministic from
    * content would also work; monotone integers mirror dcs's
    * full.<unix-ts>). The `n.length > 1` guard matters: an entry named
    * exactly "v" has an empty digit tail that vacuously passes forall and
    * then crashes toLong — IndexFeeder.mergeAndPublish carried an
    * unguarded copy of this scan (code-review r05); one definition now. */
  def nextVersion(root: String): String = {
    val existing = Option(new java.io.File(root).list()).getOrElse(Array.empty)
      .filter(n => n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
    "v" + (if (existing.isEmpty) 1L else existing.max + 1L)
  }

  /** Atomically point CURRENT at a committed version. */
  def swap(root: String, version: String): Unit = {
    // meta.json alone is written during the FIRST build stage, and even
    // _COMMITTED_termstats precedes the revterms/trigram stages — gating
    // on either would let a crashed staging dir become CURRENT with
    // silently-degraded sections (the hazard IndexFeeder.batchDirs
    // documents). Require the TERMINAL build marker, written only after
    // every configured stage committed.
    require(new java.io.File(s"$root/$version/meta.json").exists() &&
      new java.io.File(s"$root/$version/_COMMITTED_build").exists(),
      s"version $version is not a committed index (final stage markers missing)")
    val tmp = java.nio.file.Paths.get(s"$root/CURRENT.tmp")
    java.nio.file.Files.writeString(tmp, version)
    java.nio.file.Files.move(tmp, currentFile(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def currentVersion(root: String): Option[String] =
    if (java.nio.file.Files.exists(currentFile(root)))
      Some(java.nio.file.Files.readString(currentFile(root)).trim)
    else None

  /** Load the currently-published index. */
  def loadCurrent(spark: SparkSession, root: String): BuiltIndex = {
    val ver = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published index under $root"))
    IndexBuilder.load(spark, s"$root/$ver")
  }

  /** Drop all versions except CURRENT (the cleanup cron analogue,
    * reference `cleanup-failed-shards.cron`). */
  def vacuum(root: String): Seq[String] = {
    val keep = currentVersion(root).toSet
    val victims = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v") && !keep(f.getName))
    victims.foreach(v => org.apache.commons.io.FileUtils.deleteDirectory(v))
    victims.map(_.getName).toSeq
  }
}
