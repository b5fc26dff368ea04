package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mini transaction log: manifest-based ATOMIC multi-file commit +
  * snapshot-isolation reads over a plain parquet directory — the
  * keystone the maintenance family's pieces (a14 snapshot diff, a17
  * delete vectors, a20 dynamic overwrite, g88 append+compact) compose
  * under in a real lakehouse table format.
  *
  * Layout:
  * {{{
  *   <table>/data/<uuid>/part-*.parquet   -- immutable staged files
  *   <table>/_manifests/v<N>.manifest     -- newline list of data files
  * }}}
  *
  * Protocol (the Delta/Iceberg core, reduced to its invariant):
  *  - a WRITER stages new part files under data/ (unique directory per
  *    commit attempt — never visible to any reader until committed),
  *    then publishes manifest v(N+1) = manifest(N) ++ staged files by
  *    WRITE-TEMP-THEN-ATOMIC-RENAME. The rename is the commit point.
  *  - OPTIMISTIC CONCURRENCY: the rename refuses to replace an existing
  *    target, so of two writers racing to v(N+1) exactly one wins; the
  *    loser sees the conflict exception, re-reads the new head, and
  *    retries against it (or gives up — caller's policy).
  *  - a READER pins a manifest version at open and reads EXACTLY that
  *    file list; later commits add files it never sees. Uncommitted
  *    staged files are invisible by construction (readers only learn of
  *    files through manifests), so a crashed writer leaves garbage, not
  *    corruption — compaction's GC sweep reclaims unreferenced files.
  *
  * Scale notes: the manifest carries file PATHS (O(files), kept bounded
  * by a6-style compaction), never data; commits are O(1) renames, so
  * writer throughput is independent of table size; readers plan from a
  * single manifest read. On object stores without atomic rename, the
  * commit point moves into a CAS on a catalog entry — same invariant,
  * different primitive (documented, not simulated, here: the local-FS
  * rename is the honest single-node stand-in).
  */
object TxLog {

  private def manifestDir(table: String) =
    new java.io.File(table, "_manifests")

  private def manifestFile(table: String, v: Int) =
    new java.io.File(manifestDir(table), s"v$v.manifest")

  /** Highest committed version, if any commit has ever succeeded. */
  def currentVersion(table: String): Option[Int] =
    Option(manifestDir(table).listFiles()).toSeq.flatten
      .flatMap(f => "^v(\\d+)\\.manifest$".r
        .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .maxOption

  /** The exact file list of a committed version. */
  def files(table: String, v: Int): Seq[String] = {
    val f = manifestFile(table, v)
    require(f.exists(), s"no manifest v$v under $table")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toList finally src.close()
  }

  /** Stage a DataFrame as new immutable part files; returns their paths.
    * Staged files are invisible until a commit references them. */
  def stage(df: DataFrame, table: String): Seq[String] = {
    val dir = new java.io.File(new java.io.File(table, "data"),
      java.util.UUID.randomUUID().toString)
    df.write.parquet(dir.toString)
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.toString).sorted
  }

  /** Publish version `base + 1` = files(base) ++ staged. The atomic
    * CREATE of the manifest name is the commit point — a hard link, not
    * a rename: POSIX rename(2) silently REPLACES an existing target
    * (atomic but not exclusive — it would let the second of two racing
    * writers clobber the first), while link(2) is atomic AND fails with
    * EEXIST, which is exactly the optimistic-concurrency conflict
    * signal. A losing writer throws (FileAlreadyExistsException) and
    * commits NOTHING. Returns the new version; `base = 0` creates the
    * table. */
  def commit(table: String, staged: Seq[String], base: Int): Int =
    commitManifest(table,
      (if (base == 0) Nil else files(table, base)) ++ staged, base)

  /** Snapshot-isolated read of a pinned version: exactly that manifest's
    * files, whatever has committed since. */
  def read(spark: SparkSession, table: String, v: Int): DataFrame =
    spark.read.parquet(files(table, v): _*)

  /** Publish version `base + 1` whose manifest is EXACTLY `staged` — a
    * REWRITE commit (compaction, sorted clustering, full snapshot
    * replace), vs [[commit]]'s append semantics. Same atomic-exclusive
    * link as the commit point. The replaced files stay on disk, still
    * referenced by older manifests, until [[vacuum]] retires them. */
  def commitRewrite(table: String, staged: Seq[String], base: Int): Int =
    commitManifest(table, staged, base)

  private def commitManifest(table: String, all: Seq[String],
      base: Int): Int = {
    val next = base + 1
    val md = manifestDir(table)
    md.mkdirs()
    val tmp = java.io.File.createTempFile(s"v$next-", ".tmp", md)
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try all.foreach(w.println) finally w.close()
    try
      java.nio.file.Files.createLink(
        manifestFile(table, next).toPath, tmp.toPath)
    finally tmp.delete()
    next
  }

  /** Garbage-collect: delete every data file not referenced by one of
    * the `keepLast` most recent manifests, and drop the expired
    * manifests themselves. Returns the deleted data-file paths.
    *
    * This is the retention contract of every table format: a reader
    * pinned INSIDE the retention window is never broken (its manifest
    * and files survive untouched); a reader pinned beyond it fails
    * LOUDLY on its next file open (the manifest is gone) rather than
    * silently seeing partial data. Crashed-writer garbage — staged
    * files no manifest ever referenced — is reclaimed by the same
    * sweep, since "referenced by a retained manifest" is the only
    * liveness criterion. */
  def vacuum(table: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must retain at least the current version")
    val versions = Option(manifestDir(table).listFiles()).toSeq.flatten
      .flatMap(f => "^v(\\d+)\\.manifest$".r
        .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .sorted
    val retained = versions.takeRight(keepLast)
    val live = retained.flatMap(files(table, _)).toSet
    val dataRoot = new java.io.File(table, "data")
    val dead = Option(dataRoot.listFiles()).toSeq.flatten.flatMap { d =>
      Option(d.listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".parquet") &&
          !live.contains(f.toString))
    }
    dead.foreach(_.delete())
    // prune now-empty staging dirs and expired manifests
    Option(dataRoot.listFiles()).toSeq.flatten
      .filter(d => Option(d.listFiles()).exists(_.isEmpty))
      .foreach(_.delete())
    versions.dropRight(keepLast)
      .foreach(v => manifestFile(table, v).delete())
    dead.map(_.toString).sorted
  }
}
