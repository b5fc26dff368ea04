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
  def commit(table: String, staged: Seq[String], base: Int): Int = {
    val next = base + 1
    val all = (if (base == 0) Nil else files(table, base)) ++ staged
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

  /** Snapshot-isolated read of a pinned version: exactly that manifest's
    * files, whatever has committed since. */
  def read(spark: SparkSession, table: String, v: Int): DataFrame =
    spark.read.parquet(files(table, v): _*)
}
