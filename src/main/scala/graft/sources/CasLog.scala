package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** [[TxLog]]'s commit protocol with the commit point moved into a
  * catalog COMPARE-AND-SWAP — the OBJECT-STORE form of the lakehouse
  * commit. S3-class stores have no exclusive rename and no link(2), so
  * the manifest body lands under a CONTENT-UNIQUE object name (never
  * contended — writes to distinct keys cannot race) and the only
  * mutable thing in the whole protocol is the catalog's head entry,
  * advanced by `compareAndSet(expectedHead, newHead)`. This is exactly
  * the shape of Delta's S3 commit coordinator and Iceberg's catalog
  * pointer swap: same invariant as TxLog's exclusive publish (of two
  * writers racing from the same base, exactly one wins; the loser gets
  * a conflict exception and commits NOTHING), different primitive.
  *
  * The catalog here is an in-memory map — the honest stand-in for a
  * DynamoDB/Glue/JDBC catalog in a sandbox with no object store — but
  * the PROTOCOL is the real one and TxLogSpec holds its laws
  * adversarially (barrier-synchronized racing writers, monotone head,
  * pinned-reader stability): the laws are properties of the CAS, not of
  * the store behind it.
  *
  * Reuses [[TxLog.stage]]'s staging discipline (immutable part files,
  * invisible until referenced); manifests are newline path lists like
  * TxLog's. Readers PIN a [[CasLog.Head]] — an immutable (version,
  * manifest-object) pair — so snapshot isolation is pointer-copy
  * cheap and later commits can never mutate what a pinned reader
  * resolves.
  */
object CasLog {

  /** An immutable catalog entry: the head version and the manifest
    * object it points at. Value-equality is what the CAS compares. */
  final case class Head(version: Int, manifest: String)

  // table path → head entry. ConcurrentHashMap.replace(k, old, new) and
  // putIfAbsent are the CAS primitives (atomic on value equality).
  private val catalog = new ConcurrentHashMap[String, Head]()
  // (table, version) → manifest object: history for version-pinned
  // reads; written only by the CAS winner, so single-writer per key.
  private val versions = new ConcurrentHashMap[(String, Int), String]()

  def head(table: String): Option[Head] = Option(catalog.get(table))

  /** Publish version `base + 1` = files(base) ++ staged. The manifest
    * body is written to a unique object FIRST (uncontended), then the
    * commit point is ONE catalog CAS. A losing writer throws
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] (TxLog's
    * uniform conflict signal) and commits nothing — its manifest object
    * is unreferenced garbage for a vacuum sweep, exactly like TxLog's
    * orphaned staging. */
  def commit(table: String, staged: Seq[String], base: Int): Int = {
    val next = base + 1
    val all =
      (if (base == 0) Nil
       else filesOf(table, versions.get((table, base)))) ++ staged
    // unique object name: uuid-keyed, never contended
    val obj = new Path(new Path(table, "_cas"),
      s"m-${java.util.UUID.randomUUID()}.manifest")
    val fs = obj.getFileSystem(
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
    val out = fs.create(obj, false)
    try all.foreach(p => out.write((p + "\n").getBytes(UTF_8)))
    finally out.close()
    val won =
      if (base == 0)
        catalog.putIfAbsent(table, Head(next, obj.toString)) == null
      else {
        val expect = catalog.get(table)
        expect != null && expect.version == base &&
          catalog.replace(table, expect, Head(next, obj.toString))
      }
    if (!won)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"CAS conflict: $table head moved past v$base")
    versions.put((table, next), obj.toString)
    next
  }

  /** The pinned file list of a catalog entry — resolving through the
    * immutable Head, never through the mutable catalog. */
  def files(h: Head): Seq[String] = filesOf("", h.manifest)

  /** Version-pinned file list (the TxLog.files twin). */
  def files(table: String, v: Int): Seq[String] = {
    val m = versions.get((table, v))
    require(m != null, s"no CAS manifest v$v under $table")
    filesOf(table, m)
  }

  def read(spark: SparkSession, h: Head): DataFrame =
    spark.read.parquet(files(h): _*)

  private def filesOf(table: String, manifest: String): Seq[String] = {
    require(manifest != null, s"no CAS manifest under $table")
    val p = new Path(manifest)
    val fs = p.getFileSystem(
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
    val in = fs.open(p)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toList finally src.close()
  }

  /** Test hook: forget a table (the catalog is process-lifetime). */
  private[graft] def reset(table: String): Unit = {
    catalog.remove(table)
    versions.keySet.removeIf(_._1 == table)
  }
}
