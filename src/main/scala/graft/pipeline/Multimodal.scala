package graft.pipeline

import graft.QueryDef
import graft.QueryDef.{benchOnly, graded}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** M: multimodal columns — images/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The corpus carries no real media, so the binary column is manufactured
  * from `documents.text` (UTF-8 encode). What this module makes real and
  * testable is the Spark-side plumbing a 100 TB media pipeline needs:
  *  - `BinaryType` columns flowing through scans, projections and
  *    aggregations without materializing on the driver;
  *  - cheap metadata (sizes, digests, magic-byte sniffing) computed with
  *    codegen'd built-ins, so filtering/pruning happens BEFORE any
  *    expensive decode;
  *  - the decode step as per-partition batch processing
  *    ([[Multimodal.decodeBatch]]) with an explicit output schema — the
  *    decoder itself is a clearly-marked deterministic STUB (no media
  *    codecs in this environment), but the iterator-in/iterator-out shape,
  *    schema and partitioning are exactly what a real codec call would
  *    use.
  */
object Multimodal {

  // m1 — binary metadata extraction, graded: byte length, content digest,
  // and a "magic bytes" prefix (the hex head a format sniffer would
  // dispatch on). DuckDB twins: text::BLOB, md5 over the same UTF-8 bytes.
  private val m1 = graded(
    "m1_media_meta",
    """SELECT doc_id,
      |  octet_length(text::BLOB) AS n_bytes,
      |  md5(text) AS digest,
      |  substring(hex(text::BLOB), 1, 16) AS magic_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("blob", encode($"text", "UTF-8"))
      .select($"doc_id",
        octet_length($"blob").as("n_bytes"),
        md5($"blob").as("digest"),
        substring(hex($"blob"), 1, 16).as("magic_hex"))
      .orderBy("doc_id")
  }

  /** Decoded-media metadata record (the decode output schema). */
  final case class MediaMeta(doc_id: Long, n_bytes: Int,
      width: Int, height: Int, brightness: Double)

  /** Per-partition batch "decode". STUB: a real pipeline would hand the
    * byte buffers to an image codec here (and would batch them per
    * partition exactly like this, amortizing codec init across the
    * iterator). This stand-in derives deterministic fake dimensions from
    * the content digest so tests have stable expectations.
    */
  def decodeBatch(it: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    // per-partition init (a real codec context would be created here, once)
    val digest = java.security.MessageDigest.getInstance("MD5")
    it.map { case (id, bytes) =>
      val d = digest.digest(bytes)
      MediaMeta(
        doc_id = id,
        n_bytes = bytes.length,
        width = 64 + (java.lang.Byte.toUnsignedInt(d(0)) % 16) * 64,
        height = 64 + (java.lang.Byte.toUnsignedInt(d(1)) % 16) * 64,
        brightness = java.lang.Byte.toUnsignedInt(d(2)) / 255.0)
    }
  }

  // m2 — bench-only: the full decode pipeline. binary column →
  // mapPartitions batch decode → typed Dataset → aggregate. Rows never
  // collect to the driver; the decode parallelism is the scan partitioning.
  private val m2 = benchOnly("m2_media_decode") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
      .toDF()
      .select($"doc_id", $"n_bytes", $"width", $"height",
        round($"brightness", 6).as("brightness"))
      .orderBy("doc_id")
  }

  /** One sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, brightness: Double)

  /** Per-partition 1→N frame sampling. STUB decoder (see [[decodeBatch]]):
    * a real pipeline would seek/decode k frames per video here; the
    * iterator-flatMap shape (each input row yields k output rows, batched
    * per partition, never materialized on the driver) is the real part.
    */
  def sampleFrames(k: Int)(it: Iterator[(Long, Array[Byte])]): Iterator[Frame] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    it.flatMap { case (id, bytes) =>
      val d = digest.digest(bytes)
      (0 until k).iterator.map { f =>
        Frame(id, f, java.lang.Byte.toUnsignedInt(d(f % d.length)) / 255.0)
      }
    }
  }

  // m3 — bench-only: frame sampling, the 1→N twin of m2's 1→1 decode.
  // At 100 TB the output is k× the input row count but each frame row is
  // tiny metadata — the heavy binary column is dropped before the rows
  // fan out.
  private val m3 = benchOnly("m3_frame_sample") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(sampleFrames(4))
      .toDF()
      .select($"doc_id", $"frame_idx", round($"brightness", 6).as("brightness"))
      .orderBy("doc_id", "frame_idx")
  }

  // m4 — media dedup by content digest: the binary-column twin of exact
  // text dedup. The 16-byte digest — not the payload — travels through
  // the shuffle (one groupBy + one join back), which is what makes exact
  // media dedup feasible at 100 TB: the multi-MB blobs stay columnar in
  // the scan and never ride a shuffle. Keeper = min doc_id per digest.
  private val m4 = graded(
    "m4_media_dedup",
    """WITH h AS (SELECT doc_id, md5(text) AS digest FROM documents),
      |k AS (
      |  SELECT digest, min(doc_id) AS keeper, count(*) AS copies
      |  FROM h GROUP BY 1)
      |SELECT h.doc_id, k.keeper, k.copies, h.doc_id = k.keeper AS keep
      |FROM h JOIN k USING (digest)
      |ORDER BY h.doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val h = Tables.documents(spark, dir)
      .select($"doc_id", md5(encode($"text", "UTF-8")).as("digest"))
    val k = h.groupBy($"digest")
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("copies"))
    h.join(k, "digest")
      .select($"doc_id", $"keeper", $"copies", ($"doc_id" === $"keeper").as("keep"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(m1, m2, m3, m4)
}
