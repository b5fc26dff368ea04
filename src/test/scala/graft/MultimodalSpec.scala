package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeBatch is deterministic and batch-shaped") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val out1 = Multimodal.decodeBatch(Iterator((1L, bytes))).toList
    val out2 = Multimodal.decodeBatch(Iterator((1L, bytes))).toList
    assert(out1 === out2)
    val m = out1.head
    assert(m.n_bytes === bytes.length)
    assert(m.width >= 64 && m.width <= 64 + 15 * 64)
    assert(m.height >= 64 && m.height <= 64 + 15 * 64)
    assert(m.brightness >= 0.0 && m.brightness <= 1.0)
  }

  test("m2 pipeline: binary column survives distributed decode, one row per doc") {
    val df = SparkEntry.queries("m2_media_decode")(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(df.count() === docs)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "brightness"))
    // byte length must equal the source text's UTF-8 length — proves the
    // binary payload reached the decoder intact
    val joined = df.join(
      graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("expect")),
      "doc_id")
    assert(joined.where(col("n_bytes") =!= col("expect")).count() === 0)
  }

  test("m3 frame sampling yields exactly k rows per document") {
    val df = SparkEntry.queries("m3_frame_sample")(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(df.count() === docs * 4)
    assert(df.groupBy("doc_id").count()
      .where(col("count") =!= 4).count() === 0)
  }

  test("PGM codec round-trips and validates its header") {
    import Multimodal.Pgm
    // round trip: decoded fields equal the synthesis parameters
    val blob = Pgm.encode(13L, "abc def")
    val d = Pgm.decode(blob)
    assert(d.width === 8 + 13 % 8)
    assert(d.height === 8 + 13 % 5)
    assert(d.maxval === 255)
    assert(d.brightness > 0.0 && d.brightness <= 1.0)
    // hand-built known image: 2x1, pixels (0, 255) → brightness 0.5
    val tiny = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, -1)
    assert(Pgm.decode(tiny).brightness === (255.0 / 2) / 255.0)
    // a real decoder rejects malformed input instead of fabricating pixels
    intercept[IllegalArgumentException](Pgm.decode("JUNK".getBytes))
    intercept[IllegalArgumentException](Pgm.decode(blob.dropRight(1))) // truncated raster
    intercept[IllegalArgumentException](
      Pgm.decode("P5\n2 1\n65535\n12".getBytes)) // unsupported maxval
  }

  test("multi-frame PGM container round-trips and rejects truncation") {
    import Multimodal.Pgm
    val blob = Pgm.encodeFrames(7L, "abc xyz", 3)
    val frames = Pgm.decodeFrames(blob)
    assert(frames.length === 3)
    assert(frames.forall(f => f.width === 8 + 7 % 8 && f.height === 8 + 7 % 5))
    // frame pixels are offset by the frame index -> brightness strictly
    // increases with f for an all-ASCII source (no mod-256 wraparound)
    assert(frames.map(_.brightness) === frames.map(_.brightness).sorted)
    assert(frames(0).brightness < frames(2).brightness)
    intercept[IllegalArgumentException](Pgm.decodeFrames(blob.dropRight(1)))
    intercept[IllegalArgumentException](
      Pgm.decodeFrames(blob ++ "P6\n".getBytes)) // wrong magic mid-stream
  }

  test("m5 decoded dimensions follow the synthesis rule for every doc") {
    val df = SparkEntry.queries("m5_image_decode")(spark, sfDir)
    assert(df.where(col("width") =!= lit(8) + col("doc_id") % 8
      || col("height") =!= lit(8) + col("doc_id") % 5).count() === 0)
    assert(df.where(col("brightness") < 0 || col("brightness") > 1).count() === 0)
  }

  test("m1 metadata agrees with decode output on byte counts") {
    val meta = SparkEntry.queries("m1_media_meta")(spark, sfDir)
      .select(col("doc_id"), col("n_bytes").as("meta_bytes"))
    val dec = SparkEntry.queries("m2_media_decode")(spark, sfDir)
      .select(col("doc_id"), col("n_bytes").as("dec_bytes"))
    assert(meta.join(dec, "doc_id")
      .where(col("meta_bytes") =!= col("dec_bytes")).count() === 0)
  }
}
