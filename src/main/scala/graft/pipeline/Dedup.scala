package graft.pipeline

import graft.QueryDef
import graft.QueryDef.{benchOnly, graded}
import graft.operators.Banding
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G (dedup family): exact and near-duplicate detection for training-data
  * pipelines.
  *
  * Scale notes (100 TB):
  *  - exact dedup (g1) is one shuffle on the dedup key with a
  *    WindowGroupLimit-prunable rank filter — never `dropDuplicates`,
  *    which is nondeterministic about the surviving row.
  *  - content fingerprinting (g8) reduces exact-dedup of multi-KB text to
  *    a 16-byte-key groupBy: hash travels through the shuffle, not the
  *    document.
  *  - all-pairs similarity (g2, g14) runs banded, and the band is an
  *    EQUI-JOIN key (bucket = floor(doc_id/band), left side exploded to
  *    [bkt, bkt+1] — [[graft.operators.Banding]]): the join is
  *    hash-partitioned with O(n·band) candidates, never a nested loop over
  *    n² pairs. The unbanded scale path is MinHash-LSH (g3): shingle →
  *    signature → band-bucket join, candidates ∝ true near-duplicates.
  *  - the minhash signature itself (g13) is an exact, oracle-checkable
  *    per-document reduction (4 independent min-hashes over token hashes).
  */
object Dedup {

  // g1 — exact dedup, keep-first-per-key: first event per (user, type) in
  // event-time order. row_number + full tiebreak makes the survivor
  // deterministic (SURVEY §2 G1). Ordering happens in the µs domain on
  // both sides so sub-µs nanosecond residue can never flip a tie.
  private val g1 = graded(
    "g1_dedup_exact",
    """SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts_us", $"event_id")
    Tables.eventsUs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"event_type",
        $"event_id".as("first_event_id"), $"ts_us".as("first_ts"))
      .orderBy("user_id", "event_type")
  }

  // g2 — near-dup by exact token-set Jaccard, banded self-join. The
  // threshold compares the unrounded ratio (int/int division is
  // IEEE-exact, identical across engines); output is rounded.
  private val g2 = graded(
    "g2_neardup_jaccard",
    """WITH toks AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      |  FROM documents)
      |SELECT doc_a, doc_b, round(jac, 6) AS jac
      |FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.tk, b.tk))::DOUBLE /
      |    len(list_distinct(list_concat(a.tk, b.tk)))::DOUBLE AS jac
      |  FROM toks a JOIN toks b
      |    ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 150) p
      |WHERE jac >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", array_distinct(split($"text", " ")).as("tk"))
    val a = toks.select($"doc_id".as("doc_a"), $"tk".as("tk_a"))
    val b = toks.select($"doc_id".as("doc_b"), $"tk".as("tk_b"))
    Banding.bandedPairs(a, b, "doc_a", "doc_b", 150)
      .withColumn("jac",
        size(array_intersect($"tk_a", $"tk_b")).cast("double") /
          size(array_union($"tk_a", $"tk_b")).cast("double"))
      .where($"jac" >= 0.9)
      .select($"doc_a", $"doc_b", round($"jac", 6).as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  // g3 — bench-only: MinHash-LSH dedup at scale, DataFrame-native.
  // Approximate candidate generation → no DuckDB twin; g2 is the graded
  // correctness twin. Pipeline: tokens → 16 minhashes (xxhash64 with 16
  // fixed seeds, elementwise min per doc) → 4 bands of 4 rows, band key =
  // hash of the band's signature slice → CHAIN candidate edges (each doc
  // links only to its predecessor in bucket doc_id order — a window lag,
  // O(n·bands) edges that preserve exactly the bucket connectivity an
  // all-pairs enumeration would give) → exact-Jaccard verification of
  // each edge → connected components over verified edges via bounded
  // pointer jumping → emit doc → component representative.
  //
  // Never enumerate intra-bucket pairs: that is quadratic in bucket size
  // (this corpus has a 31-word vocabulary, so band signatures collide into
  // ~2.6k-doc buckets at sf0.1 — the round-1 MLlib approxSimilarityJoin
  // cost 235 s and a bucket-pair equi-join still cost 135 s; the chain
  // form runs in ~2 s). Chaining under-merges only when a verified-edge
  // path is broken by one failing edge — the documented approximation of
  // LSH dedup, whose exhaustive graded twin is g2.
  private val g3 = benchOnly("g3_minhash_lsh") { (spark, dir) =>
    import spark.implicits._
    val nHashes = 16
    val bandRows = 4
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", array_distinct(split($"text", " ")).as("tk"))
    val tok = toks.select($"doc_id", explode($"tk").as("word"))
    val mins = (0 until nHashes).map(i => min(xxhash64(lit(i), $"word")).as(s"h$i"))
    val sig = tok.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
    val bandCols = (0 until nHashes / bandRows).map { bnd =>
      val slice = (bnd * bandRows until (bnd + 1) * bandRows).map(i => col(s"h$i"))
      struct(lit(bnd).as("band"), xxhash64(slice: _*).as("bk"))
    }
    val buckets = sig
      .select($"doc_id", explode(array(bandCols: _*)).as("bb"))
      .select($"doc_id", $"bb.band".as("band"), $"bb.bk".as("bk"))
    val wBkt = Window.partitionBy($"band", $"bk").orderBy($"doc_id")
    val edges = buckets
      .withColumn("prev", lag($"doc_id", 1).over(wBkt))
      .where($"prev".isNotNull)
      .select($"prev".as("doc_a"), $"doc_id".as("doc_b"))
      .distinct()
    val verified = edges
      .join(toks.select($"doc_id".as("doc_a"), $"tk".as("tk_a")), "doc_a")
      .join(toks.select($"doc_id".as("doc_b"), $"tk".as("tk_b")), "doc_b")
      .where(size(array_intersect($"tk_a", $"tk_b")).cast("double") /
        size(array_union($"tk_a", $"tk_b")).cast("double") >= 0.9)
      .select($"doc_a", $"doc_b")
    // initial labels: min verified in-neighbor, else self
    val linked = toks.select($"doc_id")
      .join(verified.groupBy($"doc_b").agg(min($"doc_a").as("rep0")),
        $"doc_id" === $"doc_b", "left")
      .select($"doc_id", coalesce($"rep0", $"doc_id").as("rep"))
    // bounded pointer jumping: 3 rounds close chains up to 2^3 hops; each
    // round is one hash equi-join on rep = doc_id
    val jump = (l: org.apache.spark.sql.DataFrame) =>
      l.as("a").join(l.select($"doc_id".as("r_doc"), $"rep".as("r_rep")),
          $"a.rep" === $"r_doc")
        .select($"a.doc_id".as("doc_id"), least($"a.rep", $"r_rep").as("rep"))
    val closed = jump(jump(jump(linked)))
    closed.where($"rep" < $"doc_id")
      .select($"doc_id", $"rep")
      .orderBy("doc_id")
  }

  // g8 — content fingerprinting: md5 over normalized text (identical
  // digests in both engines), plus how many docs share the fingerprint.
  private val g8 = graded(
    "g8_fingerprint",
    """SELECT doc_id, md5(text) AS fp,
      |  count(*) OVER (PARTITION BY md5(text)) AS n_same
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("fp", md5($"text"))
      .withColumn("n_same", count(lit(1)).over(Window.partitionBy($"fp")))
      .select("doc_id", "fp", "n_same")
      .orderBy("doc_id")
  }

  // g13 — minhash signatures, exactly. Token hash = first 8 hex digits of
  // md5 (identical in both engines); k affine rehashes over a prime
  // modulus; per-document signature = element-wise min. This is the
  // deterministic core of LSH dedup, reduced to plain aggregates.
  private val mhP = 4294967311L // smallest prime > 2^32
  private val mhAB = Seq((1L, 0L), (1664525L, 1013904223L),
    (22695477L, 1L), (1103515245L, 12345L))

  private def duckHex8(col: String): String =
    (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substring($col, $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
    ).mkString("(", " + ", ")")

  private val g13 = graded(
    "g13_minhash_sig", {
      val mins = mhAB.zipWithIndex.map { case ((a, b), i) =>
        s"min(($a * h + $b) % $mhP) AS mh$i"
      }.mkString(",\n      |  ")
      s"""WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
      |  FROM documents
      |), hashed AS (
      |  SELECT doc_id, ${duckHex8("md5(word)")} AS h FROM tok
      |)
      |SELECT doc_id,
      |  $mins
      |FROM hashed
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("word"))
    val hashed = tok.withColumn("h", conv(substring(md5($"word"), 1, 8), 16, 10).cast("bigint"))
    val mins = mhAB.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * $"h" + lit(b)) % lit(mhP)).as(s"mh$i")
    }
    hashed.groupBy($"doc_id").agg(mins.head, mins.tail: _*).orderBy("doc_id")
  }

  // g14 — character-3-gram Jaccard near-dup (shingling catches
  // reorderings that token-set Jaccard misses). Banded like g2; tighter
  // band because shingle sets are ~6× larger than token sets.
  private val g14 = graded(
    "g14_ngram_jaccard",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, length(text) - 2),
      |      i -> substring(text, i, 3))) AS gr
      |  FROM documents)
      |SELECT doc_a, doc_b, round(jac, 6) AS jac
      |FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.gr, b.gr))::DOUBLE /
      |    len(list_distinct(list_concat(a.gr, b.gr)))::DOUBLE AS jac
      |  FROM sh a JOIN sh b
      |    ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 50) p
      |WHERE jac >= 0.75
      |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", array_distinct(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("gr"))
    val a = sh.select($"doc_id".as("doc_a"), $"gr".as("gr_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"gr".as("gr_b"))
    Banding.bandedPairs(a, b, "doc_a", "doc_b", 50)
      .withColumn("jac",
        size(array_intersect($"gr_a", $"gr_b")).cast("double") /
          size(array_union($"gr_a", $"gr_b")).cast("double"))
      .where($"jac" >= 0.75)
      .select($"doc_a", $"doc_b", round($"jac", 6).as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  val defs: Seq[QueryDef] = Seq(g1, g2, g3, g8, g13, g14)
}
