package graft.pipeline

import graft.QueryDef
import graft.QueryDef.graded
import graft.operators.Banding
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G (similarity family): vector similarity search over the embedding
  * column (`array<float>`, 64-dim).
  *
  * All element arithmetic casts float→double inside the lambda: Spark
  * would otherwise accumulate in float32 while the DuckDB oracle promotes
  * to double (SURVEY §1.4). Dot products fold left-to-right in both
  * engines, so unrounded doubles are bit-identical and safe to threshold.
  *
  * Scale notes (100 TB):
  *  - g4 is the brute-force exact-kNN baseline: one scan, per-row scoring,
  *    TakeOrderedAndProject top-k — embarrassingly parallel, no shuffle.
  *  - g5 all-pairs runs banded with the band as an equi-join key
  *    ([[graft.operators.Banding]]): hash-partitioned, O(n·band)
  *    candidates, never an n² nested loop.
  *  - g12 is the scale path: hyperplane-LSH bucketing prunes candidates to
  *    one bucket (~1/16 of the data per query) before exact re-scoring —
  *    the same partition-pruning shape an IVF index gives. The bucket id
  *    is a join/partition key, so a batch of queries becomes a bucket
  *    equi-join instead of a cross join.
  */
object Similarity {

  /** embedding (float) → v (double) plus its precomputed L2 norm. */
  private def withVec(df: DataFrame): DataFrame =
    df.withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(expr(
        "aggregate(v, cast(0 as double), (a, x) -> a + x * x)")))

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)")

  // DuckDB twins of the vector helpers (1-based list indexing).
  private val duckV = "list_transform(embedding, x -> x::DOUBLE)"
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2]))"

  // g4 — exact cosine top-k for one query vector (vec_id = 0), brute force
  // over the whole table. Ordering uses the rounded score + vec_id so the
  // cutoff row is engine-independent.
  private val g4 = graded(
    "g4_cosine_topk",
    s"""WITH e AS (
      |  SELECT vec_id, $duckV AS v,
      |    sqrt(list_sum(list_transform($duckV, x -> x * x))) AS nrm
      |  FROM embeddings),
      |q AS (SELECT v AS qv, nrm AS qnrm FROM e WHERE vec_id = 0)
      |SELECT vec_id, round(${duckDot("v", "qv")} / (nrm * qnrm), 6) AS cos_sim
      |FROM e CROSS JOIN q
      |WHERE vec_id <> 0
      |ORDER BY cos_sim DESC, vec_id
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val e = withVec(Tables.embeddingsDist(spark, dir))
    val q = e.where($"vec_id" === 0).select($"v".as("qv"), $"nrm".as("qnrm"))
    e.where($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"vec_id", round(dot("v", "qv") / ($"nrm" * $"qnrm"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }

  // g5 — embedding-cosine near-dup: banded all-pairs self-join above a
  // threshold (thresholded on the unrounded, bit-identical score).
  private val g5 = graded(
    "g5_simjoin_threshold",
    s"""WITH e AS (
      |  SELECT vec_id, $duckV AS v,
      |    sqrt(list_sum(list_transform($duckV, x -> x * x))) AS nrm
      |  FROM embeddings)
      |SELECT vec_a, vec_b, round(cs, 6) AS cos_sim
      |FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    ${duckDot("a.v", "b.v")} / (a.nrm * b.nrm) AS cs
      |  FROM e a JOIN e b
      |    ON a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= 100) p
      |WHERE cs >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val e = withVec(Tables.embeddingsDist(spark, dir))
      .persist() // read by both join sides; avoids recomputing the cast+norm
    val a = e.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nb"))
    Banding.bandedPairs(a, b, "vec_a", "vec_b", 100)
      .withColumn("cs", dot("va", "vb") / ($"na" * $"nb"))
      .where($"cs" >= 0.35)
      .select($"vec_a", $"vec_b", round($"cs", 6).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  // g12 — LSH-bucketed ANN: 4 fixed axis-hyperplane sign bits → 16
  // buckets; exact cosine re-scoring only within the query's bucket.
  private val bktSql =
    """((embedding[1] >= 0)::INT * 8 + (embedding[17] >= 0)::INT * 4 +
      |   (embedding[33] >= 0)::INT * 2 + (embedding[49] >= 0)::INT)""".stripMargin

  private val g12 = graded(
    "g12_ann_lsh",
    s"""WITH e AS (
      |  SELECT vec_id, $duckV AS v,
      |    sqrt(list_sum(list_transform($duckV, x -> x * x))) AS nrm,
      |    $bktSql AS bkt
      |  FROM embeddings),
      |q AS (SELECT v AS qv, nrm AS qnrm, bkt AS qbkt FROM e WHERE vec_id = 0)
      |SELECT vec_id, bkt, round(${duckDot("v", "qv")} / (nrm * qnrm), 6) AS cos_sim
      |FROM e JOIN q ON e.bkt = q.qbkt
      |WHERE vec_id <> 0
      |ORDER BY cos_sim DESC, vec_id
      |LIMIT 5""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val bkt =
      (element_at($"embedding", 1) >= 0).cast("int") * 8 +
        (element_at($"embedding", 17) >= 0).cast("int") * 4 +
        (element_at($"embedding", 33) >= 0).cast("int") * 2 +
        (element_at($"embedding", 49) >= 0).cast("int")
    val e = withVec(Tables.embeddingsDist(spark, dir)).withColumn("bkt", bkt)
    val q = e.where($"vec_id" === 0)
      .select($"v".as("qv"), $"nrm".as("qnrm"), $"bkt".as("qbkt"))
    e.join(broadcast(q), $"bkt" === $"qbkt")
      .where($"vec_id" =!= 0)
      .select($"vec_id", $"bkt",
        round(dot("v", "qv") / ($"nrm" * $"qnrm"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(5)
  }

  // g17 — bench-only: IVF-style ANN. Index build: a deterministic coarse
  // quantizer (16 "centroids" sampled by vec_id — a k-means stand-in;
  // training is out of scope for a query engine) assigns every vector to
  // its nearest centroid, i.e. one broadcast join + per-row argmax. Search:
  // the query probes its nprobe=2 nearest centroids and re-scores
  // exhaustively ONLY inside those inverted lists — at 100 TB the list id
  // is a partition key, so probing is partition pruning and the scan never
  // touches the other 14/16 of the data.
  private val g17 = QueryDef.benchOnly("g17_ann_ivf") { (spark, dir) =>
    import spark.implicits._
    val e = withVec(Tables.embeddingsDist(spark, dir))
    val cents = e.where($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"nrm".as("cnrm"))
    // build: assign each vector to its nearest centroid (cosine argmax)
    val wVec = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"cscore".desc, $"cid")
    val assigned = e.join(broadcast(cents))
      .withColumn("cscore", dot("v", "cv") / ($"nrm" * $"cnrm"))
      .withColumn("rk", row_number().over(wVec))
      .where($"rk" === 1)
      .select($"vec_id", $"cid", $"v", $"nrm")
    // search: query = vec_id 0; probe its 2 best centroids
    val q = e.where($"vec_id" === 0)
      .select($"v".as("qv"), $"nrm".as("qnrm"))
    val probes = cents.crossJoin(broadcast(q))
      .withColumn("cscore", dot("cv", "qv") / ($"cnrm" * $"qnrm"))
      .orderBy($"cscore".desc, $"cid").limit(2)
      .select($"cid")
    assigned.join(broadcast(probes), "cid")
      .crossJoin(broadcast(q))
      .where($"vec_id" =!= 0)
      .select($"vec_id", $"cid",
        round(dot("v", "qv") / ($"nrm" * $"qnrm"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }

  val defs: Seq[QueryDef] = Seq(g4, g5, g12, g17)
}
