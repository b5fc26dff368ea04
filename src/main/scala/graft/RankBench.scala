package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbench closing the r15 verdict's what's-wrong #3: the r15
  * two-pass bucketed token rank (TextAnalysis.rankTokens) costs +0.3–0.5 s
  * at the 33-token bench vocab — this tool measures the vocab size where
  * it starts WINNING against the one-pass global `row_number()` window it
  * replaced, on a synthetic Zipf-shaped frequency table. Equality of the
  * two rankings is asserted before timing (same total order: n DESC,
  * token ASC). Usage:
  *   tools/run.sh graft.RankBench [vocabSize ...]   (default 1e5 1e6 1e7)
  */
object RankBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def onePass(freq: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      freq.select(col("token"),
        (row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1)
          .cast("bigint").as("token_id"),
        col("n"))
    }
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (v <- sizes) {
      // Zipf-ish: n = V div (id + 1) — heavy ties in the tail (shared
      // buckets, the two-pass rank's hardest case) and a long head
      val freq = spark.range(v)
        .select(concat(lit("tok_"), lpad(col("id").cast("string"), 9, "0"))
          .as("token"),
          (lit(v) / (col("id") + 1)).cast("long").as("n"))
        .localCheckpoint(true)
      val diff = pipeline.TextAnalysis.rankTokens(freq)
        .except(onePass(freq)).count()
      require(diff == 0L, s"rankings differ at vocab $v")
      for (run <- 1 to 2) {
        val t1 = time(onePass(freq))
        val t2 = time(pipeline.TextAnalysis.rankTokens(freq))
        println(f"[rankbench] vocab=$v run$run one_pass=$t1%.2f s " +
          f"two_pass=$t2%.2f s")
      }
      freq.unpersist()
    }
    spark.stop()
  }
}
