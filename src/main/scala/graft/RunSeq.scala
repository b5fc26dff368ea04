package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run several graded keys IN ORDER in one JVM with Bench's
  * exact per-key mechanics (count + clearCache, time taken after the
  * unpersist) — the reproducer for cross-key contamination questions
  * like BENCH_r08's "h3/h5–h8 regress 4–7.7× when run right after the
  * h34–h38 streaming drains". Usage:
  *   tools/run.sh graft.RunSeq <sfDir> <key> [key ...]
  */
object RunSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up pair as Bench. Warm-up dir is overridable and a
    // failure is REPORTED, not swallowed: a silently-skipped warm-up
    // inflates the first measured key — the exact contamination this
    // tool exists to diagnose (r9 ADVICE).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    try {
      SparkEntry.queries("c1_join_broadcast")(spark, warmDir).count()
      SparkEntry.queries("e1_win_rank")(spark, warmDir).count()
    } catch { case e: Throwable =>
      System.err.println(s"[runseq] WARNING: warm-up on $warmDir failed " +
        s"(${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")
          .linesIterator.take(1).mkString}) — first key's time is cold")
    }
    keys.foreach { key =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(spark, sfDir).count()
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[runseq] $key rows=$n t=$dt%.3f s")
    }
    spark.stop()
  }
}
