package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one graded query by key with timing, optionally printing
  * the formatted physical plan. Usage:
  *   tools/run.sh graft.RunOne <key> <sfDir> [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = args.lift(1).filter(_ != "explain")
      .getOrElse("/root/testdata/sf0.01")
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(key)
    if (explain) fn(spark, sfDir).explain("formatted")
    // two timed runs: first includes codegen warm-up, second is steady-state
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[runone] $key run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
