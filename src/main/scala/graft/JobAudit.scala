package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run keys and report their SCHEDULED-JOB profile — how many
  * Spark jobs each invocation submits and where the wall goes, the
  * number the r15 verdict's "≤ N jobs/round" targets are checked
  * against (job barriers, not stages, are the serial cost of iterative
  * operators at any scale). Usage:
  *   tools/run.sh graft.JobAudit <sfDir> <key> [key ...]
  *
  * Each key runs TWICE (RunOne's discipline: run 2 is steady-state,
  * fixtures/JIT warm); both runs' job counts and walls print.
  */
object JobAudit {
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
    final case class J(id: Int, t0: Long, var t1: Long = -1L,
        var desc: String = "")
    val jobs = new ConcurrentLinkedQueue[J]()
    val open = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val j = J(s.jobId, s.time,
          desc = Option(s.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""))
        jobs.add(j); open.put(s.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(open.remove(e.jobId)).foreach(_.t1 = e.time)
      }
    })
    keys.foreach { key =>
      for (run <- 1 to 2) {
        jobs.clear(); open.clear()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(key)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1200) // async listener bus settle (ShuffleAudit rule)
        val js = jobs.toArray(Array.empty[J]).sortBy(_.id)
        val jobWall = js.collect { case j if j.t1 > 0 => j.t1 - j.t0 }.sum / 1e3
        println(f"[jobaudit] $key run$run rows=$n jobs=${js.length} " +
          f"wall=$wall%.2f s job_wall_sum=$jobWall%.2f s")
        if (sys.env.contains("GRAFT_JOBAUDIT_DETAIL"))
          js.foreach { j =>
            val d = if (j.t1 > 0) f"${(j.t1 - j.t0) / 1e3}%.3f" else "?"
            println(f"[jobaudit]   job ${j.id}%4d $d%8s s  ${j.desc.take(90)}")
          }
      }
    }
    spark.stop()
  }
}
