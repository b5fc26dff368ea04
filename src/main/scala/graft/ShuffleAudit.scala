package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: run keys and report their MEASURED shuffle traffic (bytes +
  * records written to the shuffle layer, summed over all tasks) — the
  * number SCALE.md's "shuffles X, not Y" claims must cite instead of
  * eyeballing the plan. Usage:
  *   tools/run.sh graft.ShuffleAudit <sfDir> <key> [key ...]
  */
object ShuffleAudit {
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
    val bytes = new LongAdder; val recs = new LongAdder
    val peakTaskBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { m =>
          bytes.add(m.shuffleWriteMetrics.bytesWritten)
          recs.add(m.shuffleWriteMetrics.recordsWritten)
          peakTaskBytes.accumulateAndGet(
            m.shuffleWriteMetrics.bytesWritten, math.max(_, _))
        }
      }
    })
    keys.foreach { key =>
      bytes.reset(); recs.reset(); peakTaskBytes.set(0L)
      val n = SparkEntry.queries(key)(spark, sfDir).count()
      spark.catalog.clearCache()
      // listener bus is async (and private): a short settle beats
      // depending on Spark internals for a dev-only audit tool
      Thread.sleep(1500)
      println(f"[shuffle] $key rows=$n shuffle_bytes=${bytes.sum}%,d " +
        f"shuffle_records=${recs.sum}%,d peak_task_bytes=${peakTaskBytes.get}%,d")
    }
    spark.stop()
  }
}
