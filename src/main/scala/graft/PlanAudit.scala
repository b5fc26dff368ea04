package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (d <- SparkEntry.all) {
      try {
        val p = d.fn(spark, dir).queryExecution.executedPlan.toString
        val smells = Seq(
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
          "CART" -> p.contains("CartesianProduct"),
          "SHUFFLES" -> false).collect { case (t, true) => t }
        val nEx = "Exchange".r.findAllIn(p).size
        println(f"${d.key}%-22s exchanges=$nEx%2d ${smells.mkString(",")}")
      } catch { case e: Throwable => println(s"${d.key} ERR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
