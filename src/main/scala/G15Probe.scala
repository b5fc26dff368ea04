import org.apache.spark.sql.SparkSession
object G15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    def show(tag: String): Unit = {
      val r = graft.SparkEntry.queries("g15_simhash")(spark, sf)
        .where("doc_id = 0").collect()
      println(s"[probe] $tag -> ${r.mkString(" ")}")
    }
    show("g15 alone")
    // now run the queries that persist() and re-run g15
    Seq("g2_neardup_jaccard","g14_ngram_jaccard","g16_simhash_dedup","g19_dedup_pipeline").foreach { k =>
      graft.SparkEntry.queries(k)(spark, sf).count()
      show(s"g15 after $k")
    }
    spark.stop()
  }
}
