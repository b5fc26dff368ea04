package graft

import graft.functions.Udfs
import org.apache.spark.sql.functions._

class UdafSpec extends SparkSpec {

  test("GeoMean aggregator equals exp(avg(ln)) and merges across partitions") {
    import spark.implicits._
    val vals = Seq(2.0, 8.0, 4.0, 1.0, 16.0)
    // 5 input partitions → exercises merge(), not just reduce()
    val df = vals.toDF("x").repartition(5)
    val geo = udaf(Udfs.GeoMean)
    val got = df.agg(geo($"x").as("g")).head().getDouble(0)
    val want = math.exp(vals.map(math.log).sum / vals.size)
    assert(math.abs(got - want) < 1e-12)
  }

  test("GeoMean ignores nulls and non-positive values") {
    import spark.implicits._
    val df = Seq[java.lang.Double](2.0, null, 8.0, 0.0, -3.0).toDF("x")
    val geo = udaf(Udfs.GeoMean)
    val got = df.agg(geo($"x")).head().getDouble(0)
    assert(math.abs(got - 4.0) < 1e-12) // geomean(2, 8)
  }

  test("empty input yields the zero element, not NaN") {
    import spark.implicits._
    val geo = udaf(Udfs.GeoMean)
    val got = Seq.empty[Double].toDF("x").agg(geo(col("x"))).head().getDouble(0)
    assert(got === 0.0)
  }
}
