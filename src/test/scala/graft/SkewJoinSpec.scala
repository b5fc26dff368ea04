package graft

import graft.operators.SkewJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(orders, customer, "o_custkey", salts = 7)
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salt spreads a single hot key across all salt values") {
    import spark.implicits._
    // one key carries 10k rows — the shape AQE cannot split per-key
    val hot = (1 to 10000).map(i => (42L, i.toLong)).toDF("k", "payload")
    val dim = Seq((42L, "x")).toDF("k", "name")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", salts = 8)
    assert(joined.count() === 10000L)
    // group the salted large side and confirm the hot key fans out
    val saltCard = hot.withColumn("_salt",
        pmod(xxhash64(struct(hot.columns.map(col): _*)), lit(8L)))
      .select("_salt").distinct().count()
    assert(saltCard === 8L)
  }
}
