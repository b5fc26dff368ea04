package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}

class GraftExtensionsSpec extends SparkSpec {

  test("extension class injects without error and the builder evaluates") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
    val (_, _, builder) = GraftExtensions.sortedIntersectSize
    val arr = (xs: Seq[Long]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    val e = builder(Seq(arr(Seq(1L, 3L, 7L)), arr(Seq(3L, 7L, 9L))))
    assert(e.eval(null) === 2)
  }

  test("runtime registration exposes the same function through SQL") {
    graft.functions.SortedIntersectSize.register(spark)
    val got = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 5L), array(2L, 5L, 8L))")
      .head().getInt(0)
    assert(got === 2)
  }
}
