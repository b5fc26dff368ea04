package graft.functions

import graft.QueryDef
import graft.QueryDef.graded
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** I: the extensibility surface.
  *
  * Binding rule (SURVEY §2 I): a UDF may appear in a graded query only when
  * its semantics are exactly re-expressible in DuckDB SQL for the oracle.
  * Black-box UDFs block Catalyst pushdown and codegen, so the engine keeps
  * them out of hot paths; at 100 TB a profiled hotspot would graduate to a
  * native Catalyst `Expression` with `doGenCode` instead.
  */
object Udfs {

  /** Identifier normalization — the classic catalog-maintenance cleanup
    * (strip punctuation, uppercase). `Brand#13` → `BRAND13`.
    */
  val normalizeId: String => String =
    s => if (s == null) null else s.toUpperCase.replaceAll("[^A-Z0-9]", "")

  // i1 — scalar UDF demonstrating spark.udf registration, with an exact
  // SQL re-expression as the oracle.
  private val i1 = graded(
    "i1_udf_scalar",
    """SELECT p_partkey, p_brand,
      |  upper(regexp_replace(p_brand, '[^a-zA-Z0-9]', '', 'g')) AS brand_norm
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val norm = udf(normalizeId)
    spark.udf.register("normalize_id", norm)
    Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand", norm($"p_brand").as("brand_norm"))
      .orderBy("p_partkey")
  }

  val defs: Seq[QueryDef] = Seq(i1)
}
