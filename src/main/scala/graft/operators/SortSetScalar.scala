package graft.operators

import graft.QueryDef
import graft.QueryDef.graded
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F: sort / limit / top-k, set operations, and the scalar function surface
  * (string, date, math, array/higher-order, explode, map).
  *
  * Scale notes (100 TB): global top-k never globally sorts — Catalyst plans
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows).
  * Higher-order array functions evaluate per-row with no shuffle. Explode
  * is a Generate operator: linear, pipelined, no shuffle until the
  * downstream aggregate.
  */
object SortSetScalar {

  // F1 — global top-k via TakeOrderedAndProject.
  private val f1 = graded(
    "f1_topk_global",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  // F2 — set operations (INTERSECT/EXCEPT are set-semantics: distinct).
  private val f2 = graded(
    "f2_setops",
    """SELECT 'both' AS tag, nk FROM
      |  (SELECT c_nationkey AS nk FROM customer
      |   INTERSECT SELECT s_nationkey FROM supplier) t1
      |UNION ALL
      |SELECT 'cust_only' AS tag, nk FROM
      |  (SELECT c_nationkey AS nk FROM customer
      |   EXCEPT SELECT s_nationkey FROM supplier) t2
      |ORDER BY tag, nk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val c = Tables.customer(spark, dir).select($"c_nationkey".as("nk"))
    val s = Tables.supplier(spark, dir).select($"s_nationkey".as("nk"))
    val both = c.intersect(s).select(lit("both").as("tag"), $"nk")
    val custOnly = c.except(s).select(lit("cust_only").as("tag"), $"nk")
    both.unionByName(custOnly).orderBy("tag", "nk")
  }

  // F3 — string function family. Casts align DuckDB's BIGINT results with
  // Spark's INT. regexp_extract: both engines return '' on no-match
  // (probed).
  private val f3 = graded(
    "f3_str_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS name_u,
      |  lower(p_brand) AS brand_l,
      |  substring(p_name, 1, 5) AS name5,
      |  length(p_name)::INT AS name_len,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  levenshtein(p_brand, 'Brand#1')::INT AS lev,
      |  replace(p_type, 'ECONOMY', 'ECO') AS type_r,
      |  concat(p_brand, ':', p_type) AS brand_type,
      |  trim(concat(' ', p_name, ' ')) AS trimmed
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        upper($"p_name").as("name_u"),
        lower($"p_brand").as("brand_l"),
        substring($"p_name", 1, 5).as("name5"),
        length($"p_name").as("name_len"),
        regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
        levenshtein($"p_brand", lit("Brand#1")).as("lev"),
        regexp_replace($"p_type", "ECONOMY", "ECO").as("type_r"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
        trim(concat(lit(" "), $"p_name", lit(" "))).as("trimmed"))
      .orderBy("p_partkey")
  }

  // F4 — date/time function family. Dialect notes (SURVEY §2 F4): Spark
  // datediff(end, start) ↔ DuckDB datediff('day', start, end); Spark
  // dayofweek is 1-based Sunday, DuckDB 0-based Sunday.
  private val f4 = graded(
    "f4_date_funcs",
    """SELECT o_orderkey,
      |  year(o_orderdate)::INT AS yr,
      |  month(o_orderdate)::INT AS mo,
      |  day(o_orderdate)::INT AS dom,
      |  (dayofweek(o_orderdate) + 1)::INT AS dow,
      |  date_trunc('month', o_orderdate) AS om,
      |  (o_orderdate::DATE + 30) AS ship_by,
      |  datediff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS d_since
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        dayofweek($"o_orderdate").as("dow"),
        // DuckDB date_trunc('month', ts) yields DATE; Spark yields
        // TIMESTAMP — cast so both sides carry the same logical type.
        date_trunc("month", $"o_orderdate").cast("date").as("om"),
        date_add(to_date($"o_orderdate"), 30).as("ship_by"),
        datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).as("d_since"))
      .orderBy("o_orderkey")
  }

  // F5 — math function family. ceil/floor: Spark returns BIGINT, DuckDB
  // DOUBLE — cast the oracle side.
  private val f5 = graded(
    "f5_math_funcs",
    """SELECT p_partkey,
      |  round(p_retailprice, 2) AS price_r,
      |  round(abs(p_retailprice - 1000), 2) AS dev,
      |  round(ln(p_retailprice), 6) AS ln_p,
      |  round(sqrt(p_retailprice), 6) AS sqrt_p,
      |  round(power(p_size, 2), 1) AS size_sq,
      |  ceil(p_retailprice)::BIGINT AS cp,
      |  floor(p_retailprice)::BIGINT AS fp
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        round($"p_retailprice", 2).as("price_r"),
        round(abs($"p_retailprice" - 1000), 2).as("dev"),
        round(log($"p_retailprice"), 6).as("ln_p"),
        round(sqrt($"p_retailprice"), 6).as("sqrt_p"),
        round(pow($"p_size", 2), 1).as("size_sq"),
        ceil($"p_retailprice").as("cp"),
        floor($"p_retailprice").as("fp"))
      .orderBy("p_partkey")
  }

  // F6 — array + higher-order functions over the embedding column. Every
  // element is cast float→double inside the lambda: Spark would otherwise
  // accumulate in float32 while DuckDB promotes to double (SURVEY §1.4).
  private val f6 = graded(
    "f6_array_funcs",
    """SELECT vec_id,
      |  len(embedding)::INT AS n_dims,
      |  round(embedding[1]::DOUBLE, 6) AS first_e,
      |  round(embedding[64]::DOUBLE, 6) AS last_e,
      |  round(list_sum(list_transform(embedding, x -> x::DOUBLE)), 6) AS sum_e,
      |  round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS norm
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        size($"embedding").as("n_dims"),
        round(element_at($"embedding", 1).cast("double"), 6).as("first_e"),
        round(element_at($"embedding", 64).cast("double"), 6).as("last_e"),
        round(expr(
          "aggregate(embedding, cast(0 as double), (a, x) -> a + cast(x as double))"), 6)
          .as("sum_e"),
        round(sqrt(expr(
          "aggregate(embedding, cast(0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")), 6)
          .as("norm"))
      .orderBy("vec_id")
  }

  // F7 — explode/UNNEST → word histogram, fully ordered.
  private val f7 = graded(
    "f7_explode",
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |GROUP BY word
      |ORDER BY word""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  // F8 — map functions over JSON-parsed props (no native map columns exist
  // in the corpus; from_json is the entry point — SURVEY §2 F8).
  private val f8 = graded(
    "f8_map_funcs",
    """SELECT event_id,
      |  array_to_string(json_keys(props), '|') AS ks,
      |  json_extract_string(props, '$.k')::INTEGER AS k_val
      |FROM events
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // Keys are serialized to a '|'-joined string: the driver's compare gate
    // cannot hash array-typed result cells (pandas factorize limitation).
    Tables.apply(spark, dir, "events")
      .withColumn("m", from_json($"props", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)))
      .select($"event_id",
        array_join(map_keys($"m"), "|").as("ks"),
        expr("try_element_at(m, 'k')").as("k_val"))
      .orderBy("event_id")
  }

  // F9 — ordered string aggregation (listagg). collect_list order is
  // shuffle-nondeterministic, so the graded form sorts the collected set
  // before joining — the value is a pure function of the group's set.
  private val f9 = graded(
    "f9_listagg",
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(array_join(sort_array(collect_list($"n_name")), ",").as("nations"))
      .orderBy("r_name")
  }

  // F10 — null-handling scalars over synthesized nulls (the corpus is
  // null-free, so nullif manufactures them): coalesce / nullif / nvl2
  // shapes plus greatest/least null semantics (both engines skip nulls in
  // greatest/least rather than propagate).
  private val f10 = graded(
    "f10_null_funcs",
    """SELECT p_partkey,
      |  nullif(p_size, 25) AS size_nn,
      |  coalesce(nullif(p_size, 25), -1) AS size_filled,
      |  CASE WHEN nullif(p_size, 25) IS NULL THEN 'was_25' ELSE 'other' END AS tag,
      |  greatest(p_size, 25) AS g25,
      |  least(nullif(p_size, 25), 10) AS l10
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        nullif($"p_size", lit(25)).as("size_nn"),
        coalesce(nullif($"p_size", lit(25)), lit(-1)).as("size_filled"),
        when(nullif($"p_size", lit(25)).isNull, "was_25").otherwise("other").as("tag"),
        greatest($"p_size", lit(25)).as("g25"),
        least(nullif($"p_size", lit(25)), lit(10)).as("l10"))
      .orderBy("p_partkey")
  }

  // F11 — multiset (bag) set operations: EXCEPT ALL / INTERSECT ALL keep
  // duplicate multiplicity, which the distinct forms (f2) destroy. The
  // probe multiset is orders.o_custkey (many per customer) against the
  // customer key list; output rows are tagged per operation.
  private val f11 = graded(
    "f11_setops_all",
    """SELECT 'except_all' AS op, k FROM (
      |  SELECT o_custkey AS k FROM orders
      |  EXCEPT ALL
      |  SELECT c_custkey FROM customer) e
      |UNION ALL
      |SELECT 'intersect_all' AS op, k FROM (
      |  SELECT o_custkey AS k FROM orders
      |  INTERSECT ALL
      |  SELECT c_custkey FROM customer) i
      |ORDER BY op, k""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_custkey".as("k"))
    val c = Tables.customer(spark, dir).select($"c_custkey".as("k"))
    o.exceptAll(c).withColumn("op", lit("except_all"))
      .union(o.intersectAll(c).withColumn("op", lit("intersect_all")))
      .select($"op", $"k")
      .orderBy("op", "k")
  }

  // F12 — error-safe scalar evaluation: division by zero and bad casts
  // yield NULL instead of failing the job — at 100 TB one malformed row
  // must never kill a pipeline. Spark's try_* family ↔ DuckDB's
  // TRY_CAST / nullif-guarded division (identical null semantics).
  private val f12 = graded(
    "f12_try_funcs",
    """SELECT p_partkey,
      |  p_retailprice / nullif(p_size - p_size, 0) AS div_by_zero,
      |  round(p_retailprice / nullif(p_size, 0), 4) AS per_unit,
      |  TRY_CAST(p_type AS INTEGER) AS bad_cast,
      |  TRY_CAST(p_size AS SMALLINT) AS ok_cast
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        expr("try_divide(p_retailprice, p_size - p_size)").as("div_by_zero"),
        round(expr("try_divide(p_retailprice, p_size)"), 4).as("per_unit"),
        expr("try_cast(p_type AS INT)").as("bad_cast"),
        expr("try_cast(p_size AS SHORT)").as("ok_cast"))
      .orderBy("p_partkey")
  }

  // F13 — bitwise scalar functions (mask/xor/shift — the id-manipulation
  // toolkit every salting/bucketing scheme leans on). Dialect note:
  // Spark's `^` is XOR while DuckDB's `^` is exponentiation — the oracle
  // must spell `xor()`.
  private val f13 = graded(
    "f13_bit_funcs",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS low_byte,
      |  xor(o_orderkey, 12345) AS xored,
      |  (o_orderkey & 15) << 4 AS shifted_l,
      |  o_orderkey >> 3 AS shifted_r
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        expr("o_orderkey & 255").as("low_byte"),
        expr("o_orderkey ^ 12345").as("xored"),
        expr("shiftleft(o_orderkey & 15, 4)").as("shifted_l"),
        expr("shiftright(o_orderkey, 3)").as("shifted_r"))
      .orderBy("o_orderkey")
  }

  // F14 — string FORMATTING family (the report/export-side complement of
  // f3's parsing family): printf-style templating, pad/repeat/reverse/
  // translate, fixed-width keys. Spark `format_string` and DuckDB
  // `printf` both implement C printf for %s/%0Nd, so the template is
  // shared verbatim. Pure per-row projection — scales like the scan.
  private val f14 = graded(
    "f14_format_funcs",
    """SELECT p_partkey,
      |  printf('%s:%05d', p_brand, p_partkey) AS tag,
      |  lpad(p_brand, 12, '.') AS brand_pad,
      |  rpad(p_type, 16, '-') AS type_pad,
      |  reverse(p_name) AS name_rev,
      |  translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
      |  repeat(p_brand, 2) AS brand2,
      |  left(p_name, 3) AS name3
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        format_string("%s:%05d", $"p_brand", $"p_partkey").as("tag"),
        lpad($"p_brand", 12, ".").as("brand_pad"),
        rpad($"p_type", 16, "-").as("type_pad"),
        reverse($"p_name").as("name_rev"),
        translate($"p_type", "AEIOU", "aeiou").as("type_tr"),
        repeat($"p_brand", 2).as("brand2"),
        substring($"p_name", 1, 3).as("name3"))
      .orderBy("p_partkey")
  }

  // F15 — URL parsing family (the curation front door for a web corpus:
  // domain stats, host-level dedup keys, path routing all start here).
  // The corpus ships no URL column, so a deterministic URL is synthesized
  // in-query from document fields (g27's synthesize-then-process pattern,
  // declared) and parsed with Spark's native `parse_url` — the DuckDB
  // twin reconstructs each component with anchored regexes over the same
  // string, so the oracle checks parse_url's semantics, not itself.
  // Map-side projection only; scales like the scan.
  private val f15 = graded(
    "f15_url_funcs",
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://' || source || '.example.org/' || lang || '/doc-'
      |      || doc_id || '?ref=' || (doc_id % 7) AS url
      |  FROM documents)
      |SELECT doc_id, url,
      |  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
      |  regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
      |  regexp_extract(url, '^[a-z]+://[^/?]+([^?]*)', 1) AS path,
      |  regexp_extract(url, 'ref=([0-9]+)', 1) AS ref,
      |  split_part(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '.', 1)
      |    AS subdomain
      |FROM u
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("url",
        concat(lit("https://"), $"source", lit(".example.org/"), $"lang",
          lit("/doc-"), $"doc_id", lit("?ref="), $"doc_id" % 7))
      .select($"doc_id", $"url",
        parse_url($"url", lit("PROTOCOL")).as("proto"),
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY"), lit("ref")).as("ref"),
        split_part(parse_url($"url", lit("HOST")), lit("."), lit(1))
          .as("subdomain"))
      .orderBy("doc_id")
  }

  // f16 — the REGEXP family as its own graded surface (f3 touches
  // regexp_extract; this covers the full curation toolkit: extract-all,
  // count-shaped len(extract_all), boolean match, global replace,
  // group extraction). Patterns stay in the RE2-compatible subset (no
  // lookaround/backrefs — g27's rule) so Java regex and DuckDB's RE2
  // agree; the extract-all list rides joined (the array-output rule);
  // no-match regexp_extract is ''-vs-NULL divergent (F3's caveat), so
  // the oracle wraps it in coalesce. Map-side projection — scales like
  // the scan.
  private val f16 = graded(
    "f16_regexp_funcs",
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[a-z]{7,}'))::BIGINT AS n_long,
      |  regexp_matches(text, '(^| )data( |$)') AS has_data,
      |  coalesce(regexp_extract(text, '([a-z]*tion)', 1), '') AS first_tion,
      |  coalesce(array_to_string(regexp_extract_all(text, '[a-z]{8,}'), ','),
      |    '') AS longs,
      |  md5(regexp_replace(text, ' +', '_', 'g')) AS fp_ws
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id",
      size(regexp_extract_all($"text", lit("[a-z]{7,}"), lit(0)))
        .cast("bigint").as("n_long"),
      $"text".rlike("(^| )data( |$)").as("has_data"),
      regexp_extract($"text", "([a-z]*tion)", 1).as("first_tion"),
      array_join(regexp_extract_all($"text", lit("[a-z]{8,}"), lit(0)), ",")
        .as("longs"),
      md5(regexp_replace($"text", " +", "_")).as("fp_ws"))
      .orderBy("doc_id")
  }

  // f17 — NULL ORDERING pinned explicitly: Spark's ASC default is NULLS
  // FIRST, DuckDB's is NULLS LAST — an ORDER BY or ranking window over a
  // nullable key silently disagrees between the engines unless the null
  // position is stated. This key states it both ways (ASC NULLS FIRST /
  // DESC NULLS LAST) inside ranking windows partitioned on the priority
  // key (never a global single-partition sort), so the placement is
  // graded as DATA (rank columns), not just presentation order; the
  // nullable column is a declared derived band (every 7th order's price
  // nulled — the corpus has no organic nulls, a12's precedent). One
  // priority-key shuffle + two window passes over the same partitioning.
  private val f17 = graded(
    "f17_null_ordering",
    """WITH t AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |         ELSE o_totalprice END AS v
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, round(v, 2) AS v,
      |  rank() OVER (PARTITION BY o_orderpriority
      |               ORDER BY v ASC NULLS FIRST, o_orderkey) AS rk_nf,
      |  rank() OVER (PARTITION BY o_orderpriority
      |               ORDER BY v DESC NULLS LAST, o_orderkey) AS rk_nl
      |FROM t
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val wNf = Window.partitionBy($"o_orderpriority")
      .orderBy($"v".asc_nulls_first, $"o_orderkey")
    val wNl = Window.partitionBy($"o_orderpriority")
      .orderBy($"v".desc_nulls_last, $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority",
        when($"o_orderkey" % 7 === 0, lit(null)).otherwise($"o_totalprice")
          .as("v"))
      .select($"o_orderkey", $"o_orderpriority", round($"v", 2).as("v"),
        rank().over(wNf).as("rk_nf"),
        rank().over(wNl).as("rk_nl"))
      .orderBy("o_orderkey")
  }

  // F18 — calendar function family beyond f4's basics: period edges
  // (last_day, quarter-trunc), ISO week math (weekday/weekofyear — the
  // one calendar area where engine conventions genuinely diverge:
  // Spark weekday is 0=Monday, DuckDB isodow is 1=Monday; Spark
  // weekofyear IS the ISO week, DuckDB's week() likewise), day-of-year,
  // and month rollover via add_months (clamps 31st → month end in both
  // engines by the SQL standard). All map-side projections — scales
  // like the scan.
  private val f18 = graded(
    "f18_calendar_funcs",
    """SELECT o_orderkey,
      |  last_day(o_orderdate::DATE) AS month_end,
      |  date_trunc('quarter', o_orderdate)::DATE AS q_start,
      |  quarter(o_orderdate)::INT AS q,
      |  (isodow(o_orderdate) - 1)::INT AS wd_iso,
      |  week(o_orderdate)::INT AS iso_week,
      |  dayofyear(o_orderdate)::INT AS doy,
      |  (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus_3m
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        last_day($"o_orderdate").as("month_end"),
        date_trunc("quarter", $"o_orderdate").cast("date").as("q_start"),
        quarter($"o_orderdate").as("q"),
        weekday($"o_orderdate").as("wd_iso"),
        weekofyear($"o_orderdate").as("iso_week"),
        dayofyear($"o_orderdate").as("doy"),
        add_months(to_date($"o_orderdate"), 3).as("plus_3m"))
      .orderBy("o_orderkey")
  }

  // F19 — the DIGEST scalar family (md5 / sha-256 / a composite row
  // digest): the primitives every fingerprint, split-hash and checksum
  // key here builds on (g8, g25, b8), graded on their own so a digest
  // regression is pinpointed to the function, not discovered through a
  // downstream dedup mismatch. md5 and sha256 produce identical hex in
  // both engines (DialectNotes md5 rule; sha2(x,256) ≡ sha256); the row
  // digest md5(concat_ws) pins the field-delimiter convention shared
  // with b8's table checksum. sha1 has NO DuckDB 1.0 twin — excluded by
  // the same rule that keeps approx sketches bench-only. Pure map-side
  // projection: zero shuffle beyond the final presentation sort.
  private val f19 = graded(
    "f19_digest_funcs",
    """SELECT p_partkey,
      |  md5(p_name) AS h_md5,
      |  sha256(p_name) AS h_sha256,
      |  md5(p_name || '|' || p_brand || '|' || CAST(p_size AS VARCHAR))
      |    AS row_digest,
      |  substring(md5(p_name), 1, 8) AS h_short
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        md5($"p_name").as("h_md5"),
        sha2($"p_name", 256).as("h_sha256"),
        md5(concat_ws("|", $"p_name", $"p_brand",
          $"p_size".cast("string"))).as("row_digest"),
        substring(md5($"p_name"), 1, 8).as("h_short"))
      .orderBy("p_partkey")
  }

  // f20 — HIGHER-ORDER LAMBDA functions over the embedding arrays:
  // filter / exists / forall / zip_with / indexed transform — the
  // Catalyst lambda surface beyond f6's plain aggregate. These run as
  // codegen'd expressions INSIDE the row, so a 100 TB scan pays zero
  // shuffle and zero UDF serialization for per-vector math. Both folds
  // (palindromic dot, index-weighted sum) accumulate in ELEMENT ORDER in
  // both engines — a left fold, not a set sum — so the doubles are
  // bit-identical before the 6dp rounding. DuckDB lacks zip_with and
  // lambda indices; the oracle states both via generate_series indexing,
  // which fixes the same evaluation order.
  private val f20 = graded(
    "f20_lambda_funcs",
    """SELECT vec_id,
      |  len(list_filter(embedding, x -> x::DOUBLE > 0))::INT AS n_pos,
      |  (len(list_filter(embedding, x -> x::DOUBLE > 0.2)) > 0) AS any_big,
      |  (len(list_filter(embedding, x -> NOT (x::DOUBLE > -1.0))) = 0)
      |    AS all_gt_neg1,
      |  round(list_sum(list_transform(generate_series(1, len(embedding)),
      |    j -> embedding[j]::DOUBLE
      |      * embedding[len(embedding) + 1 - j]::DOUBLE)), 6) AS pal_dot,
      |  round(list_sum(list_transform(generate_series(1, len(embedding)),
      |    j -> embedding[j]::DOUBLE * (j - 1))), 6) AS idx_weighted
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        expr("size(filter(embedding, x -> cast(x as double) > 0d))")
          .cast("int").as("n_pos"),
        expr("exists(embedding, x -> cast(x as double) > 0.2d)")
          .as("any_big"),
        expr("forall(embedding, x -> cast(x as double) > -1.0d)")
          .as("all_gt_neg1"),
        round(expr(
          """aggregate(
            |  zip_with(embedding, reverse(embedding),
            |    (x, y) -> cast(x as double) * cast(y as double)),
            |  0d, (a, v) -> a + v)""".stripMargin), 6).as("pal_dot"),
        round(expr(
          """aggregate(
            |  transform(embedding, (x, i) -> cast(x as double) * i),
            |  0d, (a, v) -> a + v)""".stripMargin), 6).as("idx_weighted"))
      .orderBy("vec_id")
  }

  // f21 — VARIANT semi-structured path (Spark 4's VARIANT type: parse
  // once into the binary variant encoding, then typed `variant_get`
  // extraction — the modern replacement for per-access JSON string
  // re-parsing, which is how a 100 TB props column should be stored;
  // b3 grades the string-path twin). The variant column itself never
  // leaves the query (not a gradable output type): it feeds a typed
  // aggregate per event type. DuckDB has no variant — the oracle speaks
  // its native JSON reader, which is exactly the cross-engine claim:
  // same values, different encodings.
  private val f21 = graded(
    "f21_variant_funcs",
    """SELECT event_type, count(*)::BIGINT AS n,
      |  min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
      |  max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k,
      |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    Tables.apply(spark, dir, "events")
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        min($"k").cast("bigint").as("min_k"),
        max($"k").cast("bigint").as("max_k"),
        sum($"k").cast("bigint").as("sum_k"))
      .orderBy($"event_type")
  }

  // f22 — SKYLINE / PARETO-DOMINANCE: parts no other part beats on BOTH
  // (price low, size high) — the multi-criteria shortlist operator
  // (dominance, not ranking: f1's top-k needs a single score; the
  // skyline needs none). The oracle states dominance DECLARATIVELY
  // (NOT EXISTS a dominator) — an independent formulation that cannot
  // inherit the implementation's bugs; the engine computes it as the
  // O(n log n) sweep: sorted by price, a part is dominated iff some
  // strictly-cheaper part has size ≥ its own, or a same-price part has
  // size strictly greater. The sweep's running max runs BANDED (price-
  // band-local RANGE windows + tiny per-band carry-in prefix max —
  // d22/d25's two-pass pattern), never as one global single-partition
  // sort. Exact cents/int sizes — no float boundary.
  private val f22 = graded(
    "f22_skyline_pareto",
    """WITH v AS (
      |  SELECT p_partkey AS pk,
      |    CAST(round(p_retailprice * 100, 0) AS BIGINT) AS pc,
      |    p_size::INT AS sz
      |  FROM part)
      |SELECT pk, pc, sz FROM v a
      |WHERE NOT EXISTS (SELECT 1 FROM v b
      |  WHERE b.pc <= a.pc AND b.sz >= a.sz
      |    AND (b.pc < a.pc OR b.sz > a.sz))
      |ORDER BY pk""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val v = Tables.part(spark, dir)
      .select($"p_partkey".as("pk"),
        round($"p_retailprice" * 100, 0).cast("bigint").as("pc"),
        $"p_size".cast("int").as("sz"))
      .withColumn("band", expr("pc div 50").cast("bigint"))
    val wCheaper = Window.partitionBy($"band").orderBy($"pc")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy($"band").orderBy($"pc")
      .rangeBetween(0, 0)
    val wBands = Window.orderBy($"band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = v.groupBy($"band").agg(max($"sz").as("bmax"))
      .withColumn("carry", max($"bmax").over(wBands))
      .select($"band", $"carry")
    v.withColumn("localCheaper", max($"sz").over(wCheaper))
      .withColumn("sameMax", max($"sz").over(wSame))
      .join(broadcast(carry), "band")
      .withColumn("cheaperMax",
        greatest(coalesce($"localCheaper", lit(Int.MinValue)),
          coalesce($"carry", lit(Int.MinValue))))
      .where(!($"cheaperMax" >= $"sz" || $"sameMax" > $"sz"))
      .select($"pk", $"pc", $"sz")
      .orderBy($"pk")
  }

  val defs: Seq[QueryDef] = Seq(f1, f2, f3, f4, f5, f6, f7, f8, f9, f10,
    f11, f12, f13, f14, f15, f16, f17, f18, f19, f20, f21, f22)
}
