package graft

/** Plan-shape regression net: the plans that make the engine scale are
  * asserted, not assumed (SURVEY §4). A change that silently turns an
  * equi-join into a nested loop, or adds a cartesian product, fails here
  * before it fails at 100 TB.
  */
class PlanQualitySpec extends SparkSpec {

  // 1-row or constant-size broadcast sides where a nested-loop broadcast
  // join is exactly right: c9 (25-row dim×dim cross), g4/g6/g17/g30
  // (single query vector / 1-row corpus-totals broadcast), g21 (10-row
  // query set joined with a non-equi self-exclusion predicate), g12
  // (1-row query probed with the non-equi radius-1 Hamming multiprobe
  // predicate).
  private val bnljOk = Set("c9_join_cross", "g4_cosine_topk", "g6_tfidf",
    "g12_ann_lsh", "g17_ann_ivf", "g21_knn_join", "g30_bigram_lift",
    "g32_cluster_assign", // broadcasts the 8-row prototype set (g4's shape)
    "g35_unigram_logprob", // crosses the 1-row corpus-total (g30's shape)
    "g53_perplexity_bucket", // g35's logprob stage — same 1-row cross
    "g37_keywords", // crosses the 1-row corpus-total (g6's shape)
    "d20_hll_merge", // crosses the 1-row whole-table exact count
    "d23_ab_ttest", // crosses the 1-row broadcast control group
    "g56_hard_negatives", // label-inequality over the 10-row query set (g21's shape)
    "g57_knn_eval", // self-exclusion inequality over the bounded eval sample
    "d26_anova", // 5-row moment table crossing its own 1-row total
    "d27_chisq", // contingency cells crossing their own 1-row chi² total
    "g59_mix_plan", // 5-lang plan table crossing the 1-row weight total
    "d43_heavy_hitters", // crosses the 1-row total-token count (g30's shape)
    "d45_bootstrap_ci", // 1-row point estimate crossing the 1-row CI bounds
    "d46_hll_intersect", // |flags|-row sketch table self-crossed (constant)
    "g64_centroid_outliers", // 1-row centroid + 1-row mean + 1-row sigma broadcasts
    "r10_psi_drift", // 10-bucket table crossing its own 1-row totals
    "h21_cusum_changepoint", // day-grain series crossing its own 1-row D/T totals
    "g66_kmeans_step", // broadcasts the 8-row prototype set (g32's shape)
    "g67_bm25", // crosses the 1-row N/avgdl totals (g6's shape)
    "g68_dsir_weights", // crosses the 1-row t_total/b_total/vocab totals
    "h23_inactivity_churn", // crosses the 1-row global-max "now"
    "r11_mix_report", // crosses the 1-row token grand total
    "g70_vocab_coverage", // 3-row cutoff broadcast joined on rk <= cutoff
    "d29_benford", // 9-digit table crossing its own 1-row total
    "d30_ks_test", // banded CDF crossing the 1-row N0/N1 totals
    "d33_infogain", // three 1-row entropy reduces crossed together
    "h27_top_paths", // path table crossing its own 1-row session total
    "g73_dup_ngram_coverage", // gram table crossing the 1-row mass total
    "g74_kn_smoothing", // bigram model crossing the 1-row type total
    "r13_freshness_report", // per-table recount against the 1-row max
    "d34_levene", // k-row moment table crossing its own 1-row total (d26's shape)
    "d35_autocorr", // day-grain series crossing its 1-row n/S + 3-row lag dims
    "g77_stopword_discovery", // df table crossing the 1-row corpus size
    "r14_column_profile", // five 1-row stats × 1-row mode broadcast crosses
    "d37_median_of_means", // two 1-row reduces of the 32-shard table crossed
    "g80_cluster_balance", // K-row sizes crossing their own 1-row min/max
    "r15_kpi_snapshot", // four per-table 1-row snapshots crossed
    "d39_runs_test", // 1-row sign counts crossing the 1-row break count
    "r16_join_cardinality", // per-join 1-row stats/actual reduces crossed
    "g81_dup_degree_dist", // 1-row total × 1-row covered for the 0-degree row
    "c21_join_spatial_grid", // two 3-row neighbor-offset dims crossed
    "g82_quality_dup_matrix", // 6-cell crosstab crossing the 1-row total
    "r17_k_anonymity", // 4-row k-list × bounded class table × 1-row total
    "g92_ann_ivf_batch", // crosses the 1-row broadcast codebook (g17's shape)
    "g93_ann_ivf_pruned", // 1-row query vector crossed into the pruned lists
    "g95_pack_efficiency", // 3-row literal W dimension crossed into the scan
    "g97_pq_adc_topk", // 1-row PQ codebook/LUT + ≤50-row candidate list crossed
    "g98_ivfadc_topk") // same constant-size crosses as g97, over pruned lists

  // Keys whose fn EXECUTES side effects before returning (h34–h38 drain a
  // full streaming query; a21 writes three parquet snapshots) and whose
  // returned frame is just a scan of the result (memory-sink table /
  // snapshot read-back) — capturing their "plan" costs a full run and
  // asserts nothing about the real pipeline. Their internal plan shapes
  // are covered where they are visible: the streaming transforms are the
  // SAME expressions as their batch twins (h1/h3/c19/h28/g1 — all netted
  // here), and a21's builders are g16/g2/g46's plans (also netted here).
  private val executesOnConstruct: Set[String] = Set(
    "h34_stream_tumbling_parity", "h35_stream_session_parity",
    "h36_stream_join_parity", "h37_stream_state_parity",
    "h38_stream_dedup_parity", "a21_verdict_snapshot")

  // Per-key Try: a single broken loader must not cascade into every plan
  // assertion (see GradedQuerySpec's construction gate, which reports the
  // per-key failures; here broken keys are simply absent from `plans`).
  private lazy val plans: Seq[(String, String)] = SparkEntry.all
    .filterNot(d => executesOnConstruct(d.key)).flatMap { d =>
      scala.util.Try(
        d.key -> d.fn(spark, sfDir).queryExecution.executedPlan.toString
      ).toOption
    }

  test("all plans construct") {
    val expected = SparkEntry.all.size - executesOnConstruct.size
    assert(plans.size === expected,
      s"${expected - plans.size} keys failed to construct — " +
        "see GradedQuerySpec's construction gate for per-key errors")
  }

  test("no query plans a CartesianProduct") {
    for ((key, plan) <- plans)
      assert(!plan.contains("CartesianProduct"), s"$key plans a cartesian:\n$plan")
  }

  // `*(n)` prefixes in the EXECUTED plan string mark WholeStageCodegen
  // spans (AQE materializes them only after execution, so each hot key
  // is run first). A hot path that falls out of codegen — e.g. a
  // non-codegen Expression slipping into a projection — is a multi-x
  // interpreter slowdown at 100 TB that no unit test would otherwise
  // catch; this pins the brief's "widen the codegen spans" requirement.
  test("hot paths run inside WholeStageCodegen spans") {
    val hot = Seq("d1_agg_group", "b1_filter_pred", "e4_win_running",
      "f3_str_funcs", "g4_cosine_topk", "g7_text_stats", "c2_join_sortmerge")
    for (key <- hot) {
      val df = SparkEntry.queries(key)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"$key has no codegen span:\n$plan")
      // the custom codegen kernel must live INSIDE a starred span —
      // VecCosine implements doGenCode precisely so scoring stays fused
      if (key == "g4_cosine_topk")
        assert(plan.linesIterator.exists(l =>
          l.contains("*(") && l.contains("vec_cosine")),
          s"vec_cosine fell out of codegen:\n$plan")
    }
  }

  test("g17 IVF build assigns by per-row argmax — no unique-key Window shuffle") {
    // r6 verdict: the build stage joined every vector against all 16
    // centroids (16× fan-out) and ranked with row_number() partitioned by
    // the UNIQUE vec_id — a full corpus shuffle+sort to compute a per-row
    // maximum. The rewritten build scores the one-row broadcast codebook
    // inside the scan projection; no Window may appear anywhere in g17.
    val plan = SparkEntry.queries("g17_ann_ivf")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"g17 build regressed to a Window-shuffle argmax:\n$plan")
  }

  test("nested-loop joins appear only where the build side is constant-size") {
    val offenders = plans.collect {
      case (key, plan) if plan.contains("BroadcastNestedLoopJoin") => key
    }.toSet
    assert(offenders === bnljOk,
      s"unexpected BNLJ in ${offenders.diff(bnljOk)}; " +
        s"stale allowlist entries: ${bnljOk.diff(offenders)}")
  }

  test("report queries broadcast every dim and push the date filters (r2)") {
    val p = plans.toMap.apply("r2_report_region_volume")
    // customer/supplier/nation/region all broadcast; only orders⋈lineitem
    // may shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"), p)
  }

  test("filter pushdown reaches the parquet scan (b1)") {
    val plan = plans.toMap.apply("b1_filter_pred")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull"), plan)
  }

  test("column pruning reaches the parquet scan (a1 reads only selected columns)") {
    val plan = plans.toMap.apply("a1_scan_project")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // a1 projects a subset of lineitem; the scan must not read all 11 columns
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      readSchema)
  }

  test("g26 decontamination broadcasts the benchmark gram set") {
    // the eval-set side must broadcast so the candidate side never
    // shuffles on the gram key — the property that makes g26 viable at
    // 100 TB
    val p = plans.toMap.apply("g26_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("h7 funnel pushes each step's event_type filter into the scan") {
    val p = plans.toMap.apply("h7_funnel")
    for (step <- Seq("view", "click", "purchase"))
      assert(p.contains(s"EqualTo(event_type,$step)"),
        s"missing pushed filter for $step:\n$p")
  }

  test("g28 packing: the large cumsum window is range-partitioned, not global") {
    // the two-pass prefix sum exists precisely to avoid a single-partition
    // global-order window over the full table — the per-document window
    // must partition on the range key
    val p = plans.toMap.apply("g28_pack_chunks")
    assert(p.contains("hashpartitioning(rng"), p)
  }

  test("h10 concurrency: the sweep-line cumsum is day-partitioned, not global") {
    // same invariant as g28: the per-delta running sum must partition on
    // the day key; only the tiny per-day totals table may use a global
    // window
    val p = plans.toMap.apply("h10_max_concurrency")
    assert(p.contains("hashpartitioning(day_k"), p)
  }

  test("c13 salted join: the salt is part of the join key") {
    // the point of the rewrite — hot keys spread over (key, salt); if the
    // salt fell out of the join condition the plan degraded back to the
    // skew-prone single-key shuffle
    val p = plans.toMap.apply("c13_join_salted")
    assert(p.contains("salt"), p)
  }

  test("c22: AQE OptimizeSkewedJoin fires — executed plan carries a skew SMJ") {
    // the row's whole claim is that AQE did the mitigation c13 does by
    // hand; that is only observable in the POST-EXECUTION adaptive plan
    // (skew split is decided from runtime partition sizes), so run the
    // query and then inspect the final plan for the skew-flagged
    // sort-merge join
    val df = SparkEntry.queries("c22_join_skew_aqe")(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("SortMergeJoin"), executed)
    assert(executed.contains("skew=true"),
      s"AQE skew split did not fire at $sfDir:\n$executed")
  }

  test("a24: the MV answer scans the state table, never the fact table") {
    // the consumption half of IVM — if the answer's plan ever rejoins
    // the fact table, the key silently degrades into a full recompute
    // with extra steps
    val p = plans.toMap.apply("a24_mview_rewrite")
    assert(p.contains("graft_mview"), p)
    assert(!p.contains("orders.parquet"),
      s"a24's ANSWER must read maintained state, not the fact table:\n$p")
  }

  test("a24 refresh: merge read is bucket-pruned; untouched buckets are " +
      "not rewritten") {
    // the refresh bound the a24 comment claims — |delta| + |touched
    // buckets' state| — demonstrated on a delta landing in ONE bucket:
    // the merge's base read must carry partition filters (only that
    // bucket's files are scanned) and every other bucket's files must
    // survive the refresh byte-identical (same names — dynamic
    // overwrite never stages into them)
    import spark.implicits._
    import graft.operators.Mview
    val t = s"${graft.sources.TmpDirs.perPidRoot("graft_mview")}/spec/prune"
    graft.sources.TmpDirs.rmTree(new java.io.File(t))
    def st(rows: (Long, Long, Long)*) =
      rows.toDF("o_custkey", "n_orders", "rev_cents")
    // base: one customer per bucket (pmod(custkey, 8) = 0..7)
    Mview.withBucket(st((0L until 8L).map(c => (c, 1L, 100L * c)): _*))
      .write.partitionBy("bucket").parquet(t)
    def bucketFiles(b: Int): Set[String] =
      Option(new java.io.File(t, s"bucket=$b").listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = (0 until 8).map(bucketFiles)
    // delta: two updates, both landing in bucket 3 (custkeys 3 and 11)
    val touched = Mview.refresh(t, st((3L, 2L, 50L), (11L, 1L, 70L)))
    assert(touched === Seq(3), s"delta touches exactly bucket 3: $touched")
    // plan law: the merge's base read is partition-pruned to bucket 3
    val mergePlan = Mview.prunedState(spark, t, touched)
      .queryExecution.executedPlan.toString
    assert(mergePlan.contains("PartitionFilters") &&
      "bucket.*(IN|isnotnull)".r.findFirstIn(mergePlan).nonEmpty,
      s"merge read must prune on the bucket partition column:\n$mergePlan")
    // file law: untouched buckets keep exactly their files
    (0 until 8).filter(_ != 3).foreach { b =>
      assert(bucketFiles(b) === before(b),
        s"bucket $b was rewritten by a refresh that never touched it")
    }
    assert(bucketFiles(3) !== before(3), "bucket 3 was rewritten")
    // content law: the merge is correct (3 merged, 11 inserted, rest kept)
    val rows = spark.read.parquet(t)
      .select($"o_custkey", $"n_orders", $"rev_cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows === ((0L until 8L).filter(_ != 3L)
      .map(c => (c, 1L, 100L * c)).toSet + ((3L, 3L, 350L)) + ((11L, 1L, 70L))))
  }

  test("d49: the maintained-NDV answer scans bitmap state, never the " +
      "fact table") {
    // the a24 consumption contract applied to NDV: if the answer ever
    // rejoins orders, the key degrades into d2's full countDistinct
    // with extra steps
    val p = plans.toMap.apply("d49_bitmap_ndv_maintain")
    assert(p.contains("graft_ndv"), p)
    assert(!p.contains("orders.parquet"),
      s"d49's ANSWER must read maintained bitmap state:\n$p")
  }

  test("g37 keywords: per-doc top-3 is WindowGroupLimit-pruned, not a full rank") {
    // the e5 shape: row_number ≤ k must plan the group-limit pushdown so
    // each shuffle partition retains only k rows per doc before the sort
    val p = plans.toMap.apply("g37_keywords")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("g61 domain cap: per-source top-15 is WindowGroupLimit-pruned") {
    // same rank-limit pushdown contract as g37: each shuffle partition
    // keeps only its per-source top-k before the sort — at 100 TB the
    // shuffle carries candidates, not the corpus
    val p = plans.toMap.apply("g61_domain_cap")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("g67 BM25: per-term top-20 is WindowGroupLimit-pruned") {
    // the retrieval shape: each shuffle partition keeps only its per-term
    // top-k candidates before the sort — g37's rank-limit contract
    val p = plans.toMap.apply("g67_bm25")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("g94 RRF: both per-query retrieval top-20s are WindowGroupLimit-" +
      "pruned and the posting joins are equi-joins") {
    // hybrid retrieval at scale = two posting equi-joins + rank-limit
    // pushdown; a missing group limit would sort every candidate list
    // in full before cutting to 20
    val p = plans.toMap.apply("g94_rrf_fusion")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g93 IVF on disk: the probe read is partition-pruned on cid") {
    // g17's "list id is a partition key" claim, asserted: the search
    // scan must carry the probe ids as PartitionFilters — at 100 TB
    // this is nprobe/C of the corpus vs a full scan
    val p = plans.toMap.apply("g93_ann_ivf_pruned")
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).nonEmpty,
      s"probe read must prune on the cid partition column:\n$p")
  }

  test("g98 IVFADC: the probe read is partition-pruned on cid AND " +
      "scans codes, never raw vectors") {
    // the assembled composition's two cost claims, pinned on one plan:
    // IVF prunes WHICH lists are read (cid PartitionFilters), PQ
    // compresses WHAT the scan reads (the index scan's ReadSchema
    // carries codes, not embedding)
    val p = plans.toMap.apply("g98_ivfadc_topk")
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).nonEmpty,
      s"probe read must prune on the cid partition column:\n$p")
    assert("ReadSchema: [^\\n]*codes".r.findFirstIn(p).nonEmpty,
      s"candidate scan must read the PQ codes:\n$p")
  }

  test("g92 batched IVF: candidates join the lists on cid, per-query " +
      "top-k is WindowGroupLimit-pruned, no all-pairs stage") {
    // the batched-ANN scale contract: ONE equi-join on the list id (at
    // 100 TB: co-located on the cid bucketing), rank-limit pushdown
    // keeps k rows per query per shuffle partition before the sort, and
    // the only nested-loop join is the 1-row codebook broadcast — a
    // brute-force all-pairs stage would plan a second BNLJ over the
    // corpus-sized query set
    val p = plans.toMap.apply("g92_ann_ivf_batch")
    assert(p.contains("WindowGroupLimit"), p)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).nonEmpty, s"list probe must be an equi-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("i5 SQL UDF inlines into the plan — no black-box ScalaUDF node") {
    // the point of the SQL-function surface: the body participates in
    // Catalyst (codegen/folding/pushdown) instead of opaquing the plan
    val p = plans.toMap.apply("i5_sql_udf")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("d18 MAD: both percentile lookups join back as broadcasts") {
    // med and mad are 3-row tables; shuffling lineitem twice to join them
    // would double the query's cost at any scale
    val p = plans.toMap.apply("d18_mad_outliers")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("d45 bootstrap: the x200 resample explode collapses map-side") {
    // the 100 TB claim: the per-(row, resample) explode never rides a
    // shuffle — partial aggregation reduces it to 200 rows per partition
    // BEFORE the b-keyed exchange. If the partial agg disappeared, the
    // shuffle would carry 200x the corpus.
    val p = plans.toMap.apply("d45_bootstrap_ci")
    val gen = p.indexOf("Generate explode")
    val ex = p.indexOf("Exchange hashpartitioning(b#")
    assert(gen >= 0, "no explode in the d45 plan:\n" + p)
    assert(ex >= 0 && ex < gen,
      "b-shuffle missing or not downstream of the explode:\n" + p)
    assert(p.substring(ex, gen).contains("partial_sum"),
      "no partial aggregate between the b-shuffle and the explode:\n" + p)
  }

  test("b6: the fact scan carries a DYNAMIC partition-pruning subquery") {
    // the dim-side family filter must reach the partitioned fact scan as a
    // runtime DPP expression (lang IN dynamicpruning#N) — a static filter
    // can't exist here because the family lives in dim relation data
    val p = plans.toMap.apply("b6_partition_prune")
    assert(p.contains("dynamicpruning"), p)
  }

  test("runtime bloom filter injects on a selective shuffle join (100 TB lever)") {
    // At cluster scale, a selective dim-side filter should semi-join-reduce
    // the fact scan BEFORE the shuffle: Spark's InjectRuntimeFilter plants a
    // bloom_filter_agg on the filtered side and a bloom_filter_might_contain
    // probe on the fact side. The thresholds are sized for real clusters
    // (application side ≥ 10 GB), so this pins the capability at test scale
    // by lowering them — the assertion is that the engine's join shapes KEEP
    // qualifying for the rewrite (equi-join, selective creation side), not a
    // config default.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      import org.apache.spark.sql.functions._
      val o = sources.Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val l = sources.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
      val q = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val plan = q.queryExecution.optimizedPlan.toString
      // Spark 4.1 renders the injected probe as might_contain(<subquery>)
      // over a bloom_filter_agg build — assert both halves of the rewrite
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("a18: bucketed join and aggregate run with zero join/agg shuffles") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      import org.apache.spark.sql.functions._
      operators.ScansFilters.bucketedTables(spark, sfDir)
      val (ot, lt) = operators.ScansFilters.bucketedNames(sfDir)
      val q = spark.table(ot)
        .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      // bucket specs match on both sides → the join AND the same-key
      // aggregate need no Exchange anywhere in the plan
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan not bucket-aware:\n$plan")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("c20: the explicit bloom probe pre-filters the fact side before the join") {
    val df = SparkEntry.queries("c20_join_bloom")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the might_contain probe must appear as a Filter condition (fact-scan
    // side), not only inside the bloom build's aggregate
    val probeOnFact = plan.linesIterator.exists(l =>
      l.contains("might_contain") && l.contains("l_orderkey"))
    assert(probeOnFact, s"bloom probe not on the fact side:\n$plan")
  }

  test("whole-stage codegen covers the scan→filter→project pipelines") {
    // AQE materializes the final plan (with codegen stages) only after
    // execution — run the query, then inspect
    val df = SparkEntry.queries("b1_filter_pred")(spark, sfDir)
    df.collect() // count() would spawn a separate QueryExecution
    // after execution AQE renders the final plan; codegen stages appear as
    // "*(n)" markers in compact form (or WholeStageCodegen in tree form)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      """\*\(\d+\)""".r.findFirstIn(plan).nonEmpty, plan)
  }
}
