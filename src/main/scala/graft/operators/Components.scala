package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components for dedup clustering (hash-to-min label
  * propagation accelerated by pointer jumping).
  *
  * The dedup pipelines reduce "which documents are the same?" to
  * components over a verified-similarity edge list; the component
  * representative (minimum id) is the retained document. This is the
  * standard large-graph formulation that runs on joins only — no step
  * ever collects the graph to the driver:
  *
  *  1. **neighbor-min** — `rep(v) ← min(rep(v), min over neighbors u of
  *     rep(u))`: one join of the label table with the undirected edge
  *     list + one aggregate. At the fixpoint of this step alone, labels
  *     are constant across every edge, i.e. exactly the component minimum
  *     — this is what makes the algorithm correct.
  *  2. **pointer jump** — `rep(v) ← min(rep(v), rep(rep(v)))`: halves
  *     remaining chain depth, purely an accelerator (without it the
  *     neighbor-min fixpoint needs O(diameter) rounds; with it,
  *     O(log diameter)). Applied `jumpsPerRound` times per round: each
  *     application is one more tiny label-table self-join INSIDE the same
  *     checkpointed round, while each saved ROUND costs two scheduled
  *     jobs — at 3 jumps the per-round depth reduction is ~8× (measured:
  *     a 2000-node path converges in 5 rounds vs 11 with one jump).
  *  3. rounds stop when the label-contracted QUOTIENT graph has no edge
  *     left (lv ≠ lu) — that emptiness ⟺ labels constant across every
  *     edge ⟺ the neighbor-min fixpoint. A non-empty quotient strictly
  *     decreases Σrep within its round (min-monotone updates), so
  *     progress per round is guaranteed and no separate convergence
  *     aggregate is needed (r15: the old per-round Σrep job never fired
  *     before the quotient check and was removed).
  *
  * Each round's label table is `localCheckpoint`'d: self-referencing
  * joins otherwise grow the logical plan exponentially and the
  * analyze/optimize cost quadratically.
  *
  * CRITICAL detail: the in-loop checkpoints are wrapped in
  * [[freshStatsCheckpoint]]. Spark's `localCheckpoint` truncates the
  * LINEAGE but carries the origin plan's STATISTICS onto the resulting
  * `LogicalRDD` — so a loop that feeds checkpoint(joins(checkpoint(...)))
  * back into itself compounds the size estimate every round
  * (estimate^2 per self-join — ^8 with 3 jumps). By round ~4 the
  * sizeInBytes BigInt has millions of digits and the optimizer's stats
  * visitor (`SizeInBytesOnlyStatsPlanVisitor`, via InjectRuntimeFilter /
  * join selection) burns minutes in BigInteger multiplication — observed
  * as a >240 s hang on a 500-node graph. Rebuilding the DataFrame from
  * the checkpointed RDD resets stats to the session default at the cost
  * of an InternalRow↔Row conversion per consumption — negligible for a
  * label table, and bounded at any scale because it never compounds.
  */
object Components {

  /** localCheckpoint + detach the origin-plan statistics (see class doc). */
  private def freshStatsCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** [[freshStatsCheckpoint]] with eager = false: the RDD is MARKED for
    * local checkpointing but not yet computed, so the first job that
    * consumes it materializes (and persists) it as an ordinary
    * dependency. This is the round-fusion device (r15 verdict #1): a
    * chain of lazily-marked intermediates collapses into the ONE
    * scheduled job that materializes the chain's eager tail, while each
    * link still ends up persisted + lineage-truncated exactly as the
    * eager form — same dataflow, same per-link caching, fewer job
    * barriers. Stats are detached the same way (class doc).
    */
  private def lazyStatsCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(false)
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** NON-EMPTY label-loop rounds executed by the most recent
    * [[connectedComponents]] call (rounds whose quotient still had edges,
    * i.e. rounds that actually propagated labels — the empty-quotient
    * verify round does not count). A diagnostic/test observability hook:
    * ComponentsSpec uses it to verify a fixture actually exercised the
    * label loop rather than the contraction-only early path, so a future
    * contraction improvement fails that test with a clear message instead
    * of a spurious partition-count mismatch. Not part of the operator
    * contract.
    *
    * SINGLE-THREADED assumption: as a process-global last-writer-wins
    * cell it is only meaningful when connectedComponents calls do not
    * overlap — true today (Bench/Verify run keys sequentially; the
    * suites share one JVM but never run two component builds at once).
    * If a caller ever parallelizes component builds, read this hook
    * nowhere and thread a per-call counter out instead.
    */
  @volatile var lastRunNonEmptyRounds: Int = -1

  /** Loop shuffle sizing from the OBSERVED label-table row count.
    *
    * The label table is |nodes| rows of (long, long) — per-round
    * task-scheduling latency dominates when it is small (measured: 10
    * rounds × 0.45 s at 32 partitions vs ~0.15 s at 4 for a 5k-node
    * graph), while a corpus-sized label table funneled through a small
    * constant is the classic at-scale bottleneck. So: target ~50k label
    * rows per task (≈ 800 KB of (long, long) — latency-bound below that,
    * comfortably parallel above), capped at the SESSION shuffle setting —
    * on a real cluster that cap is the user's cluster-wide sizing knob
    * and AQE coalesces below it; exceeding it here would second-guess
    * both — and floored at 4 (the measured small-graph sweet spot). The
    * floor takes PRECEDENCE over the cap: a session setting below 4 is
    * deliberately exceeded, because a 1-3-partition label loop serializes
    * every round with no compensating benefit.
    */
  def loopPartitionsFor(labelRows: Long, sessionParts: Int): Int = {
    val rowsPerTask = 50000L
    val needed = (labelRows + rowsPerTask - 1) / rowsPerTask
    math.max(4L, math.min(sessionParts.toLong, needed)).toInt
  }

  /** A child session sharing the SparkContext, catalog and cached data
    * with `spark`, carrying all of spark's MODIFIABLE runtime confs
    * (newSession() starts from builder/static confs, not the caller's
    * runtime state — AQE toggles, broadcast thresholds, timezone must
    * mean the same thing inside the scope), with `shuffle.partitions`
    * overridden to `shufflePartitions`. The conf-scoping device the
    * label loop runs under, exposed for any operator that needs a
    * narrowed (or widened) planning width without mutating the caller's
    * session — queries planned concurrently on the caller never see the
    * scoped width.
    */
  def scopedSession(spark: org.apache.spark.sql.SparkSession,
      shufflePartitions: Int): org.apache.spark.sql.SparkSession = {
    val child = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      if (child.conf.isModifiable(k)) child.conf.set(k, v)
    }
    child.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    child
  }

  /** @param nodes single-column DataFrame of node ids (long)
    * @param edges  two-column DataFrame of undirected edges; column names
    *               are taken positionally
    * @param loopShufflePartitions shuffle partitions for the per-round
    *        joins. Default None = ADAPTIVE: sized from the counted label
    *        table via [[loopPartitionsFor]] (one count piggybacked on the
    *        seed-sum job, zero extra actions) — small dedup graphs keep
    *        the measured 4-partition fast path, corpus-sized node tables
    *        get the full session parallelism instead of a constant-4
    *        funnel. Pass Some(n) only to pin a count in tests.
    * @return (id, rep) — rep is the minimum node id in the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 30,
      loopShufflePartitions: Option[Int] = None,
      jumpsPerRound: Int = 2,
      contractPasses: Int = 3): DataFrame = {
    require(jumpsPerRound >= 1 && contractPasses >= 1)
    // localContract's per-partition union-find memory is bounded by the
    // partition's node set, so it must use the SESSION sizing (e.g. 32),
    // not the label-loop's deliberately-small count — at scale the
    // narrowed count would concentrate the edges' nodes into a handful
    // of in-memory maps.
    val contractParts =
      nodes.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    connectedComponentsImpl(nodes, edges, maxRounds, jumpsPerRound,
      contractParts, loopShufflePartitions, contractPasses)
  }

  /** Phase 1 — partition-local contraction: union-find over each
    * partition's edge subset (`mapPartitions`, one pass, path-halving),
    * emitting (node, local component min) pairs. The loop then iterates
    * over THIS bipartite pair set instead of the raw edges: every original
    * edge was already merged locally, so each partition's subgraph
    * collapses to stars and the join loop only reconciles components that
    * straddle partitions. This is the standard local-contraction move for
    * distributed CC — the per-partition pass is memory-bounded by the
    * partition size (pick edge partitioning so a partition's node set
    * fits an executor; at 100 TB that is the same sizing exercise as any
    * hash aggregation), and it converts O(diameter) join rounds into
    * O(log #partitions-straddled) — measured 10 rounds → 2 on the sf0.01
    * dedup graph (the loop reaches the fixpoint in round 1 and round 2
    * verifies it), with identical output.
    */
  private def localContract(edges: DataFrame, parts: Int): DataFrame = {
    import edges.sparkSession.implicits._
    val Seq(srcCol, dstCol) = edges.columns.toSeq.take(2)
    edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      // RANGE partition by source id: contraction only helps when edges of
      // the same component co-locate, and similarity edges overwhelmingly
      // connect nearby ids (banded/chained candidates) — hash partitioning
      // scatters a chain's edges across partitions and contracts nothing
      // (measured: zero round reduction), range partitioning collapses
      // each id-range's subgraph completely
      .repartitionByRange(parts, col("s"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) {
            val p = parent(x)
            parent(x) = parent.getOrElse(p, p) // path halving
            x = parent(x)
          }
          x
        }
        it.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union by min: keep the smaller id as root
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
          parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
        }
        parent.keysIterator.map(n => (n, find(n))).toSeq.iterator
      }
      .toDF("doc", "lrep")
  }

  private def connectedComponentsImpl(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int, jumpsPerRound: Int, contractParts: Int,
      loopShufflePartitions: Option[Int], contractPasses: Int = 3)
      : DataFrame = {
    val spark = nodes.sparkSession
    val idCol = nodes.columns.head
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    if (debug) println("[cc] building und")
    // materialize the edge list ONCE before contraction: pass 1's
    // repartitionByRange runs a range-SAMPLING job over its input before
    // the shuffle, so an unmaterialized edge plan executes twice — and
    // every CC caller derives edges from an expensive pipeline (banded
    // LSH joins, similarity verification, window ranks). Measured on
    // g44's LSH edge set: ~1.7 s of duplicated derivation saved for one
    // cheap (s, d)-pair materialization (16 B/row at any graph size).
    val edgesMat = freshStatsCheckpoint(edges)
    // components over (node, local-rep) pairs ≡ components over the raw
    // edges: a partition's UF links exactly the nodes its edges connect,
    // and the pairs connect those nodes through their local rep.
    // checkpointed: consumed by both the edge list and the label seed —
    // uncheckpointed, the second consumer re-runs the whole upstream
    // edge-producing pipeline (for the LSH callers that is the full
    // signature+verify plan)
    // THREE contraction passes with alternating locality: pass 1
    // co-locates by source id (collapses each id-range's subgraph), pass
    // 2 re-keys the surviving (node, local-rep) pairs by REP id — chains
    // that straddled pass-1 partitions meet at their reps and collapse
    // there — and pass 3 re-keys by node id again over the now-aligned
    // reps. localContract's output always has the same component
    // structure as its input, so passes compose safely; measured: pass 2
    // cut the 8× sf0.1 join loop from ~5 rounds to ~2, pass 3 cut sf0.1
    // from 3 to 2 — each pass is one linear mapPartitions over the
    // (much smaller) pair set, each saved round is two scheduled jobs.
    // pass 3 keys by NODE id again: pass 2 merged chains at their reps,
    // which re-labels nodes into fewer, smaller-id reps — re-keying by
    // node id lets each id-range see its nodes' (now more aligned) reps
    // side by side and collapse another level of the straddle chains.
    // `contractPasses` continues the same rep/node alternation: a caller
    // that KNOWS its components straddle many id-ranges (g40's per-
    // customer order chains scatter over the whole key range — the
    // label-propagation worst case) buys extra passes at ~2 cheap jobs
    // each instead of join rounds at ~6 jobs each (r15 measurement on
    // g40: 7 passes → 3 non-empty rounds become 2 and the round-1
    // quotient shrinks, run2 9.7 s → 8.2 s; the default stays 3 because
    // the LSH dedup graphs converge there already and extra passes would
    // be pure cost for them).
    val cascade = (2 to contractPasses).foldLeft(localContract(edgesMat,
        contractParts)) { (prev, i) =>
      val keyed = if (i % 2 == 0) prev.select(col("lrep"), col("doc"))
                  else prev.select(col("doc"), col("lrep"))
      localContract(keyed, contractParts)
    }
    // contracted is consumed three times (both und directions + the seed
    // aggregate) — LAZILY marked: the seed-phase fusion below computes
    // and persists it inside the first job that needs it, instead of
    // paying a dedicated materialization job (r16: seed-phase fusion,
    // same dataflow as the old eager form).
    val contracted = lazyStatsCheckpoint(
      cascade.where(col("doc") =!= col("lrep")))
    val und0 = contracted
      .select(col("doc").as("v"), col("lrep").as("u"))
      .union(contracted.select(col("lrep").as("v"), col("doc").as("u")))
    if (debug) println("[cc] und planned")

    // seed labels with the locally-contracted rep where one exists.
    // contracted has one row PER PARTITION a node appears in — aggregate
    // to one seed per node BEFORE the join, or nodes straddling
    // partitions would be duplicated in the label table (and every
    // downstream row containing them doubled).
    val seed = contracted.groupBy(col("doc")).agg(min(col("lrep")).as("lrep"))
    var labels = lazyStatsCheckpoint(
      nodes.select(col(idCol).cast("long").as("doc"))
        .join(seed, Seq("doc"), "left")
        .select(col("doc"), coalesce(col("lrep"), col("doc")).as("rep")))
    if (debug) println("[cc] labels planned")
    // QUOTIENT REWRITE (the alternating-algorithm step): map both edge
    // endpoints through the current labels and drop self-loops, so each
    // round propagates over the contracted quotient graph instead of
    // the original edges. On a fixed edge set the min label walks ONE
    // edge-hop per round — chain-shaped components (diameter = size)
    // took O(diameter) rounds (measured: 12 on the g40 order-chain
    // graph). Contracting through the labels merges every already-
    // agreed run into one quotient vertex, so remaining diameter
    // shrinks geometrically → O(log diameter) rounds (measured: 12→4
    // on the same graph). Correctness: label(v) is always in v's
    // component (min-monotone updates over component members only), so
    // the quotient preserves connectivity, every und vertex is a label
    // value — a real node id present in `labels` — and the edge set
    // SHRINKS as components agree, so later rounds get cheaper.
    // When the materialized quotient is OBSERVED small (≤ ~8 MB of
    // (long, long) rows — the autoBroadcastJoinThreshold ballpark), hint
    // BROADCAST on the quotient side of every join that consumes it:
    // with AQE off inside the loop scope (below) the static planner sees
    // only default LogicalRDD stats and would sort-merge every join,
    // shuffling the LABEL table (the big side at scale) once per
    // consumption. The election is driven by the same per-round count
    // that decides convergence — observed data, not a config (the a37
    // manifest-stats-elects-broadcast discipline; guide §3.1). Early
    // at-scale rounds with a big quotient keep the sort-merge plan.
    def quotient(u: DataFrame, l: DataFrame, small: Boolean): DataFrame = {
      val j1 = (if (small) broadcast(u) else u)
        .join(l.select(col("doc").as("v"), col("rep").as("lv")), "v")
      (if (small) broadcast(j1) else j1)
        .join(l.select(col("doc").as("u"), col("rep").as("lu")), "u")
        .where(col("lv") =!= col("lu"))
        .select(col("lv").as("v"), col("lu").as("u"))
        .distinct()
    }
    // SEED-PHASE FUSION (r16): the FIRST quotient rewrite is the eager
    // tail that materializes contracted → seed labels → first quotient
    // in ONE scheduled job (the lazy marks above persist each link as an
    // ordinary dependency of this job). It deliberately runs in the
    // CALLER session at session width: the first quotient processes the
    // full contracted pair set — the widest data the loop ever sees —
    // while the narrowed loop width below is sized from the label table
    // and applies from the first propagation round on (identical values
    // to the pre-r16 sequence: u1 = Q(u0, l0)).
    var und = freshStatsCheckpoint(quotient(und0, labels, small = false))
    if (debug) println("[cc] first quotient done")
    // the label row count the adaptive loop sizing needs — counting
    // `nodes` directly would re-execute its upstream plan (for g19 that
    // is the whole exact-dedup stage), while `labels` was just persisted
    // by the fused job above, so this aggregates a cached RDD.
    val labelRows = labels.agg(count(lit(1))).head().getLong(0)
    // everything above (contraction, und, seed labels) ran at the SESSION
    // shuffle sizing; only the per-round loop joins below are re-sized.
    // The narrowed width is scoped to a CHILD session (shared
    // SparkContext, shared cache; own SQLConf) instead of mutating the
    // caller's session-global shuffle.partitions: per-round
    // joins/aggregates have no per-DataFrame width knob the planner
    // honors without an extra exchange per round, but a whole-session
    // conf IS per-DataFrame-scopeable by building the loop's DataFrames
    // against the child session — its checkpointed-RDD inputs are
    // session-independent, so re-homing them is the same cheap
    // InternalRow↔Row layer freshStatsCheckpoint already pays. Queries
    // planned concurrently on the caller's session never see the loop
    // width; [[scopedSession]] carries the caller's runtime confs in.
    val loopParts = loopShufflePartitions
      .getOrElse(loopPartitionsFor(labelRows, contractParts))
    val loopSession = scopedSession(spark, loopParts)
    // NON-ADAPTIVE planning inside the loop scope only (r16 round
    // fusion): with AQE, `localCheckpoint(eager = false)` is not lazy —
    // AdaptiveSparkPlanExec materializes every intermediate stage at
    // mark time, re-imposing the per-link job barriers the fusion
    // exists to remove. Inside this scope AQE has nothing left to
    // decide that the operator does not already derive from observed
    // data: the shuffle width IS the row-count-adaptive loopParts
    // (AQE's coalescing lever), every table is (long, long), and the
    // round sequence is inherently serial, so the job-barrier count is
    // the scale-dominant term (one barrier per round vs three). The
    // caller session's AQE setting is untouched.
    loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    def rehome(df: DataFrame, s: org.apache.spark.sql.SparkSession) =
      s.createDataFrame(df.rdd, df.schema)
    und = rehome(und, loopSession)
    labels = rehome(labels, loopSession)
    if (debug) println(s"[cc] init rows=$labelRows loopParts=$loopParts")
    // EARLY EXIT on an empty quotient: no edge with lv != lu remains ⟺
    // labels are constant across every edge ⟺ the neighbor-min fixpoint
    // (= component minima, see class doc). `und` is always an
    // already-persisted checkpoint RDD here, so the emptiness probe is
    // one tiny cached-scan job — never a recomputation.
    // the per-round quotient row count serves BOTH the convergence test
    // (0 rows ⟺ fixpoint, the old isEmpty probe) and the broadcast
    // election above — one tiny cached-scan job either way, since `und`
    // is always a persisted checkpoint RDD here.
    var undRows = und.count()
    var converged = undRows == 0L
    var rounds = 0
    var nonEmptyRounds = 0
    // ROTATED ROUND STRUCTURE (r16, from the r15 verdict's top item):
    // each iteration computes l_k = P(u_k, l_{k-1}) (neighbor-min +
    // jumps) and u_{k+1} = Q(u_k, l_k) as ONE fused job — the round's
    // eager tail is the next quotient's checkpoint, and the lazily
    // marked l1/labels links persist as its ordinary dependencies. The
    // produced (u, l) sequence is VALUE-IDENTICAL to the pre-r16 loop
    // (which ran Q first, then P, as 3 checkpoint jobs per round): the
    // first quotient moved above the loop, everything else is the same
    // alternation. Convergence/termination argument unchanged: a
    // NON-empty quotient strictly decreases Σrep in its round (its
    // (lv ≠ lu) edge hands min(lv, lu) to the larger side through
    // neighbor-min, every update is min-monotone), so progress per
    // round is guaranteed and the loop terminates via the quotient
    // check (maxRounds backstops). No work is wasted in any round: the
    // final quotient — the one that comes up empty — is exactly the
    // convergence proof the old verify round computed, and every
    // propagation ran over a non-empty quotient.
    while (!converged && rounds < maxRounds) {
      val tR = System.nanoTime()
      // ≤ ~8 MB of (long, long) quotient rows → broadcast it into every
      // join that consumes it (see `quotient`'s election note)
      val small = undRows <= 500000L
      // neighbor-min: min label over each node's neighbors
      val nbrMin = (if (small) broadcast(und) else und)
        .join(labels.select(col("doc").as("u"), col("rep").as("urep")), "u")
        .groupBy(col("v").as("doc")).agg(min("urep").as("nrep"))
      // mark before jumping: each jump SELF-joins its input, so an
      // unmarked chain doubles the (edge-join + aggregate) subtree per
      // jump — 2^k copies. Over the persisted link every jump is a join
      // of in-memory scans, and k jumps compress label-path depth by
      // 2^k within one scheduled round.
      val l1 = lazyStatsCheckpoint(labels
        .join(if (small) broadcast(nbrMin) else nbrMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep")))
      val jumped = (1 to jumpsPerRound).foldLeft(l1) { (cur, _) =>
        cur.as("a")
          .join(cur.select(col("doc").as("rdoc"), col("rep").as("rrep")),
            col("a.rep") === col("rdoc"))
          .select(col("a.doc").as("doc"),
            least(col("a.rep"), col("rrep")).as("rep"))
      }
      val nextLabels = lazyStatsCheckpoint(jumped)
      // the round's ONE eager materialization: quotient against the NEW
      // labels — computing it schedules l1 and nextLabels on the way
      und = freshStatsCheckpoint(quotient(und, nextLabels, small))
      labels = nextLabels
      rounds += 1
      nonEmptyRounds += 1
      undRows = und.count()
      if (undRows == 0L) converged = true
      if (debug) println(f"[cc] round $rounds${if (converged) " (converged)" else ""} ${(System.nanoTime() - tR) / 1e9}%.2f s")
    }
    lastRunNonEmptyRounds = nonEmptyRounds
    // re-home the result to the CALLER's session: downstream operators
    // compose it with caller-session DataFrames and must plan at the
    // caller's sizing, not the loop's. The underlying checkpointed RDD
    // keeps the loop's partitioning (observable, and observed by
    // ComponentsSpec); only the planning session changes.
    rehome(labels, spark).select(col("doc").as(idCol), col("rep"))
  }
}
