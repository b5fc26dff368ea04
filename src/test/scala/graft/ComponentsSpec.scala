package graft

import graft.operators.Components

class ComponentsSpec extends SparkSpec {

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(
      nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("shared-hub graph: a node with no min-ward in-edge still merges") {
    // edges (1,3),(2,3): naive pointer-chasing leaves 2 alone; correct
    // components merge all three
    val got = cc(Seq(1L, 2L, 3L), Seq((1L, 3L), (2L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain converges (pointer jumping beats O(n) rounds)") {
    val n = 200L
    val nodes = (1L to n)
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(nodes, edges)
    assert(got.values.toSet === Set(1L))
  }

  test("scattered-id path converges in O(log diameter) rounds") {
    // the g40 lesson: a path whose consecutive neighbors have SCATTERED
    // ids defeats the range-partitioned local contraction (the adjacent-id
    // chain above does not), so convergence rides entirely on the
    // in-loop quotient rewrite. A 2048-node scattered path converges in
    // 7 rounds with it (measured); without it the loop is diameter-bound
    // and 10 rounds leave wrong labels — this pins the bound.
    import spark.implicits._
    val n = 2048
    val perm = (0 until n).map(i => (i * 1223) % n) // odd multiplier: bijection mod 2^11
    val edges = (0 until n - 1).map(i => (perm(i).toLong, perm(i + 1).toLong))
    val labels = Components.connectedComponents(
      (0L until n.toLong).toDF("id"), edges.toDF("s", "d"), maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === n)
    assert(labels.values.forall(_ == 0L)) // one component, min id 0
  }

  test("disjoint cliques and singletons keep separate representatives") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L))
    val got = cc(nodes, edges)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(99L) == 99L)
  }

  test("label table has exactly one row per node (partition-straddling chain)") {
    // regression: the local-contraction pass emits one (node, lrep) pair
    // per partition a node appears in; an unaggregated seed join once
    // duplicated straddling nodes in the label table — toMap-based
    // assertions (above) cannot see that, so pin the raw row count
    import spark.implicits._
    val n = 200L
    val labels = Components.connectedComponents(
      (1L to n).toDF("id"), (1L until n).map(i => (i, i + 1)).toDF("src", "dst"))
    assert(labels.count() === n)
    assert(labels.select("id").distinct().count() === n)
  }

  test("loop shuffle sizing: adaptive, never a constant-4 funnel at scale") {
    // the r6 verdict finding: every dedup call site ran the label loop at
    // a hard-coded 4 shuffle partitions — right for 5k-node graphs, a
    // 4-partition funnel for a corpus-sized label table. The sizing rule:
    // ~50k label rows per task, floor 4 (small-graph latency sweet spot),
    // cap = session shuffle partitions (the cluster-wide sizing knob).
    assert(Components.loopPartitionsFor(0L, 32) === 4)
    assert(Components.loopPartitionsFor(5000L, 32) === 4)       // sf0.01 dedup graph
    assert(Components.loopPartitionsFor(200000L, 32) === 4)     // = 4 tasks of 50k
    assert(Components.loopPartitionsFor(300000L, 32) === 6)     // grows with rows
    assert(Components.loopPartitionsFor(100000000000L, 32) === 32)   // local cap
    assert(Components.loopPartitionsFor(100000000000L, 4096) === 4096) // cluster cap
    assert(Components.loopPartitionsFor(1000000L, 2) === 4)     // floor beats a tiny session
  }

  test("label loop runs at the adaptive width, not the small-graph floor") {
    // scattered-id path (defeats local contraction → the loop must run
    // ≥1 real round) over enough nodes that adaptive sizing must pick
    // MORE than the 4-partition floor; the returned labels carry the
    // loop's shuffle partitioning, so the partition count is observable.
    import spark.implicits._
    val n = 300000
    val perm = (0 until n).map(i => (i.toLong * 299711L) % n) // odd ⊥ n=3e5? 299711 odd, gcd check below
    // 299711 = prime > n/…; ensure bijection: gcd(299711, 300000) = 1
    assert(BigInt(299711).gcd(BigInt(n)) == BigInt(1))
    val edges = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
    // the shared test session runs at 4 shuffle partitions (which would
    // CAP the adaptive size right at the floor and hide a regression) —
    // widen to a cluster-like 32 for this call, restore after. AQE is
    // disabled for the call because its small-partition coalescing
    // rewrites the runtime partition count and would hide WHICH conf
    // ceiling the loop ran under — the exact thing this test observes.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val expected = Components.loopPartitionsFor(n.toLong, 32)
      assert(expected > 4, s"fixture too small to distinguish adaptive from floor ($expected)")
      val labels = Components.connectedComponents(
        (0L until n.toLong).toDF("id"), edges.toDF("s", "d"))
      // FIXTURE GUARD: the partition observation below is only meaningful
      // if the label LOOP produced the returned labels. If contraction
      // ever collapses this scattered chain completely, the early-exit
      // path returns seed labels at session width — that is an
      // improvement, not a sizing regression, and this assert names it.
      assert(Components.lastRunNonEmptyRounds >= 1,
        "fixture no longer defeats local contraction (loop ran 0 non-empty " +
          "rounds) — pick a harder fixture for the adaptive-width test")
      assert(labels.rdd.getNumPartitions === expected,
        s"label loop not adaptively sized: got ${labels.rdd.getNumPartitions}, want $expected")
      assert(labels.select("rep").distinct().count() === 1L) // still one component
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("random graph matches a driver-side union-find oracle") {
    val rnd = new scala.util.Random(5)
    val n = 300
    val nodes = (0L until n)
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // oracle: classic union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = nodes.map(i => i -> find(i.toInt).toLong).toMap
    assert(cc(nodes, edges) === expect)
  }
}
