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
