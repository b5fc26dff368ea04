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
  *     O(log diameter)).
  *  3. rounds stop when Σrep stops decreasing (it strictly decreases
  *     until the fixpoint, and the fixpoint of the combined round implies
  *     the neighbor-min fixpoint).
  *
  * Each round's label table is `localCheckpoint`'d: self-referencing
  * joins otherwise grow the logical plan exponentially and the
  * analyze/optimize cost quadratically.
  */
object Components {

  /** @param nodes single-column DataFrame of node ids (long)
    * @param edges  two-column DataFrame of undirected edges; column names
    *               are taken positionally
    * @param loopShufflePartitions shuffle partitions for the per-round
    *        joins. The label table is |nodes| rows — when that is small
    *        relative to the cluster, per-round task-scheduling latency
    *        dominates (measured: 10 rounds × 0.45 s at 32 partitions vs
    *        ~0.15 s at 4 for a 5k-node graph), so the loop narrows the
    *        shuffle and restores the session setting afterwards. Pass
    *        None when the label table is genuinely large.
    * @return (id, rep) — rep is the minimum node id in the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 30,
      loopShufflePartitions: Option[Int] = Some(4)): DataFrame = {
    val spark = nodes.sparkSession
    val oldShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    loopShufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    try connectedComponentsImpl(nodes, edges, maxRounds)
    finally spark.conf.set("spark.sql.shuffle.partitions", oldShuffle)
  }

  private def connectedComponentsImpl(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int): DataFrame = {
    val idCol = nodes.columns.head
    val Seq(srcCol, dstCol) = edges.columns.toSeq.take(2)
    val und = edges
      .select(col(srcCol).as("v"), col(dstCol).as("u"))
      .union(edges.select(col(dstCol).as("v"), col(srcCol).as("u")))
      .localCheckpoint()

    var labels = nodes.select(col(idCol).cast("long").as("doc"))
      .withColumn("rep", col("doc")).localCheckpoint()
    var lastSum = labels.agg(sum("rep")).head().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // neighbor-min: min label over each node's neighbors
      val nbrMin = und
        .join(labels.select(col("doc").as("u"), col("rep").as("urep")), "u")
        .groupBy(col("v").as("doc")).agg(min("urep").as("nrep"))
      val l1 = labels.join(nbrMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      // pointer jump: follow rep → rep(rep)
      val next = l1.as("a")
        .join(l1.select(col("doc").as("rdoc"), col("rep").as("rrep")),
          col("a.rep") === col("rdoc"))
        .select(col("a.doc").as("doc"), least(col("a.rep"), col("rrep")).as("rep"))
        .localCheckpoint()
      val s = next.agg(sum("rep")).head().getLong(0)
      labels = next
      converged = s == lastSum
      lastSum = s
      rounds += 1
    }
    labels.select(col("doc").as(idCol), col("rep"))
  }
}
