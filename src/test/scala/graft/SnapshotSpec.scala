package graft

/** a21's snapshot contract: after the verdict snapshot is written, every
  * audit-family consumer (1) actually READS the parquet snapshot instead
  * of re-deriving the shared pipeline, and (2) produces byte-identical
  * results to its inline fallback — the property that keeps the oracle
  * hashes stable whichever path served a given run.
  */
class SnapshotSpec extends SparkSpec {

  private val auditKeys = Seq("g46_survivorship", "g49_dedup_eval",
    "g81_dup_degree_dist", "g82_quality_dup_matrix",
    "g83_source_pair_flow", "g84_dedup_length_bias")

  private def rows(key: String): Seq[Seq[Any]] =
    SparkEntry.queries(key)(spark, sfDir).collect().toSeq.map(_.toSeq)

  test("audit keys: inline path == snapshot path, and the snapshot is read") {
    // this JVM may already have written snapshots (suite order is not
    // fixed) — clear them so the first pass is genuinely inline
    val snapRoot = new java.io.File(
      s"/tmp/graft_snapshots/${ProcessHandle.current().pid()}")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    if (snapRoot.exists()) rmrf(snapRoot)
    val inline = auditKeys.map(k => k -> rows(k)).toMap
    inline.foreach { case (k, r) => assert(r.nonEmpty, s"$k empty inline") }
    // write the snapshots (the graded a21 round trip)
    assert(rows("a21_verdict_snapshot").nonEmpty)
    // drop session-cached fragments before probing lineage: a persisted
    // plan built on a snapshot read (g85's census kernel does this) is
    // substituted as an InMemoryRelation into any matching later scan,
    // which HIDES the parquet files from inputFiles even though the data
    // still comes from the snapshot — the probe needs an uncached plan
    // to witness the files (the same per-key clearCache discipline
    // Bench applies)
    spark.catalog.clearCache()
    // every audit key is plan-visible: g46/g84 read the VERDICT snapshot
    // directly (no Components re-run whose localCheckpoint would truncate
    // lineage to a LogicalRDD), the rest read the pair snapshots — so the
    // inputFiles probe applies to the whole family unconditionally
    for (k <- auditKeys) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      assert(df.inputFiles.exists(_.contains("graft_snapshots")),
        s"$k did not read the snapshot after a21 wrote it")
      assert(df.collect().toSeq.map(_.toSeq) === inline(k),
        s"$k drifted between inline and snapshot paths")
    }
  }

  test("a21 output equals g46 (the snapshot IS the verdict table)") {
    assert(rows("a21_verdict_snapshot") === rows("g46_survivorship"))
  }
}
