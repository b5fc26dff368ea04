package graft.sources

/** Per-process scratch roots under /tmp, shared by every module that
  * stages on-disk state (Dedup snapshots, EventTime's streaming landing
  * dirs, the spec-level sink laws). One implementation of the two pieces
  * that used to be copy-pasted five times (r9 ADVICE):
  *
  *   - [[rmTree]] — recursive delete that tolerates races (a file
  *     vanishing mid-walk is fine; deletion is best-effort hygiene).
  *   - [[perPidRoot]] — `/tmp/<name>/<pid>`, wiped on first use in this
  *     JVM (a recycled pid must never serve a previous process's files —
  *     the corpus at the same path could have been regenerated in
  *     between) and with dead-pid sibling dirs garbage-collected so
  *     roots don't accumulate forever, one per JVM that ever ran.
  */
object TmpDirs {

  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(); ()
  }

  /** Wipe + GC exactly once per (JVM, name): perPidRoot is called from
    * lazy vals today, but memoizing here keeps the contract local. */
  private val initialized =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def perPidRoot(name: String): String = {
    val pid = java.lang.ProcessHandle.current().pid()
    val root = new java.io.File(s"/tmp/$name")
    if (initialized.add(name)) {
      rmTree(new java.io.File(root, pid.toString))
      Option(root.listFiles()).toSeq.flatten.foreach { d =>
        val dead = scala.util.Try(d.getName.toLong).toOption
          .exists(p => !java.lang.ProcessHandle.of(p)
            .map[java.lang.Boolean](h => h.isAlive).orElse(false))
        if (dead) rmTree(d)
      }
    }
    s"/tmp/$name/$pid"
  }
}
