package graft.pipeline

/** Sharded suffix-array kernel for EXACT-SUBSTRING duplicate detection
  * (g90) — the production form of g87's digest-window approximation
  * (SCALE.md §g87 named it; this ships it).
  *
  * Per shard (= Spark partition), the kernel concatenates the shard's
  * documents into one char buffer, builds a DEPTH-TRUNCATED suffix array
  * over it (suffixes ordered by their first L characters — for fixed
  * window length L the deeper order is irrelevant, so the sort depth is
  * capped at L exactly like the prefix-doubling cutoff in a classic
  * DC3/prefix-doubling build), and walks the sorted order once: each
  * maximal run of suffixes sharing an identical L-prefix is one DISTINCT
  * window content, summarized as a single boundary tuple
  * (content hash, min doc, max doc). Those run-boundary tuples — not
  * per-character window rows — are what leaves the shard:
  *
  *   - g87 shuffles one ~40-byte row PER CHARACTER of the corpus (digest,
  *     doc, pos for every window) into a corpus-wide window partition.
  *   - g90 shuffles one 32-byte tuple PER DISTINCT WINDOW PER SHARD into
  *     a partial-aggregating groupBy, then only the POSITIONS OF
  *     CONFIRMED DUPLICATES (a small fraction) into the per-doc interval
  *     merge. Within-shard repetition (boilerplate, templates — the bulk
  *     of a web corpus) collapses inside the suffix array before any
  *     network byte moves, and the cross-shard merge is a min/max
  *     range-intersection over doc-id boundaries.
  *
  * At 100 TB, shards are sized to executor memory — the concatenation
  * is 2 bytes/char + 4 bytes/window for the SA (a primitive int[] of
  * offsets, sorted in place by [[sortTruncated]] — see its note on why
  * boxing would void this budget), so a 4 GiB shard holds ~600 MB of
  * text. Downstream, the confirmed-duplicate window positions merge
  * into MAXIMAL duplicated spans of any length ≥ L (g91's cut list —
  * a duplicated substring of length M ≥ L appears as exactly its
  * M−L+1 consecutive duplicated windows, so the maximal
  * consecutive-window runs are the maximal duplicated regions).
  *
  * Content identity travels as a 128-bit hash (two independent 64-bit
  * polynomial hashes with murmur finalizers): collision probability over
  * W distinct windows is ~W²/2¹²⁹ (< 1e-25 at 10¹⁵ windows), and the
  * hash never needs to be cross-engine — the DuckDB oracle re-derives
  * duplication from the text itself, so grading covers the kernel
  * end-to-end.
  */
object SuffixDup {

  /** Window length in characters — g87's discriminative point (~4 tokens
    * on this corpus); both keys grade the same L so their spans agree. */
  val L = 24

  /** One distinct window content within a shard: 128-bit content hash +
    * the doc-id boundary (min/max) of its occurrences. */
  final case class Run(h1: Long, h2: Long, lo: Long, hi: Long)

  /** One window occurrence (1-based pos, oracle convention). */
  final case class WinPos(doc_id: Long, n_chars: Long, pos: Int,
      h1: Long, h2: Long)

  private def fmix(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 29; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 32; x
  }

  /** 128-bit hash of chars [off, off+L) — two independent 64-bit lanes. */
  private[graft] def hashWin(buf: Array[Char], off: Int): (Long, Long) = {
    var h1 = 0x9E3779B97F4A7C15L
    var h2 = 0xC2B2AE3D27D4EB4FL
    var k = 0
    while (k < L) {
      val c = buf(off + k).toLong
      h1 = (h1 ^ c) * 0x100000001B3L
      h2 = h2 * 0x5DEECE66DL + c + 0xBL
      k += 1
    }
    (fmix(h1), fmix(h2))
  }

  /** Depth-truncated suffix sort over PRIMITIVE int offsets — MSD 3-way
    * radix quicksort (Bentley–Sedgewick) on the chars of buf, cutting
    * off at depth L. This is what makes the kernel's sizing contract
    * (4 bytes per window for the SA) literally true: a boxed
    * Integer[] + comparator sort costs ~20 B/window plus per-compare
    * boxing, a ~5× blowout that would burst the stated 4 GiB shard
    * budget. The work list is an explicit int stack (no recursion → no
    * stack-depth hazard on adversarial runs); ranges ≤ 24 fall through
    * to insertion sort on the remaining depth; equal-at-depth-d middles
    * re-enter at d+1, so total work is O(n · L) worst case and
    * O(n · avg distinguishing prefix) on real text. */
  private[graft] def sortTruncated(sa: Array[Int], buf: Array[Char])
      : Unit = {
    // less-than comparing chars from depth d, truncated at L
    def less(a: Int, b: Int, d0: Int): Boolean = {
      var d = d0
      while (d < L) {
        if (buf(a + d) != buf(b + d)) return buf(a + d) < buf(b + d)
        d += 1
      }
      false
    }
    def insertion(lo: Int, hi: Int, d: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val t = sa(i)
        var j = i - 1
        while (j >= lo && less(t, sa(j), d)) { sa(j + 1) = sa(j); j -= 1 }
        sa(j + 1) = t
        i += 1
      }
    }
    var stack = new Array[Int](96) // (lo, hi, d) triples
    var top = 0
    def push(lo: Int, hi: Int, d: Int): Unit = {
      if (lo >= hi || d >= L) return
      if (hi - lo < 24) { insertion(lo, hi, d); return }
      if (top + 3 > stack.length)
        stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      stack(top) = lo; stack(top + 1) = hi; stack(top + 2) = d
      top += 3
    }
    push(0, sa.length - 1, 0)
    while (top > 0) {
      top -= 3
      val lo = stack(top); val hi = stack(top + 1); val d = stack(top + 2)
      // median-of-3 pivot CHARACTER at depth d
      val ca = buf(sa(lo) + d); val cb = buf(sa(lo + (hi - lo) / 2) + d)
      val cc = buf(sa(hi) + d)
      val pv: Char =
        if (ca < cb) { if (cb < cc) cb else if (ca < cc) cc else ca }
        else { if (ca < cc) ca else if (cb < cc) cc else cb }
      // 3-way partition on the char at depth d
      var lt = lo; var gt = hi; var i2 = lo
      while (i2 <= gt) {
        val c = buf(sa(i2) + d)
        if (c < pv) {
          val t = sa(lt); sa(lt) = sa(i2); sa(i2) = t; lt += 1; i2 += 1
        } else if (c > pv) {
          val t = sa(gt); sa(gt) = sa(i2); sa(i2) = t; gt -= 1
        } else i2 += 1
      }
      push(lo, lt - 1, d)
      push(lt, gt, d + 1)
      push(gt + 1, hi, d)
    }
  }

  /** Truncated-suffix-array build + run walk over one shard.
    * Input: (doc_id, text) with text.length ≥ L guaranteed by the caller.
    * Output: one [[Run]] per distinct L-window content in the shard. */
  def shardRuns(docs: Iterator[(Long, String)]): Iterator[Run] = {
    val ds = docs.toArray
    if (ds.isEmpty) return Iterator.empty
    // concatenation + doc boundary map (no sentinels needed: windows are
    // enumerated within doc bounds, so none ever crosses a boundary)
    var total = 0
    ds.foreach(total += _._2.length)
    val buf = new Array[Char](total)
    val starts = new Array[Int](ds.length + 1)
    var o = 0
    var i = 0
    while (i < ds.length) {
      starts(i) = o
      val t = ds(i)._2
      t.getChars(0, t.length, buf, o)
      o += t.length
      i += 1
    }
    starts(ds.length) = o
    // suffix offsets, sorted by their first L chars (depth-truncated SA)
    var nWin = 0
    ds.foreach(d => nWin += d._2.length - L + 1)
    val sa = new Array[Int](nWin)
    var k = 0
    i = 0
    while (i < ds.length) {
      var p = starts(i)
      val e = starts(i) + ds(i)._2.length - L
      while (p <= e) { sa(k) = p; k += 1; p += 1 }
      i += 1
    }
    sortTruncated(sa, buf)
    def sameWin(x: Int, y: Int): Boolean = {
      var j = 0
      while (j < L) {
        if (buf(x + j) != buf(y + j)) return false
        j += 1
      }
      true
    }
    // offset → owning doc index (runs are short; binary search per member)
    def docOf(off: Int): Int = {
      var lo = 0; var hi = ds.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (starts(mid) <= off) lo = mid else hi = mid - 1
      }
      lo
    }
    // run walk: each maximal equal-prefix run → one boundary tuple
    val out = Vector.newBuilder[Run]
    var r = 0
    while (r < nWin) {
      val first = sa(r)
      var lo = Long.MaxValue; var hi = Long.MinValue
      var j = r
      while (j < nWin && (j == r || sameWin(first, sa(j)))) {
        val d = ds(docOf(sa(j)))._1
        if (d < lo) lo = d
        if (d > hi) hi = d
        j += 1
      }
      val (h1, h2) = hashWin(buf, first)
      out += Run(h1, h2, lo, hi)
      r = j
    }
    out.result().iterator
  }

  /** Second local pass: every window occurrence with its content hash —
    * consumed by a broadcast semi-join against the confirmed-duplicate
    * hash set, so these rows never shuffle (they die in the scan stage
    * unless duplicated). Input: (doc_id, n_chars, text). */
  def shardPositions(docs: Iterator[(Long, Long, String)])
      : Iterator[WinPos] =
    docs.flatMap { case (docId, nChars, text) =>
      val buf = text.toCharArray
      (0 to buf.length - L).iterator.map { off =>
        val (h1, h2) = hashWin(buf, off)
        WinPos(docId, nChars, off + 1, h1, h2)
      }
    }
}
