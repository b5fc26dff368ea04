package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench stdout protocol: two JSON lines, failures surfaced in an
  * `errors` map and EXCLUDED from the total — never benched as a small
  * positive time (the r5 incident this channel exists to prevent).
  * Parsed here with strict JSON so an escaping bug in builder-authored
  * messages (newlines, quotes, tabs from exception text) fails the suite
  * rather than the driver's json.load.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private val mapper = {
    // javax-free strict JSON check: reuse Spark's bundled Jackson
    new com.fasterxml.jackson.databind.ObjectMapper()
  }

  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(line)

  test("failures land in errors, are excluded from the total, and count n_errors") {
    val results: Seq[(String, Either[String, Double])] = Seq(
      "a_ok" -> Right(1.25),
      "b_broken" -> Left("AnalysisException: [TABLE_OR_VIEW_NOT_FOUND]\n+- plan"),
      "c_ok" -> Right(0.75))
    val (l1, l2) = Bench.renderLines(results, "/root/testdata/sf0.1", 1)
    val d1 = parse(l1)
    assert(d1.get("detail").asText() === "per_query")
    assert(d1.get("queries").size() === 2)
    assert(d1.get("queries").get("a_ok").asDouble() === 1.25)
    assert(d1.get("queries").get("b_broken") == null,
      "a failed key must NOT appear as a timing")
    assert(d1.get("errors").size() === 1)
    assert(d1.get("errors").get("b_broken").asText()
      .startsWith("AnalysisException"))
    val d2 = parse(l2)
    assert(d2.get("metric").asText() === "total")
    assert(math.abs(d2.get("value").asDouble() - 2.0) < 1e-9,
      "total sums successes only")
    assert(d2.get("n_queries").asInt() === 2)
    assert(d2.get("n_errors").asInt() === 1)
  }

  test("control characters and quotes in error text stay valid JSON") {
    val nasty = "boom \"quoted\"\twith\ntabs\randctrl"
    val (l1, l2) = Bench.renderLines(Seq("k" -> Left(nasty)), "sf\"dir", 1)
    assert(parse(l1).get("errors").get("k").asText() === nasty)
    assert(parse(l2).get("n_errors").asInt() === 1)
  }

  test("mergePasses keeps per-key min, errors only when every pass fails") {
    // the r9 judge protocol: two back-to-back passes, min recorded —
    // sandbox weather only ever ADDS time, so min is the engine's number
    val p1: Seq[(String, Either[String, Double])] =
      Seq("a" -> Right(2.0), "b" -> Left("boom1"), "c" -> Left("cold"))
    val p2: Seq[(String, Either[String, Double])] =
      Seq("a" -> Right(1.5), "b" -> Left("boom2"), "c" -> Right(0.9))
    val merged = Bench.mergePasses(Seq(p1, p2)).toMap
    assert(merged("a") === Right(1.5))
    assert(merged("b") === Left("boom1"), "all-fail keeps the first error")
    assert(merged("c") === Right(0.9), "one success wins over a flaky fail")
    assert(Bench.mergePasses(Seq(p1)).toMap.apply("a") === Right(2.0))
    // key ORDER is the first pass's order (the sorted bench order)
    assert(Bench.mergePasses(Seq(p1, p2)).map(_._1) === Seq("a", "b", "c"))
  }

  test("repeats is recorded in the total line") {
    val (_, l2) = Bench.renderLines(Seq("x" -> Right(0.5)), "d", 2)
    assert(parse(l2).get("repeats").asInt() === 2)
  }

  test("incremental Emitter implements the mergePasses law exactly") {
    // arrival order = pass1 then pass2, each sorted — exactly main's loop
    val p1: Seq[(String, Either[String, Double])] =
      Seq("a" -> Right(2.0), "b" -> Left("boom1"), "c" -> Left("cold"))
    val p2: Seq[(String, Either[String, Double])] =
      Seq("a" -> Right(1.5), "b" -> Left("boom2"), "c" -> Right(0.9))
    val em = new Bench.Emitter("d", 2)
    (p1 ++ p2).foreach { case (k, o) => em.record(k, o) }
    assert(em.results === Bench.mergePasses(Seq(p1, p2)),
      "per-key fold must equal the batch merge — same keys, same order")
  }

  test("a mid-suite SIGTERM still leaves a parseable last-complete pair " +
      "(the r13 rc:124 incident)") {
    // Replay main's emission discipline: the pair is printed after EVERY
    // key, so for ANY byte-truncation of the stdout stream (the driver's
    // timeout kill), dropping the partial trailing line leaves a last
    // complete per_query line and a last complete total line that both
    // parse — and the per_query map holds exactly the keys completed.
    val arrivals: Seq[(String, Either[String, Double])] = Seq(
      "a_ok" -> Right(1.0), "b_bad" -> Left("boom \"q\"\nstack"),
      "c_ok" -> Right(0.5), "a_ok" -> Right(0.8), "b_bad" -> Right(2.0),
      "c_ok" -> Right(0.6))
    val em = new Bench.Emitter("/root/testdata/sf0.1", 2)
    val emitted = arrivals.map { case (k, o) =>
      val (l1, l2) = em.record(k, o); s"$l1\n$l2\n"
    }
    val stdout = emitted.mkString
    // completed-key set after each ARRIVAL (for the exactness assert)
    val completedAfter = arrivals.scanLeft(Set.empty[String])(_ + _._1).tail
    // truncate at every byte offset past the first complete pair
    val firstPairEnd = emitted.head.length
    (firstPairEnd to stdout.length).foreach { cut =>
      val tail = stdout.substring(0, cut)
      val complete =
        tail.substring(0, tail.lastIndexOf('\n') + 1).linesIterator.toSeq
      val lastDetail = complete.filter(_.contains("\"detail\":\"per_query\"")).last
      val lastTotal = complete.filter(_.contains("\"metric\":\"total\"")).last
      val d = parse(lastDetail) // throws on malformed JSON
      val t = parse(lastTotal)
      // the surviving detail line belongs to the Nth arrival, where N =
      // how many detail lines fully survived the cut
      val survived = complete.count(_.contains("\"detail\":\"per_query\""))
      val expectKeys = completedAfter(survived - 1)
      val gotKeys = {
        val it = d.get("queries").fieldNames()
        val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next()
        val ie = d.get("errors").fieldNames()
        while (ie.hasNext) b += ie.next()
        b.result()
      }
      assert(gotKeys === expectKeys,
        s"truncation at byte $cut must carry exactly the completed keys")
      assert(t.get("value").asDouble() >= 0.0)
    }
  }

  test("empty suite and all-green suite render parseable lines") {
    val (e1, e2) = Bench.renderLines(Nil, "d", 1)
    assert(parse(e1).get("errors").size() === 0)
    assert(parse(e2).get("value").asDouble() === 0.0)
    val (g1, g2) = Bench.renderLines(Seq("x" -> Right(0.5)), "d", 2)
    assert(parse(g1).get("queries").get("x").asDouble() === 0.5)
    assert(parse(g2).get("n_errors").asInt() === 0)
  }
}
