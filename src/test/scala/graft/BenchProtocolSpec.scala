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

  test("empty suite and all-green suite render parseable lines") {
    val (e1, e2) = Bench.renderLines(Nil, "d", 1)
    assert(parse(e1).get("errors").size() === 0)
    assert(parse(e2).get("value").asDouble() === 0.0)
    val (g1, g2) = Bench.renderLines(Seq("x" -> Right(0.5)), "d", 2)
    assert(parse(g1).get("queries").get("x").asDouble() === 0.5)
    assert(parse(g2).get("n_errors").asInt() === 0)
  }
}
