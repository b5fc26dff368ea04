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
    val (l1, l2) = Bench.renderLines(results, "/root/testdata/sf0.1")
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
    val (l1, l2) = Bench.renderLines(Seq("k" -> Left(nasty)), "sf\"dir")
    assert(parse(l1).get("errors").get("k").asText() === nasty)
    assert(parse(l2).get("n_errors").asInt() === 1)
  }

  test("empty suite and all-green suite render parseable lines") {
    val (e1, e2) = Bench.renderLines(Nil, "d")
    assert(parse(e1).get("errors").size() === 0)
    assert(parse(e2).get("value").asDouble() === 0.0)
    val (g1, g2) = Bench.renderLines(Seq("x" -> Right(0.5)), "d")
    assert(parse(g1).get("queries").get("x").asDouble() === 0.5)
    assert(parse(g2).get("n_errors").asInt() === 0)
  }
}
