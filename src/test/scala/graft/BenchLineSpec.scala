package graft

import org.scalatest.funsuite.AnyFunSuite

/** The printed bench line is the round's BENCH artifact: the driver
  * captures only the last ~2k log chars, so the line must ALWAYS fit —
  * r4/r5 lost their artifacts to this. Pin the fit invariant as a pure
  * function so battery growth can never regress it again. */
class BenchLineSpec extends AnyFunSuite {
  private def parseKeys(line: String): Seq[String] = {
    val start = line.indexOf("\"queries\":{") + "\"queries\":{".length
    val body = line.substring(start, line.indexOf("}", start))
    "\"([a-zA-Z0-9_]+)\":".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  test("small batteries print at centisecond precision with every key") {
    val rs = (1 to 10).map(i => s"q$i" -> i * 0.111)
    val line = Bench.renderFitted(rs, "sf0.1")
    assert(line.length <= 1850)
    assert(parseKeys(line).size == 10)
    assert(line.contains("\"q3\":0.33"), line) // centiseconds survived
  }

  test("oversized batteries always fit, keep the slowest keys, and report the full total") {
    // 300 queries with long names — far beyond any precision degradation
    val rs = (1 to 300).map(i => f"very_long_query_name_number_$i%03d" -> i * 0.01)
    val line = Bench.renderFitted(rs, "sf0.1")
    assert(line.length <= 1850, s"${line.length} chars")
    val keys = parseKeys(line)
    assert(keys.nonEmpty && keys.size < 300)
    // the kept set must be exactly the slowest |keys| queries
    val slowest = rs.sortBy(-_._2).take(keys.size).map(_._1).toSet
    assert(keys.toSet == slowest, "dropped a slow query while keeping a fast one")
    // total still covers all 300 (sum of 0.01..3.00 = 451.5)
    assert(line.contains("\"value\":451.5"), line)
  }

  test("the fitted line is valid JSON even at the sparse fallback") {
    val rs = (1 to 200).map(i => f"another_quite_long_benchmark_query_$i%03d" -> 1.0)
    val line = Bench.renderFitted(rs, "sf0.01")
    // cheap structural parse: balanced braces, quoted keys, no trailing comma
    assert(line.startsWith("{\"metric\":\"total\""), line.take(40))
    assert(line.endsWith("\"sf\":\"sf0.01\"}"), line.takeRight(40))
    assert(!line.contains(",}"), "trailing comma")
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
  }

  test("pipeline legs never double-count into the headline total") {
    val rs = Seq("q1" -> 1.0, "pipeline_ingest" -> 0.5, "pipeline_replicate" -> 1.0,
      "pipeline_consume" -> 0.5, "pipeline_ingest_replicate_consume" -> 2.0,
      "pipeline_curate" -> 1.0)
    val line = Bench.renderFitted(rs, "sf0.1")
    // total = q1 + combined + curate = 4.0; the legs are a breakdown of
    // the combined key, not extra work
    assert(line.contains("\"value\":4"), line)
    // the legs still appear in the per-query map
    assert(line.contains("\"pipeline_replicate\":1"), line)
  }

  test("a single enormous entry still renders (degenerate floor)") {
    val rs = Seq(("x" * 3000) -> 1.0)
    val line = Bench.renderFitted(rs, "sf0.1")
    // can't fit by construction — the floor keeps exactly one entry
    assert(parseKeys(line).size <= 1)
  }
}
