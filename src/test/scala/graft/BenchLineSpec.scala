package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses ONLY the last ~2000 bytes of Bench's stdout
  * (BENCH_r09's "tail" field is exactly 2000 chars). A final line
  * longer than that loses its head and the whole round records
  * "parsed": null — which happened three separate times (r1-r5 nanos,
  * r7/r8 full names, r9 at 156 short ids). These tests pin the
  * self-limiting contract so registry growth can never reopen it. */
class BenchLineSpec extends AnyFunSuite {

  private def mkResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => s"q${i}_some_query_name" -> i * 0.017)

  private def parseable(line: String): Boolean =
    // minimal structural check without a JSON lib: balanced braces,
    // starts/ends correctly, no truncation artifacts
    line.startsWith("{\"metric\":\"total\"") && line.endsWith("}") &&
      line.count(_ == '{') == line.count(_ == '}')

  test("small registry: full map, no omission marker") {
    val line = Bench.compactLine(mkResults(20), "1.234", "/x/sf0.1")
    assert(parseable(line))
    assert(!line.contains("queries_omitted"))
    (1 to 20).foreach(i => assert(line.contains("\"q" + i + "\":")))
  }

  test("oversized registry: line stays under budget, slowest kept") {
    val res = mkResults(400) // ~4.8 KB as a full map
    val line = Bench.compactLine(res, "99.9", "/x/sf0.1")
    assert(parseable(line))
    assert(line.length <= 1900, s"line is ${line.length} bytes")
    assert(line.contains("queries_omitted"))
    // the slowest query (q400 here) must survive the cut; the fastest
    // (q1) must be the one omitted
    assert(line.contains("\"q400\":"))
    assert(!line.contains("\"q1\":6") && !line.contains("\"q1\":0.017"))
  }

  test("omitted count + kept count add up to the registry size") {
    val res = mkResults(400)
    val line = Bench.compactLine(res, "99.9", "/x/sf0.1")
    val omitted =
      "\"queries_omitted\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toInt
    val kept = "\"q\\d+\":".r.findAllIn(line).size
    assert(kept + omitted === 400)
  }

  test("current registry size fits-or-marks, never truncates") {
    // simulate the real registry shape: ids q1..q156, mixed magnitudes
    val res = (1 to 156).map(i => s"q${i}_n" -> (if (i % 7 == 0) 3.5 else 0.273))
    val line = Bench.compactLine(res, "101.159", "/root/testdata/sf0.1")
    assert(parseable(line))
    assert(line.length <= 1900, s"line is ${line.length} bytes")
  }

  test("load stamps ride INSIDE the object, and survive a budget cut") {
    // BENCH_r13 lesson: the stderr load stamp never reached the
    // driver's record, so a contended sweep had no in-artifact proof
    val extra = ""","load_avg_start":0.08,"load_avg_end":0.10,"cores":32"""
    val small = Bench.compactLine(mkResults(20), "1.2", "/x", extra)
    assert(parseable(small) && small.contains("\"load_avg_start\":0.08"))
    val big = Bench.compactLine(mkResults(400), "9.9", "/x", extra)
    assert(parseable(big), big)
    assert(big.length <= 1900, s"line is ${big.length} bytes")
    assert(big.contains("\"load_avg_end\":0.10"))
  }

  test("failed queries (-1) keep their unambiguous marker when kept") {
    val res = Seq("q1_a" -> -1.0, "q2_b" -> 5.0)
    val line = Bench.compactLine(res, "5.0", "/x")
    assert(line.contains("\"q1\":-1"))
  }
}
