package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver consuming Bench's stdout keeps only the last ~2000
  * characters; rounds 1–2 printed the full per-query map (~3000
  * chars), so the JSON line was truncated mid-object and recorded as
  * unparseable. Pin the printed line under the window for the whole
  * current registry even with worst-case timing widths.
  */
class BenchLineSpec extends AnyFunSuite {

  test("bench line fits the driver's 2000-char output window") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Worst-case realistic magnitude: four digits of seconds.
    val results = names.map(n => (n, 9999.999))
    val line = Bench.buildLine(results, reps = 3, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1800, s"line is ${line.length} chars")
    assert(line.startsWith("{") && line.endsWith("}"))
    // All 22 TPC-H sweep queries must survive trimming.
    val tpch = names.filter(_.matches("q\\d\\d_.*"))
    tpch.foreach(n => assert(line.contains("\"" + n + "\":"), s"missing $n"))
    // Totals and query count are always present.
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains(s""""nq":${names.size}"""))
  }

  test("bench line surfaces the error count (failures must never look like speedups)") {
    val results = Seq(("q01_a", 1.0))
    val clean = Bench.buildLine(results, reps = 3, sfDir = "/tmp/sf")
    assert(clean.contains(""""errors":0"""))
    val broken = Bench.buildLine(results, reps = 3, sfDir = "/tmp/sf", errors = 85)
    assert(broken.contains(""""errors":85"""))
  }

  test("bench line is valid JSON shape (balanced braces, quoted keys)") {
    val results = Seq(("q01_a", 1.0), ("q_x", 0.25))
    val line = Bench.buildLine(results, reps = 3, sfDir = "/tmp/sf")
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // q_x is neither TPC-H-patterned nor a flagship — it stays out of
    // the headline map but still counts toward the total.
    assert(line.contains(""""queries":{"q01_a":1.000}"""))
    assert(line.contains(""""value":1.250"""))
    assert(line.contains(""""nq":2"""))
  }
}
