package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The driver-facing Bench contract, CI-tested instead of convention
  * (round-11 verdict task 7: BENCH_r11 came back rc=124 with a
  * 2,000-char tail of WindowExec warnings and no parseable JSON — a
  * logging or deadline change must never silently eat the gate again).
  *
  * Runs the real protocol with a deadline far too small to measure
  * anything, which exercises the worst-case shedding path end-to-end:
  * every graded entry takes the failure penalty, every tail entry the
  * shed sentinel, and the LAST stdout line must still parse as the
  * headline JSON with the graded fields in final position. */
class BenchSpec extends AnyFunSuite with SparkFixture {

  test("last stdout line is the parseable headline JSON even on deadline exhaustion") {
    val tmp = java.nio.file.Files
      .createTempDirectory("benchspec").resolve("bench.json").toString
    val buf = new java.io.ByteArrayOutputStream()
    val returned = Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Bench.run(spark, Sf, deadlineSec = 5.0, sf1Dir = None, outPath = tmp)
    }
    val lines = buf.toString("UTF-8").linesIterator.toSeq.filter(_.nonEmpty)
    assert(lines.nonEmpty, "Bench printed nothing")
    assert(lines.last == returned,
      "returned line must BE the last stdout line (the driver tail contract)")
    val json = JsonMethods.parse(lines.last)
    assert((json \ "metric") == JString("total"))
    val JDouble(total) = (json \ "value"): @unchecked
    // every graded entry was deadline-shed → the penalty, not a speedup
    assert(total >= Bench.Headline.size * Bench.FailPenalty - 1e-6)
    val JObject(qs) = (json \ "queries"): @unchecked
    assert(qs.map(_._1).toSet == Bench.Headline,
      "headline map must carry exactly the frozen round-1 set")
    // the full map file is written and itself parseable, with every
    // catalog entry present (tail entries as the -1 shed sentinel)
    val full = JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(tmp)))
    val JObject(fq) = (full \ "queries"): @unchecked
    assert(fq.map(_._1).toSet == SparkEntry.queries.keySet)
    // a 5 s deadline leaves no spread-measured entries; the coverage
    // stat must not launder shed entries into compliance
    val JInt(meas) = (full \ "spread_measured"): @unchecked
    assert(meas == 0)
  }
}
