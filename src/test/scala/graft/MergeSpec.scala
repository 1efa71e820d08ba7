package graft

import graft.operators.Merge
import org.scalatest.funsuite.AnyFunSuite

/** Latest-change-wins semantics of Merge.applyChanges under out-of-order
  * feeds (the part the q_cdc_apply oracle — a single-change-per-key
  * reconstruction — can't exercise). */
class MergeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("applyChanges: max-seq change wins per key; D deletes, I/U replace") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "stale", "D", 1L), (1L, "x", "U", 2L),  // update after delete → row lives
      (2L, "y", "U", 4L), (2L, "dead", "D", 5L),   // delete after update → row gone
      (4L, "z", "I", 1L))                           // plain insert
      .toDF("k", "v", "op", "seq")
    val got = Merge.applyChanges(target, changes, "k")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "x", 3L -> "c", 4L -> "z"), got)
  }
}
