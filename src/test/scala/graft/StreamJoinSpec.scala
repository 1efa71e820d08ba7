package graft

import graft.streaming.{Event, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp((60 + minute) * 60000L)

  test("stream-stream join matches purchases within the window after a click") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.clickToPurchase(clicks.toDS(), purchases.toDS(),
        windowMs = 30 * 60000L)
      .writeStream.format("memory").queryName("cp_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(1, ts(0), 7, "click", 0.0),
        Event(2, ts(0), 8, "click", 0.0))
      purchases.addData(
        Event(100, ts(10), 7, "purchase", 49.0),  // user 7, within 30 min ✓
        Event(101, ts(45), 7, "purchase", 10.0),  // user 7, too late ✗
        Event(102, ts(5), 9, "purchase", 5.0))    // other user ✗
      q.processAllAvailable()
      val rows = spark.table("cp_out")
        .select("click_id", "purchase_id", "user_id", "purchase_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 100L, 7L, 49.0)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.clickToPurchaseOuter(clicks.toDS(), purchases.toDS(),
        windowMs = 30 * 60000L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("cpo_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(1, ts(0), 7, "click", 0.0),   // will match
        Event(2, ts(0), 8, "click", 0.0))                 // never matches
      purchases.addData(Event(100, ts(10), 7, "purchase", 49.0))
      q.processAllAvailable()
      // advance BOTH watermarks far past click 2's join window so the
      // engine can prove no purchase for user 8 can still arrive
      clicks.addData(Event(3, ts(120), 9, "click", 0.0))
      purchases.addData(Event(101, ts(120), 9, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData(Event(4, ts(240), 9, "click", 0.0))
      purchases.addData(Event(102, ts(240), 9, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cpo_out")
        .select("click_id", "purchase_id", "user_id")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          r.getLong(2))).toSet
      assert(rows.contains((1L, 100L, 7L)), rows)  // matched pair
      assert(rows.contains((2L, -1L, 8L)), rows)   // null-emitted unmatched
    } finally q.stop()
  }

  test("foreachBatch applies Merge.upsert per micro-batch (streaming ETL sink)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    // seed target table: one stale row for user 1
    Seq((1L, "stale", 0.0)).toDF("user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    val in = MemoryStream[Event]
    val q = in.toDS().toDF()
      .select(col("user_id"), col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val target = spark.read.parquet(dir)
        val merged = graft.operators.Merge
          .upsert(target, batch.dropDuplicates("user_id"), "user_id")
        // rewrite-to-temp-then-swap keeps the read/write paths disjoint
        val tmp = dir + "_next"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(dir)
      }
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Event(1, ts(0), 1, "click", 5.0), Event(2, ts(1), 2, "view", 7.0))
      q.processAllAvailable()
      val got = spark.read.parquet(dir)
        .as[(Long, String, Double)].collect()
        .map { case (k, t, v) => k -> ((t, v)) }.toMap
      assert(got(1L) == ("click", 5.0)) // stale row replaced
      assert(got(2L) == ("view", 7.0))  // new key inserted
    } finally q.stop()
  }
}
