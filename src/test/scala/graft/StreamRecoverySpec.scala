package graft

import graft.streaming.{Event, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamRecoverySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp((60 + minute) * 60000L)

  test("dedupStream suppresses duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.dedupStream(in.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // dup id within watermark
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(3), 1, "view", 2.0)) // dup again, later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    implicit val sqlCtx = spark.sqlContext
    // dim keyed on a column NAMED user_id — must resolve unambiguously
    val dim = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val in = MemoryStream[Event]
    val q = StreamOps.enrich(in.toDS(), dim, "user_id")
      .select("event_id", "c_mktsegment")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Event(1, ts(0), 5, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
      assert(rows.length == 1)
      val expect = dim.where(col("user_id") === 5)
        .select("c_mktsegment").as[String].head()
      assert(rows.head.getString(1) == expect)
    } finally q.stop()
  }

  test("file-source query restarts from checkpoint exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()

    def start() = spark.readStream.format("text").schema("value STRING")
      .load(inDir)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inDir/a.txt"), "alpha\nbeta\n")
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inDir/b.txt"), "gamma\n")
    val q2 = start() // must resume from the checkpoint, not reprocess a.txt
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(outDir).as[String].collect().sorted.toSeq
    assert(got == Seq("alpha", "beta", "gamma")) // each exactly once
  }

  test("bloom pre-filter preserves join results while pruning the probe side") {
    val dim = spark.read.parquet(s"$Sf/customer.parquet")
      .where(col("c_acctbal") > 8000) // a selective dimension subset
      .select("c_custkey", "c_name")
    val fact = spark.read.parquet(s"$Sf/orders.parquet")
    val pruned = graft.operators.BloomPrune
      .preFilter(fact, "o_custkey", dim, "c_custkey", Some(100000L), 0.01)
    assert(pruned.count() < fact.count()) // actually prunes
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey").count().collect().map(_.toString).sorted.toSeq
    val viaBloom = pruned.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey").count().collect().map(_.toString).sorted.toSeq
    assert(viaBloom == plain) // false positives re-checked by the join
  }
}
