package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ObservabilitySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("extractImagesWithMetrics counts corrupt payloads without failing the job") {
    val df = Seq(
      (1L, Multimodal.pngPayload(1L)),
      (2L, Array.emptyByteArray),              // empty → corrupt
      (3L, Multimodal.pngPayload(3L)),
      (4L, "not a png at all".getBytes("UTF-8")) // garbage the codec rejects
    ).toDF("doc_id", "payload")
    val (out, corrupt) = Multimodal.extractImagesWithMetrics(df)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(corrupt.value == 2L)
  }

  test("Observation attaches data-quality metrics to a pipeline action") {
    val obs = Observation("docs_stats")
    spark.read.parquet(s"$Sf/documents.parquet")
      .observe(obs, count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        min(col("n_chars")).as("min_chars"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n").asInstanceOf[Long] == 500L)
    assert(m("min_chars").asInstanceOf[Long] > 0L)
  }
}
