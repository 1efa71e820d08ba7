package graft

import graft.functions.EncodeWord
import org.scalatest.funsuite.AnyFunSuite

class EncodeWordSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("matches the reference encode table (WorkerSender.java:129-148)") {
    assert(EncodeWord.encode("abc") == "010203")
    assert(EncodeWord.encode("z") == "26")
    assert(EncodeWord.encode("`") == "00") // off-by-one admits backtick
    assert(EncodeWord.encode("Az") == "0126") // lowercased first
    assert(EncodeWord.encode("123") == "") // digits map outside [0,26]
    assert(EncodeWord.encode("café") == "030106") // é dropped
    assert(EncodeWord.encode("") == "")
    assert(EncodeWord.encode(null) == null)
  }

  test("keep-rule equivalence: token kept iff encode is non-empty") {
    val samples = Seq("abc", "123", "café", "The", "`", "é", "1a2", "", "°", "!!")
    for (w <- samples) {
      val kept = Seq(w).toDF("text")
        .where(graft.operators.Tokenize.keep(org.apache.spark.sql.functions.col("text")))
        .count() == 1
      assert(kept == EncodeWord.encode(w).nonEmpty,
        s"keep-rule and encode disagree on '$w'")
    }
  }

  test("udf matches the Scala function on corpus words") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val words = graft.operators.Tokenize.tokenize(docs, "text")
      .select("word").distinct().as[String].collect()
    val viaUdf = spark.createDataset(words.toSeq).toDF("w")
      .select(EncodeWord.encodeUdf(org.apache.spark.sql.functions.col("w")))
      .as[String].collect()
    assert(viaUdf.toSeq == words.toSeq.map(EncodeWord.encode))
  }
}
