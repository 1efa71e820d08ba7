package graft

import graft.operators.Tokenize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenizeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("splits on the reference delimiter class and collapses runs") {
    val df = Seq("home!fairy.dance:pop;steal_python,car'snake@pop?x(y)z/a°b\tc\nd e")
      .toDF("text")
    val words = Tokenize.tokenize(df, "text").select("word").as[String]
      .collect().toSeq
    assert(words == Seq("home", "fairy", "dance", "pop", "steal", "python",
      "car", "snake", "pop", "x", "y", "z", "a", "b", "c", "d", "e"))
  }

  test("keep-rule: encode-empty tokens are dropped, mixed tokens kept") {
    val df = Seq("123 456 café The THE ` é 1a2").toDF("text")
    val words = Tokenize.tokenize(df, "text").select("word").as[String]
      .collect().toSeq
    // pure digits and pure non-[`-z] dropped; café/1a2 kept (≥1 encodable
    // char); case preserved (The vs THE distinct spellings both kept)
    assert(words == Seq("café", "The", "THE", "`", "1a2"))
  }

  test("word count matches hand-computed fixture with cross-partition dups") {
    // little_splits-style planted duplicates (SURVEY.md §5.2)
    val df = Seq("home fairy dance", "pop steal home",
      "python pop snake", "car pop home").toDF("text")
    val got = Tokenize.wordCount(df, "text").as[(String, Long)].collect().toMap
    assert(got == Map("home" -> 3L, "pop" -> 3L, "fairy" -> 1L,
      "dance" -> 1L, "steal" -> 1L, "python" -> 1L, "snake" -> 1L, "car" -> 1L))
  }

  test("counts are invariant under repartitioning (reference split-size invariant)") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet").select("text")
    val base = Tokenize.wordCount(docs, "text").as[(String, Long)].collect().toMap
    for (n <- Seq(1, 3, 7)) {
      val re = Tokenize.wordCount(docs.repartition(n), "text")
        .as[(String, Long)].collect().toMap
      assert(re == base, s"repartition($n) changed counts")
    }
  }

  test("tokenArray preserves order for shingling") {
    val arr = Seq("a!b c.d").toDF("text")
      .select(Tokenize.tokenArray(col("text")).as("ws"))
      .as[Seq[String]].head()
    assert(arr == Seq("a", "b", "c", "d"))
  }
}
