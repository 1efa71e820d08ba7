package graft

import graft.operators.Compact
import org.scalatest.funsuite.AnyFunSuite

class CompactSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"${graft.queries.TmpRoot}/compact_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  test("compact merges a many-small-files table and preserves every row") {
    val dir = freshDir("merge")
    // 64 tiny files
    spark.range(10000).select($"id", ($"id" % 7).as("k"))
      .repartition(64).write.parquet(dir)
    assert(Compact.countFiles(spark, dir) == 64)

    val (before, after) = Compact.compact(spark, dir)
    assert(before == 64)
    assert(after == 1) // 10k rows ≪ 128 MB target
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == 10000L * 9999 / 2)
  }

  test("compact is idempotent on an already-compact table") {
    val dir = freshDir("idem")
    spark.range(1000).write.parquet(dir)
    Compact.compact(spark, dir)
    val (b2, a2) = Compact.compact(spark, dir)
    assert(b2 == 1 && a2 == 1)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("compact resplits when files exceed the target size") {
    val dir = freshDir("split")
    // one file of ~several hundred KB; tiny 64 KB target forces a resplit
    spark.range(200000).select($"id",
      org.apache.spark.sql.functions.md5($"id".cast("string")).as("pad"))
      .coalesce(1).write.parquet(dir)
    assert(Compact.countFiles(spark, dir) == 1)
    val (_, after) = Compact.compact(spark, dir, targetBytes = 64L * 1024)
    assert(after > 1, s"expected a resplit, got $after file(s)")
    assert(spark.read.parquet(dir).count() == 200000)
  }
}
