package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's entry contract: prints row count + top rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_ROWS=${rows.length}")
    rows.take(5).foreach(r => println(s"ENTRY_ROW $r"))

    // reference-literal output shape: top-K per reducer
    graft.operators.Tokenize.topKPerReducer(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text",
      k = 3, numReducers = 4)
      .collect().foreach(r => println(s"PERREDUCER_ROW $r"))

    // native expression through SQL over a real scan
    graft.plans.GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    spark.sql(
      """SELECT lang, encode_word(lang) AS enc, count(*) AS n
        |FROM documents GROUP BY lang, enc ORDER BY lang""".stripMargin)
      .collect().foreach(r => println(s"ENCODE_ROW $r"))

    // streaming word count over a real file-stream source
    val inDir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.writeString(inDir.resolve("a.txt"),
      "home fairy dance\npop steal home\n")
    val lines = spark.readStream.format("text")
      .schema("value STRING").load(inDir.toString)
    val q = graft.streaming.StreamOps.streamingWordCount(lines)
      .writeStream.format("memory").queryName("smoke_wc")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table("smoke_wc").orderBy(org.apache.spark.sql.functions.desc("cnt"))
      .collect().take(3).foreach(r => println(s"STREAM_ROW $r"))
    spark.stop()
  }
}
