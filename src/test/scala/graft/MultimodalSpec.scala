package graft

import graft.operators.{MediaRecord, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal codecs are REAL (JDK ImageIO PNG + java.util.zip): the
  * planted payload must survive an encode→decode round trip bit-exactly,
  * and the decoded features must equal the construction rule's values —
  * the same invariant the DuckDB oracle checks at catalog level. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("PNG payload is a real PNG and round-trips pixel-exactly") {
    for (id <- Seq(0L, 1L, 7L, 123L, 4999L)) {
      val bytes = Multimodal.pngPayload(id)
      // PNG magic: 89 50 4E 47
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val f = Multimodal.decodeImage(id, bytes).get
      val (w, h) = Multimodal.imageDims(id)
      assert(f.width == w && f.height == h && f.n_px == w.toLong * h)
      var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.pixel(id, x, y)
        sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
      }
      assert(f.px_sum == sum && f.px_min == mn && f.px_max == mx, s"id=$id")
    }
  }

  test("aHash matches the pixel-rule replay; corrupt payloads drop; bands are lossless at ham<=7") {
    // decoded-raster aHash == rule-recomputed aHash for assorted ids
    for (id <- Seq(0L, 3L, 42L, 424L)) {
      val f = Multimodal.aHashImage(id, Multimodal.pngPayload(id)).get
      val (w, h) = Multimodal.imageDims(id)
      val samples = (0 until 64).map(i =>
        Multimodal.pixel(id, (i % 8) * w / 8, (i / 8) * h / 8))
      val mean = samples.map(_.toLong).sum / 64
      val expect = samples.zipWithIndex
        .collect { case (p, i) if p > mean => 1L << i }
        .foldLeft(0L)(_ | _)
      assert(f.ahash == expect, s"id=$id")
    }
    assert(Multimodal.aHashImage(9L, Array[Byte](1, 2, 3)).isEmpty)
    // band recall: the banded q_phash_dedup pair set equals brute force
    // over all hash pairs at hamming <= 7 (pigeonhole, 8x8-bit bands)
    val pairs = SparkEntry.queries("q_phash_dedup")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val hashes = ids.map(id =>
      id -> Multimodal.aHashImage(id, Multimodal.pngPayload(id)).get.ahash).toMap
    val brute = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 7
    } yield (a, b)).toSet
    assert(pairs == brute,
      s"banded=${pairs.size} brute=${brute.size}")
  }

  test("resize samples exactly in(2x,2y) with ceil-divided dims") {
    for (id <- Seq(0L, 3L, 42L, 777L)) {
      val f = Multimodal.resizeImage(id, Multimodal.pngPayload(id)).get
      val (w, h) = Multimodal.imageDims(id)
      assert(f.rw == (w + 1) / 2 && f.rh == (h + 1) / 2, s"id=$id")
      var sum = 0L
      for (y <- 0 until f.rh; x <- 0 until f.rw)
        sum += Multimodal.pixel(id, 2 * x, 2 * y)
      assert(f.px_sum == sum, s"id=$id")
    }
  }

  test("frame sampling keeps every 2nd frame; torn payloads drop cleanly") {
    val id = 9L
    val frames = Multimodal.sampleFrames(id, Multimodal.videoPayload(id))
    assert(frames.map(_.frame) == (0L until Multimodal.frameCount(id) by 2))
    val (w, h) = Multimodal.imageDims(id)
    val expect0 = (for (y <- 0 until h; x <- 0 until w)
      yield Multimodal.framePixel(id, 0, x, y).toLong).sum
    assert(frames.head.f_sum == expect0)
    // torn clip: a valid zlib stream whose length is not a whole frame
    val torn = {
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](w * h + 1)); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      bos.toByteArray
    }
    assert(Multimodal.sampleFrames(id, torn).isEmpty)
    assert(Multimodal.sampleFrames(id, Array[Byte](1, 2, 3)).isEmpty) // garbage
  }

  test("WAV payload parses via javax.sound and matches the PCM rule exactly") {
    for (id <- Seq(0L, 1L, 7L, 123L, 4999L)) {
      val bytes = Multimodal.wavPayload(id)
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      val f = Multimodal.decodeAudio(id, bytes).get
      val n = Multimodal.sampleCount(id)
      assert(f.sample_rate == 8000L && f.n_samples == n.toLong, s"id=$id: $f")
      var (sum, mx) = (0L, 0L)
      for (i <- 0 until n) {
        val a = math.abs(Multimodal.sample16(id, i).toLong)
        sum += a; mx = math.max(mx, a)
      }
      assert(f.sum_abs == sum && f.max_abs == mx, s"id=$id")
    }
    // corrupt shapes drop, never throw: garbage, truncated header, empty
    assert(Multimodal.decodeAudio(1L, Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.decodeAudio(1L, Multimodal.wavPayload(1L).take(20)).isEmpty)
    assert(Multimodal.decodeAudio(1L, Array.emptyByteArray).isEmpty)
  }

  test("zlib payload inflates back to the exact source bytes") {
    for (t <- Seq("", "a", "hello world " * 100, "ünïcødé — 中文 🙂")) {
      val got = Multimodal.inflate(Multimodal.deflatePayload(t)).get
      assert(new String(got, "UTF-8") == t)
    }
    // truncated stream → None, not an exception
    val z = Multimodal.deflatePayload("some content to compress")
    assert(Multimodal.inflate(z.take(z.length / 2)).isEmpty)
    assert(Multimodal.inflate("garbage".getBytes("UTF-8")).isEmpty)
  }

  test("batched extractImages decodes a distributed planted corpus") {
    val ids = spark.range(0, 200).as[Long].repartition(7)
    val feats = Multimodal.extractImages(
      ids.map(id => MediaRecord(id, Multimodal.pngPayload(id))), batchSize = 16)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 200)
    assert(feats.forall(f => f.width == Multimodal.imageDims(f.doc_id)._1))
    // spot-check one full pixel sum against the rule
    val f42 = feats(42)
    val (w, h) = Multimodal.imageDims(42L)
    val want = (for (y <- 0 until h; x <- 0 until w)
      yield Multimodal.pixel(42L, x, y).toLong).sum
    assert(f42.px_sum == want)
  }
}
