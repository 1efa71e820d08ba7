package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}

/** Opaque binary record: the storage pattern for image/audio/video columns —
  * a `binary` payload plus typed metadata columns alongside. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Typed features from a REAL image decode: dimensions from the PNG header,
  * pixel statistics from the decoded raster. */
case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                         n_px: Long, px_sum: Long, px_min: Int, px_max: Int)

/** Typed features from a REAL zlib inflate: recovered byte count and md5. */
case class InflateFeatures(doc_id: Long, n_bytes: Long, md5: String)

/** Perceptual 8×8 average-hash of a decoded image. */
case class HashFeatures(doc_id: Long, width: Int, height: Int, ahash: Long)

/** One quadrant's 16-bit average-hash (tile = qy·2 + qx ∈ 0..3). */
case class TileHashFeatures(doc_id: Long, tile: Int, thash: Long)

/** One PCM frame's exact energy statistics (energy = Σ v², peak = max|v|). */
case class AudioFrameFeatures(doc_id: Long, frame: Long, n: Long,
                              energy: Long, peak: Long)

/** L1 pixel delta between a clip's consecutive frames. */
case class MotionFeatures(doc_id: Long, frame: Long, l1_delta: Long)

/** Typed features of a nearest-neighbor-downscaled decoded image. */
case class ResizeFeatures(doc_id: Long, rw: Int, rh: Int,
                          n_px: Long, px_sum: Long, px_min: Int, px_max: Int)

/** Per-sampled-frame features of a multi-frame (video-like) payload. */
case class FrameFeatures(doc_id: Long, frame: Long, n_px: Long, f_sum: Long)

/** Typed features from a REAL WAV decode (javax.sound.sampled): format
  * metadata from the RIFF header, amplitude statistics from the PCM data. */
case class AudioFeatures(doc_id: Long, sample_rate: Long, n_samples: Long,
                         sum_abs: Long, max_abs: Long)

/** Multimodal column plumbing with pure-JDK codecs: binary payloads in,
  * typed features out, batched per-partition decode.
  *
  * Codecs are real — `javax.imageio` (PNG) and `java.util.zip` (zlib) ship
  * with the JDK, so the decode path exercises an actual third-party-format
  * parser, not a fake. Test/oracle corpora are PLANTED: payloads are built
  * by a deterministic construction rule over `doc_id`
  * ([[Multimodal.pngPayload]] / [[Multimodal.deflatePayload]]), so a SQL
  * oracle can recompute the decoded features from the rule alone while the
  * engine goes the long way — encode to real PNG/zlib bytes, then decode
  * them back with the real codec. Any codec bug (stride, color model,
  * truncation) breaks the match.
  *
  * Scale notes: mapPartitions is a narrow transformation — no shuffle; the
  * decode runs where the bytes already live. Batch size bounds per-batch
  * memory for payloads of any size. Corrupt payloads are dropped and
  * counted, never fatal ([[Multimodal.extractImagesWithMetrics]]).
  */
object Multimodal {

  // ---- planted-corpus construction rule (mirrored by the SQL oracles) ----

  /** Image dims derived from doc_id: width 8..32, height 8..24. */
  def imageDims(docId: Long): (Int, Int) =
    (8 + (docId % 25).toInt, 8 + (docId % 17).toInt)

  /** Gray value at (x, y): (x·31 + y·17 + doc_id·13) mod 256. */
  def pixel(docId: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(x * 31L + y * 17L + docId * 13L, 256L).toInt

  /** A REAL PNG (8-bit grayscale, color type 0) of the deterministic image
    * for doc_id — encoded DIRECTLY to the PNG spec (signature, IHDR,
    * zlib-deflated filter-0 scanlines in IDAT, IEND, CRC32 per chunk)
    * rather than through ImageIO's writer: ~3× cheaper per image, and it
    * makes encoder and decoder INDEPENDENT implementations — the decode
    * side (JDK ImageIO) validates bytes this encoder produced, so a bug in
    * either breaks the oracle match instead of cancelling out. */
  def pngPayload(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    // raw image data: each scanline = filter byte 0 + w gray bytes
    val raw = new Array[Byte](h * (w + 1))
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) { raw(p) = pixel(docId, x, y).toByte; p += 1; x += 1 }
      y += 1
    }
    val idat = deflateBytes(raw)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    val bos = new ByteArrayOutputStream(idat.length + 64)
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    writeChunk(bos, "IHDR", ihdr)
    writeChunk(bos, "IDAT", idat)
    writeChunk(bos, "IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  private def writeChunk(bos: ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val buf = java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
    bos.write(buf.array(), 0, buf.capacity())
  }

  private def deflateBytes(in: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(in); d.finish()
    val bos = new ByteArrayOutputStream(math.max(in.length / 2, 32))
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  /** A REAL zlib stream of the text's UTF-8 bytes (java.util.zip.Deflater).
    * The compressed size is encoder-dependent and never oracle-checked;
    * the INFLATED bytes are what the oracle can recompute. */
  def deflatePayload(text: String): Array[Byte] =
    deflateBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // ---- real decoders ----

  /** PNG signature (the 8-byte magic every PNG stream starts with). */
  private val PngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One reusable JDK PNG reader per task thread. `ImageIO.read` pays,
    * PER CALL: a reader-registry scan, a reader instantiation + dispose,
    * and — with the default `ImageIO.getUseCache` — a DISK-backed
    * FileCacheImageInputStream (create + write + delete one temp file per
    * payload). None of that is decoding; for a column of millions of small
    * in-memory payloads it dominates the real inflate+unfilter work
    * (measured at sf0.1: q_multimodal_decode 6.1 s → see SCALE.md r12).
    * The reader instance is the SAME JDK PNG plugin `ImageIO.read`
    * selects, so the decode path (and every oracle-checked byte) is
    * unchanged; readers are not thread-safe, hence one per thread. */
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      ImageIO.getImageReadersByFormatName("png").next()
  }

  /** Decode a payload to a BufferedImage like `ImageIO.read` (null when
    * undecodable), but through the cached per-thread PNG reader and a
    * memory-backed stream when the bytes carry the PNG signature; any
    * other format falls back to `ImageIO.read` (format sniffing), so the
    * accepted-input contract is identical. */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val isPng = payload.length >= 8 && {
      var i = 0
      var ok = true
      while (i < 8) { if (payload(i) != PngMagic(i)) ok = false; i += 1 }
      ok
    }
    if (!isPng) return ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val r = pngReader.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      r.setInput(iis, true, true)
      r.read(0)
    } finally {
      r.setInput(null) // drop the stream reference; keep the reader
      iis.close()
    }
  }

  /** PNG (or any ImageIO format) → dimension + pixel-statistics features.
    * None on corrupt/undecodable payloads (ImageIO returns null or throws
    * on garbage — both map to None, the droppable-and-countable shape). */
  def decodeImage(docId: Long, payload: Array[Byte]): Option[ImageFeatures] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0)
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          x += 1
        }
        y += 1
      }
      Some(ImageFeatures(docId, w, h, w.toLong * h, sum, mn, mx))
    } catch { case _: Exception => None }
  }

  /** Nearest-neighbor downscale of a REAL decoded image: decode the PNG
    * with ImageIO, sample every `factor`-th pixel of the raster
    * (out(x, y) = in(x·factor, y·factor) — output dims ceil(w/f) ×
    * ceil(h/f)), return stats of the RESIZED raster. The resize runs on
    * decoded pixels, so codec + geometry are both under test; the oracle
    * recomputes the sampled positions from the construction rule. */
  def resizeImage(docId: Long, payload: Array[Byte],
                  factor: Int = 2): Option[ResizeFeatures] = {
    if (payload == null || payload.isEmpty || factor <= 0) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      val raster = img.getRaster
      val (rw, rh) = ((img.getWidth + factor - 1) / factor,
        (img.getHeight + factor - 1) / factor)
      var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          val v = raster.getSample(x * factor, y * factor, 0)
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          x += 1
        }
        y += 1
      }
      Some(ResizeFeatures(docId, rw, rh, rw.toLong * rh, sum, mn, mx))
    } catch { case _: Exception => None }
  }

  // ---- audio (WAV/PCM) payloads ----

  /** Sample count for doc_id's synthetic clip: 400..720. */
  def sampleCount(docId: Long): Int = 400 + (docId % 5).toInt * 80

  /** 16-bit PCM sample i: ((doc_id·31 + i·17) mod 65536) − 32768. */
  def sample16(docId: Long, i: Int): Int =
    java.lang.Math.floorMod(docId * 31L + i * 17L, 65536L).toInt - 32768

  /** A REAL WAV file (canonical 44-byte RIFF/PCM header + little-endian
    * 16-bit mono samples at 8 kHz) of the deterministic signal for doc_id —
    * written directly to the RIFF spec, so the decode side
    * (`javax.sound.sampled.AudioSystem`, an independent JDK parser)
    * validates these bytes the same way ImageIO validates the hand-rolled
    * PNG: a bug in either implementation breaks the oracle match. */
  def wavPayload(docId: Long): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val n = sampleCount(docId)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1)            // audio format: PCM
      .putShort(1)            // channels: mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes(ascii)).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(sample16(docId, i).toShort); i += 1 }
    bb.array()
  }

  /** WAV → format + amplitude features via the REAL JDK audio parser.
    * None on corrupt/undecodable payloads or unexpected formats — the
    * droppable-and-countable shape shared with the image decoders. */
  def decodeAudio(docId: Long, payload: Array[Byte]): Option[AudioFeatures] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return None
      val bytes = ais.readAllBytes()
      ais.close()
      if (bytes.length % 2 != 0) return None // torn sample
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var mx = 0L
      var n = 0L
      while (bb.remaining >= 2) {
        val a = math.abs(bb.getShort.toLong)
        sum += a; if (a > mx) mx = a; n += 1
      }
      Some(AudioFeatures(docId, fmt.getSampleRate.toLong, n, sum, mx))
    } catch { case _: Exception => None }
  }

  /** Frame-level PCM energy — the VAD / loudness-segmentation primitive:
    * slice the decoded stream into fixed `frameLen`-sample frames (last
    * frame may be partial) and emit each frame's exact Σ v² and peak.
    * Same decode path and droppable-payload contract as [[decodeAudio]]. */
  def decodeAudioFrames(docId: Long, payload: Array[Byte],
                        frameLen: Int = 100): Seq[AudioFrameFeatures] = {
    if (payload == null || payload.isEmpty) return Nil
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return Nil
      val bytes = ais.readAllBytes()
      ais.close()
      if (bytes.length % 2 != 0) return Nil // torn sample
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = Seq.newBuilder[AudioFrameFeatures]
      var frame = 0L
      while (bb.remaining >= 2) {
        var n = 0L
        var energy = 0L
        var peak = 0L
        while (n < frameLen && bb.remaining >= 2) {
          val v = bb.getShort.toLong
          energy += v * v
          val a = math.abs(v)
          if (a > peak) peak = a
          n += 1
        }
        out += AudioFrameFeatures(docId, frame, n, energy, peak)
        frame += 1
      }
      out.result()
    } catch { case _: Exception => Nil }
  }

  /** Batched per-partition frame-energy extraction. */
  def extractAudioFrames(ds: Dataset[MediaRecord], frameLen: Int = 100,
                         batchSize: Int = 64): Dataset[AudioFrameFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r =>
        decodeAudioFrames(r.doc_id, r.payload, frameLen)))
    }
  }

  // ---- multi-frame ("video") payloads ----

  /** Frame count for doc_id's synthetic clip: 4..8. */
  def frameCount(docId: Long): Int = 4 + (docId % 5).toInt

  /** Frame f's gray value at (x, y): (x·31 + y·17 + doc_id·13 + f·7) mod 256. */
  def framePixel(docId: Long, f: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(x * 31L + y * 17L + docId * 13L + f * 7L, 256L).toInt

  /** A zlib-compressed clip: frameCount raw grayscale frames of
    * imageDims(doc_id), concatenated then deflated — the storage shape of
    * a video column (one binary payload, frames addressable by offset). */
  def videoPayload(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val frames = frameCount(docId)
    val raw = new Array[Byte](frames * w * h)
    var p = 0
    var f = 0
    while (f < frames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raw(p) = framePixel(docId, f, x, y).toByte; p += 1; x += 1 }
        y += 1
      }
      f += 1
    }
    deflateBytes(raw)
  }

  /** MOTION ENERGY — decode the clip (real inflate) and emit the exact L1
    * pixel delta between each pair of consecutive frames: the scene-cut /
    * motion-segmentation signal (a static clip scores near zero, a hard
    * cut spikes). Same torn-write contract as [[sampleFrames]]. */
  def frameDeltas(docId: Long, payload: Array[Byte]): Seq[MotionFeatures] = {
    val (w, h) = imageDims(docId)
    val fsz = w * h
    inflate(payload) match {
      case Some(raw) if fsz > 0 && raw.length % fsz == 0 =>
        val frames = raw.length / fsz
        (0 until frames - 1).map { f =>
          var d = 0L
          var i = 0
          while (i < fsz) {
            d += math.abs((raw(f * fsz + i) & 0xff) - (raw((f + 1) * fsz + i) & 0xff))
            i += 1
          }
          MotionFeatures(docId, f.toLong, d)
        }
      case _ => Nil
    }
  }

  /** Batched per-partition motion-delta extraction. */
  def extractMotion(ds: Dataset[MediaRecord],
                    batchSize: Int = 64): Dataset[MotionFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r => frameDeltas(r.doc_id, r.payload)))
    }
  }

  /** FRAME SAMPLING — decode the clip (real inflate), slice it into
    * frames by offset, keep every `stride`-th frame, and emit per-frame
    * pixel sums. None on corrupt payloads or a length that is not a whole
    * number of frames (a torn write). */
  def sampleFrames(docId: Long, payload: Array[Byte],
                   stride: Int = 2): Seq[FrameFeatures] = {
    val (w, h) = imageDims(docId)
    val fsz = w * h
    inflate(payload) match {
      case Some(raw) if fsz > 0 && raw.length % fsz == 0 =>
        val frames = raw.length / fsz
        (0 until frames by stride).map { f =>
          var sum = 0L
          var i = f * fsz
          val end = i + fsz
          while (i < end) { sum += (raw(i) & 0xff); i += 1 }
          FrameFeatures(docId, f.toLong, fsz.toLong, sum)
        }
      case _ => Nil
    }
  }

  /** zlib stream → recovered bytes. None on corrupt input. */
  def inflate(payload: Array[Byte]): Option[Array[Byte]] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val inf = new Inflater()
      inf.setInput(payload)
      val bos = new ByteArrayOutputStream(payload.length * 2 + 32)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // n == 0 with input exhausted but the stream NOT finished = a
        // truncated payload (finished() must be rechecked first: the call
        // that completes a zero-output stream reports both flags true)
        if (n == 0 && !inf.finished() && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated")
        bos.write(buf, 0, n)
      }
      inf.end()
      Some(bos.toByteArray)
    } catch { case _: Exception => None }
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** 8×8 average-hash (aHash) of a REAL decoded image — the perceptual
    * fingerprint behind image near-dup detection: sample the raster on a
    * fixed 8×8 grid (in(⌊i·w/8⌋, ⌊j·h/8⌋) — nearest-neighbor, any input
    * size), take the INTEGER floor mean of the 64 samples, set bit
    * j·8+i where sample > mean. Pure integer throughout, so the hash is
    * engine- and partition-invariant and a SQL oracle can replay it from
    * the fixture's pixel rule. */
  def aHashImage(docId: Long, payload: Array[Byte]): Option[HashFeatures] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w == 0 || h == 0) return None
      val raster = img.getRaster
      val samples = new Array[Int](64)
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          samples(j * 8 + i) = raster.getSample(i * w / 8, j * h / 8, 0)
          i += 1
        }
        j += 1
      }
      val mean = samples.map(_.toLong).sum / 64
      var hash = 0L
      var idx = 0
      while (idx < 64) {
        if (samples(idx) > mean) hash |= (1L << idx)
        idx += 1
      }
      Some(HashFeatures(docId, w, h, hash))
    } catch { case _: Exception => None }
  }

  /** Per-QUADRANT 4×4 average-hashes (16 bits each) of a real decoded
    * image — the crop/partial-match-resistant variant of [[aHashImage]]:
    * a crop or occlusion that destroys one quadrant leaves the other
    * three hashes intact, so near-dups still collide on ≥1 tile bucket.
    * Quadrant qx,qy ∈ {0,1} spans origin (qx·⌊w/2⌋, qy·⌊h/2⌋) with dims
    * (⌊w/2⌋, ⌊h/2⌋) (odd last row/column dropped — both engines agree);
    * inside it the 4×4 nearest-neighbor grid, integer floor mean, bit
    * j·4+i set when sample > mean. Pure integer, oracle-replayable. */
  def tileHashImage(docId: Long, payload: Array[Byte]): Option[Seq[TileHashFeatures]] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val (tw, th) = (w / 2, h / 2)
      if (tw == 0 || th == 0) return None
      val raster = img.getRaster
      val tiles = for (qy <- 0 until 2; qx <- 0 until 2) yield {
        val (ox, oy) = (qx * tw, qy * th)
        val samples = new Array[Int](16)
        var j = 0
        while (j < 4) {
          var i = 0
          while (i < 4) {
            samples(j * 4 + i) = raster.getSample(ox + i * tw / 4, oy + j * th / 4, 0)
            i += 1
          }
          j += 1
        }
        val mean = samples.map(_.toLong).sum / 16
        var hash = 0L
        var idx = 0
        while (idx < 16) {
          if (samples(idx) > mean) hash |= (1L << idx)
          idx += 1
        }
        TileHashFeatures(docId, qy * 2 + qx, hash)
      }
      Some(tiles)
    } catch { case _: Exception => None }
  }

  /** Batched per-partition tile-hash extraction (corrupt payloads drop). */
  def extractTileHash(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[TileHashFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r =>
        tileHashImage(r.doc_id, r.payload).toSeq.flatten))
    }
  }

  /** Batched per-partition aHash extraction (the [[extractImages]]
    * contract: corrupt payloads drop). */
  def extractAHash(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[HashFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r => aHashImage(r.doc_id, r.payload)))
    }
  }

  // ---- batched per-partition extraction ----

  /** Batched per-partition image decode over binary payloads. Corrupt
    * payloads are silently dropped (use [[extractImagesWithMetrics]] to
    * count them). */
  def extractImages(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a native codec would decode N payloads at once
        batch.flatMap(r => decodeImage(r.doc_id, r.payload))
      }
    }
  }

  /** Batched per-partition zlib inflate → (n_bytes, md5) of the RECOVERED
    * content: the round-trip proof a SQL oracle can recompute from the
    * uncompressed source. */
  def extractInflate(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[InflateFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          inflate(r.payload).map(b => InflateFeatures(r.doc_id, b.length.toLong, md5hex(b)))
        }
      }
    }
  }

  /** Batched per-partition decode + nearest-neighbor resize. */
  def extractResized(ds: Dataset[MediaRecord], factor: Int = 2,
                     batchSize: Int = 64): Dataset[ResizeFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r =>
        resizeImage(r.doc_id, r.payload, factor)))
    }
  }

  /** Batched per-partition clip inflate + every-`stride`-th frame sample. */
  def extractFrames(ds: Dataset[MediaRecord], stride: Int = 2,
                    batchSize: Int = 64): Dataset[FrameFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r =>
        sampleFrames(r.doc_id, r.payload, stride)))
    }
  }

  /** Batched per-partition WAV decode over binary payloads. */
  def extractAudio(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap(r =>
        decodeAudio(r.doc_id, r.payload)))
    }
  }

  /** DataFrame front door: (doc_id, payload binary) → image features. */
  def extract(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractImages(df.as[MediaRecord]).toDF()
  }

  /** Production shape: corrupt payloads (null/empty/garbage — anything the
    * codec rejects) are dropped and COUNTED via an accumulator instead of
    * failing the job. Returns (features, corruptCounter); read the counter
    * after an action.
    *
    * Accumulator caveat (standard Spark semantics): updates inside a
    * TRANSFORMATION are at-least-once — task retries, speculation, or
    * running a second action over the result re-count. Treat the value as
    * a diagnostic; for an exactly-once metric attach `df.observe` to the
    * single action instead (see ObservabilitySpec). */
  def extractImagesWithMetrics(df: DataFrame, batchSize: Int = 64)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    import df.sparkSession.implicits._
    val corrupt = df.sparkSession.sparkContext
      .longAccumulator("graft.multimodal.corrupt")
    val out = df.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val f = decodeImage(r.doc_id, r.payload)
          if (f.isEmpty) corrupt.add(1)
          f
        }
      }
    }
    (out.toDF(), corrupt)
  }
}
