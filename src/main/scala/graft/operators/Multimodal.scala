package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Opaque binary record: the storage pattern for image/audio/video columns —
  * a `binary` payload plus typed metadata columns alongside. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Typed features extracted from a media payload. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                         width: Int, height: Int)

/** Multimodal column plumbing: binary payloads in, typed features out,
  * batched per-partition decode.
  *
  * The actual image/audio codec is STUBBED ([[Multimodal.decodeStub]] — the
  * decode libraries are not in this container); everything Spark-side is
  * real: the binary column schema, the typed `Dataset[MediaRecord]`
  * boundary, and the batched `mapPartitions` shape (records are decoded in
  * groups of `batchSize`, mirroring how an Arrow/pandas batch UDF or a
  * native codec API would consume them).
  *
  * Scale notes: mapPartitions is a narrow transformation — no shuffle; the
  * decode runs where the bytes already live. Batch size bounds per-batch
  * memory for payloads of any size.
  */
object Multimodal {

  /** STUB decoder: deterministic fake standing in for a real codec.
    * Produces a codepoint checksum (UTF-8-decodes the payload — engine-
    * independent even for non-ASCII text payloads, unlike a raw byte sum)
    * and fake dimensions derived from the payload size, so tests and
    * oracles can pin the plumbing end-to-end. */
  def decodeStub(payload: Array[Byte]): MediaFeatures = {
    val sum = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().asLongStream().sum()
    MediaFeatures(doc_id = -1, n_bytes = payload.length, checksum = sum,
      width = payload.length % 640, height = payload.length % 480)
  }

  /** Batched per-partition feature extraction over binary payloads. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would decode N payloads at once
        batch.map(r => decodeStub(r.payload).copy(doc_id = r.doc_id))
      }
    }
  }

  /** DataFrame front door: (doc_id, payload binary) → typed features. */
  def extract(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractFeatures(df.as[MediaRecord]).toDF()
  }

  /** Production shape: corrupt payloads (null/empty — where a real codec
    * would throw) are dropped and COUNTED via an accumulator instead of
    * failing the job. Returns (features, corruptCounter); read the counter
    * after an action.
    *
    * Accumulator caveat (standard Spark semantics): updates inside a
    * TRANSFORMATION are at-least-once — task retries, speculation, or
    * running a second action over the result re-count. Treat the value as
    * a diagnostic; for an exactly-once metric attach `df.observe` to the
    * single action instead (see ObservabilitySpec). */
  def extractWithMetrics(df: DataFrame, batchSize: Int = 64)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    import df.sparkSession.implicits._
    val corrupt = df.sparkSession.sparkContext
      .longAccumulator("graft.multimodal.corrupt")
    val out = df.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          if (r.payload == null || r.payload.isEmpty) { corrupt.add(1); None }
          else Some(decodeStub(r.payload).copy(doc_id = r.doc_id))
        }
      }
    }
    (out.toDF(), corrupt)
  }
}
