package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed batch-shaped media processing — the Scala analogue of a
  * `mapInPandas` decode stage (the north-star multimodal surface).
  *
  * `decodeBatched` consumes each partition as an iterator, assembles
  * fixed-size batches (the "batch shape" a vectorized decoder or an
  * inference runtime wants), runs the decoder once per batch, and emits
  * typed features. The decoder here is a STUB — deterministic
  * pseudo-features derived from payload bytes, clearly marked — because
  * the container ships no image/audio codecs; everything Spark-side
  * (encoders, partition iteration, batch assembly, output schema) is
  * real and tested in MediaBatchSpec.
  *
  * Scale posture: a narrow mapPartitions — no shuffle, no driver
  * involvement; batch size bounds peak memory per task regardless of
  * partition size.
  */
object MediaBatchProcessor {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Long, batch_size: Int, features: Array[Double])

  val DefaultBatchSize = 64

  /** STUB decoder: a real implementation would hand `batch` to a codec /
    * model runtime. Emits 4 deterministic pseudo-features per payload
    * (length, first/last byte, byte sum mod 997). */
  private def stubDecodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val len = m.payload.length.toLong
      val first = if (len > 0) (m.payload(0) & 0xff).toDouble else 0.0
      val last = if (len > 0) (m.payload(m.payload.length - 1) & 0xff).toDouble else 0.0
      var sum = 0L
      var i = 0
      while (i < m.payload.length) { sum += (m.payload(i) & 0xff); i += 1 }
      MediaFeatures(m.doc_id, m.media_type, len, batch.size,
        Array(len.toDouble, first, last, (sum % 997).toDouble))
    }

  def decodeBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => stubDecodeBatch(batch.toSeq))
    }
  }
}
