package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

case class MediaIn(doc_id: Long, payload: Array[Byte])
case class MediaFeatures(doc_id: Long, features: Array[Long])

/** Multimodal-column plumbing (north-star): media as opaque `binary`
  * payloads with typed metadata, decoded/featurized by partition-local
  * BATCHED operators — the JVM analogue of `mapInPandas` with an
  * arrow-batch shape. The decode kernel itself is a pluggable trait:
  * real image/audio codecs are not available in this environment, so
  * the stub is a deterministic byte-level featurizer (clearly marked);
  * schema, batching, and partition behavior are the real thing.
  */
trait MediaDecoder extends Serializable {
  /** One call per batch — mirroring an arrow record-batch boundary. */
  def decodeBatch(items: Seq[MediaIn]): Seq[MediaFeatures]
}

/** STUB decoder (deterministic stand-in for image/audio decode):
  * features = [byte length, vowel-byte count, first byte]. A real
  * deployment swaps this for a codec-backed implementation with the
  * same batch signature. */
class ByteStatsDecoder extends MediaDecoder {
  override def decodeBatch(items: Seq[MediaIn]): Seq[MediaFeatures] =
    items.map { m =>
      var vowels = 0L
      var i = 0
      while (i < m.payload.length) {
        val c = m.payload(i).toChar
        if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') vowels += 1
        i += 1
      }
      val first = if (m.payload.nonEmpty) (m.payload(0) & 0xff).toLong else -1L
      MediaFeatures(m.doc_id, Array(m.payload.length.toLong, vowels, first))
    }
}

object Multimodal {

  /** Batched decode/feature-extract over a binary payload column. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     payloadCol: String, decoder: MediaDecoder,
                     batchSize: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaIn]
      .mapPartitions(_.grouped(batchSize).flatMap(decoder.decodeBatch))
  }

  /** Frame sampling: split a binary payload into fixed-size frames —
    * one row per frame with index and bytes. Pure codegen'd explode
    * (substring on binary), no UDF. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int): DataFrame = {
    val p = col(payloadCol)
    // greatest(...,1) guards the descending-sequence trap on empty payloads
    val nFrames = greatest(ceil(length(p).cast("double") / frameBytes).cast("int"), lit(1))
    df.select(col(idCol), p.as("payload"), posexplode(sequence(lit(0), nFrames - 1))
        .as(Seq("frame_idx", "off")))
      .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"),
        col("payload").substr(col("off") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }
}
