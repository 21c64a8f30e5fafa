package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * plus per-partition batch transforms for decode / feature-extract /
  * frame-sample.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration
  * shape (the Scala analog of arrow-batched pandas UDFs is
  * `mapPartitions` over a typed Dataset) — is real and tested. The
  * actual codec step is STUBBED (this environment ships no image/audio
  * libraries): [[StubCodec]] is a clearly-marked deterministic fake
  * with the exact signature a real decoder plugs into.
  */
object MultimodalOps {

  /** A media row: id, modality kind, opaque payload, typed metadata.
    * At 100 TB payloads live in parquet binary columns (or external
    * object-store pointers in `uri`); metadata stays columnar so
    * filters on kind/width/duration prune without touching bytes.
    */
  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      uri: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long,
      sample_rate: Int)

  /** Extracted features per media item. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** One sampled frame reference per (media, frame_no). */
  case class FrameSample(media_id: Long, frame_no: Int, frame_ts_ms: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** The codec seam: a real implementation would call into an image/
    * audio library per batch (exactly this iterator shape — one
    * partition in, lazily one decoded stream out, nothing materialized
    * per-partition).
    */
  trait Codec extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** STUB codec — deterministic fake standing in for the missing media
    * libraries: "features" are a hash-seeded 8-float vector, the
    * checksum a rolling byte hash. Replace with a real decoder by
    * implementing [[Codec]]; everything around it (schema, partition
    * shape, lazy iteration) is production plumbing.
    */
  object StubCodec extends Codec {
    override def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        var h = 1125899906842597L // rolling polynomial hash of the payload
        var i = 0
        while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
        val feat = Array.tabulate(8)(j => ((h >>> (j * 8)) & 0xff).toFloat / 255f)
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, h, feat)
      }
  }

  /** Decode/feature-extract: per-partition batched transform, no
    * shuffle — each executor streams its partition through the codec.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      codec: Codec = StubCodec
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(codec.decodeBatch(_))
  }

  /** Frame sampling for video/audio rows: one row per sampled frame at
    * `everyMs` spacing — pure column ops (`sequence` + `explode`), no
    * codec needed until frames are actually decoded.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("kind").isin("video", "audio") && col("duration_ms") > 0)
      .select(
        col("media_id"),
        posexplode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_ts_ms")

  /** Resize transform for image rows: per-partition batched reshape —
    * the same mapPartitions shape as [[extractFeatures]], with the
    * pixel work behind the codec seam. The STUB "resampler" carries
    * payload bytes through and rewrites the typed metadata (the real
    * dimensions contract); a real implementation decodes, resamples,
    * and re-encodes inside the same iterator without materializing the
    * partition. Non-image rows pass through untouched.
    */
  def resizeImages(
      media: Dataset[MediaRow],
      targetW: Int,
      targetH: Int
  ): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind == "image") r.copy(width = targetW, height = targetH)
      else r
    })
  }

  /** Metadata-only projection: the common pruned read path — never
    * touches payload bytes (column pruning keeps the binary column out
    * of the scan entirely).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n_items"),
      sum(col("duration_ms")).as("total_duration_ms"),
      avg(col("width") * col("height")).as("avg_pixels"))

  /** Synthesize a deterministic media table (test/demo input): payload
    * bytes derived from the id so every row is reproducible.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val payload = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 31 + i) % 251).toByte)
      MediaRow(id, kind, s"mem://media/$id", payload,
        width = if (kind == "image") 640 else 0,
        height = if (kind == "image") 480 else 0,
        duration_ms = if (kind == "image") 0L else 1000L + (id % 9000),
        sample_rate = if (kind == "audio") 16000 else 0)
    }
  }
}
