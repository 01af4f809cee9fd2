package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, functions => F}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns travelling next to typed
  * metadata — the standard lakehouse layout for multimodal training data
  * (one parquet row group holds both; column pruning means metadata-only
  * queries never read the bytes). Decode/feature-extraction is structured
  * as batched per-partition transforms ([[Dataset.mapPartitions]]) so a
  * real decoder (JNI image lib, ffmpeg pipe) drops in per-executor with
  * bounded memory: one partition's batch at a time, no driver involvement.
  *
  * NOTE: no media codecs exist in this container, so [[fakeDecode]] is a
  * clearly-marked deterministic STUB — it derives "dimensions" from the
  * payload hash. The Spark-side plumbing (schema, binary handling,
  * partition-batched transform signature) is real and tested.
  */
object Multimodal {

  /** Canonical media-record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)
  ))

  /** Wrap a text corpus as synthetic media rows (payload = UTF-8 bytes) —
    * the test-data stand-in for real image/audio blobs. */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      F.col(idCol).cast("long").as("media_id"),
      (F.when(F.col(idCol) % 3 === 0, "image")
        .when(F.col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      F.encode(F.col(textCol), "UTF-8").as("payload"),
      F.octet_length(F.encode(F.col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decoder ??? — stands in for a real image/audio decode.
    * Deterministic fake: "width/height/duration" derived from byte length
    * and payload hash so results are reproducible everywhere. Replace the
    * body with a real codec call per partition; the signature (binary in,
    * fixed-width features out) is what a production decoder needs. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Double) = {
    // ??? real decode unavailable in this container — deterministic fake
    // derived from payload length only (keeps the oracle pure arithmetic):
    val n = payload.length
    val width = 64 + n % 1024
    val height = 64 + (n * 7) % 1024
    val duration = (n % 6000) / 100.0
    (width, height, duration)
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false)
  ))

  /** Batched decode over partitions: the executor-local loop a real
    * decoder plugs into. Each task processes its partition's rows
    * streaming — memory bounded by one row's payload, scales with input
    * splits. */
  def decode(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select("media_id", "kind", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, d) = fakeDecode(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
              r.getAs[Long]("n_bytes"), w, h, d)
        }
      }(enc)
  }

  /** Frame sampling stub: for "video" rows, emit one row per sampled
    * frame index (every `stride`th frame of a fake frame count derived
    * from payload size). Shows the explode-shaped plumbing a real frame
    * sampler needs (posexplode over a per-row frame index sequence). */
  def sampleFrames(decoded: DataFrame, stride: Int = 10): DataFrame = {
    val frames = F.greatest(F.lit(1L), (F.col("duration_s") * 30).cast("long"))
    decoded.filter(F.col("kind") === "video")
      .withColumn("frame_idx",
        F.explode(F.sequence(F.lit(0L), frames - 1, F.lit(stride.toLong))))
      .select("media_id", "frame_idx", "width", "height")
  }

  /** Resize stub: pure-metadata transform computing target dims with
    * preserved aspect ratio (the real byte-level resample would live in
    * [[decode]]'s partition loop). */
  def resizeMeta(decoded: DataFrame, maxDim: Int): Column = {
    val scale = F.least(F.lit(1.0),
      F.lit(maxDim.toDouble) / F.greatest(F.col("width"), F.col("height")))
    F.struct(
      F.floor(F.col("width") * scale).cast("int").as("w"),
      F.floor(F.col("height") * scale).cast("int").as("h"))
  }
}
