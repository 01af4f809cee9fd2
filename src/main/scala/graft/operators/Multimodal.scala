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
  * Image decode is REAL for the JDK's native raster formats
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external codecs needed):
  * [[decode]] sniffs the payload's magic bytes and reads true
  * width/height when the bytes are an actual image. Audio/video decode
  * has no JDK-native codec, so [[fakeDecode]] remains the clearly-marked
  * deterministic STUB for those (and for non-image payloads, e.g. the
  * synthetic UTF-8 test corpus): "dimensions" derived from byte length.
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

  /** True iff the payload starts with a raster-image signature the JDK
    * can decode (PNG / JPEG / GIF / BMP). Cheap guard so the partition
    * loop never pays ImageIO reader lookup on non-image bytes. */
  def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||             // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))                               // BMP

  /** REAL image decode via `javax.imageio` (JDK-native, executor-local,
    * no external libs): true pixel dimensions for PNG/JPEG/GIF/BMP bytes,
    * None when the payload is not a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] =
    if (!looksLikeImage(payload)) None
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None else Some((img.getWidth, img.getHeight))
      } catch { case _: java.io.IOException => None }

  /** Per-row decode dispatch: real `javax.imageio` dimensions when the
    * payload is an actual image, the deterministic [[fakeDecode]] stub
    * otherwise (audio/video and synthetic payloads). */
  def decodePayload(kind: String, payload: Array[Byte]): (Int, Int, Double) =
    (if (kind == "image") decodeImage(payload) else None) match {
      case Some((w, h)) => (w, h, 0.0)
      case None         => fakeDecode(payload)
    }

  /** REAL audio decode via `javax.sound.sampled` (JDK-native, executor-
    * local — WAV/AIFF/AU PCM need no external codecs): container-level
    * format plus an actual signal feature (RMS amplitude over the PCM
    * samples, normalized to [0, 1]). None when the payload is not a
    * decodable audio container. Only video remains fully stubbed (the
    * JDK has no video codec — an ffmpeg pipe plugs into the same
    * partition loop). */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Double, Double)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val duration =
          if (frames >= 0 && fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble
          else 0.0
        (fmt.getSampleSizeInBits, fmt.getEncoding) match {
          case (16, javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) =>
            val pcm = in.readAllBytes()
            var sumSq = 0.0
            var n = 0
            var i = 0
            while (i + 1 < pcm.length) {
              val s =
                if (fmt.isBigEndian) ((pcm(i) << 8) | (pcm(i + 1) & 0xFF)).toShort
                else ((pcm(i + 1) << 8) | (pcm(i) & 0xFF)).toShort
              val x = s / 32768.0
              sumSq += x * x
              n += 1
              i += 2
            }
            val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
            Some((fmt.getSampleRate.toInt, fmt.getChannels, duration, rms))
          case _ => // container decoded but samples not 16-bit PCM: no RMS
            Some((fmt.getSampleRate.toInt, fmt.getChannels, duration, 0.0))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)
  ))

  /** Audio feature extraction over the `kind = 'audio'` rows: REAL
    * javax.sound decode (sample rate / channels / duration / RMS,
    * `decoded = true`) when the payload is an actual audio container,
    * deterministic stub values (16 kHz mono, [[fakeDecode]] duration,
    * rms 0, `decoded = false`) otherwise — so synthetic corpora stay
    * oracle-replayable while real WAV bytes get real features. Same
    * batched partition-loop shape as [[decode]]. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioSchema)
    media.filter(F.col("kind") === "audio")
      .select("media_id", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          decodeAudio(payload) match {
            case Some((rate, ch, dur, rms)) =>
              Row(r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
                rate, ch, dur, rms, true)
            case None =>
              val (_, _, dur) = fakeDecode(payload)
              Row(r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
                16000, 1, dur, 0.0, false)
          }
        }
      }(enc)
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
          val kind = r.getAs[String]("kind")
          val (w, h, d) = decodePayload(kind, r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("media_id"), kind, r.getAs[Long]("n_bytes"), w, h, d)
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
