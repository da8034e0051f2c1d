package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed in *batched* per-partition passes —
 * the Scala shape of a `mapInPandas` pipeline (iterator of batches in, batches
 * out), which is how decode/resize/feature-extract runs at 100 TB without
 * per-row overhead.
 *
 * The IMAGE decode is REAL: `javax.imageio` ships with the JDK, so image
 * payloads decode to true width/height and a luminance-histogram feature
 * ([[decode]]). AUDIO is real for the containers the JDK parses
 * (`javax.sound.sampled`: WAV/AIFF/AU PCM) — true sample rate, duration,
 * and an amplitude-histogram feature. Compressed audio (mp3/opus) and
 * video remain STUBBED (no ffmpeg-style codec libraries in this
 * container): deterministic fake features from the bytes, with the real
 * batched-iterator contract. The Spark-side plumbing — schema, batch
 * iteration, partition preservation, metadata propagation — is identical
 * for every path and covered by MultimodalSpec.
 */
object Multimodal {

  /** media(media_id, kind, bytes, meta{width,height,duration_ms}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Synthesize a media table from documents (payload = utf-8 bytes), so the
    * pipeline has real binary columns to push around. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms")).as("meta"))

  /** Matches the [[MediaFeature]] encoder exactly (reference strings are
    * nullable, primitive array elements are not). */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Decoded-feature row (typed so the batched decode stays a Dataset
    * transform — a `MapPartitions` node in the logical plan, not an RDD
    * detour that would hide the operator from Catalyst/AQE). width/height
    * are populated only when the payload decoded as an image;
    * sample_rate/duration_ms only when it decoded as audio. */
  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], duration_ms: Option[Long],
      feature: Seq[Float])

  /** Real image decode: JDK `javax.imageio` → true dimensions + an 8-bin
    * normalized luminance histogram. Returns None for undecodable bytes. */
  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes.isEmpty) return None
    javax.imageio.ImageIO.setUseCache(false) // no temp-file spill per decode
    // NonFatal, not just IOException: plugin readers throw RuntimeExceptions
    // on real-world malformed payloads (CMYK JPEGs, truncated files) and one
    // bad row must not kill a corpus-wide decode job
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          hist(lum >> 5) += 1 // 256 levels → 8 bins
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      (w, h, hist.map(_ / n))
    }
  }

  /** Real audio decode for JDK-parseable containers (WAV/AIFF/AU):
    * true sample rate + duration from the header, and an 8-bin normalized
    * amplitude histogram from the 16-bit PCM samples (header-only metadata
    * for other sample sizes). Returns None for undecodable bytes. */
  private def decodeAudio(bytes: Array[Byte]): Option[(Int, Long, Array[Float])] = {
    if (bytes.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durMs = (frames * 1000.0 / fmt.getFrameRate).toLong
        val hist = new Array[Long](8)
        var total = 0L
        if (fmt.getSampleSizeInBits == 16) {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i + 1 < n) {
              val lo = buf(if (fmt.isBigEndian) i + 1 else i) & 0xFF
              val hi = buf(if (fmt.isBigEndian) i else i + 1).toInt
              val amp = math.abs((hi << 8) | lo)
              hist(math.min(amp >> 12, 7)) += 1 // |sample| 0..32768 → 8 bins
              total += 1
              i += 2
            }
            n = in.read(buf)
          }
        }
        val feature =
          if (total > 0) hist.map(_.toFloat / total)
          else Array.fill(8)(0f)
        Some((fmt.getSampleRate.toInt, durMs, feature))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Batched decode/feature-extract — the codec call a production pipeline
    * runs via mapInPandas (iterator of batches in, rows out; a typed Dataset
    * mapPartitions keeps the step inside the declarative plan; input
    * partitioning is preserved — no shuffle).
    *
    * `image` payloads decode for REAL ([[decodeImage]]): true width/height
    * plus a normalized luminance histogram. `audio` payloads decode for
    * real when the JDK parses the container ([[decodeAudio]]): sample
    * rate, duration, amplitude histogram. Video — and any payload that
    * fails to parse, e.g. the synthesized text payloads — falls back to
    * the deterministic STUB feature (byte-sum checksum + a byte-histogram
    * "embedding"), keeping output rows 1:1 with input rows either way. */
  def decode(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch => // batched like mapInPandas
          batch.iterator.map { case (id, kind, b) =>
            val bytes = Option(b).getOrElse(Array.emptyByteArray)
            var checksum = 0L
            val hist = new Array[Long](8)
            var i = 0
            while (i < bytes.length) {
              checksum = checksum * 31 + (bytes(i) & 0xFF)
              hist((bytes(i) & 0xFF) % 8) += 1
              i += 1
            }
            def stub = {
              val n = math.max(bytes.length, 1).toFloat
              MediaFeature(id, kind, bytes.length.toLong, checksum,
                None, None, None, None, hist.map(_ / n).toSeq)
            }
            kind match {
              case "image" => decodeImage(bytes) match {
                case Some((w, h, lumHist)) =>
                  MediaFeature(id, kind, bytes.length.toLong, checksum,
                    Some(w), Some(h), None, None, lumHist.toSeq)
                case None => stub
              }
              case "audio" => decodeAudio(bytes) match {
                case Some((rate, durMs, ampHist)) =>
                  MediaFeature(id, kind, bytes.length.toLong, checksum,
                    None, None, Some(rate), Some(durMs), ampHist.toSeq)
                case None => stub
              }
              case _ => stub
            }
          }
        }
      }
      .toDF()
  }

  /** Former name of [[decode]], kept for source compatibility (the decode is
    * no longer a stub for images). */
  @deprecated("use decode", "r7")
  def decodeStub(media: DataFrame, batchSize: Int = 256): DataFrame =
    decode(media, batchSize)

  // ---------------------------------------------------------------- C12
  /** Driver-checked surface of the decode pipeline: media synthesis →
    * batched decode, projected to the oracle-expressible columns (the
    * checksum/feature stubs are covered by MultimodalSpec instead). */
  def q57MultimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decode(mediaFromDocuments(spark, dir))
      .select(col("media_id"), col("kind"), col("n_bytes"))

  /** Driver-checked frame sampling: per-video frame count + sampled bytes. */
  def q58FrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaFromDocuments(spark, dir), frameBytes = 64, stride = 2)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).cast("long").as("frame_bytes_total"))

  /** Frame-sampling shape for video payloads: slice the payload into
    * fixed-size "frames" and emit every `stride`-th — pure builtins. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor(length(col("bytes")) / frameBytes).cast("int") - 1, lit(0)),
            lit(stride)),
          i => substring(col("bytes"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
}
