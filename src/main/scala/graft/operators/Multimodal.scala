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
 * The decode step itself is STUBBED (no codec libraries in this container):
 * [[decodeStub]] produces deterministic fake features from the bytes. The
 * Spark-side plumbing — schema, batch iteration, partition preservation,
 * metadata propagation — is real and covered by MultimodalSpec.
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
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Decoded-feature row (typed so the batched decode stays a Dataset
    * transform — a `MapPartitions` node in the logical plan, not an RDD
    * detour that would hide the operator from Catalyst/AQE). */
  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      feature: Seq[Float])

  /** STUB decode/feature-extract: in production this is the codec call (PIL/
    * ffmpeg et al. via mapInPandas); here a deterministic fake — byte-sum
    * checksum + an 8-dim "embedding" derived from byte histograms — with the
    * real batched-iterator shape (iterator of batches in, rows out, exactly
    * mapInPandas' contract). A typed Dataset mapPartitions keeps the step
    * inside the declarative plan; input partitioning is preserved — no
    * shuffle. */
  def decodeStub(media: DataFrame, batchSize: Int = 256): DataFrame = {
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
            val n = math.max(bytes.length, 1).toFloat
            MediaFeature(id, kind, bytes.length.toLong, checksum,
              hist.map(h => h.toFloat / n).toSeq)
          }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------- C12
  /** Driver-checked surface of the decode pipeline: media synthesis →
    * batched decode, projected to the oracle-expressible columns (the
    * checksum/feature stubs are covered by MultimodalSpec instead). */
  def q57MultimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decodeStub(mediaFromDocuments(spark, dir))
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
