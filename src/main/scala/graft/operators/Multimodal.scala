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

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** STUB decode/feature-extract: in production this is the codec call (PIL/
    * ffmpeg et al. via mapInPandas); here a deterministic fake — byte-sum
    * checksum + an 8-dim "embedding" derived from byte histograms — with the
    * real batched-iterator shape (`mapPartitions`, arrow-friendly row width).
    * Partitioning of the input is preserved: no shuffle in the plan. */
  def decodeStub(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "kind", "bytes").rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch => // batched like mapInPandas
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          var checksum = 0L
          val hist = new Array[Long](8)
          var i = 0
          while (i < bytes.length) {
            checksum = checksum * 31 + (bytes(i) & 0xFF)
            hist((bytes(i) & 0xFF) % 8) += 1
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          Row(id, kind, bytes.length.toLong, checksum,
            hist.map(h => h.toFloat / n).toSeq)
        }
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

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
