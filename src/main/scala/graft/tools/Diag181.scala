package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for q181's luminance blocking: how spread is
  * mean_lum across the corpus, and how populated are the buckets at a
  * given B? (The blocking key must have enough spread that per-bucket
  * population falls as B grows — a CLT-concentrated key would not.) */
object Diag181 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val b = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = graft.operators.Multimodal.decodeBlockFeatures(
      graft.operators.Multimodal.imagesFromDocuments(spark, dir))
    f.agg(count(lit(1)), min("mean_lum"), max("mean_lum"),
      stddev("mean_lum"), expr("approx_percentile(mean_lum, array(0.01,0.25,0.5,0.75,0.99))")).show(false)
    f.groupBy(floor(col("mean_lum") * b).as("bkt")).count()
      .orderBy(desc("count")).show(12, false)
    // spread of individual block means (candidate 2-D blocking keys)...
    f.select(col("blocks")(0).as("b0"), col("blocks")(1).as("b1"))
      .agg(min("b0"), max("b0"), stddev("b0"), stddev("b1")).show(false)
    // ...and the true-pair per-block shift the probe width must cover
    val j = graft.operators.Multimodal.decodeBlockFeatures(
      graft.operators.Multimodal.jpegsFromDocuments(spark, dir))
    val shift = f.select(col("media_id"), col("blocks").as("pa"))
      .join(j.select(col("media_id"), col("blocks").as("pb")), "media_id")
      .select(expr("aggregate(zip_with(pa, pb, (x, y) -> abs(x - y)), " +
        "cast(0.0 as double), (acc, v) -> greatest(acc, v))").as("maxShift"),
        expr("abs(pa[0] - pb[0])").as("s0"))
    shift.agg(max("maxShift"), expr("approx_percentile(maxShift, 0.99)"),
      max("s0"), avg("s0")).show(false)
    spark.stop()
  }
}
