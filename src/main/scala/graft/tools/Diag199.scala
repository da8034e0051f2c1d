package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** Dev scratch: decompose q199's sf1 cost — pair generation alone vs
  * + size filter vs + bounded/unbounded intersect kernel. */
object Diag199 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1o"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextHashFunctions.charNgramHashes(col("text"), 3).as("gs"))
      .withColumn("n_g", size(col("gs")).cast("long"))
    def pairs = Skew.saltedSelfPairs(d, "source", "doc_id", salts = 4, maxBlock = 10000)
      .filter(greatest(col("a.n_g"), col("b.n_g")) * 0.2 <= least(col("a.n_g"), col("b.n_g")))
    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[diag199] $label: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    t("pairs only")(pairs.select(col("a.doc_id")))
    t("pairs+xxhash")(pairs.select(
      (xxhash64(col("a.doc_id")).bitwiseXOR(xxhash64(col("b.doc_id")))).as("h"))
      .filter(col("h") =!= 0))
    t("pairs+bounded")(pairs
      .filter(graft.functions.GraftFunctions.sortedIntersectCountBounded(col("a.gs"), col("b.gs"), 0.2) >= 0))
    t("pairs+full")(pairs
      .filter(graft.functions.GraftFunctions.sortedIntersectCount(col("a.gs"), col("b.gs")) >= 0))
    spark.stop()
  }
}
