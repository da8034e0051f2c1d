package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: q41 pipeline with old vs new shingle source. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def pipeline(exploded: DataFrame): Set[(Long, Long)] = {
      val hashed = exploded
        .withColumn("h1", pmod(xxhash64(col("s")), lit(1L << 61)))
        .withColumn("h2", pmod(xxhash64(col("s"), lit(1)), lit(1L << 32)))
      val sig = hashed.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          array((0 until 64).map(i => min(col("h1") + lit(i.toLong) * col("h2"))): _*).as("sig"))
      val cands = graft.operators.Dedup.lshCandidates(sig, "doc_id", "sig", bands = 16)
      import spark.implicits._
      cands.as[(Long, Long)].collect().toSet
    }

    val oldE = docs.select(col("doc_id"),
      explode(graft.operators.Dedup.shingles(col("text"), 3)).as("s"))
    val newE = graft.operators.Dedup.shinglesExploded(docs, "doc_id", "text", 3)
    val a = pipeline(oldE)
    val b = pipeline(newE)
    val b2 = pipeline(newE)
    println(s"[scratch] old cands=${a.size} new cands=${b.size} new2=${b2.size}")
    println(s"[scratch] old-new: ${(a -- b).take(5)}  new-old: ${(b -- a).take(5)}")
    println(s"[scratch] new deterministic: ${b == b2}")
    spark.stop()
  }
}
