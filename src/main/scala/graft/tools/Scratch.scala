package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness — not part of the library surface. */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warmup

    // stage 1: kernel only
    val d = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextHashFunctions.charNgramHashes(col("text"), 3).as("gs"))
    time("kernel only (noop)") {
      d.write.format("noop").mode("overwrite").save()
    }
    // stage 2: salted pairs, no rescore
    val pairs = graft.operators.Skew.saltedSelfPairs(d, "source", "doc_id", salts = 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("pairs only (noop)") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    // full query
    val full = graft.operators.Dedup.q43NgramJaccard(spark, dir)
    time("full q43 (noop)") {
      full.write.format("noop").mode("overwrite").save()
    }
    time("full q43 again") {
      full.write.format("noop").mode("overwrite").save()
    }
    full.explain("formatted")
    spark.stop()
  }
}
