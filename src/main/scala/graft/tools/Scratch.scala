package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: A/B timing of q43 formulations. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val grams = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
      i => col("text").substr(i, lit(3))))

    def joinAgg(persisted: Boolean): DataFrame = {
      var g = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), explode(grams).as("ng0"))
        .select(col("doc_id"), col("source"), xxhash64(col("ng0")).as("ng"))
      if (persisted) g = g.persist()
      val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = g.select(col("doc_id").as("doc_a"), col("source"), col("ng"))
        .join(g.select(col("doc_id").as("doc_b"), col("source"), col("ng")), Seq("source", "ng"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
    }

    // bitset variant: per source, index docs 0..k-1; per (source, ng) build a
    // bitmap of member docs; per pair count AND bits via per-gram pair rows…
    // (kept for reference; explodes the same way)

    def time(name: String, f: => DataFrame): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("joinAgg", joinAgg(false))
    time("joinAgg+persist", joinAgg(true))
    spark.stop()
  }
}
