package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: time the Simpson run-length kernel, native expression vs
  * the higher-order-function formulation, on the same corpus. */
object TimeKernel {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), array_sort(split(col("text"), " ")).as("s"))
      .withColumn("n", size(col("s")).cast("long"))
    base.count()

    def hof = base
      .withColumn("starts",
        expr("filter(sequence(0, int(n) - 1), i -> i = 0 OR s[i] <> s[i-1])"))
      .withColumn("sumsq", expr(
        "aggregate(zip_with(starts, " +
          "concat(slice(starts, 2, size(starts) - 1), array(int(n))), " +
          "(a, b) -> cast(b - a as bigint) * cast(b - a as bigint)), " +
          "0L, (acc, x) -> acc + x)"))
      .select(sum(col("sumsq")), sum(size(col("starts")).cast("long")))
    def native = base
      .withColumn("sumsq", graft.functions.SortedRuns.sortedRunSumSq(col("s")))
      .select(sum(col("sumsq")),
        sum(graft.functions.SortedRuns.sortedRunCount(col("s"))))

    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      val a = hof.collect()(0)
      val tHof = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val b = native.collect()(0)
      val tNat = (System.nanoTime() - t0) / 1e9
      require(a == b, s"kernel mismatch: $a vs $b")
      println(f"[kernel] run$i hof=$tHof%.3f s native=$tNat%.3f s (${tHof / tNat}%.1fx), agree=$a")
    }
    spark.stop()
  }
}
