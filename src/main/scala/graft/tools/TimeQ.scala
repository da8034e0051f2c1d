package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time one named SparkEntry query. Usage: TimeQ <name> [sfDir] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df =
        if (name == "entry") graft.SparkEntry.entry(spark)
        else graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"[timeq] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
