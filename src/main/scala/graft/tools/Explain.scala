package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev helper: print the formatted plan of named SparkEntry queries.
  * Usage: Explain <sfDir> <query> [query ...] — one session for the
  * whole list, `===== <query> =====` separators between plans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name =====")
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      } catch {
        case e: Throwable => println(s"EXPLAIN FAILED: $e")
      }
    }
    spark.stop()
  }
}
