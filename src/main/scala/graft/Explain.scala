package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized physical plan of named driver queries —
  * the plan-shape audit loop (`tools/run.sh graft.Explain <sfdir> q1 …`;
  * no names = every query). Grep targets: unexpected `BroadcastExchange`
  * on corpus-sized frames, `Window` with an empty partition spec outside
  * a bounded frame, missing `PushedFilters` at scans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
