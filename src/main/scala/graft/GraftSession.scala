package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.SortedIntersectCount

/**
 * Session entry point — the role TiFlinkApp.Builder's environment setup plays
 * (reference: TiFlinkApp.java:241-268: execution environment, checkpointing,
 * catalog registration). graft tunes a SparkSession for the engine's
 * workloads and registers its native functions through the public
 * [[SparkSessionExtensions]] hook, so `spark.sql("... sorted_intersect_count(a,b)")`
 * works for SQL users too.
 *
 * Scale defaults: AQE on (runtime re-planning + skew-join splitting),
 * shuffle partitions sized by the caller (32 locally; on a cluster,
 * 2-3× total cores), UTC session time.
 */
object GraftSession {

  /** Extension installable via
    * `spark.sql.extensions=graft.GraftSession$Extensions`. */
  class Extensions extends (SparkSessionExtensions => Unit) {
    override def apply(ext: SparkSessionExtensions): Unit = {
      ext.injectFunction((
        new FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SortedIntersectCount(children(0), children(1))))
    }
  }

  /** Register graft's native SQL functions on an existing session. */
  def registerFunctions(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.registerTempFunction(
      spark, "sorted_intersect_count",
      children => SortedIntersectCount(children(0), children(1)))

  def builder(appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.extensions", classOf[Extensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.adaptive.skewJoin.enabled", true)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // TIMESTAMP(NANOS) parquet (events table) reads as a nanos long
      // instead of [PARQUET_TYPE_ILLEGAL]; Tables.events rebuilds a µs
      // timestamp from it. Session-level so no operator mutates conf.
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
}
