package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global order statistics — `row_number() OVER (ORDER BY …)`
 * without the single-task sort Spark's empty-partition window falls into
 * (every row through ONE reducer: the canonical 100 TB cliff, called out on
 * q86's vocabulary rank before this utility existed).
 *
 * Shape: range-repartition on the sort key (so partition i holds a
 * contiguous key range, all-parallel), rank within each partition, then add
 * the per-partition row-count prefix offsets — the only driver-side values
 * are `numPartitions` counts, an aggregate, never data. Total work: one
 * range exchange + local sorts, the same cost `ORDER BY` itself pays.
 *
 * Determinism: the ranged frame is MATERIALIZED once and both passes
 * (count, rank) read that single materialization — without it the two
 * executions could re-sample range boundaries (or AQE could re-plan an
 * upstream shuffle) and the collected offsets would silently disagree with
 * the partitions the window actually ranks. Callers must pass a TOTAL
 * order (include a unique tiebreaker column) — with ties straddling a
 * boundary the split is boundary-dependent, with a total order every row
 * has exactly one rank under ANY boundary placement.
 */
object Rank {

  /** Append `rnCol` = 1-based global row number of `df` under `sortCols`
    * (must be a total order — include a unique tiebreaker). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "rn"): DataFrame =
    globalRowNumberAndTotal(df, sortCols, rnCol)._1

  /** [[globalRowNumber]] plus the exact total row count — FREE, it is the
    * sum of the per-partition counts the offset pass already collected (a
    * caller needing rank AND n must not pay a second scan). */
  def globalRowNumberAndTotal(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "rn"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.Lineage.truncate(
      df.repartitionByRange(parts, sortCols: _*)
        .withColumn("__pid", spark_partition_id()), reliable = false).df
    // one long per non-empty partition to the driver — bounded by `parts`
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val ranked = ranged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(rnCol, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
    (ranked, counts.map(_._2).sum)
  }
}
