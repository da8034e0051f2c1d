package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Physical-layout helpers — the storage half of the 100 TB posture.
 *
 * TiFlink reads TiKV regions pre-split by key range
 * (connectors/TableKeyRangeUtils.java): each Flink subtask owns a key range,
 * so joins/upserts by primary key never reshuffle. The Spark-native
 * equivalents: *bucketing* (hash-pre-partitioned tables → co-located joins
 * with no Exchange) and *partitioning* (directory pruning at scan time).
 *
 * Fact tables at 100 TB are written once, joined thousands of times —
 * paying one bucketed write deletes the per-query shuffle of the biggest
 * input.
 */
object Storage {

  /** Write as a bucketed+sorted managed table: a join between two tables
    * bucketed the same way on the join key runs shuffle-free (and merge
    * joins directly off the sorted buckets). */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, bucketCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    // the default in-memory catalog can forget a table whose files remain —
    // clear both so Overwrite semantics hold across sessions
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(warehouse, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Write hive-style partitioned parquet: predicates on the partition
    * column prune whole directories before any I/O. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
