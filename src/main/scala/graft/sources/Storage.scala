package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, functions}

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

  /** Z-order (Morton) locality key of two 16-bit dimensions — the
    * multi-dimensional clustering key behind OPTIMIZE ZORDER-style
    * layouts: sorting/range-partitioning by this interleaved key keeps
    * rows close in BOTH dimensions close on disk, so min/max file skipping
    * prunes on either predicate (single-column sort prunes only its own).
    * Pure bitwise spread-shift arithmetic (exact BIGINT, codegen'd
    * builtins, no UDF), identical cross-engine.
    *
    * At 100 TB: `df.repartitionByRange(n, zorderKey(col("a"), col("b")))`
    * before the parquet write is the whole recipe — the key is map-side,
    * the sort is the same range exchange any ORDER BY pays. */
  def zorderKey(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      // 16 bits spread to even positions via magic-mask doubling
      val x1 = (x0.bitwiseOR(functions.shiftleft(x0, 8))).bitwiseAND(functions.lit(0x00FF00FFL))
      val x2 = (x1.bitwiseOR(functions.shiftleft(x1, 4))).bitwiseAND(functions.lit(0x0F0F0F0FL))
      val x3 = (x2.bitwiseOR(functions.shiftleft(x2, 2))).bitwiseAND(functions.lit(0x33333333L))
      (x3.bitwiseOR(functions.shiftleft(x3, 1))).bitwiseAND(functions.lit(0x55555555L))
    }
    val a16 = a.cast("long").bitwiseAND(functions.lit(65535L))
    val b16 = b.cast("long").bitwiseAND(functions.lit(65535L))
    spread(a16).bitwiseOR(functions.shiftleft(spread(b16), 1))
  }
}
