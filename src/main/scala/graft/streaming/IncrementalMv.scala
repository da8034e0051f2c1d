package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incrementally-maintained aggregate MV over a keyed changelog — the heart of
 * TiFlink: its flagship example maintains
 * `select author, count(*) from posts group by author` under inserts,
 * updates, and deletes flowing from CDC (reference:
 * examples/.../TiFlinkExample.java:12-18 + FlinkTikvConsumer row-kinds at
 * connectors/FlinkTikvConsumer.java:244-268).
 *
 * Each micro-batch:
 *   1. compacts the batch to one final change per primary key,
 *   2. diffs it against the current entity snapshot → per-key (old, new),
 *   3. turns the diff into group-level deltas (retract old, add new),
 *   4. merges deltas into the aggregate table and upserts the entity table,
 *      both published atomically (UpsertSink staging discipline).
 *
 * Work per batch ∝ changed keys + touched groups, never the full history —
 * the defining property of incremental view maintenance. At cluster scale
 * steps 2/4 are MERGE INTOs against bucketed tables; the delta algebra is
 * identical.
 */
object IncrementalMv {

  /** One maintained view: `SELECT groupKey, count(*), sum(valueCol) FROM
    * entity-state GROUP BY groupKey` where entity-state is the latest row
    * per `pk` with delete tombstones applied.
    *
    * Changelog schema contract: pk, version (monotone per key), op
    * ('delete' = tombstone), groupKey, valueCol.
    */
  def maintain(
      basePath: String,
      pk: String, version: String, op: String,
      groupKey: String, valueCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val entityPath = s"$basePath/entity"
    val aggPath = s"$basePath/agg"
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // 1. final change per key within the batch
    val compacted = batch
      .groupBy(col(pk))
      .agg(max_by(struct(batch.columns.toIndexedSeq.map(col): _*), col(version)).as("__r"))
      .select(col("__r.*"))

    // 2. diff against current entity snapshot
    val current =
      if (fs.exists(new Path(entityPath))) spark.read.parquet(entityPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    val old = current.select(
      col(pk), col(groupKey).as("__old_g"), col(valueCol).as("__old_v"),
      col(version).as("__old_ver"))
    val diff = compacted.join(old, Seq(pk), "left")
      // ignore stale replays: batch version must advance
      .filter(col("__old_ver").isNull || col(version) > col("__old_ver"))

    // 3. group deltas: retract the old contribution, add the new one
    val retract = diff.filter(col("__old_g").isNotNull)
      .select(col("__old_g").as(groupKey), lit(-1L).as("__dc"), (col("__old_v") * -1).as("__dv"))
    val add = diff.filter(col(op) =!= "delete")
      .select(col(groupKey), lit(1L).as("__dc"), col(valueCol).as("__dv"))
    val deltas = retract.unionByName(add)
      .groupBy(col(groupKey))
      .agg(sum(col("__dc")).as("__dc"), sum(col("__dv")).as("__dv"))

    // 4a. merge deltas into the aggregate table
    val aggCurrent =
      if (fs.exists(new Path(aggPath))) spark.read.parquet(aggPath)
      else spark.emptyDataFrame
        .select(lit(null).cast(compacted.schema(groupKey).dataType).as(groupKey),
          lit(0L).as("cnt"), lit(0.0).as("total")).limit(0)
    val merged = aggCurrent
      .join(deltas, Seq(groupKey), "full")
      .select(col(groupKey),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L))).as("cnt"),
        (coalesce(col("total"), lit(0.0)) + coalesce(col("__dv"), lit(0.0))).as("total"))
      .filter(col("cnt") > 0)
    atomicWrite(spark, merged, aggPath)

    // 4b. upsert the entity table (latest-row-wins + tombstones)
    val unioned = current.unionByName(compacted)
    val entity = unioned.groupBy(col(pk))
      .agg(max_by(struct(unioned.columns.toIndexedSeq.map(col): _*), col(version)).as("__r"))
      .select(col("__r.*"))
      .filter(col(op) =!= "delete")
    atomicWrite(spark, entity, entityPath)
  }

  private def atomicWrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(path + "__stage")
    val old = new Path(path + "__old")
    fs.delete(stage, true)
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    fs.delete(old, true)
    if (fs.exists(new Path(path))) fs.rename(new Path(path), old)
    fs.rename(stage, new Path(path))
    fs.delete(old, true)
  }
}
