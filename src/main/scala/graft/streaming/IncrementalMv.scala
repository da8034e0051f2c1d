package graft.streaming

import org.apache.spark.sql.DataFrame
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
 *   2. diffs it against the current entity rows OF THE TOUCHED BUCKETS ONLY
 *      (partition-pruned read) → per-key (old, new),
 *   3. turns the diff into group-level deltas (retract old, add new),
 *   4. merges deltas into the touched agg buckets and upserts the touched
 *      entity buckets — only those bucket directories are rewritten
 *      ([[BucketedTable.swapTouched]]); everything else stays byte-identical.
 *
 * Work per batch ∝ changed keys + touched groups + the buckets they hash
 * into, never the full history — the defining property of incremental view
 * maintenance, and the same per-region write shape TiFlink's sink has
 * (FlinkTikvProducer groups rows by region before prewrite).
 */
object IncrementalMv {

  /** One maintained view: `SELECT groupKey, count(*), sum(valueCol) FROM
    * entity-state GROUP BY groupKey` where entity-state is the latest row
    * per `pk` with delete tombstones applied.
    *
    * Changelog schema contract: pk, version (monotone per key), op
    * ('delete' = tombstone), groupKey, valueCol. The entity table is
    * bucketed by pk, the aggregate table by groupKey (`nBuckets` each).
    */
  def maintain(
      basePath: String,
      pk: String, version: String, op: String,
      groupKey: String, valueCol: String,
      nBuckets: Int = 16,
      reliable: Boolean = false)(batch: DataFrame, batchId: Long): Unit = {
    import BucketedTable._
    val spark = batch.sparkSession
    val entityPath = s"$basePath/entity"
    val aggPath = s"$basePath/agg"

    // 1. final change per key within the batch, tagged with its entity bucket
    val compacted = batch
      .groupBy(col(pk))
      .agg(max_by(struct(batch.columns.toIndexedSeq.map(col): _*), col(version)).as("__r"))
      .select(col("__r.*"))
      .withColumn(BucketCol, bucketOf(Seq(col(pk)), nBuckets))
    // materialized once: the bucket collect, the diff, and the entity
    // union all read it — without this the compaction shuffle runs 3×.
    // reliable=true survives executor loss mid-batch (graft.Lineage); the
    // spill is fully consumed within this call → released on exit.
    val compactedMat = graft.Lineage.truncate(compacted, reliable)
    try {
    val compactedM = compactedMat.df
    val touchedEntity = touchedBuckets(compactedM)

    // 2. diff against the current entity rows of the touched buckets only
    val current = readTouched(spark, entityPath, touchedEntity)
      .getOrElse(compactedM.limit(0))
    val old = current.select(
      col(pk), col(groupKey).as("__old_g"), col(valueCol).as("__old_v"),
      col(version).as("__old_ver"))
    val diff = compactedM.join(old, Seq(pk), "left")
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
      .withColumn(BucketCol, bucketOf(Seq(col(groupKey)), nBuckets))

    // 4a. merge deltas into the touched agg buckets (groups of those buckets
    // that got no delta ride along via the full join and are preserved)
    val touchedAgg = touchedBuckets(deltas)
    if (touchedAgg.nonEmpty) {
      val aggCurrent = readTouched(spark, aggPath, touchedAgg).getOrElse(
        deltas.select(col(groupKey), lit(0L).as("cnt"), lit(0.0).as("total"),
          col(BucketCol)).limit(0))
      val merged = aggCurrent
        .join(deltas, Seq(groupKey, BucketCol), "full")
        .select(col(groupKey),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L))).as("cnt"),
          (coalesce(col("total"), lit(0.0)) + coalesce(col("__dv"), lit(0.0))).as("total"),
          col(BucketCol))
        .filter(col("cnt") > 0)
      swapTouched(merged, aggPath, touchedAgg)
    }

    // 4b. upsert the touched entity buckets (latest-row-wins + tombstones)
    val unioned = current.unionByName(compactedM)
    val entity = unioned.groupBy(col(pk))
      .agg(max_by(struct(unioned.columns.toIndexedSeq.map(col): _*), col(version)).as("__r"))
      .select(col("__r.*"))
      .filter(col(op) =!= "delete")
    swapTouched(entity, entityPath, touchedEntity)
    } finally compactedMat.release()
  }
}
