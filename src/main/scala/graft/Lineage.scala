package graft

import org.apache.spark.sql.DataFrame

/**
 * Lineage truncation with a durability knob for iterative and multi-read
 * plans (the duplicate-cluster label loop, the bucketed upsert paths — each
 * materializes an intermediate it then reads several times).
 *
 * - `reliable = false` (default): `localCheckpoint` — blocks live on the
 *   executors with no lineage behind them. Fastest, and the right call in
 *   local mode and inside streaming micro-batches (a failed batch simply
 *   retries). But on a real cluster, losing one executor mid-job kills the
 *   whole job, because the lost blocks cannot be recomputed.
 * - `reliable = true`: `checkpoint` to the SparkContext checkpoint
 *   directory (HDFS/object-store grade). An executor loss re-reads the
 *   checkpoint files and the job continues — the posture a 1000-executor
 *   run of an hours-long iterative job needs, bought with one extra
 *   write+read of the materialized data.
 *
 * Callers expose `reliable` and pass it through; the caller (or cluster
 * conf) must have set `sparkContext.setCheckpointDir` first when enabling
 * it — fail fast here otherwise, rather than deep inside Spark.
 */
object Lineage {

  def truncate(df: DataFrame, reliable: Boolean): DataFrame =
    if (!reliable) df.localCheckpoint()
    else {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable=true needs spark.sparkContext.setCheckpointDir(...) — a " +
          "durable (HDFS/object-store) location that survives executor loss")
      df.checkpoint()
    }
}
