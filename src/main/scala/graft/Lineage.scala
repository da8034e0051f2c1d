package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

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
 * - `reliable = true`: spill to parquet under the SparkContext checkpoint
 *   directory (HDFS/object-store grade). An executor loss re-reads the
 *   spill files and the job continues — the posture a 1000-executor run of
 *   an hours-long iterative job needs, bought with one extra write+read of
 *   the materialized data.
 *
 * The durable path deliberately spills via parquet rather than
 * `df.checkpoint()`: reliable RDD checkpoints are only garbage-collected
 * by the weak-reference cleaner (and only when
 * `spark.cleaner.referenceTracking.cleanCheckpoints` is on), so an
 * iterative caller would permanently accumulate one table copy per round.
 * A [[Materialized]] instead carries an explicit `release()` — the caller
 * deletes each round's spill deterministically the moment nothing reads it.
 *
 * Callers expose `reliable` and pass it through; the caller (or cluster
 * conf) must have set `sparkContext.setCheckpointDir` first when enabling
 * it — fail fast here otherwise, rather than deep inside Spark.
 */
object Lineage {

  /** A lineage-truncated frame plus its cleanup. `release()` is idempotent
    * and a no-op for the localCheckpoint path; for the durable path it
    * deletes the spill directory — call it only once every read of `df`
    * has completed. */
  final class Materialized(val df: DataFrame, cleanup: () => Unit) {
    private var released = false
    def release(): Unit = if (!released) { released = true; cleanup() }
  }

  def truncate(df: DataFrame, reliable: Boolean): Materialized =
    if (!reliable) new Materialized(df.localCheckpoint(), () => ())
    else {
      val sc = df.sparkSession.sparkContext
      require(sc.getCheckpointDir.isDefined,
        "reliable=true needs spark.sparkContext.setCheckpointDir(...) — a " +
          "durable (HDFS/object-store) location that survives executor loss")
      val dir = new org.apache.hadoop.fs.Path(
        sc.getCheckpointDir.get, s"graft-spill-${java.util.UUID.randomUUID()}")
      df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
      val out = df.sparkSession.read.parquet(dir.toString)
      new Materialized(out, () => {
        val fs = dir.getFileSystem(sc.hadoopConfiguration)
        fs.delete(dir, true); ()
      })
    }
}
