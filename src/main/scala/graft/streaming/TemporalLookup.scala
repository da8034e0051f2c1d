package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming temporal dim join against the versioned [[SnapshotStore]] — the
 * streaming twin of the batch temporal join (B34,
 * [[graft.operators.Changelog.q102TemporalJoin]]) and the lookup-join shape
 * TiFlink gets from Flink's `FOR SYSTEM_TIME AS OF proc_time` against a
 * continuously-maintained dim table (the dim is itself an MV published
 * through the store's epoch/pointer machinery).
 *
 * The consistency contract is PER-BATCH SNAPSHOT PINNING: the dim version is
 * resolved ONCE per micro-batch, so every row of the batch joins the same
 * epoch — a dim publish landing mid-batch cannot split the batch across two
 * dim states (the torn-read hazard of naive lookup joins). Version upgrades
 * happen only at batch-ATTEMPT boundaries: a foreachBatch replay of the
 * same batchId after a mid-batch failure re-resolves `_LATEST`, which may
 * have advanced, so two attempts of one batchId can enrich against
 * different dim versions — standard processing-time lookup-join semantics
 * (Flink's lookup join has the same property). Each output row carries the
 * `dim_version` it was resolved against, which is also the audit trail for
 * exactly this case; pin-per-batchId (a version file keyed by batchId)
 * would be the upgrade if replay determinism were required.
 *
 * Scale: `readSnapshot` is a plain parquet read of the pinned epoch — at
 * 100 TB the dim is either broadcast (small) or bucketed (B23) for a
 * shuffle-free probe; the per-batch pin adds one `_LATEST` pointer read.
 */
object TemporalLookup {

  /** foreachBatch body: left-join `batch` to the pinned dim snapshot on
    * `joinKeys`, stamp `dim_version`, and hand the enriched frame to
    * `sink`. Fails loudly if the store has no committed epoch yet — the
    * dim must be snapshotted before the stream starts (TiFlink's own
    * snapshot-then-CDC sequencing). */
  def enrich(storePath: String, joinKeys: Seq[String])(
      sink: (DataFrame, Long) => Unit)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val version = SnapshotStore.latestVersion(spark, storePath).getOrElse(
      throw new IllegalStateException(
        s"temporal lookup against $storePath: no committed dim snapshot; " +
          "publish the initial dim epoch before starting the stream"))
    val dim = SnapshotStore.readSnapshot(spark, storePath, Some(version))
    sink(batch.join(dim, joinKeys, "left")
      .withColumn("dim_version", lit(version)), batchId)
  }
}
