package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * MVCC snapshot store — TiFlink's "stale snapshot isolation" contract
 * (README: "everytime you query the target table, you will see a consistent
 * snapshot of the materialized view in some past time"), realized with
 * versioned directories + a latest-pointer file instead of TiKV timestamps:
 *
 *   target/_v=<batchId>/...parquet      immutable snapshot per epoch
 *   target/_LATEST                      readable pointer, updated last
 *
 * Writers publish a fully-formed snapshot and flip the pointer as the final
 * step; readers resolve the pointer once and then read an immutable
 * directory — a long-running query never sees a half-written epoch, and
 * time-travel (`readSnapshot(path, v)`) falls out for free. Old epochs are
 * pruned behind a retention window, the same role TiKV GC plays.
 */
object SnapshotStore {

  private val Latest = "_LATEST"

  def publish(df: DataFrame, basePath: String, version: Long, keep: Int = 3): Unit = {
    val spark = df.sparkSession
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vdir = new Path(basePath, s"_v=$version")
    fs.delete(vdir, true) // replay of the same epoch overwrites idempotently
    df.write.mode(SaveMode.Overwrite).parquet(vdir.toString)
    val tmp = new Path(basePath, s"$Latest.tmp")
    val out = fs.create(tmp, true)
    out.writeBytes(version.toString)
    out.close()
    fs.delete(new Path(basePath, Latest), false)
    fs.rename(tmp, new Path(basePath, Latest)) // pointer flip = commit point
    versions(spark, basePath).sorted.dropRight(keep)
      .foreach(v => fs.delete(new Path(basePath, s"_v=$v"), true))
  }

  def latestVersion(spark: SparkSession, basePath: String): Option[Long] = {
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(basePath, Latest)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      Some(s.toLong)
    }
  }

  def versions(spark: SparkSession, basePath: String): Seq[Long] = {
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(basePath))) Nil
    else fs.listStatus(new Path(basePath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("_v="))
      .map(_.stripPrefix("_v=").toLong)
  }

  /** Read the latest committed snapshot (or a pinned past `version`). */
  def readSnapshot(spark: SparkSession, basePath: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, basePath))
      .getOrElse(throw new IllegalStateException(s"no committed snapshot at $basePath"))
    spark.read.parquet(new Path(basePath, s"_v=$v").toString)
  }

  /** foreachBatch sink: merge the micro-batch latest-by-key into the prior
    * snapshot and publish the result as a new epoch. */
  def upsertSink(
      basePath: String, keys: Seq[String], versionCol: String,
      deleteCol: Option[String] = None, keep: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      import org.apache.spark.sql.functions._
      val spark = batch.sparkSession
      val prior = latestVersion(spark, basePath)
        .map(v => readSnapshot(spark, basePath, Some(v)))
      val unioned = prior.map(_.unionByName(batch)).getOrElse(batch)
      val packed = unioned
        .groupBy(keys.map(col): _*)
        .agg(max_by(struct(unioned.columns.toIndexedSeq.map(col): _*), col(versionCol)).as("__r"))
        .select(col("__r.*"))
      val alive = deleteCol.fold(packed)(d => packed.filter(!col(d)))
      publish(alive, basePath, batchId, keep)
    }
}
