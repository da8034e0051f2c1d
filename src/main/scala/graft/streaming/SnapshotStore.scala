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
 *
 * Single-writer-at-a-time is ENFORCED, not assumed: the pointer flip runs
 * under an exclusive `_LATEST.lock` (atomic create-if-absent) and rejects
 * non-monotone epochs, so a second writer or a delayed stale publish fails
 * loudly instead of silently regressing the pointer. The lock is LEASED,
 * the local stand-in for TiFlink's expiring coordinator timestamps
 * (coordinator/Transaction.java, grpc/GrpcService.java): a lock whose
 * mtime is older than `lockLeaseMs` belongs to a crashed writer and may be
 * taken over — no operator intervention — while a fresh lock still fails
 * the second writer loudly. A LIVE writer keeps its lock fresh with a
 * heartbeat thread that bumps the mtime at a third of the lease, so even a
 * phase-1 epoch write far longer than the lease cannot make the holder look
 * dead; the residual caveat is the standard one — a writer whose WHOLE
 * PROCESS stalls longer than the lease (GC pause, suspended VM) can lose
 * the lock, which the `checkHeld` fence converts into a loud abort before
 * the commit point rather than an interleaved write.
 */
object SnapshotStore {

  private val Latest = "_LATEST"

  /** Default lock lease: generous vs the two-metadata-op flip it guards. */
  val DefaultLockLeaseMs: Long = 10 * 60 * 1000L

  /** Thrown when a concurrent or stale writer is detected at publish time. */
  final class ConcurrentPublishException(msg: String)
    extends IllegalStateException(msg)

  /** Exclusive writer lease over one store's `_LATEST.lock`. The lock file
    * carries this writer's random token; a daemon heartbeat bumps the lock
    * mtime at a third of the lease so a LIVE writer whose phase-1 epoch
    * write outlasts `leaseMs` never looks expired to a takeover scan.
    * `checkHeld()` re-reads the token — a lost or taken-over lock aborts the
    * publish BEFORE the commit point instead of interleaving with the thief.
    * `close()` deletes the lock only if the token is still ours (never
    * deletes a successor writer's fresh lock). */
  private final class WriterLease(
      fs: org.apache.hadoop.fs.FileSystem, lock: Path, token: String,
      leaseMs: Long) extends AutoCloseable {
    @volatile private var closed = false
    private val heartbeat = new Thread(() => {
      val period = math.max(leaseMs / 3, 1000L)
      var interrupted = false
      while (!closed && !interrupted) {
        try Thread.sleep(period)
        catch { case _: InterruptedException => interrupted = true }
        if (!closed && !interrupted) {
          try fs.setTimes(lock, System.currentTimeMillis(), -1)
          catch { case _: java.io.IOException => () } // next beat retries
        }
      }
    }, s"graft-lease-heartbeat-$lock")
    heartbeat.setDaemon(true)
    heartbeat.start()

    private def readToken(): Option[String] =
      try {
        val in = fs.open(lock)
        try Some(scala.io.Source.fromInputStream(in).mkString.trim)
        finally in.close()
      } catch { case _: java.io.IOException => None }

    /** Fence: fail before the commit point if the lock is gone or stolen. */
    def checkHeld(): Unit =
      if (!readToken().contains(token))
        throw new ConcurrentPublishException(
          s"writer lease on $lock lost (lock missing or taken over by " +
            "another writer); aborting before the pointer flip")

    def close(): Unit = {
      closed = true
      heartbeat.interrupt()
      try if (readToken().contains(token)) fs.delete(lock, false)
      catch { case _: java.io.IOException => () } // corpse reclaimed via lease expiry
    }
  }

  /** Take the store's exclusive writer lock (see [[acquireLock]] for the
    * takeover protocol) and start its heartbeat. */
  private def acquireLease(
      spark: SparkSession, basePath: String, leaseMs: Long): WriterLease = {
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new Path(basePath, s"$Latest.lock")
    val token = java.util.UUID.randomUUID().toString
    val out = acquireLock(fs, lock, leaseMs)
    out.writeBytes(token)
    out.close()
    new WriterLease(fs, lock, token, leaseMs)
  }

  /** Publish one epoch under an exclusive, heartbeat-renewed writer lease.
    * The lease covers the WHOLE publish — phase-1 epoch write included —
    * so two writers can never interleave inside the same `_v=` directory,
    * and the heartbeat keeps the lock fresh however long phase 1 runs
    * (without it, a multi-minute epoch write would out-age the lease and
    * invite takeover of a live writer). */
  def publish(df: DataFrame, basePath: String, version: Long, keep: Int = 3,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit = {
    val spark = df.sparkSession
    val lease = acquireLease(spark, basePath, lockLeaseMs)
    try {
      writeEpoch(df, basePath, version)
      lease.checkHeld() // fence before the commit point
      flipPointerLocked(spark, basePath, version, keep)
    } finally lease.close()
  }

  /** Cross-store publish with 2PC shape — the local stand-in for TiFlink's
    * coordinated transactions (coordinator/Transaction.java: prewrite all
    * keys, then commit at one timestamp). Phase 1 PREPARES every store by
    * writing its immutable epoch directory (no pointer moves — a failure
    * here publishes nothing anywhere). Phase 2 COMMITS by flipping each
    * pointer under its exclusive lock. A crash mid-phase-2 can leave a
    * prefix of stores flipped — the window a real coordinator closes with
    * its commit record; readers of each store still only ever see complete
    * epochs. */
  def publishAll(
      snapshots: Seq[(DataFrame, String)], version: Long, keep: Int = 3,
      lockLeaseMs: Long = DefaultLockLeaseMs): Unit = {
    // all leases first (conflicts throw rather than block → no deadlock),
    // so no store's epoch dir is touched unless every store is ours to write
    val leases = scala.collection.mutable.ArrayBuffer.empty[WriterLease]
    try {
      snapshots.foreach { case (df, base) =>
        leases += acquireLease(df.sparkSession, base, lockLeaseMs)
      }
      snapshots.foreach { case (df, base) => writeEpoch(df, base, version) }
      leases.foreach(_.checkHeld())
      snapshots.foreach { case (df, base) =>
        flipPointerLocked(df.sparkSession, base, version, keep)
      }
    } finally leases.foreach(l => try l.close() catch { case _: Exception => () })
  }

  /** Phase 1: materialize the epoch directory; readers cannot see it until
    * the pointer flips. Committed epochs are IMMUTABLE: a replay of an
    * already-committed version is a no-op (exactly-once replays carry the
    * same content, and rewriting would yank files out from under pinned
    * readers), and a version older than the pointer is rejected here,
    * before it can clobber a retained time-travel epoch. Only an
    * uncommitted leftover from a crashed prepare is ever overwritten. */
  private def writeEpoch(df: DataFrame, basePath: String, version: Long): Unit = {
    val spark = df.sparkSession
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vdir = new Path(basePath, s"_v=$version")
    latestVersion(spark, basePath).foreach { cur =>
      if (cur > version)
        throw new ConcurrentPublishException(
          s"stale publish of epoch $version: pointer already at $cur")
      if (cur == version) return // committed epoch is immutable; replay no-op
    }
    fs.delete(vdir, true) // an uncommitted crash leftover — unreadable, safe
    df.write.mode(SaveMode.Overwrite).parquet(vdir.toString)
  }

  /** Acquire `lock` by atomic create-if-absent. A held lock is a conflict
    * UNLESS its mtime is older than `leaseMs`: the holder crashed between
    * create and its finally-delete, so the corpse must be broken. Breaking
    * is ATOMIC via rename-to-unique-name — of N racing waiters exactly one
    * rename succeeds (the source exists only once), so no waiter can delete
    * a lock a sibling just legitimately re-created; the rename winner
    * removes the corpse and retries the create (a brand-new writer may
    * still beat it there — that is an ordinary conflict, not a race bug). */
  private def acquireLock(fs: org.apache.hadoop.fs.FileSystem, lock: Path,
      leaseMs: Long): org.apache.hadoop.fs.FSDataOutputStream = {
    var lastCreateFailure: String = "n/a"
    def tryCreate() =
      try Some(fs.create(lock, false)) // atomic create-if-absent = the mutex
      catch { case e: java.io.IOException => lastCreateFailure = e.toString; None }
    tryCreate().getOrElse {
      val age =
        try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
        catch { case _: java.io.FileNotFoundException => -1L } // just freed — retry below
      if (age >= 0 && age <= leaseMs)
        throw new ConcurrentPublishException(
          s"another writer holds $lock (age ${age}ms ≤ lease ${leaseMs}ms); " +
            "concurrent publishes to one snapshot store are not allowed")
      if (age > leaseMs) {
        val corpse = new Path(lock.getParent, s"${lock.getName}.corpse-${java.util.UUID.randomUUID()}")
        val won =
          try fs.rename(lock, corpse) // atomic: exactly one waiter wins
          catch { case _: java.io.IOException => false }
        if (!won)
          throw new ConcurrentPublishException(
            s"lost the takeover race for expired lock $lock to another writer")
        fs.delete(corpse, false)
      }
      tryCreate().getOrElse(
        throw new ConcurrentPublishException(
          s"could not acquire $lock after takeover — another writer grabbed it, " +
            s"or the filesystem refused the create (last failure: $lastCreateFailure)"))
    }
  }

  /** Phase 2: commit point — flip `_LATEST`. Caller MUST hold the store's
    * [[WriterLease]] (and have fenced with `checkHeld()`). */
  private def flipPointerLocked(
      spark: SparkSession, basePath: String, version: Long, keep: Int): Unit = {
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // monotone epochs: equal = crash-replay of this batch (idempotent,
    // allowed); lower = a delayed stale writer that lost the race and
    // must NOT regress the pointer
    latestVersion(spark, basePath).foreach { cur =>
      if (cur > version)
        throw new ConcurrentPublishException(
          s"stale publish of epoch $version: pointer already at $cur")
    }
    val tmp = new Path(basePath, s"$Latest.tmp")
    val out = fs.create(tmp, true)
    out.writeBytes(version.toString)
    out.close()
    fs.delete(new Path(basePath, Latest), false)
    if (!fs.rename(tmp, new Path(basePath, Latest))) // flip = commit point
      throw new ConcurrentPublishException(
        s"pointer flip to epoch $version failed; store left on prior epoch")
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
