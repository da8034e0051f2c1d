package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe monotone pointer shared by the snapshot store's `_LATEST`
  * and the timestamp oracle's gc floor: the value rides in the file NAME
  * (`<prefix><n>`) so the write is ONE atomic create (a reader can never
  * see partial content), a new version lands BEFORE superseded ones are
  * removed (a crash leaves extra files, never a MISSING pointer — the
  * delete-then-rename it replaced could lose the pointer entirely), and
  * readers take the max (concurrent writers can only advance it).
  *
  * Reader hardening, because directory listings are NOT atomic under
  * concurrent mutation (a sibling process deleting compacted files
  * mid-readdir can make a STABLE entry vanish from one scan — observed
  * on ext4 by the cross-process gc racer):
  *  - the listing runs TWICE and the scans' union is taken (independent
  *    readdir passes don't repeat a transient positional miss);
  *  - an optional per-process MONOTONE CACHE floors the result at the
  *    highest value this process ever read. Callers opt in only when a
  *    wiped-and-recreated directory restarting ABOVE the old value is
  *    acceptable — true for the oracle floor (timestamps are unique per
  *    store lifetime; restarting higher is harmless), NOT for snapshot
  *    stores that must support dropIfExists rebuilds from epoch zero;
  *  - the legacy content-bearing file read is Try-guarded end to end: a
  *    concurrent first-advance-after-upgrade deletes that file between
  *    the exists check and the open.
  */
private[graft] object VersionedPointer {
  private val monotone =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Consecutive best-effort-cleanup failures per pointer directory.
    * Correctness never depends on cleanup (readers take the max), but a
    * PERSISTENTLY failing delete accumulates superseded pointer files
    * and slows every listing — so repeated failures must be observable
    * before that happens, not silent. Reset on the first clean sweep. */
  private val cleanupFailStreak =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Current consecutive-failure streak for `dir` (0 = healthy). */
  private[graft] def cleanupFailures(dir: Path): Long =
    Option(cleanupFailStreak.get(dir.toString)).map(_.longValue).getOrElse(0L)

  private def noteCleanup(dir: Path, failed: Boolean): Unit =
    if (!failed) cleanupFailStreak.remove(dir.toString)
    else {
      val n = cleanupFailStreak.merge(dir.toString, 1L, (a, b) =>
        java.lang.Long.valueOf(a.longValue + b.longValue)).longValue
      // warn once the streak is clearly persistent, then decimated so a
      // wedged store can't flood the log
      if (n == 3 || n % 100 == 0) log.warn(
        s"pointer cleanup at $dir has failed $n consecutive times; " +
          "superseded pointer files are accumulating (reads stay correct " +
          "— max wins — but listings grow until deletes succeed)")
    }

  private def scan(fs: FileSystem, dir: Path, prefix: String): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)

  /** Max pointer value across both formats (None if neither exists). */
  def readMax(fs: FileSystem, dir: Path, prefix: String,
      legacyName: String, monotoneCacheKey: Option[String]): Option[Long] = {
    val listed = scan(fs, dir, prefix) ++ scan(fs, dir, prefix)
    var rescued: Seq[Long] = Nil
    val legacy: Option[Long] =
      try {
        val p = new Path(dir, legacyName)
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
          finally in.close()
        }
      } catch {
        // ONLY the documented migration race: the first advance after an
        // upgrade deletes the legacy file between our exists and open.
        // Anything else (transient I/O, corrupt content) must propagate —
        // swallowing it would read a legacy-only store as pointerless,
        // letting a delayed stale writer advance a LOWER version and
        // regress the pointer past the caller's None stale-check.
        case _: java.io.FileNotFoundException =>
          // The FNF is itself a SIGNAL: the migrating writer's delete
          // runs strictly AFTER its versioned create, so by the time the
          // legacy open failed, the versioned file durably exists — but
          // both scans above may PREDATE it. Without a re-scan, a reader
          // whose scans ran before the create and whose open ran after
          // the delete reads the pointer as ABSENT (floor 0) for one
          // syscalls-wide window per store at upgrade time.
          rescued = scan(fs, dir, prefix)
          None
      }
    val cached = monotoneCacheKey
      .flatMap(k => Option(monotone.get(k)).map(_.longValue))
    val all0 = listed ++ rescued ++ legacy ++ cached
    // The OTHER ordering of the same migration race: the writer's
    // create+delete both complete before our exists() check, so the
    // legacy read returns None with no FNF signal — before concluding
    // the pointer is ABSENT (the one answer callers treat as load-
    // bearing: "store empty", defeating stale-write checks), scan once
    // more. Costs one extra listing only on stores with no pointer.
    val all =
      if (all0.nonEmpty) all0 else scan(fs, dir, prefix)
    val out = if (all.isEmpty) None else Some(all.max)
    for (k <- monotoneCacheKey; v <- out)
      monotone.merge(k, v, (a, b) => if (a.longValue >= b.longValue) a else b)
    out
  }

  /** Advance the pointer to `value`: one atomic create of the new
    * version, then best-effort cleanup of superseded versions and the
    * legacy file (failures leave harmless extra files — readers max). */
  def advance(fs: FileSystem, dir: Path, prefix: String,
      legacyName: String, value: Long): Unit = {
    fs.create(new Path(dir, s"$prefix$value"), true).close()
    var anyFailed = false
    val swept = scala.util.Try {
      fs.listStatus(dir).toSeq.map(_.getPath.getName).foreach { n =>
        val superseded = n == legacyName ||
          (n.startsWith(prefix) && scala.util.Try(
            n.stripPrefix(prefix).toLong).toOption.exists(_ < value))
        if (superseded)
          try fs.delete(new Path(dir, n), false)
          catch { case scala.util.control.NonFatal(_) => anyFailed = true }
      }
    }
    noteCleanup(dir, failed = anyFailed || swept.isFailure)
  }
}
