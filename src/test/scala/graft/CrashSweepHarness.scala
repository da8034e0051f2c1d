package graft

import java.nio.file.{Files, StandardCopyOption}

/**
 * Shared crash-point-enumeration harness (see [[Round17CrashSweepSpec]]
 * for the method doc): arm [[InstrumentedFs]] to kill the "process" at
 * the Nth mutating op, sweep N until a run completes untripped, recover
 * along the protocol's documented path, assert invariants. Factored out
 * so every file-protocol family (snapshot/bucketed/oracle cycles, the
 * IVF index CRUD) sweeps with the same discipline.
 */
trait CrashSweepHarness { this: SparkSpec =>

  InstrumentedFs.configure(spark.sparkContext.hadoopConfiguration)

  protected val MutOps = Set("create", "delete", "rename", "mkdirs", "setTimes")
  protected def mutUnder(marker: String): (String, String) => Boolean =
    (op, p) => MutOps.contains(op) && p.contains(marker) &&
      !p.contains(".hb-") // the lease heartbeat is a background daemon —
                          // its beats would make op numbering racy, and its
                          // failures are best-effort by design

  protected def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    val s = src.toPath
    val walk = Files.walk(s)
    try walk.forEach { p =>
      val t = dst.toPath.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.COPY_ATTRIBUTES)
    } finally walk.close()
  }

  /** Sweep one protocol: for N = 1, 2, ... arm a crash at the Nth mutating
    * op under a fresh copy of `template`, run `attempt`, revive, run
    * `recover`, assert `invariant`. Stops at the first N the attempt
    * completes untripped (every crash point covered), with a hard cap as a
    * runaway guard. Returns the number of crash points swept. */
  protected def sweep(label: String, template: java.io.File,
      attempt: (String, java.io.File) => Unit,
      recover: (String, java.io.File) => Unit,
      invariant: (String, java.io.File) => Unit): Int = {
    var n = 1
    var done = false
    while (!done && n <= 400) {
      val local = Files.createTempDirectory(s"sweep-$label-").toFile
      copyTree(template, local)
      val root = s"ifs://$local"
      InstrumentedFs.armCrash(n)(mutUnder(local.getName))
      // Catch the injected crash (possibly Spark-wrapped) and other
      // NonFatal failures — the tripped/crashed cross-check below
      // attributes them. Fatal errors (OOM, linkage) RETHROW: an armed
      // injection does not excuse an unrelated VM-level failure, and
      // swallowing one would misattribute it to the sweep.
      val crashed =
        try { attempt(root, local); false }
        catch {
          case _: InstrumentedFs.InjectedCrash => true
          case scala.util.control.NonFatal(_) => true
        }
      val tripped = InstrumentedFs.isDead
      InstrumentedFs.revive()
      if (crashed && !tripped)
        fail(s"$label: attempt N=$n failed for a non-injected reason")
      recover(root, local)
      invariant(root, local)
      if (!tripped) done = true // clean run: the op sequence is exhausted
      n += 1
      if (n % 25 == 0) // localCheckpoint blocks from the bucketed path
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    assert(done, s"$label: crash sweep did not converge within 400 ops")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    n - 2 // crash points actually tripped
  }

  protected def names(dir: java.io.File): Seq[String] =
    Option(dir.listFiles()).map(_.map(_.getName).toSeq).getOrElse(Nil)

}
