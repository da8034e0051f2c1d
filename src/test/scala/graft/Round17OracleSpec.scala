package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{TimestampOracle, VersionedPointer}

/** Round-17 oracle hardening, driven through [[InstrumentedFs]] so each
  * race lands at its exact interleaving point:
  *   - safePoint's gap verification is bounded by LISTING size (zero
  *     point lookups on a gapless backlog, a hard cap with a conservative
  *     fallback on a pathological one) yet still catches a readdir miss;
  *   - VersionedPointer.readMax re-scans once when the legacy pointer
  *     file vanishes mid-read (the migration race);
  *   - gc's object-store mtime-refresh cannot resurrect a c= marker that
  *     a racing commit retracted after losing the abort race.
  */
class Round17OracleSpec extends AnyFunSuite {

  private def freshRoot(): (Configuration, String, java.io.File) = {
    InstrumentedFs.reset()
    val conf = new Configuration()
    InstrumentedFs.configure(conf)
    val local = Files.createTempDirectory("r17tso").toFile
    (conf, s"ifs://$local", local)
  }

  private def touch(dir: java.io.File, name: String): java.io.File = {
    dir.mkdirs()
    val f = new java.io.File(dir, name)
    assert(f.createNewFile(), s"could not create $f")
    f
  }

  test("safePoint verifies only listing GAPS: zero lookups on a gapless backlog") {
    val (conf, root, local) = freshRoot()
    val tso = new java.io.File(local, "_tso")
    // a never-gc'd store (floor pinned at 0) with a deep resolved backlog
    // and one live pending allocation — the shape where the old
    // every-integer loop was O(top) per safePoint call
    (1 to 1500).foreach { n => touch(tso, s"t=$n"); touch(tso, s"c=$n") }
    touch(tso, "t=1501") // in-lease pending
    InstrumentedFs.reset() // count only the safePoint call itself
    val sp = TimestampOracle.safePoint(conf, root,
      TimestampOracle.DefaultLeaseMs)
    assert(sp === 1500L)
    // no gaps → no per-ts verification; the only exists() calls are the
    // floor pointer's fixed handful (per-scan dir probes, the legacy
    // file, the absent-pointer rescue scan). The bound must not scale
    // with the 3000-entry backlog.
    assert(InstrumentedFs.opCount("exists") <= 6,
      s"safePoint issued ${InstrumentedFs.opCount("exists")} exists() " +
        "calls on a gapless 1500-ts backlog — gap derivation regressed")
  }

  test("safePoint still catches a pending allocation a racing readdir missed") {
    val (conf, root, local) = freshRoot()
    val tso = new java.io.File(local, "_tso")
    (1 to 5).foreach(n => touch(tso, s"t=$n"))
    Seq(1, 2, 4, 5).foreach(n => touch(tso, s"c=$n"))
    // t=3 is pending and STABLE on disk, but every listing misses it —
    // the cross-process readdir race. Its value is a gap in the sorted
    // listing, so the point verification must find it and stop below.
    InstrumentedFs.hideFromListings(Set("t=3"), listings = Long.MaxValue)
    val sp = TimestampOracle.safePoint(conf, root,
      TimestampOracle.DefaultLeaseMs)
    assert(sp === 2L,
      s"safePoint $sp overtook the in-lease allocation t=3 the listing missed")
  }

  test("safePoint caps gap lookups and falls back conservatively, never wrongly") {
    val (conf, root, local) = freshRoot()
    val tso = new java.io.File(local, "_tso")
    // pathological mass-miss shape: the listing evidences ts 1 and 600
    // but nothing between — 598 gap integers, far past the lookup cap
    Seq(1, 600).foreach { n => touch(tso, s"t=$n"); touch(tso, s"c=$n") }
    InstrumentedFs.reset()
    val sp = TimestampOracle.safePoint(conf, root,
      TimestampOracle.DefaultLeaseMs)
    // gaps 2..257 verify clean (no t= on disk); the cap trips at the
    // 257th gap integer (258) and the safe point stops just below it —
    // conservative (≤ the true 600), never past a missed pending ts
    assert(sp === 1L + TimestampOracle.MaxGapLookups)
    assert(InstrumentedFs.opCount("exists") <=
      TimestampOracle.MaxGapLookups.toLong + 8,
      s"cap did not bound exists() calls: ${InstrumentedFs.opCount("exists")}")
  }

  test("readMax re-scans when the legacy pointer vanishes mid-read (migration race)") {
    val (conf, root, local) = freshRoot()
    val dir = new java.io.File(local, "ptr"); dir.mkdirs()
    // versioned pointer exists on disk, but BOTH initial scans predate
    // its create (hidden from the first two listings); the legacy file
    // passes the exists check, then its open fails — the migrating
    // writer's delete landed in between
    touch(dir, "_p.v7")
    java.nio.file.Files.write(new java.io.File(dir, "_p").toPath,
      "5".getBytes("UTF-8"))
    InstrumentedFs.hideFromListings(Set("_p.v7"), listings = 2)
    InstrumentedFs.beforeOp("open", "/_p") {
      throw new java.io.FileNotFoundException("migration delete ran")
    }
    val fs = new Path(root).getFileSystem(conf)
    val got = VersionedPointer.readMax(fs, new Path(root, "ptr"), "_p.v",
      "_p", monotoneCacheKey = None)
    // without the FNF-triggered re-scan this reads None (pointer absent,
    // floor 0) — the one-syscalls-wide upgrade window the advice named
    assert(got === Some(7L))
  }

  test("gc's object-store mtime refresh never rewrites a c= beside an a= (abort won)") {
    val (conf, root, local) = freshRoot()
    val t = TimestampOracle.begin(conf, root)
    TimestampOracle.commit(conf, root, t)
    // the expiry scan's abort marker landed and won the race; the
    // committer is about to retract its c= (but has not yet)
    val tso = new java.io.File(local, "_tso")
    touch(tso, s"a=${t.ts}")
    val cFile = new java.io.File(tso, s"c=${t.ts}")
    val mtimeBefore = cFile.lastModified()
    Thread.sleep(20)
    InstrumentedFs.noopSetTimes(true) // object-store connector behavior
    TimestampOracle.gc(conf, root, TimestampOracle.DefaultLeaseMs)
    // the refresh fallback must SKIP the rewrite: a fresh c= here would
    // outlive the committer's retraction and flip the delivered abort
    assert(cFile.lastModified() === mtimeBefore,
      "gc rewrote a c= marker that an abort verdict already shadowed")
    // the racing committer's retraction now lands; the abort verdict is
    // the one the store keeps
    assert(cFile.delete())
    intercept[TimestampOracle.TimestampFencedException] {
      TimestampOracle.commit(conf, root, t)
    }
  }

  test("an abort landing mid-refresh leaves dual markers that READ as abort") {
    // the residual syscalls-wide window: a= turns durable between gc's
    // pre-checks and its rewrite. gc must NOT post-delete the c= (the a=
    // could equally be a transient expiry-scan marker about to be
    // retracted on seeing c= — deleting would flip a DELIVERED commit);
    // instead both markers stand and every reader resolves them by the
    // standing abort-wins rule, so no delivered verdict flips either way
    val (conf, root, local) = freshRoot()
    val t = TimestampOracle.begin(conf, root)
    TimestampOracle.commit(conf, root, t)
    val tso = new java.io.File(local, "_tso")
    Thread.sleep(20)
    InstrumentedFs.noopSetTimes(true)
    InstrumentedFs.beforeOp("create", s"c=${t.ts}") {
      touch(tso, s"a=${t.ts}")
    }
    TimestampOracle.gc(conf, root, TimestampOracle.DefaultLeaseMs)
    assert(InstrumentedFs.pendingHooks === 0, "the abort injection never fired")
    assert(new java.io.File(tso, s"a=${t.ts}").exists())
    // dual markers resolve as ABORT for every caller — never as success
    intercept[TimestampOracle.TimestampFencedException] {
      TimestampOracle.commit(conf, root, t)
    }
    assert(TimestampOracle.safePoint(conf, root,
      TimestampOracle.DefaultLeaseMs) === t.ts)
  }

  test("gc never recreates a marker that was deleted after its listing") {
    // the resurrection class at its root: whoever deleted the marker
    // between gc's listing and its rewrite (a committer retracting after
    // an abort race, a sibling gc compacting), recreating it would undo
    // a deliberate retraction — the point-lookup pre-check must see the
    // marker gone and write nothing
    val (conf, root, local) = freshRoot()
    val t = TimestampOracle.begin(conf, root)
    TimestampOracle.commit(conf, root, t)
    val tso = new java.io.File(local, "_tso")
    Thread.sleep(20)
    InstrumentedFs.noopSetTimes(true)
    // the retraction lands just before gc's exists(p) re-verify
    InstrumentedFs.beforeOp("exists", s"c=${t.ts}") {
      val c = new java.io.File(tso, s"c=${t.ts}")
      if (c.exists()) assert(c.delete())
    }
    TimestampOracle.gc(conf, root, TimestampOracle.DefaultLeaseMs)
    assert(InstrumentedFs.pendingHooks === 0, "the retraction never fired")
    assert(!new java.io.File(tso, s"c=${t.ts}").exists(),
      "gc resurrected a c= marker that was retracted after its listing")
  }

  test("pointer cleanup failures are counted and reset on a clean sweep") {
    val (conf, root, local) = freshRoot()
    val fs = new Path(root).getFileSystem(conf)
    val dir = new Path(root, "cptr")
    VersionedPointer.advance(fs, dir, "_p.v", "_p", 1L)
    assert(VersionedPointer.cleanupFailures(dir) === 0L)
    // three advances whose superseded-version delete persistently fails
    (2L to 4L).foreach { v =>
      InstrumentedFs.beforeOp("delete", s"_p.v${v - 1}") {
        throw new java.io.IOException("simulated cleanup failure")
      }
      VersionedPointer.advance(fs, dir, "_p.v", "_p", v)
    }
    assert(VersionedPointer.cleanupFailures(dir) === 3L,
      "persistent cleanup failures were not surfaced")
    // reads stay correct throughout (max wins over the debris)...
    assert(VersionedPointer.readMax(fs, dir, "_p.v", "_p", None) === Some(4L))
    // ...and the first clean sweep resets the streak
    VersionedPointer.advance(fs, dir, "_p.v", "_p", 5L)
    assert(VersionedPointer.cleanupFailures(dir) === 0L)
    assert(VersionedPointer.readMax(fs, dir, "_p.v", "_p", None) === Some(5L))
  }
}
