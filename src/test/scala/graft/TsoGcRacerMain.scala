package graft

import org.apache.hadoop.conf.Configuration

import graft.streaming.TimestampOracle

/** Subprocess entry for the CROSS-PROCESS gc race: a bare JVM (no Spark)
  * that loops begin → commit → gc `args(1)` times against the store at
  * `args(0)`, printing each committed timestamp. Two of these racing
  * from SEPARATE processes exercise what the in-JVM intern lock cannot
  * serialize: concurrent floor advances (interleaved `_floor.v<n>`
  * creates and superseded-version deletes), gc compaction racing another
  * process's begin/commit, and directory listings racing deletes. The
  * versioned max-wins floor must keep allocations unique and strictly
  * increasing throughout, and no commit may be spuriously fenced (a
  * just-allocated ts is pending and inside its lease, so no gc may pass
  * it). Any exception exits nonzero — the spec asserts exit 0.
  */
object TsoGcRacerMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val conf = new Configuration()
    var i = 0
    while (i < n) {
      val ts = TimestampOracle.begin(conf, root)
      try TimestampOracle.commit(conf, root, ts)
      catch {
        case e: Throwable => // diagnostic dump for the spec's racer
          val d = new java.io.File(root, "_tso")
          System.err.println(s"FENCE on ts=${ts.ts}: " +
            d.listFiles().map(_.getName).sorted.mkString(","))
          throw e
      }
      TimestampOracle.gc(conf, root, TimestampOracle.DefaultLeaseMs)
      println(ts.ts)
      i += 1
    }
  }
}
