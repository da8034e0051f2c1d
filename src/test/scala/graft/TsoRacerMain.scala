package graft

import org.apache.hadoop.conf.Configuration

import graft.streaming.TimestampOracle

/** Subprocess entry for the CROSS-PROCESS timestamp-oracle race: a bare
  * JVM (no Spark) that allocates `args(1)` timestamps against the store
  * at `args(0)` and prints each to stdout. Two of these racing from
  * SEPARATE processes is the scenario the in-JVM intern lock cannot
  * serialize — uniqueness there rests entirely on the kernel-atomic
  * O_CREAT|O_EXCL create in `TimestampOracle.atomicCreate`.
  */
object TsoRacerMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val conf = new Configuration()
    var i = 0
    while (i < n) {
      println(TimestampOracle.begin(conf, root).ts)
      i += 1
    }
  }
}
