package graft

import graft.streaming.TcpTso

/** Subprocess entry for the CROSS-PROCESS race against a network-served
  * timestamp oracle: a bare JVM (no Spark, NO access to the oracle's
  * filesystem root) that allocates `args(2)` timestamps from the
  * [[graft.streaming.TsoServer]] at `args(0)`:`args(1)` and prints each
  * to stdout — the "two drivers without a shared filesystem" scenario
  * the file-CAS provider cannot serve. */
object TsoTcpRacerMain {
  def main(args: Array[String]): Unit = {
    val tso = TcpTso(args(0), args(1).toInt)
    val n = args(2).toInt
    var i = 0
    while (i < n) {
      println(tso.begin().ts)
      i += 1
    }
  }
}
