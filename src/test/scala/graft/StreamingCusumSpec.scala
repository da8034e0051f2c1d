package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CusumReading, StreamingCusum}

/** Continuous CUSUM control chart ([[graft.streaming.StreamingCusum]]):
  * closed-week readings must equal the sequential SPC recurrence over the
  * same feed, across micro-batch boundaries, with gap weeks closed at
  * zero and the in-order contract enforced loudly. */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def rocksdb(): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  test("closed weeks equal the sequential recurrence across batches, gaps at zero") {
    rocksdb()
    // key a: weeks 0(×3), 1(×1), 3(×4) — week 2 is a silent gap
    val feed = Seq(
      Seq(("a", 0L), ("a", 0L), ("a", 0L), ("b", 0L),
        ("c", 0L), ("c", 0L), ("c", 0L), ("c", 0L), ("c", 0L)),
      Seq(("a", 1L), ("b", 1L), ("b", 1L), ("c", 1L)),
      Seq(("a", 3L), ("a", 3L), ("a", 3L), ("a", 3L), ("b", 2L)))
    val ref = 2L
    val threshold = 1L
    val out = collection.mutable.ArrayBuffer.empty[CusumReading]
    val input = MemoryStream[(String, Long)]
    val q = StreamingCusum.monitor(
      input.toDS().map { case (k, w) => StreamingCusum.Obs(k, w) },
      ref, threshold)
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[CusumReading], _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
      }.start()
    try {
      feed.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = out.synchronized(out.toList)
      .map(r => (r.key, r.week) -> ((r.x, r.cusum, r.flagged))).toMap
    // replay sequentially: weeks close when a later week arrives
    def replay(counts: Map[Long, Long], upto: Long): Map[Long, (Long, Long, Boolean)] = {
      var c = 0L
      (0L until upto).map { w =>
        val x = counts.getOrElse(w, 0L)
        c = math.max(0L, c + (x - ref))
        w -> ((x, c, c > threshold))
      }.toMap
    }
    val wantA = replay(Map(0L -> 3L, 1L -> 1L), 3L) // week 3 still open
    val wantB = replay(Map(0L -> 1L, 1L -> 2L), 2L) // week 2 still open
    val wantC = replay(Map(0L -> 5L), 1L) // week 1 still open
    assert(got.view.filterKeys(_._1 == "a").map { case ((_, w), v) => w -> v }.toMap === wantA)
    assert(got.view.filterKeys(_._1 == "b").map { case ((_, w), v) => w -> v }.toMap === wantB)
    assert(got.view.filterKeys(_._1 == "c").map { case ((_, w), v) => w -> v }.toMap === wantC)
    // gap week 2 for key a closed at zero and decayed the cusum
    assert(got(("a", 2L))._1 === 0L)
    // the sustained-excess key actually alarms: c's week 0 excess is
    // 5 − ref = 3 > threshold
    assert(got(("c", 0L))._3 === true)
    // and the ordinary keys never alarm
    assert(got.collect { case ((k, _), (_, _, f)) if k != "c" => f }
      .forall(_ == false))
  }

  test("an out-of-order week fails loudly instead of corrupting the chart") {
    rocksdb()
    val input = MemoryStream[(String, Long)]
    val q = StreamingCusum.monitor(
      input.toDS().map { case (k, w) => StreamingCusum.Obs(k, w) }, 1L, 1L)
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[CusumReading], _: Long) =>
          df.collect(); () // consume every partition
      }.start()
    try {
      input.addData(("k", 5L)); q.processAllAvailable()
      input.addData(("k", 3L)) // goes backwards
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("out-of-order")), chain(e).mkString("\n"))
    } finally q.stop()
  }
}
