package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Changelog
import graft.streaming.StreamingScd2

/** Continuously-maintained SCD2 history: after every micro-batch the table
  * must equal the batch q94 transformation over the rows fed so far, and
  * disorder must fail loudly instead of rewriting served history. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream history equals batch q94 over the full feed, per batch") {
    val events = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"value", $"ts")
      .as[(Long, Long, String, Double, java.time.LocalDateTime)]
      .collect()
      .sortBy(e => (e._5, e._2)) // global time order; per-key order follows
    val (b1, rest) = events.splitAt(events.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val input = MemoryStream[(Long, Long, String, Double, java.time.LocalDateTime)]
    val base = Files.createTempDirectory("scd2").toString
    val q = input.toDF()
      .toDF("user_id", "event_id", "event_type", "value", "ts")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingScd2.applyBatch(s"$base/hist", "user_id", "ts", "event_id",
          nBuckets = 4)(b, id))
      .start()

    def history: Set[(Long, Long, String, Double,
        java.time.LocalDateTime, Option[java.time.LocalDateTime], Boolean)] =
      spark.read.parquet(s"$base/hist")
        .select($"user_id", $"event_id", $"event_type", $"value",
          $"valid_from", $"valid_to", $"is_current")
        .as[(Long, Long, String, Double, java.time.LocalDateTime,
          Option[java.time.LocalDateTime], Boolean)].collect().toSet

    try {
      var fed = Array.empty[(Long, Long, String, Double, java.time.LocalDateTime)]
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
        fed = fed ++ b
        // batch ground truth: q94's lead-window transformation over fed rows
        val fedDf = fed.toSeq
          .toDF("user_id", "event_id", "event_type", "value", "ts")
        fedDf.createOrReplaceTempView("__scd2_fed")
        val want = spark.sql(
          """SELECT user_id, event_id, event_type, value,
            |  ts AS valid_from,
            |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            |    AS valid_to,
            |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            |    IS NULL AS is_current
            |FROM __scd2_fed""".stripMargin)
          .as[(Long, Long, String, Double, java.time.LocalDateTime,
            Option[java.time.LocalDateTime], Boolean)].collect().toSet
        assert(history === want)
      }
      assert(history.nonEmpty)
      // and it matches the named batch operator over the same full table
      val q94 = Changelog.q94Scd2Intervals(spark, sf)
        .as[(Long, Long, String, Double, java.time.LocalDateTime,
          Option[java.time.LocalDateTime], Boolean)].collect().toSet
      assert(history === q94)
    } finally q.stop()
  }

  test("a late (out-of-order) version fails loudly") {
    val base = Files.createTempDirectory("scd2late").toString
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    def df(rows: (Long, Long, String, Double, java.time.LocalDateTime)*) =
      rows.toDF("user_id", "event_id", "event_type", "value", "ts")
    def apply0(b: DataFrame, id: Long) =
      StreamingScd2.applyBatch(s"$base/hist", "user_id", "ts", "event_id",
        nBuckets = 4)(b, id)
    apply0(df((1L, 1L, "a", 1.0, t0), (1L, 2L, "b", 2.0, t0.plusHours(2))), 0L)
    val e = intercept[IllegalStateException] {
      apply0(df((1L, 3L, "c", 3.0, t0.plusHours(1))), 1L) // between 1 and 2
    }
    assert(e.getMessage.contains("out-of-order"))
    // replaying an applied batch is a no-op
    apply0(df((1L, 1L, "a", 1.0, t0)), 0L)
    assert(spark.read.parquet(s"$base/hist").count() === 2)
  }

  test("replay of a half-applied batch (stale marker) is a no-op, not stuck") {
    // Crash window: swapTouched succeeded, writeMarker did not — the
    // batch's rows are already history but the marker still reads the
    // previous batch. The replay must neither duplicate rows nor trip the
    // disorder check against the batch's own stored rows.
    val base = Files.createTempDirectory("scd2replay").toString
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    def df(rows: (Long, Long, String, Double, java.time.LocalDateTime)*) =
      rows.toDF("user_id", "event_id", "event_type", "value", "ts")
    def apply0(b: DataFrame, id: Long) =
      StreamingScd2.applyBatch(s"$base/hist", "user_id", "ts", "event_id",
        nBuckets = 4)(b, id)
    val batch = df((1L, 1L, "a", 1.0, t0), (1L, 2L, "b", 2.0, t0.plusHours(1)),
      (2L, 3L, "c", 3.0, t0))
    apply0(batch, 0L)
    val before = spark.read.parquet(s"$base/hist")
      .select($"user_id", $"event_id", $"valid_from", $"valid_to", $"is_current")
      .collect().toSet
    // simulate the crash: remove the marker (via the Hadoop FS, which owns
    // the checksum sidecar) so the replay really runs
    val markerPath = new org.apache.hadoop.fs.Path(s"$base/hist/_applied_batch")
    markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(markerPath, false)
    apply0(batch, 0L) // must not throw 'out-of-order', must not duplicate
    val after = spark.read.parquet(s"$base/hist")
      .select($"user_id", $"event_id", $"valid_from", $"valid_to", $"is_current")
      .collect().toSet
    assert(after === before)
    assert(after.size === 3)
    // and the marker is repaired so the next batch proceeds normally
    apply0(df((1L, 4L, "d", 4.0, t0.plusHours(2))), 1L)
    assert(spark.read.parquet(s"$base/hist").count() === 4)

    // a version-key collision with a DIFFERENT payload is NOT a replay:
    // it must fail the append-only check loudly, never drop silently
    markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(markerPath, false)
    val ex = intercept[IllegalStateException] {
      apply0(df((1L, 4L, "d", 99.0, t0.plusHours(2))), 1L)
    }
    assert(ex.getMessage.contains("out-of-order SCD2 version"))
  }
}
