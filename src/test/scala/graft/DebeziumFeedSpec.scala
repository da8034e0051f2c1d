package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Changelog
import graft.sources.{Debezium, Tables}
import graft.streaming.MaterializedView

/** Changefeed ingestion: a Debezium-JSON directory replayed into a
  * MaterializedView converges to the q31/q32 snapshot+CDC state, across
  * checkpointed restarts mid-feed; envelope decode is verified for both
  * connector framings, deletes, malformed input, and Canal-JSON. */
class DebeziumFeedSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts_us", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  // one shared NTZ→µs conversion so feed encoding and expected state can
  // never disagree on timezone handling
  private def tsUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  private val cut = "2024-01-15 00:00:00"

  /** Debezium-JSON lines for a slice of `events`: error events are the
    * tombstone row-kind (q31's convention), `wrapped` exercises the
    * schemas.enable=true `payload` framing. source.ts_ms is real
    * epoch-millis; source.pos is a genuine log-position analog —
    * monotone in (µs-within-ms, event_id) — so the adapter's default
    * version orders exactly by (ts, event_id), q31's ordering (event ids
    * here stay < 1000, so id mod 1000 is collision-free). */
  private def feedJson(df: DataFrame, snapshotPhase: Boolean,
      wrapped: Boolean): Seq[String] = {
    val row = struct($"event_id", tsUs($"ts").as("ts_us"), $"user_id",
      $"event_type", $"value")
    val source = struct((tsUs($"ts") / 1000L).cast("long").as("ts_ms"),
      (pmod(tsUs($"ts"), lit(1000L)) * 1000L + pmod($"event_id", lit(1000L)))
        .as("pos"))
    val upCode = if (snapshotPhase) "r" else "u"
    val core = when($"event_type" === "error",
        to_json(struct(row.as("before"), source.as("source"),
          lit("d").as("op"))))
      .otherwise(
        to_json(struct(row.as("after"), source.as("source"),
          lit(upCode).as("op"))))
    val line =
      if (!wrapped) core
      // payload framing: rebuild under the wrapper key (to_json of a
      // struct column named payload)
      else when($"event_type" === "error",
          to_json(struct(struct(row.as("before"), source.as("source"),
            lit("d").as("op")).as("payload"))))
        .otherwise(
          to_json(struct(struct(row.as("after"), source.as("source"),
            lit(upCode).as("op")).as("payload"))))
    df.select(line.as("value")).as[String].collect().toSeq
  }

  private def writeFeedFile(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  test("fromJson decodes both framings identically; deletes carry before") {
    val ev = Tables.events(spark, sf).limit(50)
    val flat = Debezium.fromJson(
      feedJson(ev, snapshotPhase = false, wrapped = false).toDF("value"), rowSchema)
    val wrap = Debezium.fromJson(
      feedJson(ev, snapshotPhase = false, wrapped = true).toDF("value"), rowSchema)
    val a = flat.collect().map(_.toSeq).toSet
    assert(a === wrap.collect().map(_.toSeq).toSet)
    assert(a.nonEmpty)
    // ops map per decodeToRowData's table; the delete image is `before`
    val byOp = flat.select($"event_type", $"op").distinct()
      .as[(String, String)].collect().toSet
    assert(byOp.filter(_._1 == "error").forall(_._2 == Debezium.Delete))
    assert(byOp.filterNot(_._1 == "error").forall(_._2 == Debezium.Upsert))
    // default version: commit-ms scaled + pos tiebreak
    val v = flat.select($"ts_us", $"event_id", $"version")
      .as[(Long, Long, Long)].collect()
    v.foreach { case (us, id, ver) =>
      val pos = (us % 1000L) * 1000L + (id % 1000L)
      assert(ver === (us / 1000L) * 1000000L + pos, s"version of event $id")
    }
  }

  test("malformed events fail loudly by default, drop under permissive") {
    val bad = Seq(
      """{"after": {"event_id": 1}, "op": "x", "source": {"ts_ms": 5}}""", // unknown op
      """not json at all""",
      """{"op": "u", "source": {"ts_ms": 5}}""") // upsert with no after image
    val ok = """{"after": {"event_id": 1, "ts_us": 2, "user_id": 3,""" +
      """ "event_type": "view", "value": 1.5}, "op": "c", "source": {"ts_ms": 5, "pos": 1}}"""
    val e = intercept[Exception](
      Debezium.fromJson((bad :+ ok).toDF("value"), rowSchema).collect())
    assert(e.getMessage.contains("malformed Debezium event"), e.getMessage)
    val kept = Debezium.fromJson((bad :+ ok).toDF("value"), rowSchema,
      permissive = true).collect()
    assert(kept.length === 1 && kept.head.getAs[Long]("event_id") === 1L)
  }

  test("canal-JSON: multi-row envelopes, string casts, DELETE") {
    val lines = Seq(
      """{"data":[{"event_id":"1","ts_us":"10","user_id":"7","event_type":"view","value":"1.5"},""" +
        """{"event_id":"2","ts_us":"11","user_id":"8","event_type":"click","value":"2.5"}],""" +
        """"type":"INSERT","es":100,"ts":101}""",
      """{"data":[{"event_id":"1","ts_us":"12","user_id":"7","event_type":"view","value":"9.0"}],""" +
        """"type":"DELETE","es":200,"ts":201}""")
    val got = Debezium.fromCanalJson(lines.toDF("value"), rowSchema)
      .as[(Long, Long, Long, String, Double, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 10L, 7L, "view", 1.5, 100000000L, "upsert"),
      (2L, 11L, 8L, "click", 2.5, 100000000L, "upsert"),
      (1L, 12L, 7L, "view", 9.0, 200000000L, "delete")))
    val bad = intercept[Exception](
      Debezium.fromCanalJson(Seq("""{"type":"TRUNCATE","es":1}""").toDF("value"),
        rowSchema).collect())
    assert(bad.getMessage.contains("malformed Canal event"))
  }

  test("a Debezium directory replayed into an MV converges to snapshot+CDC " +
    "state across checkpointed mid-feed restarts") {
    val base = Files.createTempDirectory("dbz").toString
    val feed = s"$base/feed"
    val target = s"$base/mv"
    val ckpt = s"$base/ckpt"

    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val cutTs = lit(cut).cast("timestamp_ntz")
    val snap = ev.filter($"ts" <= cutTs)
    // the changefeed arrives in COMMIT ORDER (the adapter's ordering
    // contract) — split it at its median commit point, not by key hash
    val cdc = ev.filter($"ts" > cutTs)
    val commits = cdc.select($"ts", $"event_id")
      .as[(java.time.LocalDateTime, Long)].collect()
      .sortBy { case (t, id) =>
        (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + t.getNano, id)
      }
    val (midTs, midId) = commits(commits.length / 2)
    val firstHalf = $"ts" < lit(midTs).cast("timestamp_ntz") ||
      ($"ts" === lit(midTs).cast("timestamp_ntz") && $"event_id" <= midId)

    // the FlinkTikvConsumer sequence: snapshot scan first (op 'r'), then
    // the changefeed — here three files, with a restart between each
    writeFeedFile(feed, "00-snapshot.json",
      feedJson(snap, snapshotPhase = true, wrapped = false))

    def runMv(): Unit = {
      val q = MaterializedView.newBuilder()
        .setSource(Debezium.stream(spark, feed, rowSchema,
          maxFilesPerTrigger = Some(1)))
        .setQuery(df => df.select($"user_id", $"event_id", $"ts_us",
          $"event_type", $"value", $"version",
          ($"op" === Debezium.Delete).as("deleted")))
        .setPrimaryKeys("user_id")
        .setVersionColumn("version")
        .setDeleteColumn("deleted")
        .setTargetPath(target)
        .setNumBuckets(4)
        .setCheckpointLocation(ckpt)
        .build().start()
      try q.processAllAvailable() finally q.stop()
    }
    def state: Set[(Long, Long, String, Double)] =
      spark.read.parquet(target).filter(!$"deleted")
        .select($"user_id", $"ts_us", $"event_type", $"value")
        .as[(Long, Long, String, Double)].collect().toSet
    def expectedOf(slice: DataFrame): Set[(Long, Long, String, Double)] =
      Changelog.latestByKey(slice, Seq("user_id"), Seq($"ts".desc, $"event_id".desc))
        .filter($"event_type" =!= "error")
        .select($"user_id", tsUs($"ts"), $"event_type", $"value")
        .as[(Long, Long, String, Double)].collect().toSet

    runMv() // snapshot only
    assert(state === expectedOf(snap), "post-snapshot state")
    assert(state.nonEmpty)

    // first half of the changefeed lands (payload-wrapped framing), restart
    writeFeedFile(feed, "01-cdc.json",
      feedJson(cdc.filter(firstHalf), snapshotPhase = false, wrapped = true))
    runMv()
    assert(state === expectedOf(snap.unionByName(cdc.filter(firstHalf))),
      "mid-feed state")

    // rest of the feed, another restart from the same checkpoint
    writeFeedFile(feed, "02-cdc.json",
      feedJson(cdc.filter(!firstHalf), snapshotPhase = false, wrapped = true))
    runMv()
    // final convergence: exactly the batch q31 changelog-apply state
    val q31 = Changelog.q31CdcApply(spark, sf)
      .select($"user_id", tsUs($"last_ts"), $"last_event_type", $"last_value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(state === q31, "converged state must equal q31CdcApply")
  }
}
