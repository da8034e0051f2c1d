package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Debezium
import graft.streaming.{IncrementalMv, JdbcUpsertSink}

/** The COMPLETE reference loop, end to end: a database's Debezium
  * changefeed drives an incrementally-maintained aggregate MV whose own
  * retraction changelog is applied — exactly once — back INTO a database
  * by the JDBC upsert sink. This is TiFlink's whole architecture
  * (TiFlinkApp.java: CDC in → Flink MV → 2PC sink into TiKV) as three
  * graft seams composed: B43 feed → B33 IVM → B61 sink, with restarts of
  * BOTH streaming stages and mid-downtime arrivals between them. */
class ClosedLoopSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val url = "jdbc:derby:memory:graftloop;create=true"

  private val rowSchema = StructType(Seq(
    StructField("pk", LongType), StructField("grp", StringType),
    StructField("value", DoubleType)))

  private def line(op: String, pk: Long, grp: String, value: Double,
      tsMs: Long, pos: Long): String = {
    val img = s"""{"pk":$pk,"grp":"$grp","value":$value}"""
    val src = s"""{"ts_ms":$tsMs,"pos":$pos}"""
    if (op == "d") s"""{"before":$img,"source":$src,"op":"d"}"""
    else s"""{"after":$img,"source":$src,"op":"$op"}"""
  }

  /** Stage + atomic rename: phase 3 writes while the tail is LIVE, and a
    * file-source listing that catches a half-written file would mark it
    * processed and drop its events — the same publish discipline every
    * graft writer uses. */
  private def writeFeed(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def derbyState(): Set[(String, Long, Double)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT GRP, CNT, TOTAL FROM LIVE_AGG")
      val b = Set.newBuilder[(String, Long, Double)]
      while (rs.next())
        b += ((rs.getString("GRP"), rs.getLong("CNT"), rs.getDouble("TOTAL")))
      b.result()
    } finally c.close()
  }

  test("changefeed -> incremental MV -> JDBC sink converges across restarts") {
    val base = Files.createTempDirectory("loop").toString
    val feed = s"$base/feed"
    val cl = s"$base/changelog"

    // ---- stage 1: Debezium dir-tail feeding the aggregate IVM
    def startMv() = Debezium.stream(spark, feed, rowSchema)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/mv-ckpt")
      .foreachBatch((b: DataFrame, id: Long) =>
        IncrementalMv.maintain(s"$base/mv", "pk", "version", "op",
          "grp", "value", nBuckets = 4, changelogPath = Some(cl))(b, id))
      .start()

    // ---- stage 2: the MV's retraction changelog relayed into Derby.
    // One catch-up micro-batch may carry SEVERAL batch dirs for one
    // group; the sink's latest-per-key contract is the relay's job —
    // reduce by the batch id embedded in the committed dir name.
    val clSchema = StructType(Seq(
      StructField("grp", StringType), StructField("op", StringType),
      StructField("cnt", LongType), StructField("total", DoubleType)))
    val sink = JdbcUpsertSink(url, "live_agg", Seq("grp"),
      deleteCol = Some("deleted"))
    def startRelay() = spark.readStream.schema(clSchema)
      .option("basePath", cl).parquet(s"$cl/batch=*")
      .withColumn("ver",
        regexp_extract(input_file_name(), "batch=(\\d+)", 1).cast("long"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/relay-ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val latest = b
          .withColumn("__rn", row_number().over(
            W.partitionBy($"grp").orderBy($"ver".desc)))
          .filter($"__rn" === 1)
          .select($"grp", $"cnt", $"total", ($"op" === "D").as("deleted"))
        sink(latest, id)
      }
      .start()

    def mvAgg: Set[(String, Long, Double)] =
      spark.read.parquet(s"$base/mv/agg")
        .select($"grp", $"cnt", $"total")
        .as[(String, Long, Double)].collect().toSet

    // ---- phase 1: snapshot-style inserts
    writeFeed(feed, "00.json", Seq(
      line("r", 1L, "a", 10.0, 1000L, 1L),
      line("r", 2L, "a", 20.0, 1000L, 2L),
      line("r", 3L, "b", 5.0, 1000L, 3L)))
    val mv1 = startMv()
    mv1.processAllAvailable() // changelog dir must exist before the tail
    val relay1 = startRelay()
    try {
      relay1.processAllAvailable()
      assert(derbyState() === Set(("a", 2L, 30.0), ("b", 1L, 5.0)))
      assert(derbyState() === mvAgg, "Derby must mirror the MV exactly")
    } finally { mv1.stop(); relay1.stop() }

    // ---- phase 2 (mid-downtime arrivals): a group move, a delete, a
    // new group — all while BOTH stages are down; then restart and the
    // checkpoints resume exactly once
    writeFeed(feed, "01.json", Seq(
      line("u", 2L, "b", 25.0, 2000L, 1L), // fk move a -> b
      line("d", 3L, "b", 0.0, 2000L, 2L))) // delete
    writeFeed(feed, "02.json", Seq(
      line("c", 4L, "c", 7.0, 3000L, 1L)))
    val mv2 = startMv(); val relay2 = startRelay()
    try {
      mv2.processAllAvailable(); relay2.processAllAvailable()
      assert(derbyState() === Set(("a", 1L, 10.0), ("b", 1L, 25.0),
        ("c", 1L, 7.0)))
      assert(derbyState() === mvAgg)

      // ---- phase 3: empty a group entirely — the changelog D row must
      // DELETE the database row, not zero it
      writeFeed(feed, "03.json", Seq(line("d", 4L, "c", 0.0, 4000L, 1L)))
      mv2.processAllAvailable(); relay2.processAllAvailable()
      assert(derbyState() === Set(("a", 1L, 10.0), ("b", 1L, 25.0)))
      assert(derbyState() === mvAgg)

      // the loop's invariant, recomputed from the fed changes directly:
      // Derby equals the batch aggregate of the surviving entities
      val want = Set(("a", 1L, 10.0), ("b", 1L, 25.0))
      assert(derbyState() === want)
    } finally { mv2.stop(); relay2.stop() }
  }

  test("database at BOTH ends from a cold start, with a mid-bootstrap restart") {
    // the reference's COMPLETE two-phase start (FlinkTikvConsumer.java:
    // 133-159: snapshot read OF THE DATABASE at t0, then CDC from t0)
    // composed from graft seams: Tables.fromJdbcSplit (B66, the ranged
    // snapshot) → setBootstrap (B59) → Debezium changefeed (B43) →
    // JdbcUpsertSink (B61) — source database and target database, cold
    // start, crash INSIDE the bootstrap window (after the sink applied,
    // before the done-marker), restart, exactly once throughout
    val srcUrl = "jdbc:derby:memory:loopsrc;create=true"
    val dstUrl = "jdbc:derby:memory:loopdst;create=true"
    val base = Files.createTempDirectory("loop2").toString
    val feed = s"$base/feed"
    Files.createDirectories(Paths.get(feed))

    // the SOURCE database, pre-populated before any stream exists
    locally {
      val c = DriverManager.getConnection(srcUrl)
      try {
        val st = c.createStatement()
        st.execute("CREATE TABLE src_rows (pk BIGINT PRIMARY KEY, " +
          "grp VARCHAR(10), value DOUBLE)")
        st.execute("INSERT INTO src_rows VALUES " +
          "(1, 'a', 10.0), (2, 'a', 20.0), (3, 'b', 5.0)")
        st.close()
      } finally c.close()
    }

    // phase-1 snapshot: a RANGED read of the database (the
    // TableKeyRangeUtils analog), shaped as op='r' version-0 changelog
    // rows — everything the feed later carries must outrank it
    def snapshot = {
      val t = sources.Tables.fromJdbcSplit(spark, srcUrl, "src_rows", 3)
      // Spark clamps stride partitions on a tiny key range [1,3]; what
      // matters is the read is SPLIT, not the exact count
      assert(t.df.rdd.getNumPartitions >= 2, "snapshot must be ranged")
      t.df.select($"PK".as("pk"), $"GRP".as("grp"), $"VALUE".as("value"))
        .withColumn("version", lit(0L)) // below every feed version
        .withColumn("op", lit(sources.Debezium.Upsert))
    }

    val sink = JdbcUpsertSink(dstUrl, "live_rows", Seq("pk"),
      deleteCol = Some("deleted"))
    def builder(s: (DataFrame, Long) => Unit) =
      graft.streaming.MaterializedView.newBuilder()
        .setSource(Debezium.stream(spark, feed, rowSchema))
        .setBootstrap(snapshot)
        .setQuery(df =>
          graft.streaming.ChangelogOps.latestByKey(df, Seq("pk"), "version")
            // the decoder normalizes ops to upsert/delete (Debezium.scala)
            .withColumn("deleted", $"op" === sources.Debezium.Delete)
            .drop("op"))
        .setPrimaryKeys("pk")
        .setVersionColumn("version")
        .setSink(s)
        .setCheckpointLocation(s"$base/ckpt")

    def dstState(): Set[(Long, String, Double)] = {
      val c = DriverManager.getConnection(dstUrl)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT PK, GRP, VALUE FROM LIVE_ROWS")
        val b = Set.newBuilder[(Long, String, Double)]
        while (rs.next())
          b += ((rs.getLong("PK"), rs.getString("GRP"),
            rs.getDouble("VALUE")))
        b.result()
      } finally c.close()
    }

    // ---- cold start #1 CRASHES mid-bootstrap: the sink applied the
    // snapshot but the process dies before the done-marker lands
    val boom = intercept[RuntimeException] {
      builder((df, id) => { sink(df, id)
        throw new RuntimeException("crash before bootstrap marker")
      }).build().start()
    }
    assert(boom.getMessage.contains("crash before bootstrap marker"))
    // the snapshot DID land (the crash was after the apply)...
    assert(dstState() === Set((1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 5.0)))
    // ...and no marker exists, so a restart MUST re-run the bootstrap
    assert(!Files.exists(Paths.get(s"$base/ckpt/_graft_bootstrap_done")))

    // ---- cold start #2 resumes: the re-applied bootstrap is fenced by
    // the sink (batch id -1 already committed — exactly once), the
    // marker lands, and CDC takes over from the snapshot timestamp
    val q1 = builder(sink).build().start()
    try {
      q1.processAllAvailable()
      assert(dstState() === Set((1L, "a", 10.0), (2L, "a", 20.0),
        (3L, "b", 5.0)))
      writeFeed(feed, "00.json", Seq(
        line("u", 1L, "a", 11.0, 2000L, 1L), // update
        line("d", 2L, "a", 0.0, 2000L, 2L), // delete
        line("c", 4L, "c", 7.0, 2000L, 3L))) // insert
      q1.processAllAvailable()
      assert(dstState() === Set((1L, "a", 11.0), (3L, "b", 5.0),
        (4L, "c", 7.0)))
    } finally q1.stop()

    // ---- downtime arrivals + restart: the checkpoint resumes the feed
    // exactly once and the bootstrap stays a no-op (marker present)
    writeFeed(feed, "01.json", Seq(
      line("u", 3L, "b", 6.0, 3000L, 1L)))
    val q2 = builder(sink).build().start()
    try {
      q2.processAllAvailable()
      assert(dstState() === Set((1L, "a", 11.0), (3L, "b", 6.0),
        (4L, "c", 7.0)))
    } finally q2.stop()

    // dropIfExists cannot rebuild a custom sink's target (the fence
    // would survive the checkpoint wipe and freeze it) — refused loudly,
    // pointing at the sink-side reset
    val refuse = intercept[IllegalArgumentException] {
      builder(sink).setDropIfExists(true).build().start()
    }
    assert(refuse.getMessage.contains("clearFence"))
  }
}
