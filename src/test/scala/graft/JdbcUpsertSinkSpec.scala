package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.JdbcUpsertSink

/** Exactly-once JDBC upserts into embedded Derby: changelog apply
  * (insert/update/delete) through a real streaming query, replay
  * idempotence via the fence, crash-window staging leftovers cleaned, and
  * the latest-wins contract enforced loudly. */
class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def readAll(table: String): Set[(Long, String, Double)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT K, NAME, VAL FROM $table ORDER BY K")
      val b = Set.newBuilder[(Long, String, Double)]
      while (rs.next())
        b += ((rs.getLong("K"), rs.getString("NAME"), rs.getDouble("VAL")))
      b.result()
    } finally c.close()
  }

  private def stageCount(table: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT count(*) AS N FROM ${table}_GSTG")
      rs.next(); rs.getLong("N")
    } finally c.close()
  }

  test("streamed changelog applies exactly once across a restart") {
    val sink = JdbcUpsertSink(url, "live_view", Seq("k"),
      deleteCol = Some("del"))
    val input = MemoryStream[(Long, String, Double, Boolean)]
    val base = java.nio.file.Files.createTempDirectory("jdbcsink").toString
    def start() = input.toDS()
      .toDF("k", "name", "val", "del")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(sink)
      .start()

    val q1 = start()
    try {
      input.addData((1L, "a", 1.0, false), (2L, "b", 2.0, false),
        (3L, "c", 3.0, false))
      q1.processAllAvailable()
      assert(readAll("LIVE_VIEW") ===
        Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))

      // update k2, delete k3, insert k4 — one changelog batch
      input.addData((2L, "b2", 20.0, false), (3L, "c", 0.0, true),
        (4L, "d", 4.0, false))
      q1.processAllAvailable()
      assert(readAll("LIVE_VIEW") ===
        Set((1L, "a", 1.0), (2L, "b2", 20.0), (4L, "d", 4.0)))
      assert(stageCount("LIVE_VIEW") === 0L, "staging must drain")
    } finally q1.stop()

    // restart from the same checkpoint: committed batches must not
    // re-apply; a new batch must
    val q2 = start()
    try {
      input.addData((4L, "d2", 40.0, false))
      q2.processAllAvailable()
      assert(readAll("LIVE_VIEW") ===
        Set((1L, "a", 1.0), (2L, "b2", 20.0), (4L, "d2", 40.0)))
    } finally q2.stop()
  }

  test("replay and crash-window staging leftovers are exactly-once") {
    val sink = JdbcUpsertSink(url, "replay_view", Seq("k"))
    def df(rows: (Long, String, Double)*) = rows.toDF("k", "name", "val")

    sink(df((1L, "a", 1.0), (2L, "b", 2.0)), 10L)
    assert(readAll("REPLAY_VIEW") === Set((1L, "a", 1.0), (2L, "b", 2.0)))

    // full replay of a committed batch: fence skips it even with
    // different content (the batch id IS the identity)
    sink(df((1L, "MUTATED", 9.9)), 10L)
    assert(readAll("REPLAY_VIEW") === Set((1L, "a", 1.0), (2L, "b", 2.0)))

    // crash window: a half-staged batch (rows staged, nothing fenced) —
    // plant leftovers for batch 11, then run it for real
    val c = DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      "INSERT INTO REPLAY_VIEW_GSTG (K, NAME, VAL, GRAFT_BATCH_ID) " +
        "VALUES (7, 'ghost', 7.0, 11)")
    finally c.close()
    sink(df((3L, "c", 3.0)), 11L)
    assert(readAll("REPLAY_VIEW") ===
      Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)),
      "the ghost staging row must be cleared, not merged")
    assert(stageCount("REPLAY_VIEW") === 0L)
  }

  test("clearFence resets exactly-once state for a checkpoint wipe") {
    // checkpoint and fence share a lifetime: wiping the checkpoint
    // restarts batch ids, and WITHOUT the reset the surviving fence
    // would silently skip every replayed batch — the frozen-target trap
    val sink = JdbcUpsertSink(url, "fence_view", Seq("k"))
    def df(rows: (Long, String, Double)*) = rows.toDF("k", "name", "val")
    sink(df((1L, "a", 1.0)), 0L)
    assert(readAll("FENCE_VIEW") === Set((1L, "a", 1.0)))
    // simulate the wiped-checkpoint restart WITHOUT the reset: batch 0
    // replays with new content and is (correctly, for a replay) skipped
    sink(df((1L, "post-wipe", 9.0)), 0L)
    assert(readAll("FENCE_VIEW") === Set((1L, "a", 1.0)))
    // the operator's documented move: clear the fence, then reprocess
    JdbcUpsertSink.clearFence(url, "fence_view")
    sink(df((1L, "post-wipe", 9.0)), 0L)
    assert(readAll("FENCE_VIEW") === Set((1L, "post-wipe", 9.0)),
      "after clearFence the replayed feed must apply")
  }

  test("multiple rows per key in one batch fail loudly") {
    val sink = JdbcUpsertSink(url, "dup_view", Seq("k"))
    val ex = intercept[IllegalStateException] {
      sink(Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k", "name", "val"), 0L)
    }
    assert(ex.getMessage.contains("latest-per-key"))
    // the failed batch left nothing behind: not fenced, target absent rows
    assert(readAll("DUP_VIEW") === Set.empty)
    // and a corrected retry of the SAME batch id applies
    sink(Seq((1L, "b", 2.0)).toDF("k", "name", "val"), 0L)
    assert(readAll("DUP_VIEW") === Set((1L, "b", 2.0)))
  }

  test("user/password options ride every connection as Properties") {
    // Derby scopes unqualified tables to the connecting USER's schema, so
    // if the options actually reach the connection (driver-side metadata,
    // driver-side transaction, AND executor-side staging writes), the
    // sink's tables land in schema CREDU — invisible to a bare
    // connection, visible to a credentialed one. That distinguishes
    // Properties-borne creds from a silently-ignored options map.
    val curl = "jdbc:derby:memory:graftsinkcred;create=true"
    val opts = Map("user" -> "CREDU", "password" -> "pw")
    val sink = JdbcUpsertSink(curl, "cred_view", Seq("k"), options = opts)
    sink(Seq((1L, "a", 1.0)).toDF("k", "name", "val"), 0L)

    val bare = DriverManager.getConnection(curl)
    try {
      val ex = intercept[java.sql.SQLException] {
        bare.createStatement().executeQuery("SELECT K FROM CRED_VIEW")
      }
      assert(ex.getSQLState === "42X05") // table does not exist (in APP)
    } finally bare.close()

    val props = new java.util.Properties()
    opts.foreach { case (k, v) => props.setProperty(k, v) }
    val cred = DriverManager.getConnection(curl, props)
    try {
      val rs = cred.createStatement()
        .executeQuery("SELECT K, NAME, VAL FROM CRED_VIEW")
      assert(rs.next() && rs.getLong("K") === 1L &&
        rs.getString("NAME") === "a" && rs.getDouble("VAL") === 1.0)
      assert(!rs.next())
    } finally cred.close()
  }
}
