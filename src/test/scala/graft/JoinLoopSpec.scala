package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.streaming.{JdbcUpsertSink, JoinMv}

/** The JOIN side of the closed loop — TiFlink's flagship example is a
  * JOIN MV maintained inside the database: here the B52 delta-join MV's
  * before/after-image changelog is relayed, exactly once, into Derby by
  * the B61 sink, and the database copy must mirror the MV's parquet
  * state through late dims, fanout dim updates, fk moves, and deletes.
  * (ClosedLoopSpec covers the AGGREGATE MV loop; this is the two-table
  * maintenance story end-to-end.) */
class JoinLoopSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjoinloop;create=true"

  private def derby(): Set[(Long, Long, Long, Double, Option[String])] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT ORDER_ID, AVER, CUST_ID, AMOUNT, CUST_NAME FROM LIVE_JOIN")
      val b = Set.newBuilder[(Long, Long, Long, Double, Option[String])]
      while (rs.next()) {
        val name = Option(rs.getString("CUST_NAME"))
        b += ((rs.getLong("ORDER_ID"), rs.getLong("AVER"),
          rs.getLong("CUST_ID"), rs.getDouble("AMOUNT"), name))
      }
      b.result()
    } finally c.close()
  }

  test("join-MV changelog maintains a Derby copy through every mutation") {
    val base = Files.createTempDirectory("jloop").toString
    val cl = s"$base/changelog"
    val sink = JdbcUpsertSink(url, "live_join", Seq("order_id"),
      deleteCol = Some("deleted"))

    def facts(rows: (Long, Long, String, Long, Double)*) =
      rows.toDF("order_id", "aver", "aop", "cust_id", "amount")
    def dims(rows: (Long, Long, String, String)*) =
      rows.toDF("cust_pk", "bver", "bop", "cust_name")

    def applyAndRelay(id: Long,
        fa: org.apache.spark.sql.DataFrame,
        fb: org.apache.spark.sql.DataFrame): Unit = {
      JoinMv.applyBatch(s"$base/mv",
        "order_id", "aver", "aop", "cust_id",
        "cust_pk", "bver", "bop",
        nBuckets = 4, changelogPath = Some(cl))(fa, fb, id)
      // the relay: flatten the before/after changelog batch into the
      // sink's latest-per-key upsert shape (D rows carry a null __row —
      // only the key and the marker matter)
      val diff = spark.read.parquet(s"$cl/batch=$id")
        .select($"order_id", $"__row.aver".as("aver"),
          $"__row.cust_id".as("cust_id"), $"__row.amount".as("amount"),
          $"__row.cust_name".as("cust_name"),
          ($"__op" === "D").as("deleted"))
      sink(diff, id)
    }

    def mv: Set[(Long, Long, Long, Double, Option[String])] =
      spark.read.parquet(s"$base/mv/mv")
        .select($"order_id", $"aver", $"cust_id", $"amount", $"cust_name")
        .as[(Long, Long, Long, Double, Option[String])].collect().toSet

    // batch 0: two facts, one dim — order 2's dim is LATE (null name)
    applyAndRelay(0L,
      facts((1L, 1L, "ins", 10L, 5.0), (2L, 1L, "ins", 20L, 7.0)),
      dims((10L, 1L, "ins", "alice")))
    assert(derby() === mv)
    assert(derby() === Set((1L, 1L, 10L, 5.0, Some("alice")),
      (2L, 1L, 20L, 7.0, None)))

    // batch 1: the late dim arrives (order 2 upgrades via the reverse
    // index), plus a third fact
    applyAndRelay(1L,
      facts((3L, 1L, "ins", 10L, 9.0)),
      dims((20L, 1L, "ins", "bob")))
    assert(derby() === mv)
    assert(derby().contains((2L, 1L, 20L, 7.0, Some("bob"))))

    // batch 2: dim update fans out; order 1 MOVES fk 10 -> 20
    applyAndRelay(2L,
      facts((1L, 2L, "upd", 20L, 6.0)),
      dims((10L, 2L, "upd", "ALICE")))
    assert(derby() === mv)
    assert(derby().contains((1L, 2L, 20L, 6.0, Some("bob"))))
    assert(derby().contains((3L, 1L, 10L, 9.0, Some("ALICE"))))

    // batch 3: delete a fact AND a dim — the fact row leaves Derby, the
    // dim's remaining referents null their name
    applyAndRelay(3L,
      facts((2L, 2L, "delete", 20L, 0.0)),
      dims((10L, 3L, "delete", "")))
    assert(derby() === mv)
    assert(!derby().exists(_._1 == 2L), "deleted fact must leave Derby")
    assert(derby().contains((3L, 1L, 10L, 9.0, None)))

    // a stale REPLAY of batch 3 (same id, mutated content) must fence —
    // this exercises the MARKER short-circuit (nothing recomputes)
    applyAndRelay(3L,
      facts((1L, 9L, "upd", 20L, 99.0)),
      dims())
    assert(derby() === mv, "fenced replay must not diverge the copy")

    // crash-window replay: the marker landed AFTER the changelog write,
    // so a crash between them replays the batch with the marker absent —
    // the CHANGELOG-DIR guard (not the marker) must then keep batch=3
    // from being overwritten with a spurious re-diff, and the MV redo
    // must be idempotent
    val mvFs = new org.apache.hadoop.fs.Path(s"$base/mv/mv")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(mvFs.delete(
      new org.apache.hadoop.fs.Path(s"$base/mv/mv/_applied_batch"), false))
    val clBefore = spark.read.parquet(s"$cl/batch=3")
      .collect().map(_.toString).sorted.toSeq
    applyAndRelay(3L,
      facts((2L, 2L, "delete", 20L, 0.0)),
      dims((10L, 3L, "delete", "")))
    assert(derby() === mv, "crash-window replay must converge")
    assert(spark.read.parquet(s"$cl/batch=3")
      .collect().map(_.toString).sorted.toSeq === clBefore,
      "the committed changelog batch must not be rewritten by the replay")
  }
}
