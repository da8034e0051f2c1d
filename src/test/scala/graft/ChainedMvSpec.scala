package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{IncrementalMv, MaterializedView}

/** MVs feeding MVs — the TiFlink pitch (README: each MV's changelog can
  * drive downstream MVs, reference TiFlinkApp chains via the target table's
  * CDC): the upstream aggregate MV emits its own I/U/D changelog
  * (IncrementalMv changelogPath), and a DOWNSTREAM MaterializedView
  * maintains itself purely from that changelog stream — no access to the
  * base table — converging to exactly the upstream's committed state. */
class ChainedMvSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("a downstream MV maintained from the upstream MV's changelog converges") {
    val base = Files.createTempDirectory("chain").toString
    val cl = s"$base/changelog"

    // ---- upstream: aggregate MV over a keyed changelog, emitting diffs
    val input = MemoryStream[(Long, Long, String, String, Double)]
    val upstream = input.toDF().toDF("pk", "version", "op", "grp", "value")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/up-ckpt")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalMv.maintain(s"$base/up", "pk", "version", "op", "grp", "value",
          changelogPath = Some(cl))(b, id))
      .start()

    // ---- downstream: a second MV whose ONLY source is the changelog files.
    // Spark's file stream source tails the directory; each committed
    // batch=N dir becomes input rows (grp, op, cnt, total). The downstream
    // query upserts by grp with op='D' as the tombstone — the same
    // latest-row-wins contract TiFlink's sink applies to row-kind streams.
    val clSchema = StructType(Seq(
      StructField("grp", StringType), StructField("op", StringType),
      StructField("cnt", LongType), StructField("total", DoubleType)))
    def startDownstream() = MaterializedView.newBuilder()
      .setSource(spark.readStream.schema(clSchema)
        .option("basePath", cl).parquet(s"$cl/batch=*"))
      .setQuery(df => df.select(col("grp"), col("op"), col("cnt"), col("total"),
        // file order within one poll is not a version: the changelog is
        // keyed by grp and each batch dir holds at most one row per grp,
        // so the batch id embedded in the file path is the true version
        regexp_extract(input_file_name(), "batch=(\\d+)", 1).cast("long").as("ver"),
        (col("op") === "D").as("deleted")))
      .setPrimaryKeys("grp")
      .setVersionColumn("ver")
      .setDeleteColumn("deleted")
      .setTargetPath(s"$base/down")
      .setNumBuckets(4)
      .setCheckpointLocation(s"$base/down-ckpt")
      .build().start()

    def upState = spark.read.parquet(s"$base/up/agg")
      .select("grp", "cnt", "total").as[(String, Long, Double)].collect().toSet
    def downState = spark.read.parquet(s"$base/down")
      .filter(!col("deleted"))
      .select("grp", "cnt", "total").as[(String, Long, Double)].collect().toSet

    try {
      // batch 0: inserts across two groups
      input.addData((1L, 1L, "ins", "a", 10.0), (2L, 1L, "ins", "a", 20.0),
        (3L, 1L, "ins", "b", 5.0))
      upstream.processAllAvailable()
      // batch 1: group move + delete; batch 2: group b disappears entirely
      input.addData((2L, 2L, "upd", "b", 25.0), (3L, 2L, "delete", "b", 0.0))
      upstream.processAllAvailable()
      input.addData((2L, 3L, "delete", "b", 0.0))
      upstream.processAllAvailable()

      val downstream = startDownstream()
      try downstream.processAllAvailable() finally downstream.stop()

      assert(upState === Set(("a", 1L, 10.0)))
      assert(downState === upState,
        "downstream MV (changelog-only) must equal the upstream committed state")

      // late chain growth: more upstream batches, downstream RESTARTS from
      // its checkpoint and catches up from the new changelog dirs only
      input.addData((4L, 1L, "ins", "c", 7.0))
      upstream.processAllAvailable()
      val resumed = startDownstream()
      try resumed.processAllAvailable() finally resumed.stop()
      assert(upState === Set(("a", 1L, 10.0), ("c", 1L, 7.0)))
      assert(downState === upState, "restart must resume the chain exactly")
    } finally upstream.stop()
  }
}
