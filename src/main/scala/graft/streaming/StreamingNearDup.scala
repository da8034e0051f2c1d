package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One LSH-candidate near-dup pair flagged online. `est_jaccard` is the
  * MinHash estimate (matching signature slots / slots) — recall-complete
  * over the banding exactly like batch C2; precision comes from the same
  * offline exact rescore q41 runs (streaming flags, batch confirms: the
  * production split). */
case class NearDupCandidate(doc_a: Long, doc_b: Long, band: Int,
    est_jaccard: Double)

/**
 * Continuous MinHash-LSH near-duplicate detection — batch C2/q41's
 * streaming twin (the B45/B46 pattern: same kernels, bounded state,
 * checkpointed). An ingest pipeline calls this to flag "this document is
 * probably a near-dup of an earlier one" AT ARRIVAL TIME instead of at
 * the next batch dedup run.
 *
 * Shared semantics by construction: signatures and band keys are computed
 * PLAN-SIDE with the exact expressions batch q41 uses
 * ([[graft.functions.TextHashes]] kernels + the same
 * `xxhash64(slice(sig), band)` banding), so AS LONG AS no bucket exceeds
 * `cap`, the stream's candidate pair set equals batch
 * `Dedup.lshCandidates` over the same corpus (spec-asserted) — the
 * stateful layer only REMEMBERS, it never hashes differently. The two
 * engines intentionally differ on an over-cap bucket: batch retroactively
 * excludes the WHOLE bucket (it sees the final size), while a stream
 * cannot retract Append-mode emissions, so it keeps the first-`cap`
 * pairs already flagged and admits nothing more — size `cap` alike to
 * batch's `maxBucket` for the parity regime, and treat an over-cap
 * bucket's flags as unvetted (the batch rescore drops them).
 *
 * State: per (band, band_hash) bucket, the ≤`cap` (doc_id, signature)
 * rows seen first — 64 longs each, so total state is
 * buckets_touched · cap · ~0.5 KB, independent of document sizes (the
 * shingle arrays never enter state; exact Jaccard is the batch rescore's
 * job). A bucket at cap stops admitting new members and emits nothing
 * for them — the forward-time analog of batch's hot-bucket exclusion
 * (`maxBucket`): a degenerate bucket must not go quadratic in either
 * engine. Emission is Append (a flagged pair is final); a pair sharing
 * several bands emits once per band — consumers dedup on (doc_a, doc_b),
 * exactly as batch's `.distinct()` does. */
object StreamingNearDup {

  /** (doc_id, sig) — built plan-side by [[detect]]. */
  type SignedDoc = (Long, Seq[Long])

  private class BucketProcessor(cap: Int)
      extends StatefulProcessor[(Int, Long), (Int, Long, Long, Seq[Long]),
        NearDupCandidate] {
    @transient private var st: ValueState[Vector[(Long, Seq[Long])]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Vector[(Long, Seq[Long])]](
        "bucket", Encoders.kryo[Vector[(Long, Seq[Long])]], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[(Int, Long, Long, Seq[Long])],
        timerValues: TimerValues): Iterator[NearDupCandidate] = {
      var members = if (st.exists()) st.get() else Vector.empty[(Long, Seq[Long])]
      val out = Vector.newBuilder[NearDupCandidate]
      // deterministic within-batch order (arrival order is not a total
      // order across a shuffle)
      rows.toSeq.sortBy(_._3).foreach { case (band, _, docId, sig) =>
        if (!members.exists(_._1 == docId) && members.length < cap) {
          members.foreach { case (prevId, prevSig) =>
            val eq = sig.iterator.zip(prevSig.iterator).count { case (a, b) => a == b }
            val (lo, hi) = if (prevId < docId) (prevId, docId) else (docId, prevId)
            out += NearDupCandidate(lo, hi, band, eq.toDouble / sig.length.toDouble)
          }
          members = members :+ (docId -> sig)
        }
      }
      st.update(members)
      out.result().iterator
    }
  }

  /** Flag near-dup candidates over a `(doc_id, text)` stream. `bands`
    * bands of `64/bands` minhash slots, q41's defaults. Run with
    * `outputMode("append")`. */
  def detect(docs: Dataset[(Long, String)], bands: Int = 16,
      cap: Int = 1000): Dataset[NearDupCandidate] = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(cap > 1, "cap must admit at least 2 docs per bucket")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = 64 / bands
    val signed = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextHashFunctions.minhashSig(
          graft.functions.TextHashFunctions.wordShingleHashes(col("text"), 3),
          64).as("sig"))
      // the same banding expression as Dedup.lshCandidates — one source of
      // truth for which documents CAN collide
      .select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_id"),
            xxhash64(slice(col("sig"), b * r + 1, lit(r)), b).as("band_hash"))))
          .as("bd"))
      .select(col("bd.band_id"), col("bd.band_hash"), col("doc_id"), col("sig"))
      .as[(Int, Long, Long, Seq[Long])]
    signed.groupByKey(x => (x._1, x._2))
      .transformWithState(new BucketProcessor(cap), TimeMode.None(),
        OutputMode.Append())
  }
}
