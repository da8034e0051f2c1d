package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * End-to-end streaming corpus curation — the TiFlinkApp-shaped composition
 * for the pipeline side (reference: TiFlinkApp.java:70-99 runs ONE
 * continuous job maintaining a query; this runs one continuous job
 * maintaining a curated corpus): normalize → repetition-filter →
 * bounded-state exact dedup → versioned snapshot publication.
 *
 * Stage semantics match the batch operators 1:1 — q70 normalization, q64
 * repetition filter, q40 exact dedup, [[SnapshotStore]] epochs — so the
 * batch oracles remain each stage's executable specification; this object
 * contributes only the streaming glue: a watermark bounds dedup state to
 * the disorder horizon (`dropDuplicatesWithinWatermark`), and every
 * micro-batch publishes one immutable snapshot epoch (readers get
 * stale-snapshot isolation and time travel over the curated corpus).
 *
 * Scale: every stage is a map-only expression except the dedup (state =
 * fingerprints inside the watermark horizon, evicted beyond it) and the
 * epoch merge (latest-by-key over prior snapshot + delta). Corpus-GLOBAL
 * stages (q75 boilerplate, q80 vocab coverage) deliberately do NOT stream —
 * they need a full-corpus pass and run as periodic batch jobs over the
 * published store.
 */
object CurationPipeline {

  /** Map-only curation prefix over a (doc_id, text, ts) frame — usable on
    * batch frames too (specs diff it against the batch operators). Adds
    * `norm_text`, `fp` (dedup fingerprint of the NORMALIZED text, so
    * whitespace/case variants collapse), and the q64 keep flag. The
    * expressions ARE the batch operators' ([[graft.operators.TextAnalysis
    * .normalizeExpr]], [[graft.operators.TextAnalysis.repetitionKeepExpr]]) —
    * shared definitions, so batch and stream cannot silently diverge. */
  def curatedColumns(docs: DataFrame,
      maxTopFrac: Double = 0.5, minDistinctRatio: Double = 0.2): DataFrame = {
    import graft.functions.TextHashFunctions
    import graft.operators.TextAnalysis
    docs
      .withColumn("norm_text", TextAnalysis.normalizeExpr(col("text")))
      .withColumn("fp", md5(col("norm_text")))
      .withColumn("__s", TextHashFunctions.wordRepetitionStats(col("norm_text")))
      .withColumn("keep",
        TextAnalysis.repetitionKeepExpr(col("__s"), maxTopFrac, minDistinctRatio))
      .drop("__s")
  }

  /** Start the continuous curation job: `docs` is a STREAMING frame with
    * (doc_id, text, ts) and whatever metadata columns ride along. Documents
    * failing the repetition filter are dropped. Dedup semantics: INSIDE the
    * watermark horizon the first occurrence of each normalized-text
    * fingerprint wins (later arrivals are dropped in-stream); a duplicate
    * arriving BEYOND the horizon — its dedup state already evicted — is
    * re-emitted and upserts its fingerprint's row, so the stored text stays
    * identical (same fp ⇒ same norm_text) but the doc_id/ts ATTRIBUTION
    * becomes latest-EVENT-TIME (the upsert versions by `ts`, not doc_id —
    * a re-crawl with a lower id still wins if its event time is later;
    * same-instant duplicates tie-break arbitrarily). Bounded state has
    * exactly this trade; size the horizon to the re-crawl disorder you
    * need first-seen attribution for.
    * Each micro-batch publishes epoch `batchId` at `targetBase`
    * ([[SnapshotStore.readSnapshot]] reads the curated corpus, pinned or
    * latest). */
  def start(docs: DataFrame, targetBase: String, checkpointDir: String,
      watermarkDelay: String = "10 minutes",
      maxTopFrac: Double = 0.5, minDistinctRatio: Double = 0.2,
      keepEpochs: Int = 3,
      mixRates: Option[(Map[String, Double], Double)] = None,
      splitFracs: Option[(Double, Double)] = None): StreamingQuery = {
    import graft.operators.Corpus
    // Optional q84 mixing / q91 split stages — the SAME expressions as the
    // batch operators (pure functions of doc_id), so a document sampled or
    // labeled in-stream matches what a batch re-run over the published
    // corpus would decide; both need a `source` column on `docs`.
    val mixed = mixRates.fold(docs) { case (rates, dflt) =>
      docs.filter(Corpus.mixKeepExpr(col("doc_id"), col("source"), rates, dflt))
    }
    val labeled = splitFracs.fold(mixed) { case (t, v) =>
      mixed.withColumn("split", Corpus.splitExpr(col("doc_id"), t, v))
    }
    val curated = curatedColumns(labeled, maxTopFrac, minDistinctRatio)
      .filter(col("keep"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("keep")
    curated.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(SnapshotStore.upsertSink(
        targetBase, keys = Seq("fp"), versionCol = "ts", keep = keepEpochs))
      .start()
  }
}
