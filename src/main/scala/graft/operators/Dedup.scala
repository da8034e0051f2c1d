package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/**
 * Deduplication operators for training-data pipelines — exact, MinHash+LSH,
 * SimHash, n-gram Jaccard, embedding-cosine.
 *
 * Scale design:
 *  - Exact dedup groups on a 128-bit content hash, never on the text itself —
 *    the shuffle carries 16 bytes + ids per row, not documents.
 *  - MinHash/LSH: the only join is on (band_id, band_hash) — uniform keys by
 *    construction, candidate pairs ≪ n²; buckets are capped so one
 *    pathological bucket can't go quadratic.
 *  - SimHash reduces a document to one 64-bit signature; near-dup = hamming
 *    proximity, joinable on signature prefixes.
 *  - All signatures are built from codegen'd higher-order functions
 *    (transform/aggregate/xxhash64) — no UDFs, no driver-side loops.
 */
object Dedup {

  // ---------------------------------------------------------------- C1
  /** Exact dedup: group by md5(text), keep the lowest doc_id (the canonical
    * representative), count duplicates. */
  def q40DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Word k-shingles (distinct), hashed to 64-bit — the unit of Jaccard. */
  def shingles(text: Column, k: Int): Column = {
    val words = split(text, " ", -1)
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => xxhash64(concat_ws(" ", slice(words, i + 1, lit(k))))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the shingle set. One pass, nested codegen'd transforms. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleCol, s => xxhash64(s, seed))))

  /** LSH candidate pairs: split the signature into `bands`, bucket by band
    * hash, pair within buckets. Returns (doc_a, doc_b) with doc_a < doc_b. */
  def lshCandidates(
      docs: DataFrame, idCol: String, sigCol: String,
      bands: Int, maxBucket: Int = 1000): DataFrame = {
    val rows = docs.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val nHashes = 64 // caller contract: sig length
    val r = nHashes / bands
    val banded = rows.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_id"), xxhash64(slice(col("sig"), b * r + 1, lit(r)), b).as("band_hash"))))
        .as("bd"))
      .select(col("id"), col("bd.band_id"), col("bd.band_hash"))
    // cap pathological buckets (a degenerate shingle set would go quadratic)
    val capped = banded
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band_id", "band_hash")))
      .filter(col("bucket_n") <= maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  // ---------------------------------------------------------------- C2
  /** MinHash+LSH near-dup: shingle → 64 minhashes → 16 bands → bucket join →
    * exact-Jaccard rescore of candidates only. Output is rescored with the
    * true Jaccard, so recall (not precision) is the only LSH approximation. */
  def q41DedupMinhash(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 64))
    val cands = lshCandidates(docs, "doc_id", "sig", bands = 16)
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash from word unigrams: per bit, sign of Σ(±1) weighted by
    * each word-hash's bit. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(text, " ", -1), w => xxhash64(w))
    val bits = transform(sequence(lit(0), lit(63)), i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0, lit(1L))
        .otherwise(lit(0L)))
    aggregate(zip_with(bits, sequence(lit(0), lit(63)), (b, i) => call_function("shiftleft", b, i)),
      lit(0L), (acc, v) => acc.bitwiseXOR(v))
  }

  // ---------------------------------------------------------------- C3
  /** SimHash signatures + near-dup pairs within hamming distance ≤ 6, found
    * by banding the 64-bit signature into 4×16-bit chunks (pigeonhole: any
    * pair within distance 3 shares ≥1 exact chunk; wider distances trade
    * recall) — same bucket-join shape as LSH, no n² scan. */
  def q42DedupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), simhash(col("text")).as("sh"))
    val chunks = docs.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        i => struct(i.as("chunk_id"),
          call_function("shiftright", col("sh"), i * 16).bitwiseAND(0xFFFF).as("chunk_val")))).as("c"))
      .select(col("doc_id"), col("sh"), col("c.chunk_id"), col("c.chunk_val"))
    val hamming = {
      val x = col("a.sh").bitwiseXOR(col("b.sh"))
      bit_count(x)
    }
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------------------- C4
  /** Exact character-3-gram Jaccard for pairs within the same source
    * (blocking key bounds the pair count; at scale the block is the shard). */
  def q43NgramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val grams = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
      i => col("text").substr(i, lit(3))))
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"), grams.as("g"))
    d.as("a").join(d.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.g"), col("b.g"))).cast("double") /
          (size(col("a.g")) + size(col("b.g"))
            - size(array_intersect(col("a.g"), col("b.g")))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- C5
  /** Embedding cosine near-dup: pairs with cosine ≥ threshold. Blocked by
    * label (the cluster id) to bound pairs; the unblocked scale path is
    * q46's hyperplane-LSH bucketing. */
  def q44DedupEmbedding(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
