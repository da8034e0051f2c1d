package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling join utility: salted repartition join for hot keys.
 *
 * AQE's skew-join split handles sort-merge skew at runtime; salting is the
 * planner-independent fallback when one side has a pathological hot key
 * (e.g. a null-ish default id owning 10% of a 100 TB fact table). The hot
 * side gets a random salt in [0, salts); the other side is replicated once
 * per salt value — so the hot key's rows spread over `salts` reducers
 * instead of one.
 */
object Skew {

  /** Inner-join `big` (skewed on `key`) with `small`, spreading each key
    * over `salts` partitions. `small` is exploded ×salts, so keep it the
    * dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** All within-block unordered pairs (`a.<id> < b.<id>`) as a self-join,
    * with each block salted into `salts`² sub-buckets (triangle
    * replication) so one block ≠ one reducer.
    *
    * A plain self-join on the block key caps parallelism at the number of
    * distinct blocks — at 100 TB a "source" or "label" block holds millions
    * of rows and a 1000-executor cluster would idle on ~20 tasks. Here row x
    * keeps its own salt sₓ and is replicated once per partner salt p:
    * left carries (sₓ, p), right carries (p, s_y) — pair {x,y} meets in
    * exactly one of salts² buckets, keys stay uniform by construction.
    * Replication is ×salts per side, all of it map-side.
    *
    * Callers reference the two sides as `col("a.…")` / `col("b.…")`.
    *
    * `maxBlock` bounds the quadratic: a block with more rows is EXCLUDED
    * (same pathological-bucket discipline as `Dedup.lshCandidates`'s cap —
    * Σ C(block,2) is the whole cost, and one degenerate block must not own
    * the job). The bound is computed with a map-side partial-aggregated
    * groupBy + broadcast semi-join — NOT a count window, which would sort
    * every row of the hot block through one reducer, the exact pathology
    * this utility exists to avoid. */
  def saltedSelfPairs(
      d: DataFrame, blockCol: String, idCol: String, salts: Int,
      maxBlock: Int = Int.MaxValue): DataFrame = {
    val bounded =
      if (maxBlock == Int.MaxValue) d
      else {
        // "No silent caps": an excluded block makes the result diverge from
        // any uncapped oracle, so surface every drop loudly (bounded collect
        // — ≤20 rows — over the column-pruned partial-agg; the quadratic
        // pair stage dwarfs this extra pass).
        val over = oversizeBlocks(d, blockCol, maxBlock)
        val dropped = over
          .select(col(blockCol).cast("string").as("__b"), col("__bn"))
          .limit(20).collect()
        if (dropped.nonEmpty)
          System.err.println(
            s"[graft] saltedSelfPairs(maxBlock=$maxBlock) DROPPING " +
              s"${dropped.length} oversize '$blockCol' block(s) (first 20 shown): " +
              dropped.map(r => s"${r.getString(0)}(${r.getLong(1)} rows)").mkString(", "))
        d.join(broadcast(over.select(col(blockCol))), Seq(blockCol), "left_anti")
      }
    val partnerSalts = array((0 until salts).map(lit): _*)
    val own = pmod(xxhash64(col(idCol)), lit(salts)).cast("int")
    // The probe side is explicitly spread over the salts²·|blocks| composite
    // keys: when the build side broadcasts, the pair-generation work runs at
    // the PROBE side's parallelism — which is the file-scan split count, i.e.
    // possibly 1 task for a small compact input. The quadratic per-bucket
    // work is the whole cost here, so the extra shuffle (rows ×salts, map
    // side) is always worth the full-cluster fan-out. The partition count is
    // pinned (REPARTITION_BY_NUM) so AQE's small-partition coalescing can't
    // fold the deliberately CPU-heavy buckets back together by byte size.
    val numParts = graft.GraftSession.shufflePartitions(d.sparkSession)
    val a = bounded.withColumn("__sa", own).withColumn("__sb", explode(partnerSalts))
      .repartition(numParts, col(blockCol), col("__sa"), col("__sb"))
    val b = bounded.withColumn("__sb", own).withColumn("__sa", explode(partnerSalts))
    a.as("a").join(b.as("b"),
      col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col("a.__sa") === col("b.__sa") && col("a.__sb") === col("b.__sb") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
  }

  /** Block keys (with their `__bn` row counts) exceeding `maxBlock` — the
    * blocks [[saltedSelfPairs]] EXCLUDES. Public so callers can join the
    * exclusion back into their own result (e.g. a null/unknown verdict)
    * instead of letting dropped rows silently read as negatives. One
    * map-side partial-aggregated groupBy over the pruned block column. */
  def oversizeBlocks(d: DataFrame, blockCol: String, maxBlock: Int): DataFrame =
    d.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBlock)

  /** Hash-repartition `df` on `key` up to the session shuffle width when
    * its plan parallelism is BELOW it — the scale-adaptive fan-out for
    * CPU-heavy per-row kernels (image/audio codec encode+decode) whose
    * input's file/row-group layout under-splits: a small parquet file is
    * one row group, so the scan is ONE task no matter how many cores sit
    * idle, and `files.minPartitionNum` cannot split below a row group. On
    * a production multi-split table the partition check makes this a
    * NO-OP — no shuffle is added at scale (guide §2: scale-adaptive, not
    * a local[32] constant). Hash on a unique key, not round-robin: keyless
    * repartition pays a retry-determinism local sort (SPARK-23207). The
    * `.rdd.getNumPartitions` probe only forces physical planning of the
    * (scan-shaped) input — no job runs. */
  def fanOutForCpu(d: DataFrame, key: String): DataFrame = {
    val want = graft.GraftSession.shufflePartitions(d.sparkSession)
    if (d.rdd.getNumPartitions >= want) d
    else d.repartition(want, col(key))
  }

  /** Top-n hot keys of a frame by count — the diagnostic used to decide
    * whether salting/AQE-skew settings are warranted. */
  def hotKeys(df: DataFrame, key: Column, n: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(n)
}
