package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Bounded per-query top-k as a PARTIAL-MERGE AGGREGATE — the scale shape
 * `row_number() OVER (PARTITION BY query ORDER BY score DESC, id ASC)
 *  WHERE rn <= k` cannot reach.
 *
 * The window form materializes and SORTS the whole scored pair stream:
 * even with Spark's WindowGroupLimit pushdown, every map task local-sorts
 * its |corpus|×|queries| slice before the per-key limit — at an all-pairs
 * eval (reference scale: the q183/q239/q244 family at the 200k brute gate,
 * a 4·10¹⁰-row sort) that is hours of spill, not compute. This aggregate
 * keeps a k-slot binary heap per query instead: O(1) state per (query,
 * partition), no sort, no spill, and the shuffle carries at most k entries
 * per query per map partition — the exact map-side-combine shape a
 * 1000-executor scan wants. Measured at sf1.0 it turns the 20k-vector
 * exact-kNN evals from ~280 s (window) to seconds (see SURVEY §6.1).
 *
 * Ordering is EXACTLY the window's: score descending under Spark's total
 * double order (`java.lang.Double.compare` — NaN greatest, -0.0 < 0.0),
 * neighbor_id ascending on ties. The comparator is total, so the kept set
 * is independent of encounter/merge order — partial merges commute, and
 * the result is bit-identical to the window form (ranks included) for
 * NON-NULL scores; null-scored pairs are dropped (see `update`), where
 * the window would trail them — callers ranking a nullable score filter
 * first.
 *
 * Grouping discipline (see [[TopKByScore.topK]]): callers group by
 * `pmod(hash(query_id), B)` with `B = buckets(spark)` — the session
 * shuffle width clamped BELOW the ObjectHashAggregate sort-fallback
 * threshold (`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`,
 * 128 by default), so the map-side hash agg NEVER degenerates into the
 * very sort this exists to avoid. Each bucket's buffer holds the heaps of
 * the ~|queries|/B query ids that hash into it; query→bucket is a
 * function, so no cross-bucket merge is needed and the final explode is
 * exact. A wider final stage (huge query batches on a big cluster) is one
 * conf away: raise the fallback threshold and B follows.
 */
case class TopKByScore(
    queryId: Expression,
    neighborId: Expression,
    score: Expression,
    k: Int,
    guardQueries: Int = TopKByScore.DefaultGuardQueries,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[TopKByScore.Heap]]
  with TernaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  /** Loud one-per-buffer signal when a single bucket's heap count crosses
    * `guardQueries` (~[[TopKByScore.DefaultGuardQueries]]·(16k+~50) bytes
    * of task memory at the default): the final-merge parallelism is capped
    * at B < the ObjectHashAggregate fallback threshold, so a million-query
    * batch concentrates ~|queries|/B heaps in one task — fine until it
    * isn't, and it must never be silent (the q181 lesson). */
  private def guardCheck(before: Int, after: Int): Unit =
    if (before < guardQueries && after >= guardQueries) {
      TopKByScore.guardSignals.incrementAndGet()
      System.err.println(
        s"[graft] TopKByScore: a single bucket now holds $after query " +
          s"heaps (k=$k, ~${after.toLong * (16L * k + 50) >> 20} MB of " +
          "task memory) — the query batch is outgrowing the final-merge " +
          "parallelism; raise spark.sql.objectHashAggregate.sortBased." +
          "fallbackThreshold so TopKByScore.buckets widens, or split the " +
          "query batch")
    }

  override def inputTypes: Seq[GraftColumnBridge.AbstractType] =
    Seq(LongType, LongType, DoubleType)

  override def first: Expression = queryId
  override def second: Expression = neighborId
  override def third: Expression = score

  override def prettyName: String = "top_k_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.outputType

  override def createAggregationBuffer(): mutable.LongMap[TopKByScore.Heap] =
    mutable.LongMap.empty

  override def update(
      buffer: mutable.LongMap[TopKByScore.Heap],
      input: InternalRow): mutable.LongMap[TopKByScore.Heap] = {
    val q = queryId.eval(input)
    val n = neighborId.eval(input)
    val s = score.eval(input)
    // CONTRACT: null-scored pairs are DROPPED (as if `WHERE score IS NOT
    // NULL` preceded the ranking). The graft kernels never produce null
    // ids/scores (dot products of non-null arrays), so this never fires
    // there; but it is a real divergence from the window form for an
    // under-k query with null-scored candidates — the window (DESC ⇒
    // NULLS LAST) would emit those at trailing ranks, this omits them.
    // Callers ranking a nullable score must filter or coalesce first.
    if (q != null && n != null && s != null) {
      val before = buffer.size
      buffer.getOrElseUpdate(q.asInstanceOf[Long], new TopKByScore.Heap(k))
        .offer(s.asInstanceOf[Double], n.asInstanceOf[Long])
      guardCheck(before, buffer.size)
    }
    buffer
  }

  override def merge(
      a: mutable.LongMap[TopKByScore.Heap],
      b: mutable.LongMap[TopKByScore.Heap]): mutable.LongMap[TopKByScore.Heap] = {
    val before = a.size
    b.foreach { case (q, hb) =>
      a.get(q) match {
        case None     => a.update(q, hb)
        case Some(ha) => hb.foreachEntry((s, id) => ha.offer(s, id))
      }
    }
    guardCheck(before, a.size)
    a
  }

  override def eval(buffer: mutable.LongMap[TopKByScore.Heap]): Any = {
    // deterministic output: queries ascending, neighbors in rank order
    val qs = buffer.keys.toArray
    java.util.Arrays.sort(qs)
    val out = mutable.ArrayBuffer.empty[InternalRow]
    qs.foreach { q =>
      val (scores, ids) = buffer(q).sorted
      var r = 0
      while (r < ids.length) {
        out += new GenericInternalRow(
          Array[Any](q, (r + 1).toLong, ids(r), scores(r)))
        r += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(
      buffer: mutable.LongMap[TopKByScore.Heap]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (q, h) =>
      out.writeLong(q)
      out.writeInt(h.size)
      h.foreachEntry { (s, id) => out.writeDouble(s); out.writeLong(id) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.LongMap[TopKByScore.Heap] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = mutable.LongMap.empty[TopKByScore.Heap]
    val nq = in.readInt()
    var i = 0
    while (i < nq) {
      val q = in.readLong()
      val m = in.readInt()
      val h = new TopKByScore.Heap(k)
      var j = 0
      while (j < m) { h.offer(in.readDouble(), in.readLong()); j += 1 }
      buffer.update(q, h)
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKByScore =
    copy(queryId = newFirst, neighborId = newSecond, score = newThird)
}

object TopKByScore {

  /** Default heap-count bound per bucket buffer before the loud signal:
    * 2^20 queries ≈ 200-350 MB of heaps at k=5..10 — large enough that no
    * sane eval trips it, small enough to fire well before task OOM. */
  val DefaultGuardQueries: Int = 1 << 20

  /** Session conf key overriding [[DefaultGuardQueries]] (read by
    * [[topK]]; specs lower it to witness the signal). */
  val GuardConfKey = "graft.topk.guard.queriesPerBucket"

  /** Count of guard signals emitted in this JVM — the testable witness
    * (executors also print the actionable stderr line). */
  val guardSignals = new java.util.concurrent.atomic.AtomicLong(0)

  val outputType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("rank", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  /** Grouping fan-out for [[topK]]: the session shuffle width (so the
    * final merge+explode stage scales with the cluster), clamped BELOW
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128
    * default) — with fewer distinct group keys per map partition than the
    * threshold, the object-hash partial agg never falls back to sorting
    * its input, which is the whole point. Floor of 64 so a
    * small-shuffle-width session still spreads the final merge. */
  def buckets(spark: org.apache.spark.sql.SparkSession): Int = {
    val fallback = scala.util.Try(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold").toInt)
      .toOption.filter(_ > 1).getOrElse(128)
    math.min(fallback - 1,
      math.max(64, graft.GraftSession.shufflePartitions(spark)))
  }

  /** "a ranks strictly before b" under the window order
    * (score DESC via Spark's total double order, then id ASC). */
  private def before(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) c > 0 else ia < ib
  }

  /** k-slot binary heap with the WORST kept entry at the root (so a new
    * candidate evicts in O(log k) iff it ranks before the root). Pure
    * primitive arrays — no boxing on the per-pair hot path. */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    /** heap order: parent ranks AFTER (is worse than) its children */
    private def worse(i: Int, j: Int): Boolean =
      before(scores(j), ids(j), scores(i), ids(i))

    private def swap(i: Int, j: Int): Unit = {
      val s = scores(i); scores(i) = scores(j); scores(j) = s
      val d = ids(i); ids(i) = ids(j); ids(j) = d
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && worse(l, m)) m = l
        if (r < n && worse(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def offer(s: Double, id: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1)
      } else if (before(s, id, scores(0), ids(0))) {
        scores(0) = s; ids(0) = id; siftDown(0)
      }
    }

    def foreachEntry(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), ids(i)); i += 1 }
    }

    /** entries in rank order (best first) — rank r is index r-1 */
    def sorted: (Array[Double], Array[Long]) = {
      val idx = Array.range(0, n).sortWith { (i, j) =>
        before(scores(i), ids(i), scores(j), ids(j))
      }
      (idx.map(scores), idx.map(ids))
    }
  }

  /** Exact per-query top-k over a scored pair frame — drop-in for the
    * window+filter idiom with the same output contract:
    * `(query_id, rank, neighbor_id, score)`, rank 1..k per query in
    * (score DESC, neighbor_id ASC) order. `q`/`n` must be long-typed,
    * `s` double-typed. */
  def topK(scored: DataFrame, q: Column, n: Column, s: Column,
      k: Int): DataFrame = {
    val guard = scala.util.Try(
      scored.sparkSession.conf.get(GuardConfKey).toInt)
      .toOption.filter(_ > 0).getOrElse(DefaultGuardQueries)
    val agg = GraftColumnBridge.column(
      TopKByScore(
        GraftColumnBridge.expression(q),
        GraftColumnBridge.expression(n),
        GraftColumnBridge.expression(s), k, guard).toAggregateExpression())
    scored
      .groupBy(pmod(hash(q), lit(buckets(scored.sparkSession))).as("__bucket"))
      .agg(agg.as("__top"))
      .select(explode(col("__top")).as("__e"))
      .select(col("__e.query_id").as("query_id"), col("__e.rank").as("rank"),
        col("__e.neighbor_id").as("neighbor_id"), col("__e.score").as("score"))
  }
}
