package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.GraftColumnBridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass, zero-copy text signature kernels for the dedup operators
 * (reference capability: TiFlink-adjacent LLM-pipeline dedup, SURVEY §2.C).
 *
 * Each kernel walks the document's UTF-8 bytes ONCE and hashes sub-spans in
 * place (`XXH64.hashUnsafeBytes` on the backing array — no per-gram string
 * allocation). They are drop-in equivalents of the declarative
 * higher-order-function formulations in [[graft.operators.Dedup]] (kept as
 * executable specifications; KernelParitySpec asserts equality) but those
 * evaluate their lambdas interpreted per element, which dominates corpus-
 * scale shingling:
 *
 *  - char n-grams:   `array_distinct(transform(sequence(...), substr))` →
 *    O(len) boxed strings per row, per side of a self-join.
 *  - word shingles:  posexplode + `lead` windows → a full sort shuffle of
 *    every (doc, word) row just to reassemble adjacent words.
 *  - minhash:        64 `min(xxhash64(s, seed))` aggregates over an exploded
 *    row per (doc, shingle) — a wide shuffle whose input is ~#words × #docs.
 *  - simhash:        64 conditional sums over exploded words.
 *
 * Hash parity: spans are hashed exactly like the builtin `xxhash64` hashes a
 * string (XXH64 over the UTF-8 bytes, seed 42), so signatures built here are
 * bit-identical to the HOF formulations and LSH bucketing is unchanged.
 */
object TextHashes {

  private val SEED = 42L

  /** Byte offsets of each codepoint start, plus a terminal numBytes entry.
    * Returns the char count; fills `offsets` (caller sizes it numBytes+1). */
  private def charOffsets(base: AnyRef, off: Long, numBytes: Int, offsets: Array[Int]): Int = {
    var i = 0; var c = 0
    while (i < numBytes) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      c += 1
    }
    offsets(c) = numBytes
    c
  }

  private def sortedDistinct(hs: Array[Long], n: Int): ArrayData = {
    java.util.Arrays.sort(hs, 0, n)
    var w = 0; var i = 0
    while (i < n) {
      if (w == 0 || hs(w - 1) != hs(i)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** Sorted distinct xxhash64 values of the char n-grams of `s` — equals
    * `sort_array(transform(array_distinct(grams), xxhash64))` for
    * grams = substr(i, n), i ∈ [1, max(len-n+1, 1)]. */
  def charNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject; val off = s.getBaseOffset; val nb = s.numBytes
    val offsets = new Array[Int](nb + 2)
    val nc = charOffsets(base, off, nb, offsets)
    val count = math.max(nc - n + 1, 1)
    val hs = new Array[Long](count)
    var g = 0
    while (g < count) {
      val start = offsets(g)
      val end = offsets(math.min(g + n, nc))
      hs(g) = XXH64.hashUnsafeBytes(base, off + start, end - start, SEED)
      g += 1
    }
    sortedDistinct(hs, count)
  }

  /** Sorted distinct xxhash64 values of word k-shingles (words = split on a
    * single space, shingle = k consecutive words joined by " "). Because the
    * joiner equals the separator, each shingle IS a byte span of the original
    * text — hashed in place, no concatenation. <k words → one whole-text
    * shingle (matches `Dedup.shingles`). */
  def wordShingleHashes(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject; val off = s.getBaseOffset; val nb = s.numBytes
    // word boundaries: starts(i) .. ends(i) in bytes (single-byte 0x20 sep)
    var nw = 1
    var i = 0
    while (i < nb) { if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) nw += 1; i += 1 }
    val starts = new Array[Int](nw); val ends = new Array[Int](nw)
    var w = 0; starts(0) = 0; i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) {
        ends(w) = i; w += 1; starts(w) = i + 1
      }
      i += 1
    }
    ends(w) = nb
    val count = math.max(nw - k + 1, 1)
    val hs = new Array[Long](count)
    var g = 0
    while (g < count) {
      val start = starts(g)
      val end = ends(math.min(g + k - 1, nw - 1))
      hs(g) = XXH64.hashUnsafeBytes(base, off + start, end - start, SEED)
      g += 1
    }
    sortedDistinct(hs, count)
  }

  /** MinHash signature over a shingle-hash array: slot j = min over shingles
    * of `xxhash64(s, j)` — reproduced exactly (hashLong(s, 42) chained into
    * hashInt(j, ·)) so signatures and LSH buckets match
    * [[graft.operators.Dedup.signatureFromExploded]] bit-for-bit. */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val inner = XXH64.hashLong(arr.getLong(i), SEED)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashInt(j, inner)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Word-repetition statistics in one pass, zero shuffle:
    * [n_words, n_distinct, top_count] for words = split on single space
    * (empties kept, matching `string_split` semantics in the oracle).
    * Distinct/top come from run-lengths over the SORTED word hashes —
    * no per-row map allocation; a 64-bit collision merging two words is
    * the usual negligible-xxhash64 caveat. This replaces the
    * explode + groupBy(doc, word) + groupBy(doc) formulation whose two
    * shuffles move every (doc, word) row of the corpus. */
  def wordRepetitionStats(s: UTF8String): ArrayData = {
    val base = s.getBaseObject; val off = s.getBaseOffset; val nb = s.numBytes
    var nw = 1
    var i = 0
    while (i < nb) { if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) nw += 1; i += 1 }
    val hs = new Array[Long](nw)
    var wordStart = 0
    var w = 0
    i = 0
    while (i <= nb) {
      val atSep = i == nb || org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte
      if (atSep) {
        hs(w) = XXH64.hashUnsafeBytes(base, off + wordStart, i - wordStart, SEED)
        w += 1
        wordStart = i + 1
      }
      i += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 0
    var top = 0
    var run = 0
    i = 0
    while (i < nw) {
      if (i == 0 || hs(i) != hs(i - 1)) { distinct += 1; run = 1 }
      else run += 1
      if (run > top) top = run
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(nw.toLong, distinct.toLong, top.toLong))
  }

  /** 64-bit SimHash from word unigrams — bit i set iff Σ_words (±1 by bit i
    * of xxhash64(word)) > 0. Bit-identical to [[graft.operators.Dedup.simhashDf]]
    * (split on single space keeps empty words; their hash participates). */
  def simhash64(s: UTF8String): Long = {
    val base = s.getBaseObject; val off = s.getBaseOffset; val nb = s.numBytes
    val counts = new Array[Int](64)
    var wordStart = 0
    var i = 0
    while (i <= nb) {
      val atSep = i == nb || org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte
      if (atSep) {
        val h = XXH64.hashUnsafeBytes(base, off + wordStart, i - wordStart, SEED)
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
        wordStart = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** Shared shape for the UTF8String → signature kernels: null-safe unary
  * expression whose codegen is one static call into [[TextHashes]] (the loop
  * body is compiled Scala — stays inside whole-stage codegen, no virtual
  * dispatch per element). Declares string input so a wrong-typed child is an
  * analysis-time DATATYPE_MISMATCH, not a runtime ClassCastException. */
abstract class TextHashExpression extends UnaryExpression with ExpectsInputTypes {
  /** Java source for the static call, given the child variable name. */
  protected def staticCall(childVar: String): String
  protected def evalKernel(s: UTF8String): Any

  override def inputTypes: Seq[AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${staticCall(c)};")
}

case class CharNgramHashes(child: Expression, n: Int) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"
  override protected def evalKernel(s: UTF8String): Any = TextHashes.charNgramHashes(s, n)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashes.charNgramHashes($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

case class WordShingleHashes(child: Expression, k: Int) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"
  override protected def evalKernel(s: UTF8String): Any = TextHashes.wordShingleHashes(s, k)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashes.wordShingleHashes($c, $k)"
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

case class WordRepetitionStats(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_repetition_stats"
  override protected def evalKernel(s: UTF8String): Any = TextHashes.wordRepetitionStats(s)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashes.wordRepetitionStats($c)"
  override protected def withNewChildInternal(newChild: Expression): WordRepetitionStats =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def evalKernel(s: UTF8String): Any = TextHashes.simhash64(s)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashes.simhash64($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature of a shingle-hash array (`array<bigint>` → 64×bigint). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[ArrayData], numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TextHashes.minhashSig($c, $numHashes);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Column API for the text-signature kernels. */
object TextHashFunctions {
  import GraftColumnBridge.{column => col2, expression => expr2}
  def charNgramHashes(c: Column, n: Int): Column = col2(CharNgramHashes(expr2(c), n))
  def wordShingleHashes(c: Column, k: Int): Column = col2(WordShingleHashes(expr2(c), k))
  def minhashSig(c: Column, numHashes: Int): Column = col2(MinHashSig(expr2(c), numHashes))
  def simhash64(c: Column): Column = col2(SimHash64(expr2(c)))
  def wordRepetitionStats(c: Column): Column = col2(WordRepetitionStats(expr2(c)))
}
