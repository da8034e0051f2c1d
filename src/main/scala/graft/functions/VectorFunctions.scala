package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `array<float>` embedding columns, composed from built-in
 * higher-order functions (`zip_with`/`aggregate`/`transform`) — codegen'd by
 * Catalyst, no UDF/serialization cost in the hot path, which is what keeps
 * brute-force similarity scans tractable at 100 TB.
 *
 * Elements are cast to double *before* multiplication: fp32 accumulation
 * differs between engines and loses precision; fp64 left-to-right
 * accumulation is deterministic and matches DuckDB's list functions.
 */
object VectorFunctions {

  /** Element-wise cast to array<double>. */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** fp64 left-to-right dot product — native codegen'd expression
    * ([[DotProduct]]); bit-identical to the HOF composition it replaces. */
  def dot(a: Column, b: Column): Column =
    DotProduct.ofColumns(toDoubles(a), toDoubles(b))

  def l2Norm(a: Column): Column = {
    val d = toDoubles(a)
    sqrt(DotProduct.ofColumns(d, d))
  }

  /** Dot product over columns already of type array<double> (hoist the
    * float→double cast out of pair loops with [[toDoubles]] first). */
  def dotD(a: Column, b: Column): Column = DotProduct.ofColumns(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Normalize to unit length (pre-normalizing the corpus once turns cosine
    * top-k into dot-product top-k — the standard trick before sharding an
    * ANN scan). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(toDoubles(a), x => x / n)
  }

  /** Symmetric int8 quantization: per-vector scale = max|x|/127, elements
    * round to [-127, 127] — a 4× smaller embedding column (1 B/dim + one
    * float), the standard storage/interconnect saver for a 100 TB ANN
    * corpus. Max reconstruction error is scale/2 per element, asserted in
    * SimilaritySpec. Returns struct(scale float, q array<tinyint>). */
  def quantize8(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x)))
    val scale = when(mx === 0.0f, lit(1.0f)).otherwise(mx / 127.0f)
    struct(scale.cast("float").as("scale"),
      transform(v, x => round(x.cast("double") / scale).cast("byte")).as("q"))
  }

  /** Inverse of [[quantize8]]: array<double> reconstruction (double, so the
    * dequantized vectors drop straight into [[dotD]]/cosine pipelines). */
  def dequantize8(s: Column): Column =
    transform(s.getField("q"), x => x.cast("double") * s.getField("scale").cast("double"))
}
