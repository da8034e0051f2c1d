package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit

/**
 * Column API over Spark's OWN bloom-filter expressions — the pair that
 * powers Catalyst's runtime-filter injection (`bloom_filter_agg` /
 * `might_contain`), surfaced so operators can build the semi-join
 * prefilter EXPLICITLY where the optimizer's automatic injection cannot
 * see it (e.g. across a driver-mediated two-job pipeline, or keyed on a
 * derived hash the filter framework does not track).
 *
 * Shape: the aggregate distributedly ORs per-partition sketches into one
 * bounded binary (size set by `expectedItems`, never by data volume); the
 * probe is a codegen-friendly bitwise test against that binary shipped as
 * a literal — exactly the bound Spark's runtime-filter subquery broadcast
 * accepts. No false negatives ever (a pruned row provably has no match),
 * so an exact verify join downstream keeps results exact; false positives
 * only cost the prefilter some selectivity.
 */
object BloomFilters {

  /** Aggregate `hash` (a LONG column — pre-hash values with `xxhash64`)
    * into one serialized bloom filter sized for `expectedItems` distinct
    * values (Spark's default bits-per-item ⇒ ~3% false-positive rate).
    * Returns NULL on zero input rows. */
  def bloomAgg(hash: Column, expectedItems: Long): Column =
    GraftColumnBridge.column(new BloomFilterAggregate(
      GraftColumnBridge.expression(hash), expectedItems)
      .toAggregateExpression())

  /** `true` iff `hash` (LONG, same hash space as the build side) might be
    * in the serialized `bloom` — which must be a FOLDABLE column (e.g.
    * `lit(bytes)`): Spark's own expression rejects a per-row bloom, the
    * guard that keeps the sketch plan-constant and the probe map-side. */
  def mightContain(bloom: Column, hash: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(bloom),
      GraftColumnBridge.expression(hash)))

  /** Convenience: build the bloom from `build`'s `hashCol` (bounded
    * driver-side sketch — the same kind of value Spark's runtime-filter
    * broadcast holds), returning a probe predicate for `hashCol` on the
    * big side, or `None` when the build side is empty. */
  def buildProbe(build: org.apache.spark.sql.DataFrame, hashCol: Column,
      expectedItems: Long): Option[Column] = {
    val row = build.agg(bloomAgg(hashCol, expectedItems).as("bf")).head()
    if (row.isNullAt(0)) None
    else Some(mightContain(lit(row.getAs[Array[Byte]](0)), hashCol))
  }
}
