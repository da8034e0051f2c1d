package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * As-of (temporal) join: for each left row, the most recent right row with
 * `right.ts <= left.ts` within the same key — the classic point-in-time
 * lookup (trade→latest-quote). Spark has no native ASOF JOIN; composing it
 * from a union + running `last(_, ignoreNulls)` window keeps it one shuffle
 * on (key) with a per-partition sort — no range-join explosion, no
 * per-row subquery. DuckDB's native `ASOF JOIN` is the oracle.
 *
 * Scale: identical shape to a sessionization pass — shuffle by key, sort by
 * time within partition; skewed keys split by AQE.
 */
object AsOf {

  /** Left rows enriched with the latest `rightValueCols` from `right` as of
    * each left row's time (inclusive). Rows with no prior right row keep
    * nulls (LEFT ASOF semantics). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightValueCols: Seq[String], prefix: String = "right_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filter(_ != key).map(col) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left at equal ts → "<=" semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col(key), col("__side")) ++ leftCols.filter(_ != key).map(col) ++
        rightValueCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"$prefix$c")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  // ---------------------------------------------------------------- B19
  /** Each purchase event joined to the user's most recent click at or
    * before the purchase. */
  def q37AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    asofJoin(purchases, clicks, "user_id", "ts", "ts",
      Seq("ts", "value"), prefix = "click_")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("click_ts"), col("click_value"))
  }
}
