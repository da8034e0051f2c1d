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

  /** Top-n hot keys of a frame by count — the diagnostic used to decide
    * whether salting/AQE-skew settings are warranted. */
  def hotKeys(df: DataFrame, key: Column, n: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(n)
}
