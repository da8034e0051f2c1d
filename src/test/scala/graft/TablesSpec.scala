package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Type-mapping checks — the TypeUtils.java:50-99 analog: every stored
  * column type maps onto the expected Catalyst type (including the
  * nanosecond-timestamp workaround for events). */
class TablesSpec extends SparkSpec {

  test("parquet ⇄ Catalyst type mapping is what operators assume") {
    def types(t: String) =
      Tables(spark, sf, t).schema.fields.map(f => f.name -> f.dataType).toMap
    val li = types("lineitem")
    assert(li("l_orderkey") === LongType)
    assert(li("l_linenumber") === IntegerType)
    assert(li("l_quantity") === DoubleType)
    assert(li("l_returnflag") === StringType)
    // Spark 4 reads parquet isAdjustedToUTC=false timestamps as NTZ
    assert(li("l_shipdate") === TimestampNTZType)
    val emb = types("embeddings")
    assert(emb("embedding") === ArrayType(FloatType, containsNull = true))
    // ns-timestamp table reads as µs NTZ through the loader
    val ev = Tables.events(spark, sf).schema.fields.map(f => f.name -> f.dataType).toMap
    assert(ev("ts") === TimestampNTZType)
    assert(ev("props") === StringType)
  }

  test("primary keys are registered for every table") {
    Tables.names.foreach { t =>
      val pks = Tables.primaryKeys(t)
      val cols = Tables(spark, sf, t).columns.toSet
      assert(pks.nonEmpty && pks.forall(cols), s"$t: $pks ⊄ $cols")
    }
  }

  test("unknown table name is rejected") {
    intercept[IllegalArgumentException](Tables(spark, sf, "nope"))
  }
}
