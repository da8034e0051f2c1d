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

  test("catalog discovers a foreign dataset dir: list, PK metadata, SQL MV") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graftcat").toString

    // a brand-new table the built-in registry has never heard of …
    Seq((1L, "eu", 10.0), (2L, "us", 20.0), (3L, "eu", 30.0))
      .toDF("acct_id", "zone", "balance")
      .coalesce(1).write.parquet(s"$dir/accounts.parquet")
    // … plus one built-in-named table (different dir, same shape)
    Tables(spark, sf, "nation").coalesce(1).write.parquet(s"$dir/nation.parquet")
    // PK sidecar for the new table
    Files.writeString(java.nio.file.Paths.get(s"$dir/${Tables.MetaFile}"),
      """{"primaryKeys": {"accounts": ["acct_id"]}}""")

    assert(Tables.discover(spark, dir) === Seq("accounts", "nation"))
    assert(Tables.primaryKeysIn(spark, dir, "accounts") === Seq("acct_id"))
    // built-in fallback still answers for tables absent from the meta file
    assert(Tables.primaryKeysIn(spark, dir, "nation") === Seq("n_nationkey"))
    assert(Tables(spark, dir, "accounts").count() === 3)

    // end-to-end: a streaming MV whose SQL joins the foreign table through
    // setCatalog — no edit to Tables.names anywhere in this test
    implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val base = Files.createTempDirectory("graftcatmv").toString
    val q = graft.streaming.MaterializedView.newBuilder()
      .setSource(input.toDF().toDF("acct_id", "ver", "amount"))
      .setCatalog(dir)
      .setSqlQuery(
        """SELECT zone, max(ver) AS ver, sum(amount) AS total
          |FROM txns JOIN accounts USING (acct_id) GROUP BY zone""".stripMargin,
        "txns")
      .setTargetPath(s"$base/mv")
      .setVersionColumn("ver")
      .setCheckpointLocation(s"$base/ckpt")
      .build().start()
    try {
      input.addData((1L, 1L, 5.0), (2L, 1L, 7.0), (3L, 1L, 9.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/mv")
        .select("zone", "total").as[(String, Double)].collect().toSet
      assert(got === Set(("eu", 14.0), ("us", 7.0)))
    } finally q.stop()
  }
}
