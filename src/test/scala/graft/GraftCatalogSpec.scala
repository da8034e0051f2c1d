package graft

import java.nio.file.Files

import graft.streaming.SnapshotStore

/** SQL-native addressing over snapshot stores: `graft.<ns>.<table>`
  * resolves to the committed epoch, `VERSION AS OF` / the `version` read
  * option pin past epochs, and writes through SQL are refused. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val dir = Files.createTempDirectory("graftsql").toString
    // catalog wiring is plain session conf — no DDL, no registry edits
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.path", dir)
    dir
  }

  /** Fresh store per test (epochs are monotone per store). */
  private def publishMv(ns: String): Unit = {
    SnapshotStore.publish(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "v"),
      s"$root/$ns/mv", version = 1L)
    SnapshotStore.publish(
      Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "grp", "v"),
      s"$root/$ns/mv", version = 2L)
  }

  test("SELECT from graft.<ns>.<table> reads the committed epoch") {
    publishMv("s1")
    val got = spark.sql(s"SELECT id, v FROM graft.s1.mv ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
    // epoch resolution is per-scan: a new publish is visible to the NEXT query
    SnapshotStore.publish(
      Seq((1L, "a", 12.0)).toDF("id", "grp", "v"), s"$root/s1/mv", 3L)
    assert(spark.sql("SELECT count(*) AS c FROM graft.s1.mv")
      .as[Long].head() === 1L)
  }

  test("VERSION AS OF and the version read option pin a past epoch") {
    publishMv("s2")
    val pinned = spark.sql("SELECT id, v FROM graft.s2.mv VERSION AS OF 1 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(pinned === Seq((1L, 10.0), (2L, 20.0)))
    val opt = spark.read.option("version", "1").table("graft.s2.mv")
      .selectExpr("id", "v").as[(Long, Double)].collect().toSeq.sorted
    assert(opt === Seq((1L, 10.0), (2L, 20.0)))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.s2.mv VERSION AS OF 99").collect())
    assert(e.getMessage.contains("no committed epoch"))
  }

  test("filters and pruning reach the parquet scan through the catalog") {
    publishMv("s3")
    val q = spark.sql("SELECT v FROM graft.s3.mv WHERE id = 2")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed filter on id in:\n$plan")
    assert(q.as[Double].collect().toSeq === Seq(20.0))
  }

  test("catalog lists namespaces and tables from the live directory tree") {
    publishMv("s4")
    SnapshotStore.publish(Seq((1L, 1L)).toDF("k", "ver"), s"$root/s4/other", 1L)
    val tables = spark.sql("SHOW TABLES IN graft.s4").select("tableName")
      .as[String].collect().toSet
    assert(tables === Set("mv", "other"))
    val ns = spark.sql("SHOW NAMESPACES IN graft").select("namespace")
      .as[String].collect().toSet
    assert(ns.contains("s4"))
  }

  test("schema evolution: analysis-time pins keep the old schema, scan-option pins refuse") {
    publishMv("s6")
    // epoch 3 ADDS a column
    SnapshotStore.publish(
      Seq((1L, "a", 12.0, true)).toDF("id", "grp", "v", "flag"),
      s"$root/s6/mv", 3L)
    // VERSION AS OF pins at load → the query is ANALYZED with the old schema
    val asOf = spark.sql("SELECT * FROM graft.s6.mv VERSION AS OF 1")
    assert(asOf.schema.fieldNames.toSeq === Seq("id", "grp", "v"))
    assert(asOf.count() === 2L)
    // the standard versionAsOf read option routes through the same
    // time-travel load — schema-safe without SQL
    val opt = spark.read.option("versionAsOf", "1").table("graft.s6.mv")
    assert(opt.schema.fieldNames.toSeq === Seq("id", "grp", "v"))
    assert(opt.count() === 2L)
    // the raw `version` SCAN option cannot rewrite the analyzed schema:
    // it must refuse loudly, never null-fill the column epoch 1 lacks
    val e = intercept[Exception](
      spark.read.option("version", "1").table("graft.s6.mv").collect())
    assert(e.getMessage.contains("analyzed"), e.getMessage)
    // a scan-option pin whose epoch schema MATCHES the analyzed one passes
    val ok = spark.read.option("version", "3").table("graft.s6.mv")
    assert(ok.count() === 1L)
  }

  test("SQL writes are refused: epochs only move through the leased publish") {
    publishMv("s5")
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft.s5.nope (id BIGINT) USING parquet"))
    assert(e.getMessage.toLowerCase.contains("read-only"))
    val d = intercept[Exception](spark.sql("DROP TABLE graft.s5.mv"))
    assert(d.getMessage.toLowerCase.contains("read-only"))
  }
}
