package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Catalog over a dataset directory — the Spark-native analog of TiFlink's
 * `TiFlinkCatalog` (reference: flink/src/main/java/org/tikv/flink/TiFlinkCatalog.java:140-199),
 * which lists source tables and exposes their schemas + primary keys to the
 * planner. Here a "database" is a directory of parquet tables; schemas come
 * from parquet footers (TypeUtils.java:50-99 analog is the built-in
 * parquet⇄Catalyst type mapping), and primary keys are registered metadata
 * used by changelog/upsert operators.
 *
 * Scale note: `spark.read.parquet` keeps scans declarative so Catalyst can
 * push filters/prune columns; nothing is cached or collected here.
 */
object Tables {

  /** Table names of the test dataset (TPC-H-ish star schema + changelog + docs). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Primary keys — what TiFlinkCatalog derives from TiTableInfo indices. */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Load one table from a dataset dir. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark 4 refuses outright
    * ([PARQUET_TYPE_ILLEGAL]) unless `spark.sql.legacy.parquet.nanosAsLong`
    * is on — a session-build-time setting ([[graft.GraftSession.builder]]
    * sets it; this reader must not mutate a live session's conf). The nanos
    * long is rebuilt into a µs timestamp with integer division (a double
    * division would lose precision at the 1e18 scale).
    * Truncation-toward-floor matches DuckDB's CAST(ns AS TIMESTAMP). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.builder does)")
    // TIMESTAMP_NTZ matches how Spark 4 reads the other tables' timestamps
    // (parquet isAdjustedToUTC=false → NTZ) and DuckDB's naive timestamps.
    apply(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view (tableEnv.useCatalog analog).
    * `events` goes through its nanos-rebuilding reader so SQL over the
    * catalog sees the same µs `ts` column the operators do. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
