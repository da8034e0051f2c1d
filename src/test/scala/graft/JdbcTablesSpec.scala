package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Tables
import graft.streaming.MaterializedView

/** JDBC schema/PK introspection (TiJDBCHelper analog) against embedded
  * Derby — the engine the Spark distribution already ships; the metadata
  * calls are engine-neutral (same path serves H2/Postgres/MySQL). */
class JdbcTablesSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def setup(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      def ignoreExists(sql: String): Unit =
        try st.execute(sql) catch { case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" => () } // already exists
      ignoreExists("""CREATE TABLE dim_rate (
        nation_key BIGINT NOT NULL, rate DOUBLE,
        PRIMARY KEY (nation_key))""")
      ignoreExists("""CREATE TABLE audit_log (
        region_key BIGINT NOT NULL, seq INT NOT NULL, note VARCHAR(64),
        PRIMARY KEY (region_key, seq))""")
      st.execute("DELETE FROM dim_rate")
      st.execute("DELETE FROM audit_log")
      st.execute("INSERT INTO dim_rate VALUES (0, 1.5), (1, 2.5), (2, 3.5)")
      st.execute("INSERT INTO audit_log VALUES (0, 1, 'a'), (0, 2, 'b')")
      st.close()
    } finally conn.close()
  }

  test("fromJdbc introspects schema and KEY_SEQ-ordered primary keys") {
    setup()
    val t = Tables.fromJdbc(spark, url, "dim_rate")
    assert(t.primaryKey === Seq("NATION_KEY"))
    assert(t.df.columns.toSeq.map(_.toLowerCase) === Seq("nation_key", "rate"))
    assert(t.df.count() === 3)
    // composite key comes back in declaration (KEY_SEQ) order
    val a = Tables.fromJdbc(spark, url, "AUDIT_LOG")
    assert(a.primaryKey === Seq("REGION_KEY", "SEQ"))
    assert(Tables.jdbcTables(url).map(_.toLowerCase)
      .filter(Set("dim_rate", "audit_log")) === Seq("audit_log", "dim_rate"))
  }

  test("metadata lookup escapes LIKE metacharacters and honors cred options") {
    setup()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE TABLE ABXC (k BIGINT NOT NULL, PRIMARY KEY (k))")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      st.close()
    } finally conn.close()
    // 'ab_c' does not exist; unescaped it would pattern-match ABXC and
    // then fail later on the data read — it must fail HERE, loudly
    val e = intercept[IllegalArgumentException] {
      Tables.fromJdbc(spark, url, "ab_c")
    }
    assert(e.getMessage.contains("not found"))
    // user/password in options ride the metadata connection as Properties
    // (embedded Derby accepts any credentials; the point is the code path)
    val t = Tables.fromJdbc(spark, url, "dim_rate",
      Map("user" -> "APP", "password" -> "pw"))
    assert(t.primaryKey === Seq("NATION_KEY"))
    assert(Tables.jdbcTables(url, Map("user" -> "APP", "password" -> "pw"))
      .map(_.toLowerCase).contains("dim_rate"))
  }

  test("a registered JDBC table joins the parquet catalog in SQL") {
    setup()
    val pks = Tables.registerJdbc(spark, url, Seq("dim_rate"))
    assert(pks === Map("dim_rate" -> Seq("NATION_KEY")))
    Tables.registerAll(spark, sf)
    val got = spark.sql(
      """SELECT n.n_name, d.rate FROM nation n
        |JOIN dim_rate d ON n.n_nationkey = d.NATION_KEY
        |ORDER BY n.n_nationkey""".stripMargin)
      .as[(String, Double)].collect()
    assert(got.length === 3)
    assert(got.map(_._2).toSeq === Seq(1.5, 2.5, 3.5))
  }

  test("an MV built over the introspected table converges") {
    setup()
    val dim = Tables.fromJdbc(spark, url, "dim_rate")
    val pk = dim.primaryKey
    assert(pk === Seq("NATION_KEY"))
    val input = MemoryStream[(Long, Long, Double)]
    val source = input.toDF().toDF("nation_key", "version", "amount")
    val base = Files.createTempDirectory("jdbcmv").toString
    val mv = MaterializedView.newBuilder()
      .setSource(source)
      // join the stream against the live-database dimension, keyed by the
      // INTROSPECTED primary key — nothing hand-declared
      .setQuery(df => df.join(dim.df,
        df("nation_key") === dim.df(pk.head))
        .select(df("nation_key"), df("version"),
          (df("amount") * dim.df("RATE")).as("scaled")))
      .setTargetPath(s"$base/target")
      .setPrimaryKeys("nation_key")
      .setVersionColumn("version")
      .setCheckpointLocation(s"$base/ckpt")
      .build()
    val q = mv.start()
    try {
      input.addData((0L, 1L, 10.0), (1L, 1L, 10.0), (0L, 2L, 20.0))
      q.processAllAvailable()
      val state = spark.read.parquet(s"$base/target")
        .select("nation_key", "version", "scaled")
        .as[(Long, Long, Double)].collect().toSet
      assert(state === Set((0L, 2L, 30.0), (1L, 1L, 25.0)))
    } finally q.stop()
  }

  test("fromJdbcSplit range-splits the snapshot read on the PK") {
    // the TableKeyRangeUtils analog: N stride predicates over the key
    // interval, each partition its own connection
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      def ignoreExists(sql: String): Unit =
        try st.execute(sql) catch { case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" => () } // already exists
      ignoreExists("CREATE TABLE split_tbl (id BIGINT NOT NULL, v DOUBLE, " +
        "PRIMARY KEY (id))")
      st.execute("DELETE FROM split_tbl")
      val ps = c.prepareStatement("INSERT INTO split_tbl VALUES (?, ?)")
      (1L to 97L).foreach { i =>
        ps.setLong(1, i); ps.setDouble(2, i * 0.5); ps.addBatch()
      }
      ps.executeBatch(); ps.close(); st.close()
    } finally c.close()

    val t = Tables.fromJdbcSplit(spark, url, "split_tbl", numPartitions = 4)
    assert(t.primaryKey === Seq("ID"))
    assert(t.df.rdd.getNumPartitions === 4, "key space must split 4 ways")
    // splitting is transparent: every row exactly once
    assert(t.df.select("ID").as[Long].collect().sorted.toSeq
      === (1L to 97L))
    // partitions are non-degenerate: more than one holds rows
    val perPart = t.df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 1, s"degenerate split: ${perPart.toSeq}")

    // an empty table degrades to the unsplit read instead of a zero-width
    // range (which would make every stride predicate false)
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      try c2.createStatement().execute(
        "CREATE TABLE split_empty (id BIGINT NOT NULL, PRIMARY KEY (id))")
      catch { case e: java.sql.SQLException
        if e.getSQLState == "X0Y32" => () }
      c2.createStatement().execute("DELETE FROM split_empty")
    } finally c2.close()
    val e = Tables.fromJdbcSplit(spark, url, "split_empty", numPartitions = 4)
    assert(e.df.count() === 0L)

    // a non-numeric key fails loudly, not silently unsplit
    val c3 = java.sql.DriverManager.getConnection(url)
    try c3.createStatement().execute(
      "CREATE TABLE split_str (k VARCHAR(10) NOT NULL, PRIMARY KEY (k))")
    catch { case e: java.sql.SQLException
      if e.getSQLState == "X0Y32" => () }
    finally c3.close()
    val ex = intercept[IllegalArgumentException] {
      Tables.fromJdbcSplit(spark, url, "split_str", numPartitions = 4)
    }
    assert(ex.getMessage.contains("numeric"))
  }
}
