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

  /** Table names of the built-in test dataset (TPC-H-ish star schema +
    * changelog + docs). Kept as the schema-known fallback; any OTHER
    * dataset directory is served by [[discover]], which lists what is
    * actually on disk — the `TiFlinkCatalog.listTables` behavior
    * (TiFlinkCatalog.java:140-152 lists from the live store, not a
    * compiled-in enum). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Primary keys of the built-in tables — what TiFlinkCatalog derives from
    * TiTableInfo indices. For foreign datasets, [[primaryKeysIn]] reads the
    * optional `_graft_meta.json` instead. */
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

  /** Optional per-dataset metadata file name. Shape:
    * `{"primaryKeys": {"my_table": ["id"], ...}}` — the role
    * `TiTableInfo`'s index metadata plays for TiFlinkCatalog.getTable
    * (TiFlinkCatalog.java:154-199): schemas come from parquet footers,
    * keys from this sidecar. */
  val MetaFile = "_graft_meta.json"

  /** List the tables of a dataset directory: every `<name>.parquet` file or
    * directory directly under `dir`, sorted. Listing is live (one FS
    * listStatus — no caching, no compiled-in name set), so dropping a new
    * parquet table into the directory makes it immediately queryable. */
  def discover(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .filterNot(_.startsWith("_"))
      .sorted
  }

  /** Primary key of `name` in `dir`: `_graft_meta.json` wins, then the
    * built-in map, then none (a keyless table is still readable — only the
    * changelog/upsert operators need keys, and they take them explicitly). */
  def primaryKeysIn(spark: SparkSession, dir: String, name: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fromMeta: Option[Seq[String]] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        (JsonMethods.parse(text) \ "primaryKeys" \ name) match {
          case JArray(vs) => Some(vs.collect { case JString(s) => s })
          case _ => None
        }
      }
    fromMeta.orElse(primaryKeys.get(name)).getOrElse(Seq.empty)
  }

  /** Schema cache keyed by (path, length, modification time): parquet
    * schema INFERENCE runs a Spark job per `spark.read.parquet` call, and
    * a 320-query board re-reading a handful of static tables pays that
    * job (~50-70 ms of pure scheduling latency) thousands of times. A
    * production deployment gets this from the catalog/metastore; here the
    * (len, mtime) key re-infers the moment a file is rewritten (specs
    * rewrite synthetic tables in place), so only METADATA is cached —
    * never rows, never plans. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      org.apache.spark.sql.types.StructType]()

  /** Load one table from a dataset dir — any discovered table, not just the
    * built-ins. Unknown names fail with the live table listing. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir, s"$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"unknown table: $name (tables in $dir: ${discover(spark, dir).mkString(", ")})")
    val st = fs.getFileStatus(p)
    val schema = schemaCache.computeIfAbsent(
      (p.toString, st.getLen, st.getModificationTime),
      _ => spark.read.parquet(s"$dir/$name.parquet").schema)
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** `ts` is normalized to TIMESTAMP_NTZ whatever physical type the dataset
    * generation used, so every downstream operator (and the DuckDB oracle,
    * whose timestamps are naive) sees one µs-precision naive-timestamp
    * column:
    *   - TIMESTAMP(MICROS), isAdjustedToUTC=false → read as NTZ, pass-through;
    *   - legacy TIMESTAMP(NANOS) datasets → Spark 4 refuses the type outright
    *     ([PARQUET_TYPE_ILLEGAL]) unless `spark.sql.legacy.parquet.nanosAsLong`
    *     is on (a session-build-time setting; [[graft.GraftSession.builder]]
    *     sets it — this reader must not mutate a live session's conf), and the
    *     nanos long is rebuilt into µs with integer division (a double
    *     division would lose precision at the 1e18 scale;
    *     truncation-toward-floor matches DuckDB's CAST(ns AS TIMESTAMP)). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case TimestampNTZType => raw
      case LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case other =>
        // fail loudly: a silent cast would route e.g. UTC-adjusted
        // TimestampType through the session timezone and shift every ts
        // relative to the oracle's naive read with no error
        throw new IllegalArgumentException(
          s"events.ts has unsupported physical type $other — expected " +
            "TIMESTAMP_NTZ (µs, isAdjustedToUTC=false) or legacy " +
            "TIMESTAMP(NANOS)-as-long")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** One introspected JDBC table: its Spark frame (the built-in `jdbc`
    * relation — filters push down to the database as WHERE clauses) plus
    * the primary key read from `DatabaseMetaData`, KEY_SEQ-ordered. */
  final case class JdbcTable(name: String, primaryKey: Seq[String], df: DataFrame)

  /** Introspect one table of a live database over JDBC: schema via the
    * Spark `jdbc` source, primary key via `DatabaseMetaData.getPrimaryKeys`
    * — the "point me at an existing database" bootstrap the reference does
    * against TiDB (TiJDBCHelper.java:76-130 reads `getPrimaryKeys` /
    * `getColumns` from the information schema; here the JDBC metadata API
    * is the engine-neutral equivalent, so the same call serves Derby, H2,
    * Postgres, MySQL…). Unquoted identifiers are case-normalized by each
    * engine (Derby/H2 upper-case them), so the metadata lookup tries the
    * given, upper- and lower-cased spellings and uses whichever the
    * database knows. A table with no declared key yields `Seq.empty` —
    * readable, but the changelog/upsert operators will demand explicit
    * keys, same contract as [[primaryKeysIn]].
    *
    * Scale: introspection is a handful of driver-side metadata calls; the
    * data path stays declarative (`spark.read.jdbc` partitions via the
    * usual partitionColumn options passed through `options`). */
  def fromJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): JdbcTable = {
    val conn = jdbcConnect(url, options)
    val (resolved, pk) =
      try {
        val md = conn.getMetaData
        def tableExists(n: String): Boolean = {
          // getTables treats the name as a LIKE pattern — escape '_'/'%'
          // where the driver supports it, and ALWAYS verify the returned
          // TABLE_NAME exactly: some drivers (Derby) declare no escape
          // string at all, so 'a_b' would otherwise resolve via a
          // pattern match on a different table
          val rs = md.getTables(null, null, escapeJdbcPattern(md, n), null)
          try Iterator.continually(rs).takeWhile(_.next())
            .exists(_.getString("TABLE_NAME") == n)
          finally rs.close()
        }
        val name = Seq(table, table.toUpperCase, table.toLowerCase)
          .distinct.find(tableExists).getOrElse(throw new IllegalArgumentException(
            s"table '$table' not found via JDBC metadata at $url"))
        val rs = md.getPrimaryKeys(null, null, name)
        val cols = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (r.getShort("KEY_SEQ"), r.getString("COLUMN_NAME")))
          .toSeq
        rs.close()
        (name, cols.sortBy(_._1).map(_._2))
      } finally conn.close()
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", resolved)
      .options(options).load()
    JdbcTable(resolved, pk, df)
  }

  /** [[fromJdbc]] with the table's key space AUTO-split into
    * `numPartitions` ranges on its primary key — the
    * TableKeyRangeUtils.getTableKeyRanges analog
    * (TableKeyRangeUtils.java:17-42: the reference divides a table's row-
    * key interval into `num` equal ranges so parallel sources each scan
    * one). Here the split column is the first primary-key column (must be
    * numeric — range-splitting needs an ordered key, same as the
    * reference's long row keys; anything else fails loudly), its bounds
    * come from one `MIN/MAX` probe, and Spark's JDBC source turns the
    * bounds into `numPartitions` stride predicates — each executor opens
    * its own connection for its slice.
    *
    * An empty table (or one with a single key value) degrades to the
    * unsplit read — a zero-width range would make every stride predicate
    * false and silently drop rows in some dialects. */
  def fromJdbcSplit(spark: SparkSession, url: String, table: String,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): JdbcTable = {
    require(numPartitions > 0, s"numPartitions must be > 0: $numPartitions")
    val probe = fromJdbc(spark, url, table, options)
    require(probe.primaryKey.nonEmpty,
      s"table '${probe.name}' has no primary key — range split needs one")
    val splitCol = probe.primaryKey.head
    val dt = probe.df.schema(probe.df.schema.fieldIndex(splitCol)).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"primary-key column '$splitCol' of '${probe.name}' is $dt — range " +
        "split needs a numeric key (the reference splits long row keys)")
    val conn = jdbcConnect(url, options)
    val bounds =
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            s"SELECT MIN($splitCol), MAX($splitCol) FROM ${probe.name}")
          try {
            rs.next()
            val lo = rs.getLong(1); val loNull = rs.wasNull()
            val hi = rs.getLong(2); val hiNull = rs.wasNull()
            if (loNull || hiNull || lo == hi) None else Some((lo, hi))
          } finally rs.close()
        } finally st.close()
      } finally conn.close()
    bounds match {
      case None => probe // empty / single-key table: unsplit read
      case Some((lo, hi)) =>
        // caller options first: the PROBED split and the explicit
        // numPartitions argument must win over any stale partitioning
        // keys riding in from a fromJdbc call site
        val df = spark.read.format("jdbc")
          .options(options)
          .option("url", url).option("dbtable", probe.name)
          .option("partitionColumn", splitCol)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .option("numPartitions", numPartitions.toString)
          .load()
        JdbcTable(probe.name, probe.primaryKey, df)
    }
  }

  /** Metadata connection honoring the standard Spark-JDBC `user` /
    * `password` options — a bare `getConnection(url)` would authenticate
    * the DATA read but fail the schema/PK introspection against any
    * credentialed database (creds would have to ride the URL). */
  private def jdbcConnect(url: String,
      options: Map[String, String]): java.sql.Connection = {
    val props = new java.util.Properties()
    options.get("user").foreach(props.setProperty("user", _))
    options.get("password").foreach(props.setProperty("password", _))
    java.sql.DriverManager.getConnection(url, props)
  }

  /** Escape LIKE metacharacters (`_`, `%`, and the escape itself) for the
    * `DatabaseMetaData` pattern arguments, using the driver's own escape
    * string. `getPrimaryKeys` takes a literal name — no escaping there. */
  private def escapeJdbcPattern(md: java.sql.DatabaseMetaData,
      name: String): String = {
    val esc = md.getSearchStringEscape
    if (esc == null || esc.isEmpty) name
    else name.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
  }

  /** Every user table the database reports via `getTables(TABLE)` —
    * `TiFlinkCatalog.listTables` against a JDBC endpoint instead of a
    * dataset directory. */
  def jdbcTables(url: String,
      options: Map[String, String] = Map.empty): Seq[String] = {
    val conn = jdbcConnect(url, options)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      try Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME")).toSeq.sorted
      finally rs.close()
    } finally conn.close()
  }

  /** Register every (or the named) JDBC table as a temp view and return
    * each table's introspected primary key — the JDBC twin of
    * [[registerAll]]: after this, SQL joins the live database against the
    * parquet catalog, and the returned keys feed the MV/upsert builders. */
  def registerJdbc(spark: SparkSession, url: String,
      tables: Seq[String] = Seq.empty,
      options: Map[String, String] = Map.empty): Map[String, Seq[String]] = {
    val names = if (tables.nonEmpty) tables else jdbcTables(url, options)
    names.map { n =>
      val t = fromJdbc(spark, url, n, options)
      t.df.createOrReplaceTempView(t.name.toLowerCase)
      t.name.toLowerCase -> t.primaryKey
    }.toMap
  }

  /** Register every DISCOVERED table as a temp view (tableEnv.useCatalog
    * analog) — live directory listing, so a dataset dir with extra or
    * missing tables registers exactly what exists. `events` goes through
    * its nanos-rebuilding reader so SQL over the catalog sees the same µs
    * `ts` column the operators do. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    discover(spark, dir).foreach { n =>
      val raw = apply(spark, dir, n)
      // nanos signature check, not just the name: a foreign dataset's own
      // `events` table must not be put through the ns→µs rebuild
      val df =
        if (n == "events" && raw.schema.exists(f =>
            f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
          events(spark, dir)
        else raw
      df.createOrReplaceTempView(n)
    }
}
