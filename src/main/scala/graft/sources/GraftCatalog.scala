package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.SnapshotStore

/**
 * Spark SQL-native addressing for snapshot stores — the DataSource-V2
 * `CatalogPlugin` analog of TiFlink's connector registration
 * (reference: flink/src/main/java/org/tikv/flink/TikvDynamicTableFactory.java:26-59
 * registers a factory so plain SQL DDL reaches the engine, and
 * TiFlinkCatalog.java:140-199 lists/loads tables from the live store).
 *
 * Wire-up (one session conf, no DDL):
 * {{{
 *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
 *   spark.sql.catalog.graft.path = /data/graft          // catalog root
 * }}}
 * after which `SELECT * FROM graft.store.mv` reads the COMMITTED epoch of
 * the [[SnapshotStore]] at `/data/graft/store/mv`, and
 * `SELECT * FROM graft.store.mv VERSION AS OF 3` (or
 * `spark.read.option("version", "3").table("graft.store.mv")`) pins an
 * older epoch — TiFlink's "stale snapshot isolation" surfaced through
 * standard SQL time travel.
 *
 * Read path: the identifier resolves to the epoch's immutable `_v=` parquet
 * directory and delegates scanning to Spark's own parquet `FileTable`, so
 * filter pushdown, column pruning, and vectorized reads all apply untouched
 * — the catalog adds name resolution + MVCC pinning, not a scan engine.
 * The epoch is resolved per SCAN, not per table-load, so a cached table
 * handle follows the pointer while any one query reads a single consistent
 * epoch (directories are immutable; only the pointer moves).
 *
 * Writes: SQL `INSERT INTO` / `INSERT OVERWRITE` on store tables go
 * THROUGH the leased epoch publish (see [[GraftSnapshotTable.newWriteBuilder]]
 * — the TikvDynamicSink analog), so SQL writers and streaming sinks
 * serialize on the same lock and readers keep full snapshot isolation. DDL
 * (`CREATE`/`DROP`/`ALTER`) stays refused: table lifecycle belongs to the
 * publish path and retention, not the SQL layer.
 *
 * Raw datasets: one more session conf,
 * {{{
 *   spark.sql.catalog.graft.dataPath = /data/sf100   // Tables.discover dir
 * }}}
 * mounts the discovered `*.parquet` tables of that directory under the
 * reserved `data` namespace — `SELECT * FROM graft.data.lineitem` with no
 * `registerAll` temp views, joinable to store MVs in one statement. This is
 * the TiFlinkCatalog behavior for SOURCE tables (TiFlinkCatalog.java:140-199
 * lists/loads from the live store) unified with the MV addressing path.
 * Discovery is live per lookup; schemas come from parquet footers; raw
 * tables have no epochs, so time travel over `data` is refused. When
 * `dataPath` is set, the `data` namespace shadows any store subdirectory of
 * the catalog root with that name.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var dataPath: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      s"GraftCatalog '$name' needs spark.sql.catalog.$name.path=<catalog root dir>"))
    dataPath = Option(options.get("dataPath"))
  }

  private val DataNs = "data"
  private def isDataNs(ns: Array[String]): Boolean =
    dataPath.isDefined && ns.length == 1 && ns.head == DataNs

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirOf(parts: Seq[String]): Path =
    parts.foldLeft(new Path(root))((p, n) => new Path(p, n))

  private def storePath(ident: Identifier): String =
    dirOf(ident.namespace.toIndexedSeq :+ ident.name).toString

  /** A directory is a store iff it has at least one committed `_v=` epoch. */
  private def isStore(p: Path): Boolean =
    try fs.listStatus(p).exists(_.getPath.getName.startsWith("_v="))
    catch { case _: java.io.IOException => false }

  private def childDirs(p: Path): Seq[Path] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
      .filterNot(_.getName.startsWith("_"))

  // ---- TableCatalog ------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (isDataNs(namespace))
      Tables.discover(spark, dataPath.get)
        .map(n => Identifier.of(namespace, n)).toArray
    else childDirs(dirOf(namespace.toIndexedSeq)).filter(isStore)
      .map(p => Identifier.of(namespace, p.getName)).toArray

  override def tableExists(ident: Identifier): Boolean =
    if (isDataNs(ident.namespace))
      Tables.discover(spark, dataPath.get).contains(ident.name)
    else isStore(new Path(storePath(ident)))

  override def loadTable(ident: Identifier): Table =
    if (isDataNs(ident.namespace)) loadData(ident)
    else loadPinned(ident, None)

  /** SQL `VERSION AS OF v` — pin one committed epoch. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (isDataNs(ident.namespace))
      throw new UnsupportedOperationException(
        s"raw dataset table ${ident.name} has no epochs: time travel applies " +
          "to snapshot stores only")
    else loadPinned(ident, Some(version.toLong))

  private def loadData(ident: Identifier): Table = {
    if (!Tables.discover(spark, dataPath.get).contains(ident.name))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (catalogName +: ident.namespace.toIndexedSeq) :+ ident.name)
    new GraftDataTable(ident.toString,
      s"${dataPath.get}/${ident.name}.parquet")
  }

  private def loadPinned(ident: Identifier, pinned: Option[Long]): Table = {
    val base = storePath(ident)
    val s = spark
    if (SnapshotStore.versions(s, base).isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (catalogName +: ident.namespace.toIndexedSeq) :+ ident.name)
    pinned.foreach { v =>
      require(SnapshotStore.versions(s, base).contains(v),
        s"no committed epoch $v at $base (have: " +
          s"${SnapshotStore.versions(s, base).sorted.mkString(", ")})")
    }
    new GraftSnapshotTable(ident.toString, base, pinned)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-only: publish epochs through SnapshotStore's " +
        "leased write path, not SQL DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("GraftCatalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-only: retention (keep=N) prunes old epochs")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("GraftCatalog is read-only")

  // ---- SupportsNamespaces ------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val stores = childDirs(new Path(root)).filterNot(isStore)
      .map(p => Array(p.getName))
    (if (dataPath.isDefined) Array(DataNs) +: stores.filterNot(_.head == DataNs)
     else stores).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    childDirs(dirOf(namespace.toIndexedSeq)).filterNot(isStore)
      .map(p => namespace :+ p.getName).toArray

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || isDataNs(namespace) ||
      fs.exists(dirOf(namespace.toIndexedSeq))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toIndexedSeq)
    val loc =
      if (isDataNs(namespace)) dataPath.get
      else dirOf(namespace.toIndexedSeq).toString
    Map("location" -> loc).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (isDataNs(namespace))
      throw new UnsupportedOperationException(
        s"'$DataNs' is the reserved raw-dataset namespace (dataPath=" +
          s"${dataPath.get}); it cannot be created as a store namespace")
    fs.mkdirs(dirOf(namespace.toIndexedSeq))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("GraftCatalog namespaces are plain dirs")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-only: remove store directories out of band")
}

/**
 * One raw parquet dataset table surfaced read-only through the `data`
 * namespace: schema from the footers, scanning delegated to Spark's own
 * parquet `FileTable` (pushdown/pruning/vectorization untouched, exactly
 * like the store tables). No epochs, no version options.
 */
private[sources] final class GraftDataTable(ident: String, file: String)
  extends Table with SupportsRead {

  private def spark = SparkSession.active

  override def name(): String = ident

  override def schema(): StructType = spark.read.parquet(file).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      ident, spark, options, Seq(file), Some(schema()),
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      .newScanBuilder(options)
}

/**
 * One snapshot store surfaced as a DSv2 table. The scan delegates to
 * Spark's parquet `FileTable` over the RESOLVED epoch's `_v=` directory —
 * immutable for the lifetime of the scan, so a long query is isolated from
 * concurrent publishes (the MVCC read contract,
 * reference README "stale snapshot isolation").
 *
 * Version resolution order: `version` read option > `VERSION AS OF` pin >
 * the `_LATEST` pointer at scan-build time.
 *
 * Schema/scan consistency: `VERSION AS OF v` and the standard `versionAsOf`
 * read option resolve through [[GraftCatalog.loadTable(ident,version)]]
 * (Spark's `TimeTravelSpec`), so the ANALYZED schema is the pinned epoch's —
 * schema evolution is fully safe on those paths. The raw `version` scan
 * option reaches only `newScanBuilder` (analysis has already fixed the
 * schema from the un-pinned table), so if the requested epoch's schema
 * differs from the analyzed one the scan REFUSES loudly instead of
 * null-filling/truncating columns the old files never had.
 */
private[sources] final class GraftSnapshotTable(
    ident: String, basePath: String, pinned: Option[Long])
  extends Table with SupportsRead with SupportsWrite {

  private def spark = SparkSession.active

  private def resolve(version: Option[Long]): String = {
    val v = version.orElse(pinned).orElse(SnapshotStore.latestVersion(spark, basePath))
      .getOrElse(throw new IllegalStateException(s"no committed snapshot at $basePath"))
    new Path(basePath, s"_v=$v").toString
  }

  override def name(): String = ident

  override def schema(): StructType =
    spark.read.parquet(resolve(None)).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` — the TikvDynamicSink analog
    * (reference: TikvDynamicSink.java accepts SQL inserts into the store):
    * both go through the LEASED epoch publish, never around it. `INSERT
    * INTO` appends to the current snapshot (the prior epoch is resolved
    * under the lease — a racing writer's epoch can't be dropped from the
    * union basis); `INSERT OVERWRITE` replaces the snapshot wholesale.
    * Keyed upserts stay the streaming path ([[SnapshotStore.upsertSink]])
    * — SQL INSERT has row-append semantics, not merge-by-pk. Implemented
    * as a DSv2 `V1Write`: the epoch directory layout is the store's own,
    * so the write is one `publishNext` call, not a DataWriterFactory. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
              require(pinned.isEmpty,
                s"cannot INSERT into a VERSION AS OF pinned read of $ident")
              SnapshotStore.publishNext(data.sparkSession, basePath) { cur =>
                if (overwrite) data
                else {
                  val prior = cur.map(v =>
                    SnapshotStore.readSnapshot(data.sparkSession, basePath, Some(v)))
                  prior.map(_.unionByName(data)).getOrElse(data)
                }
              }
              ()
            }
        }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val dir = resolve(Option(options.get("version")).map(_.toLong))
    // the scan plans with the schema of the SAME directory it reads; if
    // analysis fixed a different epoch's schema (possible only via the raw
    // `version` scan option after evolution), refuse loudly — never
    // null-fill columns the pinned files don't carry
    val scanSchema = spark.read.parquet(dir).schema
    val analyzed = schema()
    require(scanSchema == analyzed,
      s"epoch at $dir has schema ${scanSchema.simpleString} but the query " +
        s"was analyzed with ${analyzed.simpleString}; pin the epoch at " +
        "ANALYSIS time instead: SQL `VERSION AS OF v` or " +
        ".option(\"versionAsOf\", v).table(...)")
    // Spark's own parquet table does the scanning: pushdown, pruning, and
    // vectorization come from the engine, not from this catalog.
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      ident, spark, options, Seq(dir), Some(scanSchema),
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      .newScanBuilder(options)
  }
}
