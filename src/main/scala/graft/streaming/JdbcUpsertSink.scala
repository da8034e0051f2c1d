package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Exactly-once JDBC upsert sink — the write-back half of the reference's
 * loop (TiFlink's whole point is maintaining a view INSIDE the database:
 * its sink 2PC-commits rows to TiKV at coordinator timestamps,
 * TiFlinkApp.java / Transaction.java via GrpcService.java). graft's
 * upsert sinks so far target bucketed parquet; this one lands the same
 * changelog semantics in any JDBC database, exactly once, without
 * requiring XA:
 *
 *   1. executors append the batch's rows to a STAGING table
 *      (`<table>_GSTG`, keyed by batch id) over per-partition
 *      connections — parallel, append-only, idempotent because a replay
 *      first clears its own batch id;
 *   2. the driver then runs ONE local transaction: insert the batch id
 *      into the FENCE table (`<table>_GFENCE`, primary-keyed — a replayed
 *      batch hits the duplicate key and skips), `MERGE` the staged rows
 *      into the target (update / insert, and delete when the optional
 *      delete-marker column is true), clear the staging rows, commit.
 *
 * Every crash window replays cleanly: before the driver commit, nothing
 * fenced — the replay clears its staging leftovers and redoes the work;
 * after it, the fence skips the whole batch. The one-transaction driver
 * step is the miniature of the reference's 2PC decide-then-apply: the
 * fence row IS the commit record, and data + commit record land
 * atomically because they share the transaction.
 *
 * Latest-wins is the CALLER's contract (as with [[UpsertSink]]): at most
 * one row per key per batch — MV pipelines reduce per key before the
 * sink; a violation is detected in the driver transaction and fails the
 * batch loudly (Derby's MERGE would otherwise be free to apply either).
 *
 * Scale: staging writes are per-partition (no driver collect); the MERGE
 * is one set-based statement inside the database. Identifiers are
 * validated (no quoting games); types map from the DataFrame schema.
 */
object JdbcUpsertSink {

  private val Ident = "^[A-Za-z][A-Za-z0-9_]*$".r

  private def checkIdent(s: String): String = s match {
    case Ident() => s.toUpperCase
    case _ => throw new IllegalArgumentException(
      s"'$s' is not a plain SQL identifier")
  }

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(4000)"
    case _: TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"unsupported JDBC sink type $other")
  }

  /** Open a connection honoring `user`/`password` options (the same
    * contract as `Tables.jdbcConnect`) — a bare `getConnection(url)`
    * would force credentials to ride the URL string against any
    * credentialed database. Other option keys are passed through as
    * driver properties. */
  private def withConn[A](url: String, options: Map[String, String])(
      f: Connection => A): A = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name, null)
    try {
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME") == name // exact, never a pattern
      found
    } finally rs.close()
  }

  /** Create target/staging/fence if absent (idempotent). */
  private def ensureTables(url: String, options: Map[String, String],
      table: String, schema: StructType,
      keyCols: Seq[String]): Unit = withConn(url, options) { c =>
    val cols = schema.fields
      .map(f => s"${checkIdent(f.name)} ${sqlType(f.dataType)}")
    val st = c.createStatement()
    try {
      if (!tableExists(c, table))
        st.execute(s"CREATE TABLE $table (${cols.mkString(", ")}, " +
          s"PRIMARY KEY (${keyCols.mkString(", ")}))")
      if (!tableExists(c, s"${table}_GSTG"))
        st.execute(s"CREATE TABLE ${table}_GSTG (${cols.mkString(", ")}, " +
          "GRAFT_BATCH_ID BIGINT NOT NULL)")
      if (!tableExists(c, s"${table}_GFENCE"))
        st.execute(s"CREATE TABLE ${table}_GFENCE (" +
          "BATCH_ID BIGINT NOT NULL, PRIMARY KEY (BATCH_ID))")
    } finally st.close()
  }

  private def fenced(c: Connection, table: String, batchId: Long): Boolean = {
    val ps = c.prepareStatement(
      s"SELECT 1 FROM ${table}_GFENCE WHERE BATCH_ID = ?")
    try { ps.setLong(1, batchId); val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    } finally ps.close()
  }

  /** Stage the batch's rows from the executors (append-only; a replay
    * clears its own batch id first, so partial stages never double). */
  private def stage(df: DataFrame, url: String,
      options: Map[String, String], table: String,
      batchId: Long): Unit = {
    val names = df.schema.fieldNames.map(checkIdent)
    val insert = s"INSERT INTO ${table}_GSTG (${names.mkString(", ")}, " +
      s"GRAFT_BATCH_ID) VALUES (${names.map(_ => "?").mkString(", ")}, ?)"
    val n = names.length
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) withConn(url, options) { c =>
        c.setAutoCommit(false)
        val ps = c.prepareStatement(insert)
        try {
          rows.foreach { r =>
            var i = 0
            while (i < n) { ps.setObject(i + 1, r.get(i)); i += 1 }
            ps.setLong(n + 1, batchId)
            ps.addBatch()
          }
          ps.executeBatch()
          c.commit()
        } finally ps.close()
      }
    }
  }

  /** Reset the sink's exactly-once state for `table`: clear the fence and
    * any staged leftovers. Call this TOGETHER with wiping the stream's
    * checkpoint — batch ids restart there, and a surviving fence would
    * silently skip every replayed batch forever (the frozen-target trap
    * `MaterializedView.setDropIfExists` refuses to walk into). Leaves the
    * target table untouched: drop it too for a from-scratch rebuild. */
  def clearFence(url: String, table: String,
      options: Map[String, String] = Map.empty): Unit = {
    val tbl = checkIdent(table)
    withConn(url, options) { c =>
      // ONE transaction: a crash between the two deletes would leave the
      // fence cleared but foreign batch ids staged, and the restarted
      // stream's purity check would wedge on "two writers on one table?"
      c.setAutoCommit(false)
      val st = c.createStatement()
      try {
        if (tableExists(c, s"${tbl}_GFENCE"))
          st.execute(s"DELETE FROM ${tbl}_GFENCE")
        if (tableExists(c, s"${tbl}_GSTG"))
          st.execute(s"DELETE FROM ${tbl}_GSTG")
        c.commit()
      } catch {
        case e: Throwable => c.rollback(); throw e
      } finally st.close()
    }
  }

  /**
   * Build the `foreachBatch` function. `keyCols` are the upsert identity;
   * `deleteCol` (optional, boolean) marks rows that DELETE their key
   * instead of upserting it — the changelog d-op, applied in the same
   * MERGE. The delete marker is consumed by the sink, not stored.
   */
  def apply(url: String, table: String, keyCols: Seq[String],
      deleteCol: Option[String] = None,
      options: Map[String, String] = Map.empty): (DataFrame, Long) => Unit = {
    val tbl = checkIdent(table)
    val keys = keyCols.map(checkIdent)
    val del = deleteCol.map(checkIdent)
    require(keys.nonEmpty, "keyCols must be non-empty")

    (df: DataFrame, batchId: Long) => {
      val dataCols = df.schema.fieldNames.map(checkIdent).toSeq
      require(keys.forall(dataCols.contains),
        s"key columns $keys must appear in the frame ($dataCols)")
      ensureTables(url, options, tbl, df.schema, keys)
      val applied = withConn(url, options)(c => fenced(c, tbl, batchId))
      if (!applied) {
        // clear this batch's leftovers from a crashed earlier attempt,
        // then stage from the executors
        withConn(url, options) { c =>
          val ps = c.prepareStatement(
            s"DELETE FROM ${tbl}_GSTG WHERE GRAFT_BATCH_ID = ?")
          try { ps.setLong(1, batchId); ps.executeUpdate() }
          finally ps.close()
        }
        stage(df, url, options, tbl, batchId)

        withConn(url, options) { c =>
          c.setAutoCommit(false)
          // the fence row IS the commit record; a racer/replay that
          // already fenced makes the duplicate key abort this attempt
          val fencedNow =
            try {
              val f = c.prepareStatement(
                s"INSERT INTO ${tbl}_GFENCE (BATCH_ID) VALUES (?)")
              try { f.setLong(1, batchId); f.executeUpdate(); true }
              finally f.close()
            } catch {
              case _: java.sql.SQLIntegrityConstraintViolationException =>
                c.rollback(); false
            }
          if (fencedNow) try {
            // Derby's MERGE source must be a base table, so the merge
            // reads the WHOLE staging table — sound because batches are
            // sequential per sink: any row there belongs to this attempt
            // (a crashed prior batch replays before this one runs).
            // Verify that loudly — a foreign batch id in staging means a
            // second writer is targeting this table
            val purity = c.createStatement()
            try {
              val rs = purity.executeQuery(
                s"SELECT DISTINCT GRAFT_BATCH_ID FROM ${tbl}_GSTG")
              try while (rs.next()) {
                val found = rs.getLong(1)
                if (found != batchId) throw new IllegalStateException(
                  s"staging for $tbl holds batch $found while applying " +
                    s"$batchId — two writers on one table?")
              } finally rs.close()
            } finally purity.close()

            // latest-wins is the caller's contract — verify it loudly
            val dup = c.prepareStatement(
              s"SELECT ${keys.mkString(", ")} FROM ${tbl}_GSTG " +
                s"WHERE GRAFT_BATCH_ID = ? " +
                s"GROUP BY ${keys.mkString(", ")} HAVING count(*) > 1")
            try {
              dup.setLong(1, batchId)
              val rs = dup.executeQuery()
              try if (rs.next()) throw new IllegalStateException(
                s"batch $batchId carries multiple rows for key " +
                  keys.map(k => s"$k=${rs.getObject(k)}").mkString(", ") +
                  " — reduce to latest-per-key before the sink")
              finally rs.close()
            } finally dup.close()

            val nonKeys = dataCols.filterNot(keys.contains)
              .filterNot(del.contains)
            val storeCols = dataCols.filterNot(del.contains)
            val onClause = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
            val delMatched = del.map(d =>
              s"WHEN MATCHED AND s.$d THEN DELETE ").getOrElse("")
            val updMatched =
              if (nonKeys.isEmpty) ""
              else "WHEN MATCHED THEN UPDATE SET " +
                nonKeys.map(k => s"$k = s.$k").mkString(", ") + " "
            val insCond = del.map(d =>
          s"AND (s.$d IS NULL OR NOT s.$d) ").getOrElse("")
            val merge =
              s"MERGE INTO $tbl t USING ${tbl}_GSTG s ON ($onClause) " +
                delMatched + updMatched +
                s"WHEN NOT MATCHED $insCond" +
                s"THEN INSERT (${storeCols.mkString(", ")}) " +
                s"VALUES (${storeCols.map(k => s"s.$k").mkString(", ")})"
            val st = c.createStatement()
            try st.executeUpdate(merge) finally st.close()

            val clr = c.prepareStatement(
              s"DELETE FROM ${tbl}_GSTG WHERE GRAFT_BATCH_ID = ?")
            try { clr.setLong(1, batchId); clr.executeUpdate() }
            finally clr.close()

            c.commit()
          } catch {
            case e: Throwable => c.rollback(); throw e
          }
        }
      }
    }
  }
}
