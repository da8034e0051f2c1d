package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * A real-network changefeed transport: an embedded TCP log broker
 * ([[MiniBroker]]) plus a custom DSv2 micro-batch source
 * ([[SocketLogSource]]) that consumes it with OFFSET-BASED replay — the
 * semantics that make Kafka Kafka (append-only partitioned log, consumers
 * own their offsets, any range re-readable), carried over a live socket.
 * The sandbox ships no Kafka jars, so [[KafkaTopic]] stays a plan-level
 * binding; THIS binding closes the remaining seam for real: bytes leave
 * the producer over TCP, the engine checkpoints offsets, and a restarted
 * query resumes exactly where it committed (the behavior being matched is
 * the reference's changefeed consumer, FlinkTikvConsumer.java:108-191,
 * which checkpoints its resolved-ts and re-subscribes from it).
 *
 * Contrast with Spark's built-in `socket` source (which is NOT replayable
 * and documents itself as un-recoverable): here the BROKER retains the
 * log and the source pulls explicit ranges, so offsets in the checkpoint
 * stay meaningful across restarts — exactly-once composes with the same
 * idempotent sinks every other graft stream uses.
 *
 * Wire protocol (UTF-8 lines, one request per connection), with an
 * explicit response header so a dropped connection or broker error can
 * NEVER be mistaken for a valid answer (a masked empty LATEST would
 * regress the stream's offset; a truncated RANGE would silently lose
 * records past an advancing checkpoint):
 *   `LATEST`            → `OK <n>` — the current log length
 *   `RANGE <from> <to>` → `OK <count>` then exactly count record lines
 *   anything else       → `ERR <reason>`
 * The client throws on a missing/ERR header, and on a RANGE response
 * carrying fewer lines than the header promised — Spark then fails the
 * task and retries instead of committing a hole. Records must be
 * newline-free (JSON-line changefeed events are).
 *
 * Scale posture: ranges split into fixed-size partition chunks so a large
 * backlog fans out across executors; each reader pulls only its own
 * chunk. A production deployment would point the same decoders at a real
 * broker ([[KafkaTopic]]) — transport and decode stay orthogonal, this
 * source just proves the seam end-to-end with live bytes.
 */
object SocketLogProtocol {
  /** Records per input partition when a batch spans a large range. */
  val ChunkSize = 1000L

  /** ONE request line on a fresh connection, all response lines back —
    * the wire discipline shared by every graft line protocol (this
    * source and [[graft.streaming.TcpTso]]); connect/read both time out
    * so a dead peer fails the caller loudly (Spark retries the task; the
    * TSO caller aborts its timestamp) instead of hanging it forever. */
  private[graft] def request(host: String, port: Int, line: String,
      timeoutMs: Int = 30000): Seq[String] = {
    val s = new java.net.Socket()
    s.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
    s.setSoTimeout(timeoutMs)
    try {
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      out.write(line); out.write("\n"); out.flush()
      s.shutdownOutput()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
    } finally s.close()
  }

  /** Parse `OK <n>` or die — an EOF/ERR must fail the caller, never
    * default: a masked LATEST would rewind offsets, a masked RANGE
    * would commit a hole. */
  private def okHeader(lines: Seq[String], req: String): Long =
    lines.headOption match {
      case Some(h) if h.startsWith("OK ") => h.stripPrefix("OK ").trim.toLong
      case other => throw new java.io.IOException(
        s"socket-log broker gave no valid response to '$req': " +
          other.getOrElse("<EOF>"))
    }

  def latest(host: String, port: Int): Long = {
    val resp = request(host, port, "LATEST")
    okHeader(resp, "LATEST")
  }

  def range(host: String, port: Int, from: Long, to: Long): Seq[String] =
    if (to <= from) Nil
    else {
      val resp = request(host, port, s"RANGE $from $to")
      val promised = okHeader(resp, s"RANGE $from $to")
      val records = resp.drop(1)
      if (promised != to - from || records.length != promised)
        throw new java.io.IOException(
          s"socket-log RANGE [$from,$to) returned ${records.length} of " +
            s"$promised promised records — refusing a truncated read")
      records
    }
}

/** Embedded append-only log broker on an ephemeral port. Producers call
  * [[append]] in-process; consumers speak [[SocketLogProtocol]] over TCP.
  * The log is retained for the broker's lifetime (the Kafka-retention
  * analog), so restarted consumers can re-read any committed range. */
final class MiniBroker extends AutoCloseable {
  private val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val server = new java.net.ServerSocket(0)
  def port: Int = server.getLocalPort
  def host: String = "localhost"

  def append(records: String*): Unit = records.foreach { r =>
    require(!r.contains("\n"), "records must be newline-free")
    log.add(r)
  }
  def size: Long = log.size.toLong

  private val acceptor = new Thread(() => {
    while (!server.isClosed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock))
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () } // closed during accept
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(s: java.net.Socket): Unit =
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      val req = in.readLine()
      if (req != null) req.trim.split("\\s+").toSeq match {
        case Seq("LATEST") =>
          out.write(s"OK ${log.size}\n")
        case Seq("RANGE", from, to) =>
          var i = from.toLong
          val hi = math.min(to.toLong, log.size.toLong)
          out.write(s"OK ${math.max(0L, hi - i)}\n")
          while (i < hi) { out.write(log.get(i.toInt)); out.write("\n"); i += 1 }
        case _ => out.write("ERR bad request\n")
      }
      out.flush()
    } catch { case _: Exception => () } // client went away
    finally s.close()

  def close(): Unit = server.close()
}

/** DSv2 provider: `spark.readStream.format(classOf[SocketLogSource]
  * .getName).option("host", …).option("port", …)`. One string `value`
  * column — the decoders' contract. */
class SocketLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SocketLogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SocketLogTable(properties.get("host"),
      Integer.parseInt(properties.get("port")))
}

object SocketLogSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] class SocketLogTable(host: String, port: Int)
    extends Table with SupportsRead {
  override def name(): String = s"socket-log://$host:$port"
  override def schema(): StructType = SocketLogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SocketLogSource.Schema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new SocketLogStream(host, port)
      }
    }
}

/** Engine-checkpointed offset = log position (records consumed so far). */
private[sources] case class LogOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class SocketLogStream(host: String, port: Int)
    extends MicroBatchStream {
  override def initialOffset(): Offset = LogOffset(0L)
  override def deserializeOffset(json: String): Offset =
    LogOffset(json.trim.toLong)
  override def latestOffset(): Offset =
    LogOffset(SocketLogProtocol.latest(host, port))
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].n
    val e = end.asInstanceOf[LogOffset].n
    // chunk the range so a large backlog fans out across executors
    Iterator.iterate(s)(_ + SocketLogProtocol.ChunkSize)
      .takeWhile(_ < e)
      .map(lo => SocketLogPartition(host, port, lo,
        math.min(lo + SocketLogProtocol.ChunkSize, e)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SocketLogReaderFactory
  override def commit(end: Offset): Unit = () // broker-retained; no ack
  override def stop(): Unit = ()
}

private[sources] case class SocketLogPartition(host: String, port: Int,
    from: Long, to: Long) extends InputPartition

private[sources] class SocketLogReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SocketLogPartition]
    new PartitionReader[InternalRow] {
      private val lines =
        SocketLogProtocol.range(p.host, p.port, p.from, p.to).iterator
      private var cur: String = _
      override def next(): Boolean =
        if (lines.hasNext) { cur = lines.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(cur)))
      override def close(): Unit = ()
    }
  }
}

