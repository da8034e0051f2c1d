package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.sources.{Debezium, SocketLog}
import graft.streaming.{ChangelogOps, JdbcUpsertSink, MaterializedView, TcpTso}

/** One DRIVER of the two-driver deployment scenario
  * ([[TwoDriverDeploySpec]]): a separate JVM that reaches every shared
  * service over TCP — the changefeed from the host's broker, timestamps
  * from the host's [[graft.streaming.TsoServer]] — and owns only its two
  * private ends: its JDBC database (embedded Derby under its own
  * directory) and its own streaming checkpoint. No shared filesystem
  * anywhere in the running topology — the reference's deployment shape
  * (coordinator service + independent jobs over the network).
  *
  * args: name brokerHost brokerPort tsoHost tsoPort derbyDir ckptDir
  * crashMid2pc tsoToken ("" = no auth). The token rides the deployment
  * option map ([[graft.GraftOptions]] `graft.tso.auth.token`) — the
  * submit-time parse point — and reaches the wire via [[TcpTso]].
  *
  * Per applied batch the driver runs the coordinator choreography:
  * begin → JDBC-fenced apply → commit. With `crashMid2pc=true` it halts
  * the whole JVM BETWEEN the apply and the coordinator commit on its
  * first non-empty batch (exit [[DeployDriverMain.CrashExit]]) — the
  * streaming checkpoint is then uncommitted and the allocation orphaned:
  * the worst-placed crash, which the spec proves recoverable exactly
  * once. A record with pk = [[DeployDriverMain.StopPk]] is the shutdown
  * sentinel (excluded from the materialized rows).
  */
object DeployDriverMain {
  val StopPk = 999999L
  val CrashExit = 7

  private val rowSchema = StructType(Seq(
    StructField("pk", LongType), StructField("grp", StringType),
    StructField("value", DoubleType)))

  def main(args: Array[String]): Unit = {
    val Array(name, bHost, bPort, tHost, tPort, derbyDir, ckpt, crash,
      tsoToken) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-deploy-$name")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val url = s"jdbc:derby:$derbyDir;create=true"
    // the deployment option map is the submit-time parse/validate point
    // for the coordinator secret — the path a templated job takes
    val opts = GraftOptions.fromMap(
      if (tsoToken.isEmpty) Map.empty
      else Map(GraftOptions.TsoAuthToken -> tsoToken))
    val tso = TcpTso(tHost, tPort.toInt, authToken = opts.tsoAuthToken)
    val sink = JdbcUpsertSink(url, "live_rows", Seq("pk"),
      deleteCol = Some("deleted"))
    val crashMid2pc = crash.toBoolean
    @volatile var sawStop = false

    val q = MaterializedView.newBuilder()
      .setSource(SocketLog(bHost, bPort.toInt).debezium(spark, rowSchema))
      .setQuery(df =>
        ChangelogOps.latestByKey(df, Seq("pk"), "version")
          .withColumn("deleted", col("op") === Debezium.Delete)
          .drop("op"))
      .setPrimaryKeys("pk")
      .setVersionColumn("version")
      .setSink((df, id) => {
        // three actions read this batch (stop probe, count, sink stage):
        // cache it so the broker range is fetched over TCP once, not 3×
        df.persist()
        try {
        if (df.filter(col("pk") === StopPk).limit(1).count() > 0)
          sawStop = true
        val data = df.filter(col("pk") =!= StopPk)
        val n = data.count()
        // the coordinator choreography: the fenced JDBC apply is stamped
        // by a network-issued timestamp — begin, apply, commit
        val ts = tso.begin()
        try {
          sink(data, id)
          if (crashMid2pc && n > 0) {
            // die at the worst point: data + fence row are durable in
            // Derby, the checkpoint has NOT committed this batch, and
            // the coordinator allocation is orphaned (lease will abort)
            println(s"CRASHING $name $id"); Console.out.flush()
            Runtime.getRuntime.halt(CrashExit)
          }
          tso.commit(ts)
        } catch {
          case e: Throwable =>
            try tso.abort(ts)
            catch { case scala.util.control.NonFatal(_) => () }
            throw e
        }
        println(s"APPLIED $name $id $n"); Console.out.flush()
        } finally df.unpersist()
      })
      .setCheckpointLocation(ckpt)
      .build().start()

    println(s"READY $name"); Console.out.flush()
    while (!sawStop && q.isActive) Thread.sleep(200)
    q.processAllAvailable() // drain whatever arrived with the sentinel
    q.stop()
    spark.stop()
    println(s"DONE $name"); Console.out.flush()
    sys.exit(0)
  }
}
