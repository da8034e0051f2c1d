package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.sources.MiniBroker
import graft.streaming.{TcpTso, TsoServer}

/** The reference's literal deployment topology, all seams over the
  * network at once: TWO independent driver processes (separate JVMs, own
  * Spark, own checkpoint, own JDBC database), ONE coordinator
  * ([[graft.streaming.TsoServer]] over TCP), one changefeed broker
  * ([[MiniBroker]] over TCP). No shared filesystem in the running
  * topology — the host touches each driver's Derby directory only
  * POST-MORTEM, after its owning process has exited, the way a judge
  * inspects evidence rather than a participant sharing state.
  *
  * Mid-scenario, driver A is killed at the worst point (fenced JDBC
  * apply durable, streaming checkpoint uncommitted, coordinator
  * allocation orphaned), traffic keeps landing while it is down, and the
  * resumed process must replay the killed batch against the sink's fence
  * — exactly once end to end, with driver B unaffected throughout. */
class TwoDriverDeploySpec extends SparkSpec {

  private def line(op: String, pk: Long, grp: String, value: Double,
      tsMs: Long, pos: Long): String = {
    val img = s"""{"pk":$pk,"grp":"$grp","value":$value}"""
    val src = s"""{"ts_ms":$tsMs,"pos":$pos}"""
    if (op == "d") s"""{"before":$img,"source":$src,"op":"d"}"""
    else s"""{"after":$img,"source":$src,"op":"$op"}"""
  }

  private def derbyState(dir: String): Set[(Long, String, Double)] = {
    val c = DriverManager.getConnection(s"jdbc:derby:$dir")
    val out =
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT PK, GRP, VALUE FROM LIVE_ROWS")
        val b = Set.newBuilder[(Long, String, Double)]
        while (rs.next())
          b += ((rs.getLong("PK"), rs.getString("GRP"),
            rs.getDouble("VALUE")))
        b.result()
      } finally c.close()
    // embedded Derby allows ONE booting JVM at a time: release the db so
    // the owning driver process can boot it again after this post-mortem
    // (shutdown "succeeds" by throwing — the documented Derby contract)
    try DriverManager.getConnection(s"jdbc:derby:$dir;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    out
  }

  test("two drivers, one TCP coordinator, live changefeed: kill one mid-2PC, exactly-once on resume") {
    val base = Files.createTempDirectory("deploy").toString
    val broker = new MiniBroker
    // the coordinator's durable state lives on the SERVER's filesystem
    // only; drivers reach it exclusively through (host, port)
    // the coordinator requires the shared deployment secret — auth rides
    // the same wire the whole topology coordinates over
    val tsoToken = "deploy-secret-r17"
    val srv = new TsoServer(
      spark.sparkContext.hadoopConfiguration, s"$base/tso",
      authToken = Some(tsoToken))
    try {
      // phase 1 is on the wire before any driver exists
      broker.append(
        line("r", 1L, "a", 10.0, 1000L, 1L),
        line("r", 2L, "a", 20.0, 1000L, 2L),
        line("r", 3L, "b", 5.0, 1000L, 3L))

      val javaBin = new java.io.File(new java.io.File(
        sys.props("java.home"), "bin"), "java").getAbsolutePath
      val cp = sys.props("java.class.path")
      // the subprocess creates its own SparkSession outside spark-submit:
      // same JDK17 module opens the build itself needs (build.sbt)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

      def launch(name: String, crash: Boolean): (Process, java.io.File) = {
        val log = new java.io.File(
          s"$base/driver-$name-${System.nanoTime()}.log")
        val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g", "-cp", cp,
          "graft.DeployDriverMain", name,
          broker.host, broker.port.toString,
          srv.host, srv.port.toString,
          s"$base/derby$name", s"$base/ckpt$name", crash.toString, tsoToken)
        val p = new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true).redirectOutput(log).start()
        (p, log)
      }
      def slurp(f: java.io.File): String =
        if (f.exists()) new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") else ""
      def await(p: Process, log: java.io.File, wantExit: Int,
          what: String): String = {
        assert(p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS),
          s"$what timed out:\n${slurp(log)}")
        val out = slurp(log)
        assert(p.exitValue === wantExit,
          s"$what exited ${p.exitValue}, wanted $wantExit:\n$out")
        out
      }

      // ---- driver A halts between its fenced JDBC apply and its
      // coordinator commit on the first non-empty batch (by construction)
      val (a1, a1log) = launch("A", crash = true)
      val a1out = await(a1, a1log, DeployDriverMain.CrashExit,
        "driver A (crashing run)")
      assert(a1out.contains("CRASHING A"),
        s"driver A never reached its crash point:\n$a1out")
      // the apply WAS durable before the kill — the evidence the resumed
      // run's fence must honor
      assert(derbyState(s"$base/derbyA")
        === Set((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0)))

      // ---- driver B rides the same broker + coordinator, unaffected
      val (b, blog) = launch("B", crash = false)

      // ---- traffic lands while A is dead: an update, a delete, an insert
      broker.append(
        line("u", 2L, "b", 25.0, 2000L, 1L),
        line("d", 3L, "b", 0.0, 2000L, 2L),
        line("c", 4L, "c", 7.0, 3000L, 1L))

      // ---- A resumes from its own checkpoint: the killed batch replays
      // into the fence (already applied — skipped), then catch-up
      val (a2, a2log) = launch("A", crash = false)

      // ---- shutdown sentinel stops both drivers gracefully
      broker.append(line("c", DeployDriverMain.StopPk, "stop", 0.0,
        9000L, 1L))
      val a2out = await(a2, a2log, 0, "driver A (resumed run)")
      val bout = await(b, blog, 0, "driver B")
      assert(a2out.contains("DONE A") && bout.contains("DONE B"))

      // ---- post-mortem: both JDBC ends converged to the batch truth —
      // the crashed batch applied exactly once, nothing lost in the gap,
      // and the sentinel row never materialized
      val want = Set((1L, "a", 10.0), (2L, "b", 25.0), (4L, "c", 7.0))
      assert(derbyState(s"$base/derbyA") === want, "driver A's database")
      assert(derbyState(s"$base/derbyB") === want, "driver B's database")

      // ---- the coordinator arbitrated every apply over TCP: once the
      // lease expires A's orphaned mid-2PC allocation, nothing is in
      // flight and the global sequence is gap-free-resolved
      val tso = TcpTso(srv.host, srv.port, authToken = Some(tsoToken))
      Thread.sleep(50) // age the orphan past the 1 ms lease below
      val sp = tso.safePoint(leaseMs = 1L)
      assert(sp >= 3L, s"coordinator saw too few commits: $sp")
      val next = tso.begin()
      assert(next.ts === sp + 1,
        "an unresolved allocation survived the scenario")
      tso.abort(next)
    } finally { broker.close(); srv.close() }
  }
}
