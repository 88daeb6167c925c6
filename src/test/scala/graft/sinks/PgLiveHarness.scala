package graft.sinks

import org.scalatest.{BeforeAndAfterAll, Suite}
import scala.sys.process._

/** Boots a THROWAWAY single-user PostgreSQL cluster on a private unix
  * socket (no TCP, no shared state) for suites that must prove SQL
  * against a real server — [[PgLiveSpec]] (the PgDialect statement
  * arms) and [[graft.etl.ChadoGff3PgLiveSpec]] (the reference's
  * golden-count merge contract). Server-side commands hop to the
  * `postgres` system user when running as root; the psql client runs
  * as anyone. When the environment carries no Postgres install the
  * suite's tests cancel with the reason recorded (COVERAGE.md
  * documents the constraint) — they never pass vacuously.
  *
  * Each mixing suite gets its OWN data directory (tempdir), so
  * concurrently-running suites never share a socket even though the
  * port number (which only names the socket file inside the private
  * dir) is constant. */
trait PgLiveHarness extends BeforeAndAfterAll { this: Suite =>

  private val port = 54399
  private def bin(name: String): Option[String] =
    Seq("/usr/local/bin/", "/usr/bin/", "/usr/lib/postgresql/15/bin/")
      .map(_ + name).find(p => new java.io.File(p).canExecute)

  private var baseDir: java.io.File = _
  private var up = false
  private var whyDown = "not started"

  private def sh(cmd: Seq[String], input: Option[String] = None)
      : (Int, String) = {
    val out = new StringBuilder
    val log = ProcessLogger(s => { out.append(s).append('\n'); () },
      s => { out.append(s).append('\n'); () })
    val code = input match {
      case Some(in) => (Process(cmd) #<
        new java.io.ByteArrayInputStream(
          in.getBytes(java.nio.charset.StandardCharsets.UTF_8))).!(log)
      case None => Process(cmd).!(log)
    }
    (code, out.toString)
  }

  // the server refuses root — when the suite runs as root (the usual
  // container case), hop to the postgres system user for server-side
  // commands; the psql CLIENT runs fine as anyone
  private def asPg(cmd: Seq[String]): Seq[String] =
    if (sh(Seq("id", "-u"))._2.trim == "0")
      Seq("runuser", "-u", "postgres", "--") ++ cmd
    else cmd

  private def psqlBase: Seq[String] =
    Seq(bin("psql").get, "-h", baseDir.getAbsolutePath,
      "-p", port.toString, "-U", "postgres", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1", "-qtA")

  /** Run a psql script (stdin, ON_ERROR_STOP) against the throwaway
    * cluster; returns (exitCode, combined output). */
  protected def psql(script: String): (Int, String) =
    sh(psqlBase ++ Seq("-f", "-"), Some(script))

  /** Run ONE `COPY … FROM STDIN` with the data fed on psql's stdin —
    * EOF terminates the stream, so the data never rides the script
    * scanner (whose `\.` detection is line-oriented and cannot see a
    * CSV record spanning physical lines through a quoted newline). */
  protected def psqlCopy(copySql: String, data: String): (Int, String) =
    sh(psqlBase ++ Seq("-c", copySql), Some(data + "\n"))

  protected def query(sql: String): Seq[String] = {
    val (code, out) = psql(sql)
    assert(code == 0, s"query failed: $sql\n$out")
    out.linesIterator.filter(_.nonEmpty).toSeq
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    val need = Seq("initdb", "pg_ctl", "psql").map(b => b -> bin(b))
    need.collect { case (b, None) => b } match {
      case missing if missing.nonEmpty =>
        whyDown = s"no Postgres install (missing: ${missing.mkString(", ")})"
        return
      case _ => ()
    }
    baseDir = java.nio.file.Files
      .createTempDirectory("graft_pglive").toFile
    val data = new java.io.File(baseDir, "data").getAbsolutePath
    sh(Seq("chown", "-R", "postgres:postgres", baseDir.getAbsolutePath))
    val (ic, iout) = sh(asPg(Seq(bin("initdb").get, "-D", data,
      "-A", "trust", "--no-sync")))
    if (ic != 0) { whyDown = s"initdb failed: ${iout.take(300)}"; return }
    val (sc, sout) = sh(asPg(Seq(bin("pg_ctl").get, "-D", data,
      "-o", s"-k ${baseDir.getAbsolutePath} -p $port -c listen_addresses=''",
      "-l", s"${baseDir.getAbsolutePath}/pg.log", "-w", "start")))
    if (sc != 0) { whyDown = s"pg_ctl start failed: ${sout.take(300)}"; return }
    up = psql("SELECT 1")._1 == 0
    if (!up) whyDown = "server started but psql cannot connect"
  }

  override def afterAll(): Unit = {
    if (baseDir != null) {
      if (up) sh(asPg(Seq(bin("pg_ctl").get, "-D",
        new java.io.File(baseDir, "data").getAbsolutePath,
        "stop", "-m", "immediate")))
      sh(Seq("rm", "-rf", baseDir.getAbsolutePath))
    }
    super.afterAll()
  }

  protected def live(): Unit =
    assume(up, s"live-Postgres checks skipped: $whyDown")
}
