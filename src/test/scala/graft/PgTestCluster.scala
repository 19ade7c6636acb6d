package graft

import scala.sys.process._

/** One throwaway PostgreSQL cluster per test JVM, on a unix socket in
  * /tmp (no TCP), owned by the `postgres` OS user (the server refuses
  * to run as root; trust auth lets any OS user connect as the
  * `postgres` DB user afterwards). Shared by every live-PG suite;
  * stopped by a JVM shutdown hook. `up` is false — and the suites
  * self-cancel — when postgres binaries or root are unavailable. */
object PgTestCluster {

  val sockDir = "/tmp/graft-pg-live"
  val dataDir = s"$sockDir/data"

  /** libpq conninfo for the cluster — the form `psql` and the CLI's
    * -d take verbatim. */
  val dsn = s"host=$sockDir dbname=postgres user=postgres"

  // UTF-8 end to end: the wire format is byte-oriented, so psql round
  // trips must not re-decode with the su login's C locale
  val Env = "LANG=C.UTF-8 PGCLIENTENCODING=UTF8"

  /** run a command as postgres, capturing stdout+stderr as UTF-8 */
  def pg(cmd: String, stdin: Array[Byte] = Array.empty): (Int, String) = {
    val out = new java.io.ByteArrayOutputStream
    val io = new ProcessIO(
      in => { in.write(stdin); in.close() },
      o => { o.transferTo(out); o.close() },
      e => { e.transferTo(out); e.close() })
    val p = Process(Seq("su", "-s", "/bin/bash", "postgres", "-c",
      s"$Env $cmd"), new java.io.File("/tmp")).run(io)
    (p.exitValue(), new String(out.toByteArray, "UTF-8"))
  }

  def psql(sql: String): (Int, String) =
    pg(s"psql -qAt -h $sockDir -d postgres", sql.getBytes("UTF-8"))

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      Process(Seq("su", "-s", "/bin/bash", "postgres", "-c",
        s"pg_ctl -D $dataDir stop -m immediate"),
        new java.io.File("/tmp")).!(ProcessLogger(_ => ()))
      ()
    }))

  lazy val up: Boolean = {
    val haveBins = Seq("initdb", "pg_ctl", "psql").forall(b =>
      Process(Seq("bash", "-c", s"command -v $b")).! == 0)
    val isRoot = Process(Seq("id", "-u")).!!.trim == "0"
    hook
    haveBins && isRoot && {
      Process(Seq("bash", "-c",
        s"rm -rf $sockDir && mkdir -p $sockDir && " +
          s"chown postgres:postgres $sockDir")).!
      val (rcInit, _) = pg(s"initdb -D $dataDir -A trust -E UTF8 --no-locale")
      rcInit == 0 && {
        val (rcStart, _) = pg(s"pg_ctl -D $dataDir " +
          s"-o '-k $sockDir -c listen_addresses=' -l $sockDir/pg.log start")
        rcStart == 0 && psql("SELECT 1;")._1 == 0
      }
    }
  }
}
