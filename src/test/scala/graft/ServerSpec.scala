package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** The socket SQL endpoint driven by REAL client sockets — the
  * reference's server surface (/root/reference/src/server.rs:104
  * serve_sql): two CONCURRENT connections, per-connection transaction
  * state, snapshot isolation across connections (uncommitted writes
  * invisible), first-committer-wins on conflict, EXPLAIN over the
  * wire. */
class ServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A connected line-protocol client. `exec` writes one statement and
    * reads exactly `rows` response lines (every graft statement
    * renders at least a 1-row status frame). A 30 s read timeout turns
    * a protocol bug into a failure, not a hang. */
  private final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(30000)
    private val out = new PrintWriter(
      new java.io.OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8), true)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    def exec(stmt: String, rows: Int = 1): Seq[String] = {
      out.println(stmt)
      (1 to rows).map(_ => in.readLine())
    }
    def closeWrite(): Unit = sock.shutdownOutput()
    def drain(): Seq[String] =
      Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
    def close(): Unit = sock.close()
  }

  test("two concurrent connections: isolation, first-committer-wins, EXPLAIN over the wire") {
    val root = java.nio.file.Files.createTempDirectory("graft-server").toString
    val srv = new Server(spark, root, 0).start()
    try {
      val c1 = new Client(srv.boundPort)
      val c2 = new Client(srv.boundPort)
      try {
        assert(c1.exec("CREATE TABLE t (id INTEGER PRIMARY KEY, v STRING);").head
          .contains("CREATE TABLE t"))
        // open txn on c1; its staged insert must be invisible to c2
        assert(c1.exec("BEGIN;").head == "BEGIN")
        assert(c1.exec("INSERT INTO t VALUES (1, 'x');").head.startsWith("INSERT"))
        assert(c1.exec("SELECT count(*) AS n FROM t;").head == "1",
          "read-your-writes inside the txn")
        assert(c2.exec("SELECT count(*) AS n FROM t;").head == "0",
          "uncommitted write leaked across connections")
        assert(c1.exec("COMMIT;").head == "COMMIT")
        assert(c2.exec("SELECT count(*) AS n FROM t;").head == "1",
          "committed write must be visible to the other connection")

        // write-write conflict: both stage an insert for the same PK;
        // the first committer wins, the second's COMMIT errors
        assert(c1.exec("BEGIN;").head == "BEGIN")
        assert(c2.exec("BEGIN;").head == "BEGIN")
        assert(c1.exec("INSERT INTO t VALUES (2, 'first');").head.startsWith("INSERT"))
        assert(c2.exec("INSERT INTO t VALUES (2, 'second');").head.startsWith("INSERT"))
        assert(c1.exec("COMMIT;").head == "COMMIT")
        val second = c2.exec("COMMIT;").head
        assert(second.startsWith("Error:"), s"second committer must lose, got: $second")
        assert(c2.exec("SELECT v FROM t WHERE id = 2;").head == "first")

        // EXPLAIN over the wire, then EOF closes the session cleanly
        c2.closeWrite()
        c1.exec("EXPLAIN SELECT v FROM t WHERE id = 2;", rows = 0)
        c1.closeWrite()
        val plan = c1.drain().mkString("\n")
        assert(plan.contains("Physical Plan"), plan)
      } finally { c1.close(); c2.close() }

      // a NEW connection still sees the committed state (per-connection
      // sessions share the one catalog root)
      val c3 = new Client(srv.boundPort)
      try assert(c3.exec("SELECT count(*) AS n FROM t;").head == "2")
      finally c3.close()
    } finally {
      srv.close()
      graft.sources.TableCatalog.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("stress: concurrent clients on distinct PKs all land under optimistic retry") {
    val root = java.nio.file.Files.createTempDirectory("graft-server-mt").toString
    val srv = new Server(spark, root, 0).start()
    try {
      val c0 = new Client(srv.boundPort)
      assert(c0.exec("CREATE TABLE m (id INTEGER PRIMARY KEY, who STRING);").head
        .contains("CREATE TABLE m"))
      c0.close()
      // 4 clients × 3 inserts each, truly concurrent: every statement
      // must land (non-txn inserts serialize under optimistic retry),
      // no response may be an error, and per-connection sessions must
      // not cross-bind state under parallel execution
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val results = Await.result(Future.sequence((0 until 4).map { ci =>
        Future {
          val c = new Client(srv.boundPort)
          try (0 until 3).map { i =>
            c.exec(s"INSERT INTO m VALUES (${ci * 10 + i}, 'c$ci');").head
          } finally c.close()
        }
      }), 120.seconds)
      val flat = results.flatten
      assert(flat.size == 12 && flat.forall(_.startsWith("INSERT")),
        s"some concurrent inserts failed: $flat")
      val c1 = new Client(srv.boundPort)
      try {
        assert(c1.exec("SELECT count(*) AS n FROM m;").head == "12")
        assert(c1.exec(
          "SELECT count(DISTINCT who) AS w FROM m;").head == "4")
      } finally c1.close()
    } finally {
      srv.close()
      graft.sources.TableCatalog.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("a dropped connection rolls back its open transaction") {
    val root = java.nio.file.Files.createTempDirectory("graft-server-rb").toString
    val srv = new Server(spark, root, 0).start()
    try {
      val c1 = new Client(srv.boundPort)
      assert(c1.exec("CREATE TABLE r (id INTEGER PRIMARY KEY);").head
        .contains("CREATE TABLE r"))
      assert(c1.exec("BEGIN;").head == "BEGIN")
      assert(c1.exec("INSERT INTO r VALUES (7);").head.startsWith("INSERT"))
      c1.close() // vanish mid-transaction

      // staged work must be gone; published state intact and writable
      val c2 = new Client(srv.boundPort)
      try {
        // poll briefly: server-side rollback runs on the connection
        // thread after it observes the disconnect
        val deadline = System.nanoTime() + 10e9.toLong
        var n = c2.exec("SELECT count(*) AS n FROM r;").head
        while (n != "0" && System.nanoTime() < deadline) {
          Thread.sleep(100)
          n = c2.exec("SELECT count(*) AS n FROM r;").head
        }
        assert(n == "0", "dropped connection's staged insert survived")
        assert(c2.exec("INSERT INTO r VALUES (8);").head.startsWith("INSERT"))
        assert(c2.exec("SELECT count(*) AS n FROM r;").head == "1")
      } finally c2.close()
    } finally {
      srv.close()
      graft.sources.TableCatalog.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }
}
