package graft

import java.io.{ByteArrayOutputStream, PrintStream}

import graft.sources.TableCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Scripted run of the [[Shell]] REPL — the reference's entanglesql
  * client surface (/root/reference/src/bin/entanglesql.rs): statement
  * accumulation to the semicolon, `!` meta commands, pipe-separated
  * rows, txn-aware prompt, non-fatal errors. */
class ShellSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Output with the inline prompts removed (prompts print without a
    * trailing newline, so results share their line). */
  private def stripPrompts(out: String): String =
    out.replaceAll("graft(:txn|@snapshot|\\.\\.\\.)?> ", "")

  private def script(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-shell").toString
    val g = new GraftSQL(spark, new TableCatalog(spark, dir))
    val buf = new ByteArrayOutputStream()
    Shell.run(lines.iterator, new PrintStream(buf, true, "UTF-8"), g)
    buf.toString("UTF-8")
  }

  test("full session: DDL, DML, SELECT, meta commands, BEGIN/COMMIT, EXPLAIN") {
    val out = script(
      "CREATE TABLE movies (id INTEGER PRIMARY KEY, title STRING NOT NULL, rating FLOAT);",
      "INSERT INTO movies VALUES (1, 'Heat', 8.3), (2, 'Ronin', 7.3);",
      "!tables",
      "!headers on",
      // multi-line statement: complete only at the semicolon
      "SELECT id, title, rating FROM movies",
      "ORDER BY id;",
      "!headers off",
      // txn lifecycle with prompt state visible between statements
      "BEGIN;",
      "UPDATE movies SET rating = 9.9 WHERE id = 1;",
      "SELECT rating FROM movies WHERE id = 1;",
      "EXPLAIN DELETE FROM movies WHERE id = 2;",
      "COMMIT;",
      "SELECT rating FROM movies ORDER BY id;",
      "!status",
      "!table movies",
      "!exit",
      "SELECT should_never_run FROM movies;")

    // banner + !tables
    assert(out.contains("Connected to graft catalog"), out)
    assert(out.linesIterator.exists(_.trim.endsWith("movies")), out)
    // headers printed once enabled, pipe-separated rows
    assert(out.contains("id|title|rating"), out)
    assert(out.contains("1|Heat|8.3"), out)
    assert(out.contains("2|Ronin|7.3"), out)
    // prompt reflects txn state (reference entanglesql.rs:215-219)
    assert(out.contains("graft:txn> "), out)
    assert(out.contains("graft> "), out)
    // read-your-writes inside the txn, then committed value visible
    assert(out.contains("9.9"), out)
    // txn-aware EXPLAIN DML shows a real plan, not just routing
    assert(out.contains("Physical Plan"), out)
    // !status reports the catalog analog of the reference status dump
    assert(out.contains("1 tables") || out.contains("tables,"), out)
    assert(out.contains("MB disk"), out)
    // !table renders SHOW CREATE TABLE
    assert(out.contains("CREATE TABLE movies"), out)
    // !exit stops the REPL before the trailing statement
    assert(!out.contains("should_never_run"), out)
  }

  test("errors are printed and do not kill the session; partial input buffers") {
    val out = script(
      "CREATE TABLE t (id INTEGER PRIMARY KEY);",
      "INSERT INTO t VALUES (1);",
      "SELECT nope FROM t;",          // analysis error → printed, session lives
      "INSERT INTO t VALUES (1);",    // PK violation → printed, session lives
      "!nosuch",                      // unknown meta command
      "SELECT count(*) AS n",         // partial: continuation prompt
      "FROM t;",
      "SELECT 'semi ; inside literal' AS s FROM t;") // ; in a string must not split
    val clean = stripPrompts(out)
    val errs = clean.linesIterator.filter(_.startsWith("Error:")).toSeq
    assert(errs.size == 3, out)
    assert(out.contains("graft...> "), out) // continuation prompt appeared
    assert(clean.linesIterator.contains("1"), out) // count survived the errors
    assert(out.contains("semi ; inside literal"), out)
  }

  test("semicolons inside SQL comments do not split statements") {
    val out = script(
      "CREATE TABLE c (id INTEGER PRIMARY KEY, v STRING);",
      // a `;` inside a line comment must NOT end the statement early
      "INSERT INTO c VALUES (1, 'a') -- trailing note; with semicolon",
      ";",
      // block comment with a semicolon spanning the middle of a statement
      "SELECT id /* not ; the end */, v FROM c;",
      // a `--` INSIDE a string literal is data, not a comment opener
      "SELECT '--not a comment;' AS s FROM c;",
      // unterminated block comment buffers until its close arrives
      "SELECT count(*) AS n FROM c /* open",
      "still; open */;")
    val clean = stripPrompts(out)
    assert(!clean.contains("Error:"), out)
    assert(clean.contains("1|a"), out)
    assert(clean.contains("--not a comment;"), out)
    assert(out.contains("graft...> "), out) // open comment kept buffering
    assert(clean.linesIterator.toSeq.reverse
      .dropWhile(_.trim.isEmpty).headOption.exists(_.trim == "1"), out)
  }

  test("trailing comment after a semicolon completes the statement; meta commands stay live") {
    val out = script(
      "SELECT 1 AS one; -- trailing note",
      // the all-comment residue must NOT leave the shell in
      // continuation mode: the next `!` line is a meta command
      "!headers off",
      "SELECT 2 AS two;",
      // an OPEN block comment after the semicolon is still a partial
      "SELECT 3 AS three; /* open",
      "close */ SELECT 4 AS four;")
    val clean = stripPrompts(out)
    assert(!clean.contains("Error:"), out)
    assert(clean.linesIterator.exists(_.trim == "1"), out)
    // `!headers off` executed as a meta command, so no header line
    // precedes the `2` result
    assert(!clean.contains("two"), out)
    assert(clean.linesIterator.exists(_.trim == "2"), out)
    assert(clean.linesIterator.exists(_.trim == "4"), out)
  }

  test("--connect mode: thin client drives a live Server socket, txn included") {
    val root = java.nio.file.Files.createTempDirectory("graft-shell-conn").toString
    val srv = new Server(spark, root, 0).start()
    try {
      val buf = new ByteArrayOutputStream()
      Shell.connect("127.0.0.1", srv.boundPort, Iterator(
        "CREATE TABLE ct (id INTEGER PRIMARY KEY, v STRING);",
        "BEGIN;",
        "INSERT INTO ct VALUES (1, 'remote');",
        "COMMIT;",
        "SELECT v FROM ct;"), new PrintStream(buf, true, "UTF-8"))
      val out = buf.toString("UTF-8")
      assert(out.contains("CREATE TABLE ct"), out)
      assert(out.contains("BEGIN") && out.contains("COMMIT"), out)
      assert(out.linesIterator.contains("remote"), out)
      assert(!out.contains("Error:"), out)
    } finally {
      srv.close()
      graft.sources.TableCatalog.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("BEGIN READ ONLY snapshot prompt and rollback leave state intact") {
    val out = script(
      "CREATE TABLE r (id INTEGER PRIMARY KEY, v INTEGER);",
      "INSERT INTO r VALUES (1, 10);",
      "BEGIN READ ONLY;",
      "SELECT v FROM r;",
      "COMMIT;",
      "BEGIN;",
      "DELETE FROM r;",
      "ROLLBACK;",
      "SELECT count(*) AS n FROM r;")
    assert(out.contains("graft@snapshot> "), out)
    // the rollback preserved the row
    assert(stripPrompts(out).linesIterator.toSeq.reverse
      .dropWhile(_.trim.isEmpty).headOption.exists(_.trim == "1"), out)
  }
}
