package graft

import scala.io.StdIn

/** Interactive SQL shell (reference: src/mini_spark/shell.py:73-101):
  * `;`-terminated multiline input, prints the physical plan, executes with
  * wall-clock timing around execution only (shell.py:91-93).
  *
  * Run: `sbt "runMain graft.Shell [baseDir]"`.
  */
object Shell {

  /** The REPL loop, decoupled from stdin/stdout so it is testable: reads
    * lines from `in`, emits output through `out`. Returns the number of
    * queries executed (errors included — they print, like the reference's
    * shell which never dies on a bad query, shell.py:95-99). */
  def repl(engine: Engine, in: Iterator[String], out: String => Unit,
           prompt: Boolean => Unit = _ => ()): Int = {
    var executed = 0
    var running = true
    val buf = new StringBuilder
    while (running && (in.hasNext || buf.nonEmpty)) {
      prompt(buf.isEmpty)
      val line = if (in.hasNext) in.next() else "exit;"
      buf.append(line).append('\n')
      if (line.trim.endsWith(";")) {
        val q = buf.toString().trim.stripSuffix(";").trim
        buf.clear()
        if (q.equalsIgnoreCase("exit") || q.equalsIgnoreCase("quit")) running = false
        else if (q.nonEmpty) {
          try {
            val frame = engine.sql(q)
            // logical + physical, matching the reference shell which
            // prints both plans before executing (shell.py:61-69)
            frame.explain(full = true)
            val t0 = System.nanoTime()
            val n = frame.show(1000)
            out(f"($n rows, ${(System.nanoTime() - t0) / 1e9}%.3f s)")
            executed += 1
          } catch {
            case e: Exception => out(s"error: ${e.getMessage}"); executed += 1
          }
        }
      }
    }
    executed
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.orElse(Some("/root/testdata/sf0.001"))
    val spark = GraftSession.getOrCreate()
    val engine = new Engine(spark, baseDir)
    println(s"graft shell — tables resolve against ${baseDir.get}; end queries with ';', exit with 'exit;'")
    if (System.console() != null) jlineRepl(engine, baseDir.get)
    else {
      // piped/non-tty input (tests, heredocs): plain line reading
      val stdin = Iterator.continually(Option(StdIn.readLine()).getOrElse("exit;"))
      repl(engine, stdin, println,
        prompt = fresh => { print(if (fresh) "graft> " else "    -> "); Console.flush() })
    }
    spark.stop()
  }

  /** Interactive path on a real terminal: jline-backed line editing with
    * persistent history (`~/.graft_history`), fish-style autosuggestion
    * from history, and tab completion over SQL keywords + the base dir's
    * table names — the reference shell's prompt_toolkit feature set
    * (reference: src/mini_spark/shell.py:75-84 FileHistory +
    * AutoSuggestFromHistory). jline ships with Spark, so this adds no
    * dependency; the piped path above stays jline-free. */
  private def jlineRepl(engine: Engine, baseDir: String): Unit = {
    import org.jline.reader.{EndOfFileException, LineReader, LineReaderBuilder, UserInterruptException}
    import org.jline.reader.impl.completer.StringsCompleter
    import org.jline.reader.impl.history.DefaultHistory
    import org.jline.terminal.TerminalBuilder
    val tables =
      try new java.io.File(baseDir).listFiles()
        .toSeq.map(_.getName).filter(_.endsWith(".parquet"))
        .map(_.stripSuffix(".parquet"))
      catch { case _: Exception => Seq.empty }
    val words = Seq("SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING",
      "JOIN", "ON", "AS", "AND", "OR", "NOT", "LIKE", "BETWEEN", "ORDER",
      "LIMIT", "OFFSET", "DISTINCT", "COUNT", "SUM", "MIN", "MAX", "AVG",
      "UNION", "INTERSECT", "EXCEPT", "CASE", "WHEN", "THEN", "ELSE", "END",
      "IN", "IS", "NULL", "WITH", "EXISTS", "QUALIFY", "OVER", "PARTITION",
      "ROLLUP", "CUBE", "GROUPING", "SETS", "ALL", "ANY", "VALUES",
      "ILIKE", "ROWS", "RANGE", "PRECEDING", "FOLLOWING", "UNBOUNDED",
      "CURRENT", "ROW", "CAST", "INTERVAL",
      // lakehouse statements and clauses
      "INSERT", "INTO", "UPDATE", "DELETE", "MERGE", "USING", "MATCHED",
      "SET", "VECTORED", "OPTIMIZE", "ZORDER", "SEGMENTS", "PURGE",
      "THRESHOLD", "VACUUM", "KEEP", "RESTORE", "VERSION", "TIMESTAMP",
      "CHANGES", "REMOVALS", "CHANGE_FEED", "HISTORY", "DESCRIBE",
      "ANALYZE", "SUMMARIZE", "FOOTERS", "ALTER", "ADD", "DROP",
      "CONSTRAINT", "CHECK", "SHOW", "CONSTRAINTS", "COPY", "CREATE",
      "TABLE", "VIEW", "EXPLAIN", "FORMATTED",
      "exit") ++ tables
    val terminal = TerminalBuilder.builder().system(true).build()
    val history = new DefaultHistory()
    val reader = LineReaderBuilder.builder()
      .terminal(terminal)
      .history(history)
      .completer(new StringsCompleter(words: _*))
      .variable(LineReader.HISTORY_FILE,
        java.nio.file.Paths.get(System.getProperty("user.home"), ".graft_history"))
      .build()
    reader.setAutosuggestion(LineReader.SuggestionType.HISTORY)
    val promptRef = new java.util.concurrent.atomic.AtomicReference("graft> ")
    val in = Iterator.continually {
      try reader.readLine(promptRef.get())
      catch {
        case _: EndOfFileException    => "exit;"
        case _: UserInterruptException => "" // ^C clears the line, like psql
      }
    }
    try repl(engine, in, terminal.writer().println(_: String),
      prompt = fresh => promptRef.set(if (fresh) "graft> " else "    -> "))
    finally {
      try history.save() catch { case _: Exception => () }
      terminal.close()
    }
  }
}
