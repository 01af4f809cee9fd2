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
    val stdin = Iterator.continually(Option(StdIn.readLine()).getOrElse("exit;"))
    repl(engine, stdin, println,
      prompt = fresh => { print(if (fresh) "graft> " else "    -> "); Console.flush() })
    spark.stop()
  }
}
