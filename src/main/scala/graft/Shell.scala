package graft

import scala.io.StdIn

/** Interactive SQL shell (reference: src/mini_spark/shell.py:73-101):
  * `;`-terminated multiline input, prints the physical plan, executes with
  * wall-clock timing around execution only (shell.py:91-93).
  *
  * Run: `sbt "runMain graft.Shell [baseDir]"`.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.orElse(Some("/root/testdata/sf0.001"))
    val spark = GraftSession.getOrCreate()
    val engine = new Engine(spark, baseDir)
    println(s"graft shell — tables resolve against ${baseDir.get}; end queries with ';', exit with 'exit;'")
    var running = true
    val buf = new StringBuilder
    while (running) {
      print(if (buf.isEmpty) "graft> " else "    -> ")
      Console.flush()
      val line = Option(StdIn.readLine()).getOrElse("exit;")
      buf.append(line).append('\n')
      if (line.trim.endsWith(";")) {
        val q = buf.toString().trim.stripSuffix(";").trim
        buf.clear()
        if (q.equalsIgnoreCase("exit") || q.equalsIgnoreCase("quit")) running = false
        else if (q.nonEmpty) {
          try {
            val frame = engine.sql(q)
            frame.explain()
            val t0 = System.nanoTime()
            frame.show(1000)
            println(f"(${(System.nanoTime() - t0) / 1e9}%.3f s)")
          } catch {
            case e: Exception => println(s"error: ${e.getMessage}")
          }
        }
      }
    }
    spark.stop()
  }
}
