package graft

import java.nio.file.Files

import graft.sources.Tables

/** Coverage for the IO surfaces and the shell loop that previously had no
  * gate of any kind: merge (reference io.py:297-305 merge_files), inspect
  * (reference examples/read_block_file.py:8-24), and the `;`-terminated
  * REPL (reference shell.py:73-101). */
class SourcesShellSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-sources").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$d/part1.parquet")
    Seq((3, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$d/part2.parquet")
    fruits.write.mode("overwrite").parquet(s"$d/fruits.parquet")
    d
  }

  test("merge concatenates same-schema tables (reference io.py:297-305)") {
    val merged = Tables.merge(spark, Seq(s"$dir/part1.parquet", s"$dir/part2.parquet"))
    assert(merged.count() == 3)
    assert(rows(merged) == Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
  }

  test("inspect returns the row count (reference read_block_file.py:8-24)") {
    assert(Tables.inspect(spark, s"$dir/part1.parquet", n = 1) == 2L)
  }

  test("JSONL and ORC ingestion round-trip losslessly with a declared schema") {
    val d = Files.createTempDirectory("graft-ingest").toString
    fruits.write.mode("overwrite").json(s"$d/fr_jsonl")
    fruits.write.mode("overwrite").orc(s"$d/fr_orc")
    val viaJsonl = Tables.readJsonl(spark, s"$d/fr_jsonl", fruits.schema)
      .select("fruit", "quantity", "color")
    val viaOrc = Tables.readOrc(spark, s"$d/fr_orc", fruits.schema)
      .select("fruit", "quantity", "color")
    assert(rows(viaJsonl) == rows(fruits))
    assert(rows(viaOrc) == rows(fruits))
    // landing conversions produce parquet twins
    Tables.orcToParquet(spark, s"$d/fr_orc", fruits.schema, s"$d/fr_pq")
    assert(rows(spark.read.parquet(s"$d/fr_pq")) == rows(fruits))
  }

  test("shell repl: multiline ';'-terminated queries, errors don't kill the loop, exit stops it") {
    val engine = Engine(spark, dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val input = Iterator(
      "SELECT fruit, quantity FROM fruits", // multiline: no terminator yet
      "WHERE quantity > 4;",
      "SELECT nope FROM missing_table;",    // errors print, loop survives
      "exit;",
      "SELECT never_reached FROM fruits;")
    val planOut = new java.io.ByteArrayOutputStream()
    val executed = Console.withOut(new java.io.PrintStream(planOut, true, "UTF-8")) {
      Shell.repl(engine, input, out.append(_))
    }
    assert(executed == 2)
    assert(out.exists(_.startsWith("(2 rows")))    // banana 5, banana 7
    assert(out.exists(_.startsWith("error:")))
    assert(!out.exists(_.contains("never_reached")))
    // the shell prints logical AND physical plans before executing,
    // matching the reference (shell.py:61-69)
    val plans = planOut.toString("UTF-8")
    assert(plans.contains("== Parsed Logical Plan =="))
    assert(plans.contains("== Physical Plan =="))
  }

  test("shell repl with no input executes nothing and terminates") {
    val engine = Engine(spark, dir)
    assert(Shell.repl(engine, Iterator.empty, _ => ()) == 0)
  }
}
