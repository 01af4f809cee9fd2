package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => SF}

import graft.api.Col.{col => _, lit => _, _}
import graft.api.functions._
import graft.api.GraftFrame

/** Expression-algebra semantics from SURVEY §1.3 / §2.2
  * (reference typing rules: src/mini_spark/sql.py:235-355). */
class ColSpec extends SparkSpec {
  import spark.implicits._

  test("string + string concatenates (reference sql.py:331-334)") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val out = new GraftFrame(df).select((col("x") + col("y")).as("c"))
    assert(out.collect().head.getString(0) == "ab")
  }

  test("/ always yields floating point (reference sql.py:280-285)") {
    val df = Seq((7, 2)).toDF("x", "y")
    val out = new GraftFrame(df).select((col("x") / col("y")).as("d"))
    assert(out.schema.head.dataType == DoubleType)
    assert(out.collect().head.getDouble(0) == 3.5)
  }

  test("floorDiv returns integral type") {
    val df = Seq((7, 2)).toDF("x", "y")
    val out = new GraftFrame(df).select(col("x").floorDiv(col("y")).as("d"))
    assert(out.collect().head.get(0) == 3)
  }

  test("between is inclusive on both ends (reference sql.py:71-72)") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    val out = new GraftFrame(df).filter(col("x").between(lit(2), lit(4)))
    assert(rows(out.df) == Set(Seq(2), Seq(3), Seq(4)))
  }

  test("string literal vs timestamp column parses as ISO ts (reference sql.py:291-298)") {
    val df = Seq("2025-01-01 00:00:00", "2025-06-01 00:00:00")
      .toDF("s").select(SF.col("s").cast("timestamp").as("ts"))
    val out = new GraftFrame(df).filter(col("ts") > lit("2025-03-01"))
    assert(out.count() == 1)
  }

  test("LIKE with % and _ wildcards (reference sql.py:166-212)") {
    val df = Seq("apple", "apply", "banana").toDF("w")
    assert(new GraftFrame(df).filter(col("w").like("appl_")).count() == 2)
    assert(new GraftFrame(df).filter(col("w").like("%an%")).count() == 1)
  }

  test("unknown column raises") {
    val df = Seq(1).toDF("x")
    assertThrows[IllegalArgumentException] {
      new GraftFrame(df).select(col("nope")).collect()
    }
  }

  test("aggregate typing: COUNT() is integral, AVG is floating (reference sql.py:412-415,462-464)") {
    val g = new GraftFrame(fruits).groupBy(col("fruit"))
      .agg(countAll(), avgCol(col("quantity")).as("avg_q"))
    val sch = g.schema
    assert(sch("count").dataType == LongType)
    assert(sch("avg_q").dataType == DoubleType)
  }
}
