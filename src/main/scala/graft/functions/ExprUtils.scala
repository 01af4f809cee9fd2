package graft.functions

import org.apache.spark.sql.{Column, functions => F}

/** Expression-level utilities shared by the operator library. */
object ExprUtils {

  /** Let-binding for column expressions: evaluate `value` ONCE per row and
    * reference it any number of times inside `body` via a lambda variable.
    *
    * Implemented as `aggregate([], value, identity, body)`: the fold over
    * an empty array evaluates the zero (our bound value) exactly once and
    * hands it to the finish lambda. This is the antidote to Catalyst's
    * CollapseProject behavior with expensive subexpressions: a projection
    * chain that references an upstream computed column k times inlines the
    * whole expression tree k times (and a lambda body that closes over a
    * non-lambda subtree re-evaluates it per element). Binding through a
    * lambda variable makes the single evaluation structural — no persist,
    * no checkpoint, no optimizer flag.
    */
  def let(value: Column)(body: Column => Column): Column =
    F.aggregate(
      F.array().cast("array<int>"),
      value,
      (acc: Column, _: Column) => acc,
      body)

  /** Two-value let: both evaluated once, both bound. */
  def let2(v1: Column, v2: Column)(body: (Column, Column) => Column): Column =
    let(F.struct(v1.as("_1"), v2.as("_2"))) { s =>
      body(s.getField("_1"), s.getField("_2"))
    }
}
