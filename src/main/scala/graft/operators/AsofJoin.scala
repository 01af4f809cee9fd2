package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of joins (backward and forward): for every left row, the latest
  * right row (per key) whose timestamp is <= the left timestamp —
  * or, forward, the earliest with ts >=. The reference has no
  * such operator (equi-join only, SURVEY §2.5); this is the composed-
  * from-existing-ops construction (preference (a) over a custom
  * physical operator):
  *
  * union(tagged left, tagged right) → one hash-partition-by-key +
  * in-partition sort → running `last(right_payload, ignoreNulls)` window
  * → keep left rows.
  *
  * Scale shape: exactly ONE shuffle (on the key) and a per-key sort —
  * the same cost as a sort-merge join, with no range explosion and no
  * per-row probing. Skewed keys are the limit, as with any keyed join
  * (salt upstream or let AQE split).
  */
object AsofJoin {

  /** @param left     left rows; all its columns are kept
    * @param right    right rows; its columns (minus key/ts) are appended
    *                 with `rightPrefix`
    * @param key      equi-key column name present on both sides
    * @param leftTs   ordering column on the left (numeric or timestamp)
    * @param rightTs  ordering column on the right
    * @param tieBreak right-side column that makes equal-timestamp right
    *                 rows deterministic (e.g. an event id)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPrefix: String = "r_", tieBreak: String = ""): DataFrame =
    join(left, right, key, leftTs, rightTs, rightPrefix, tieBreak, fwd = false)

  /** Forward as-of join: for every left row, the EARLIEST right row (per
    * key) whose timestamp is >= the left timestamp — the mirror of
    * [[backward]] (next-event attribution: click → first subsequent
    * purchase). Same single-shuffle construction, scanned in descending
    * time order. Equal-timestamp right rows resolve to the smallest
    * `tieBreak`. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightPrefix: String = "r_", tieBreak: String = ""): DataFrame =
    join(left, right, key, leftTs, rightTs, rightPrefix, tieBreak, fwd = true)

  /** Nearest as-of join: for every left row, whichever of the backward
    * and forward candidates is temporally CLOSER (the pandas
    * `merge_asof(direction='nearest')` semantics); equal distances
    * resolve backward. `tolerance` (in the ts column's own unit — µs
    * for `unix_micros` columns) drops matches farther than the bound;
    * a left row with no candidate in range keeps NULL match columns.
    *
    * Construction: the [[backward]] pass feeds the [[forward]] pass as
    * its left side, then a narrow per-row pick — two single-shuffle
    * passes, still no range explosion. Numeric ts columns only (callers
    * with timestamps convert via `unix_micros`, the [[backward]] gate's
    * own convention). */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightPrefix: String = "r_", tieBreak: String = "",
              tolerance: Long = Long.MaxValue): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val b = backward(left, right, key, leftTs, rightTs, "_nb_", tieBreak)
    val bf = forward(b, right, key, leftTs, rightTs, "_nf_", tieBreak)
    val lt = F.col(leftTs).cast("double")
    val db = lt - F.col(s"_nb_$rightTs").cast("double")
    val df = F.col(s"_nf_$rightTs").cast("double") - lt
    val okB = F.col(s"_nb_$rightTs").isNotNull && db <= tolerance.toDouble
    val okF = F.col(s"_nf_$rightTs").isNotNull && df <= tolerance.toDouble
    val useB = okB && (!okF || db <= df) // backward wins ties
    val useF = okF && !useB
    val payload = right.columns.filterNot(c => c == key || c == rightTs)
    val matchCols = (rightTs +: payload.toSeq).map { c =>
      F.when(useB, F.col(s"_nb_$c")).when(useF, F.col(s"_nf_$c"))
        .otherwise(F.lit(null)).as(s"$rightPrefix$c")
    }
    bf.select(left.columns.map(F.col).toSeq ++ matchCols: _*)
  }

  private def join(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightPrefix: String, tieBreak: String, fwd: Boolean): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == rightTs)
    val rStruct = F.struct(
      (F.col(rightTs).as(rightTs) +: rightPayloadCols.map(c => F.col(c).as(c))): _*)

    val taggedLeft = left.select(
      F.col(key).as("_k"), F.col(leftTs).as("_t"), F.lit(0).as("_isR"),
      (if (tieBreak.nonEmpty && left.columns.contains(tieBreak))
         F.col(tieBreak).cast("long") else F.lit(0L)).as("_tb"),
      F.struct(left.columns.map(F.col): _*).as("_l"),
      F.lit(null).cast(rStructType(right, key, rightTs)).as("_r"))
    val taggedRight = right.select(
      F.col(key).as("_k"), F.col(rightTs).as("_t"), F.lit(1).as("_isR"),
      (if (tieBreak.nonEmpty) F.col(tieBreak).cast("long") else F.lit(0L)).as("_tb"),
      F.lit(null).cast(lStructType(left)).as("_l"),
      rStruct.as("_r"))

    // at equal timestamps the right row sorts FIRST (inclusive bound);
    // equal right timestamps order by the tie-break so `last` is
    // deterministic. Forward is the time-mirrored scan: descending ts,
    // so the running `last` is the SMALLEST right ts >= the left ts
    val w = (if (fwd)
        Window.partitionBy("_k")
          .orderBy(F.col("_t").desc, F.col("_isR").desc, F.col("_tb").desc)
      else
        Window.partitionBy("_k")
          .orderBy(F.col("_t").asc, F.col("_isR").desc, F.col("_tb").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedLeft.unionByName(taggedRight)
      .withColumn("_m", F.last("_r", ignoreNulls = true).over(w))
      .filter(F.col("_isR") === 0)

    val leftCols = left.columns.map(c => F.col(s"_l.$c").as(c))
    val rightCols =
      F.col(s"_m.$rightTs").as(s"$rightPrefix$rightTs") +:
        rightPayloadCols.map(c => F.col(s"_m.$c").as(s"$rightPrefix$c"))
    matched.select((leftCols ++ rightCols): _*)
  }

  private def lStructType(left: DataFrame) =
    org.apache.spark.sql.types.StructType(left.schema.fields)

  private def rStructType(right: DataFrame, key: String, rightTs: String) = {
    val payload = right.schema.fields.filterNot(f => f.name == key || f.name == rightTs)
    org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(_.name == rightTs) ++ payload)
  }
}
