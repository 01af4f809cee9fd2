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
