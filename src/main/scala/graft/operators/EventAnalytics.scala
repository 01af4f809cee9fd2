package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Classic event-analytics operators over an (user, type, timestamp)
  * stream: conversion funnels and cohort retention — the product-
  * analytics queries an events warehouse serves daily, expressed as
  * keyed aggregations and equi-joins so every step shuffles on the
  * user key and nothing ever needs a per-user ordered scan of the
  * whole history in one task.
  *
  * Timestamps are compared in exact epoch microseconds (both engines'
  * native precision for µs data) so a differential SQL oracle replays
  * every chain decision bit-for-bit.
  */
object EventAnalytics {

  /** Per-stage funnel frames. Stage 1 is each user's EARLIEST `steps(0)`
    * event (the funnel entry, which anchors the conversion window);
    * stage k is the earliest `steps(k-1)` event at-or-after the user's
    * stage-(k-1) time and within `windowMicros` of the anchor. Returns
    * one frame per stage of shape (userCol, anchor_us, t_us) — stage k's
    * rows are exactly the users who reached step k.
    *
    * Scale shape: each stage is filter → equi-join on the user key →
    * min-aggregation; the carried frame is three narrow columns, and
    * the per-type filters push into the scan. Stage count is the
    * funnel length (single digits), never data-dependent. */
  def funnelStages(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   windowMicros: Long): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMicros > 0, s"windowMicros must be positive, got $windowMicros")
    val e = events.select(F.col(userCol),
      F.col(typeCol).as("_t"), F.unix_micros(F.col(tsCol)).as("_us"))
    val s1 = e.filter(F.col("_t") === steps.head)
      .groupBy(userCol).agg(F.min("_us").as("anchor_us"))
      .withColumn("t_us", F.col("anchor_us"))
    steps.drop(1).scanLeft(s1) { (prev, step) =>
      val ek = e.filter(F.col("_t") === step)
        .select(F.col(userCol), F.col("_us"))
      prev.select(F.col(userCol), F.col("anchor_us"),
          F.col("t_us").as("_prev_us"))
        .join(ek, userCol)
        .filter(F.col("_us") >= F.col("_prev_us") &&
          F.col("_us") <= F.col("anchor_us") + windowMicros)
        .groupBy(userCol, "anchor_us").agg(F.min("_us").as("t_us"))
    }
  }

  /** Funnel drop-off report: one row per step with the number of users
    * who reached it — `(step, step_type, n_users)`, step 1-based. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame =
    funnelStages(events, userCol, typeCol, tsCol, steps, windowMicros)
      .zip(steps).zipWithIndex
      .map { case ((stage, name), i) =>
        stage.agg(F.count(F.lit(1)).as("n_users"))
          .select(F.lit(i + 1).as("step"), F.lit(name).as("step_type"),
            F.col("n_users"))
      }
      .reduce(_.unionAll(_))

  /** Wide-format per-key activity counts: one row per `keyCol`, one
    * column per pivot value (`n_<value>`) counting that value's rows —
    * the classic PIVOT report. `values` is EXPLICIT (the deployment
    * knows its event taxonomy): passing it keeps Spark's pivot from
    * running a collect-distinct planning pass over the corpus, so the
    * whole thing is one keyed aggregation with map-side combine, and
    * the output schema is stable across corpus versions. Unlisted
    * values are ignored by construction. */
  def pivotCounts(df: DataFrame, keyCol: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs an explicit value list")
    df.groupBy(keyCol)
      .pivot(pivotCol, values)
      .agg(F.count(F.lit(1)))
      .select(F.col(keyCol) +: values.map(v =>
        F.coalesce(F.col(s"`$v`"), F.lit(0L)).as(s"n_$v")): _*)
  }

  /** Cohort retention: users cohort by the calendar day of their FIRST
    * event; retention at day-offset k counts the cohort's users active
    * (any event) k days after the cohort day. Returns
    * `(cohort_day 'yyyy-MM-dd', day_k, n_users)` — the classic
    * retention triangle in long form (day_k = 0 row is the cohort
    * size). Two user-keyed shuffles (first-seen agg, cohort join) plus
    * the final small (cohort, k) rollup; the (user, day) dedup rides
    * the same exchange as the rollup's partial aggregate. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val days = events.select(F.col(userCol),
      F.to_date(F.col(tsCol)).as("_day"))
    val cohorts = days.groupBy(userCol).agg(F.min("_day").as("_cohort"))
    days.distinct()
      .join(cohorts, userCol)
      .select(F.date_format(F.col("_cohort"), "yyyy-MM-dd").as("cohort_day"),
        F.datediff(F.col("_day"), F.col("_cohort")).cast("long").as("day_k"))
      .groupBy("cohort_day", "day_k")
      .agg(F.count(F.lit(1)).as("n_users"))
  }
}
