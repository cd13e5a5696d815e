package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics for product/behavioral event tables
 * (event_id, ts, user_id, event_type, ...): ordered conversion funnels and
 * cohort retention — the aggregate workloads an events pipeline runs next to
 * sessionization (SparkEntry's ev_sessions).
 *
 * Scale shape: everything reduces per USER first (high-cardinality hash
 * groupBy with map-side combine), and the per-stage joins are equi-joins on
 * the same user key — after the first shuffle, subsequent stages co-locate.
 * No windows over the raw event stream, no driver-side state.
 */
object Events {

  /** Ordered conversion funnel: stage i counts users whose FIRST qualifying
    * stage-i event is strictly later than their first-reach time of stage
    * i−1. Returns one row per stage: (stage, stage_idx, n_users).
    *
    * Each stage is a filtered per-user min-timestamp aggregate joined to the
    * previous stage's reach times — the event table is scanned once per
    * stage with the stage predicate pushed down to the scan. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val reaches = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("_ts"))
        .join(prev.select(col(userCol), col("_t").as("_prev")), Seq(userCol))
        .filter(col("_ts") > col("_prev"))
        .groupBy(col(userCol)).agg(min(col("_ts")).as("_t"))
    }
    reaches.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), lit(i + 1).as("stage_idx"),
          col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Cohort retention: users are cohorted by the DAY of their first event;
    * a (cohort_day, day_offset) cell counts the cohort's users active
    * day_offset days later (distinct users, offset ≥ 0). Returns
    * (cohort_day, day_offset, n_users). */
  def cohortRetention(events: DataFrame,
                      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val day = to_date(col(tsCol))
    val cohorts = events.groupBy(col(userCol)).agg(min(day).as("cohort_day"))
    events.select(col(userCol), day.as("_day"))
      .join(cohorts, Seq(userCol))
      .select(col(userCol), col("cohort_day"),
        datediff(col("_day"), col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
