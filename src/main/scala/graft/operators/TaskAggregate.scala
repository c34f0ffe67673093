package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P25: task-scoped accumulation — the Logstash `aggregate` filter analogue
  * (SURVEY §2.2): events sharing a task id accumulate into a per-task map;
  * the map is pushed as ONE new event when the task ends
  * (`end_of_task => true`) or goes quiet past the inactivity timeout
  * (`push_map_as_event_on_timeout`). Tasks neither ended nor timed out stay
  * pending and emit nothing (the filter keeps them in its in-flight map).
  *
  * Relational form of the accumulation: the caller passes the accumulator
  * columns as aggregate expressions (the declarative twin of the filter's
  * per-event ruby `map[...] ||= ...` code); the operator adds the task
  * bookkeeping — first/last activity, end detection, completed|timeout
  * status. One aggregation per key, like [[Elapsed]]'s one-transaction
  * simplification.
  *
  * Shape at 10^12 rows: one hash-partitioned groupBy with map-side partial
  * aggregation (a hot task combines before the shuffle — no raw-row window,
  * no skew funnel), then a broadcast of the single-row high-water mark for
  * the timeout decision. "Quiet" is judged against the batch's max event
  * time, not wall clock, so runs are deterministic and replayable. */
object TaskAggregate {

  /** @param aggs  caller accumulators, each aliased (e.g.
    *              `sum("status").as("status_sum")`)
    * @return one row per finished task: key, n_events, first_sec, last_sec,
    *         end_sec (null when timed out), status, then `aggs` columns. */
  def apply(df: DataFrame, key: String, isEnd: Column, timeoutSec: Long,
      aggs: Seq[Column]): DataFrame = {
    val bookkeeping = Seq(
      count(lit(1)).as("n_events"),
      min(col("ts_sec")).as("first_sec"),
      max(col("ts_sec")).as("last_sec"),
      max(when(isEnd, col("ts_sec"))).as("end_sec"))
    val perTask = df.groupBy(col(key))
      .agg(bookkeeping.head, (bookkeeping.tail ++ aggs): _*)
    val hwm = df.agg(max(col("ts_sec")).as("_hwm"))
    perTask.join(broadcast(hwm))
      .withColumn("status",
        when(col("end_sec").isNotNull, "completed")
          .when(col("last_sec") + timeoutSec < col("_hwm"), "timeout"))
      .filter(col("status").isNotNull)
      .drop("_hwm")
  }
}
