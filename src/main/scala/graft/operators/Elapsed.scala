package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P20: cross-event correlation — the Logstash `elapsed` filter analogue
  * (start/end event pairing per correlation key with timeout; SURVEY §2.2).
  *
  * Semantics (one transaction per key, the elapsed filter's typical
  * unique-id usage): the FIRST start event of a key (min (ts_us, ts_sec))
  * pairs with the FIRST end event at-or-after it; `elapsed_sec` is their
  * ts_sec delta. A start whose end is missing or arrives after `timeoutSec`
  * reports status `expired` (the filter's `elapsed_expired_error` tag).
  *
  * Shape, not a window: per-key min-aggregations (map-side partial combine —
  * a hot key never funnels raw rows into one window partition) plus one
  * key-equijoin of end candidates against the tiny starts table; AQE handles
  * residual skew. Both aggregations hash-partition by the same key, so the
  * second groupBy reuses the join's partitioning (no extra shuffle).
  *
  * Cross-run resume mirrors Incremental's contract (ascending,
  * non-overlapping batches): [[state]] is a full per-key snapshot
  * (key, s, e); run(A ∪ B) == run(B, state(A)) exactly — ElapsedSpec. */
object Elapsed {

  private val evKey = struct(col("ts_us"), col("ts_sec"))

  /** Full per-key pairing state: one row per key with ≥1 start —
    * (key string, s struct<ts_us,ts_sec>, e struct<ts_us,ts_sec> nullable). */
  def state(df: DataFrame, key: String, isStart: Column, isEnd: Column,
      prior: Option[DataFrame] = None): DataFrame = {
    val batchStarts = df.filter(isStart)
      .select(col(key).cast("string").as("key"), evKey.as("_v"))
    val allStarts = prior match {
      case Some(p) => batchStarts.unionByName(
        p.select(col("key"), col("s").as("_v")))
      case None => batchStarts
    }
    val starts = allStarts.groupBy("key").agg(min(col("_v")).as("s"))
    val batchEnds = df.filter(isEnd)
      .select(col(key).cast("string").as("_ek"), evKey.as("_ev"))
      .join(starts, col("_ek") === col("key"))
      .filter(col("_ev.ts_us") >= col("s.ts_us"))
      .select(col("key").as("_k2"), col("_ev"))
    val priorEnds = prior match {
      // ascending batches: a prior end is ≥ its prior start ≥ the merged
      // start, so it stays a valid candidate unconditionally
      case Some(p) => batchEnds.unionByName(
        p.filter(col("e").isNotNull).select(col("key").as("_k2"), col("e").as("_ev")))
      case None => batchEnds
    }
    val ends = priorEnds.groupBy("_k2").agg(min(col("_ev")).as("e"))
    starts.join(ends, col("key") === col("_k2"), "left_outer").drop("_k2")
  }

  /** Project a state snapshot into result rows:
    * (key, start_sec, end_sec, elapsed_sec, status matched|expired). */
  def finish(st: DataFrame, key: String, timeoutSec: Long): DataFrame = {
    val matched = col("e").isNotNull &&
      (col("e.ts_us") - col("s.ts_us")) <= timeoutSec * 1000000L
    st.select(
      col("key").as(key),
      col("s.ts_sec").as("start_sec"),
      when(matched, col("e.ts_sec")).as("end_sec"),
      when(matched, col("e.ts_sec") - col("s.ts_sec")).as("elapsed_sec"),
      when(matched, "matched").otherwise("expired").as("status"))
  }

  /** One-shot batch form. */
  def apply(df: DataFrame, key: String, isStart: Column, isEnd: Column,
      timeoutSec: Long): DataFrame =
    finish(state(df, key, isStart, isEnd), key, timeoutSec)
}
