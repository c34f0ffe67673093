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

  /** P20b: MULTI-transaction pairing — the full Logstash `elapsed` state
    * machine (a new transaction per key after each completed one), where
    * [[apply]] handles only the first. Per key, ordered by
    * (ts_us, starts-first on ties):
    *   - a start while no transaction is open OPENS transaction k;
    *   - further starts while open are counted (`n_extra_starts`, the
    *     `elapsed_multiple_starts` tag analogue) and do not re-anchor;
    *   - the first end while open CLOSES it; ends while closed are ignored
    *     (`elapsed_end_without_start`);
    *   - timeout classifies a pair at emit (`expired` when the delta exceeds
    *     it, or no end ever arrives) — it does not re-open the machine
    *     mid-sequence, same contract as [[finish]].
    * Emits one row per transaction: (key, txn, start_sec, end_sec,
    * elapsed_sec, n_extra_starts, status).
    *
    * Shape: the run-collapse identity — classify each event S/E, keep the
    * FIRST event of each same-type run, drop a leading E-run, and the
    * survivors alternate S,E,S,E… exactly as the state machine would fire;
    * txn = ceil(rank/2). That needs per-key lag/row_number windows over the
    * start/end-marked events ONLY (filtered before the shuffle): full
    * sequential semantics cannot partially aggregate, but the windowed set
    * is the per-key transaction-event stream, bounded in practice —
    * unlike a raw-row window over all turns of a hot conversation. */
  def multi(df: DataFrame, key: String, isStart: Column, isEnd: Column,
      timeoutSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("ts_us"), col("is_s").desc)
    val w = Window.partitionBy("key").orderBy(ord: _*)
    val ev = df.filter(isStart || isEnd)
      .select(col(key).cast("string").as("key"), col("ts_us"), col("ts_sec"),
        when(isStart, 1).otherwise(0).as("is_s"))
    // r6: ONE hashpartition(key) exchange instead of three. The former form
    // materialized run_id (running sum), then ranked within (key, run_id) —
    // a second shuffle — to find run-first rows, plus a third count window.
    // But a row is its run's FIRST row exactly when chg = 1, a run's LENGTH
    // is the rn_all gap to the next run-first row (runs are contiguous in
    // the per-key order), and "leading end-run" means rn_all = 1 with
    // is_s = 0 — all derivable on the ORIGINAL key partitioning, which the
    // filters preserve, so the later lead/row_number windows reuse the same
    // exchange. Identical output (ElapsedSpec + the p20b differential).
    val marked = ev
      .withColumn("rn_all", row_number().over(w))
      .withColumn("chg", when(lag(col("is_s"), 1).over(w).isNull ||
        lag(col("is_s"), 1).over(w) =!= col("is_s"), 1L).otherwise(0L))
      .withColumn("key_n", count(lit(1)).over(Window.partitionBy("key")))
    val eff = marked.filter(col("chg") === 1L)
      .withColumn("run_len",
        coalesce(lead(col("rn_all"), 1).over(w), col("key_n") + 1) - col("rn_all"))
      .filter(!(col("rn_all") === 1 && col("is_s") === 0))
      .withColumn("rn2", row_number().over(w))
      .withColumn("txn", floor((col("rn2") + 1) / 2).cast("long"))
    val matched = col("e_us").isNotNull &&
      (col("e_us") - col("s_us")) <= timeoutSec * 1000000L
    eff.groupBy(col("key"), col("txn"))
      .agg(
        max(when(col("is_s") === 1, col("ts_sec"))).as("start_sec"),
        max(when(col("is_s") === 1, col("ts_us"))).as("s_us"),
        max(when(col("is_s") === 0, col("ts_sec"))).as("e_sec"),
        max(when(col("is_s") === 0, col("ts_us"))).as("e_us"),
        max(when(col("is_s") === 1, col("run_len") - 1)).as("n_extra_starts"))
      .select(
        col("key").as(key), col("txn"), col("start_sec"),
        when(matched, col("e_sec")).as("end_sec"),
        when(matched, col("e_sec") - col("start_sec")).as("elapsed_sec"),
        col("n_extra_starts"),
        when(matched, "matched").otherwise("expired").as("status"))
  }
}
