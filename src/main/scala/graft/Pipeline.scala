package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators._

/** Rule/lookup tables for one pipeline run (the sig filter's rules.json /
  * ioc.json / ref.json analogues, SURVEY §1.1). All broadcast-small by
  * contract; whitelist + sig rules are compiled into the plan itself. */
case class RuleTables(
    ioc: DataFrame,
    sigRules: Seq[SigRule],
    ref: DataFrame,
    whitelist: Seq[WhitelistRule])

/** The parse → enrich → route → aggregate pipeline (SURVEY §3.2).
  *
  * Stage order is the reference's check order C1→C9 and must be preserved for
  * routed-row equality: parse → C1 fp-dedup → C2 whitelist → C3 IOC → C4 sig
  * → C5 ref → C6 first-seen → C7 frequency → C8 scoring.
  *
  * Shuffle budget (SURVEY §3.2): #1 dedup window by (fp, bucket); #2 the
  * stateful stages keyed by value/(conv_id, sec); everything in between is
  * narrow (broadcast joins + compiled predicates).
  */
object Pipeline {

  /** State carried across runs (resume): seen first-seen values, fingerprint
    * buckets, per-(key, sec) frequency counts, and fired frequency buckets.
    * Empty for a fresh run. Contract: batches are processed in ascending,
    * non-overlapping time ranges (manifest-enforced), under which
    * run(A ∪ B) == run(B, state after A) exactly — see IncrementalSpec. */
  case class State(
      seenValues: Option[DataFrame],
      fpSeen: Option[DataFrame],
      freqCounts: Option[DataFrame] = None,
      firedBuckets: Option[DataFrame] = None)
  object State { val empty: State = State(None, None, None, None) }

  /** The pure transform: transcripts in, enriched detection rows out. */
  def enrich(turns: DataFrame, tables: RuleTables, conf: PipelineConf,
      state: State = State.empty): DataFrame =
    enrichPlanned(turns, tables, conf, state, persistIntermediates = false)._1

  /** enrich with explicit persist points at the two diamond-shaped stage
    * boundaries — FirstSeen consumes its input once per tracked field (the
    * value→min-key aggregations) plus the join-back, and Frequency consumes
    * its input for both the per-sec counts and the join-back. Without
    * persisting, Spark recomputes the whole upstream (scan→parse→joins) for
    * every branch; with it, branches share one materialization (the plan-audit
    * driver for this: docs/plans/enrich_full.txt). Callers own cleanup via the
    * returned thunk. */
  def enrichPlanned(turns: DataFrame, tables: RuleTables, conf: PipelineConf,
      state: State = State.empty, persistIntermediates: Boolean = true)
      : (DataFrame, () => Unit) = {
    val handles = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def p(df: DataFrame): DataFrame =
      if (!persistIntermediates) df
      else {
        val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        handles += c
        c
      }
    val parsed = Parse(turns, conf)
    val deduped = Dedup(parsed, conf, state.fpSeen)
    // the ONE persist: survivors feed (a) the main narrow enrich chain once
    // and (b) the slim first-seen/frequency aggregations, which read pruned
    // column batches from the cache
    val survivors = p(Whitelist(deduped, tables.whitelist))
    val enriched = RefCheck(
      SigRules(IocEnrich(survivors, tables.ioc, conf), tables.sigRules),
      tables.ref, conf)
    val withFirst = FirstSeen(enriched, conf, state.seenValues,
      aux = Some(survivors))
    val stateful = Frequency(withFirst, conf, state.freqCounts,
      state.firedBuckets, aux = Some(survivors))
    (Scoring(stateful, conf), () => handles.foreach(_.unpersist()))
  }

  // latest managed enrich: (identity key, result, cache-release thunk)
  private val managedRef =
    new java.util.concurrent.atomic.AtomicReference[Option[(Any, DataFrame, () => Unit)]](None)

  /** enrichPlanned for fire-and-forget callers (the driver-harness queries,
    * SparkEntry.entry): the returned DataFrame still benefits from the diamond
    * persist, at most ONE managed plan's caches are ever live (the harness
    * runs queries sequentially — no unbounded persist leak), and consecutive
    * calls with the SAME inputs return the SAME DataFrame so its cached
    * stages are shared instead of re-materialized (c8/c9/c9b run one chain,
    * not three). Callers that control their own lifecycle should use
    * enrichPlanned + the thunk.
    *
    * CONTRACT: callers are sequential and inputs are immutable — the cache is
    * keyed by the canonicalized logical plan, so if the files under the same
    * path change between calls the previous persisted data would be served;
    * interleaved callers can see their cache released mid-use. Both hold for
    * the driver harness (sequential queries over immutable sf dirs); anything
    * else must use enrichPlanned directly. */
  def enrichManaged(turns: DataFrame, tables: RuleTables,
      conf: PipelineConf, state: State = State.empty): DataFrame = managedRef.synchronized {
    val key = (turns.queryExecution.logical.canonicalized, conf,
      tables.sigRules, tables.whitelist,
      tables.ioc.queryExecution.logical.canonicalized,
      tables.ref.queryExecution.logical.canonicalized,
      state == State.empty)
    managedRef.get() match {
      case Some((k, df, _)) if k == key && state == State.empty => df
      case prev =>
        // release BEFORE persisting: persisting while the previous identical
        // plan is still registered logs 'already cached' and the later
        // unpersist would evict the shared entry from under the new plan
        prev.foreach(_._3())
        val (df, cleanup) = enrichPlanned(turns, tables, conf, state)
        // r6: persist the FINAL enriched output too, not only the survivors
        // diamond — the sharing callers (c8/c9/c9b/agg_rollup_sev_kind) each
        // re-ran the post-survivors half of the chain (ioc/sig/ref joins +
        // first-seen/frequency joins + scoring, ~2.5 s each at sf0.1)
        // against the cached survivors; with the result cached they read one
        // materialization (guide §5: reuse justifies the persist, and the
        // managed lifecycle already bounds it to one live plan)
        val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        managedRef.set(Some((key, cached, () => { cached.unpersist(); cleanup() })))
        cached
    }
  }

  /** Release the caches of the last enrichManaged plan (idempotent). */
  def releaseManaged(): Unit = managedRef.synchronized {
    managedRef.getAndSet(None).foreach(_._3())
  }

  /** FIR alert-document projection (SURVEY §2.1 S4): the reference's output
    * plugin posts an incident document — subject, category, severity — not a
    * raw event. category = the hit kind contributing the most score (ties by
    * detection priority sig > ioc > ref > new > freq); subject is a compact
    * human line. Pure narrow column work — zero extra shuffles. */
  def alertDocs(enriched: DataFrame): DataFrame = {
    val kinds = Seq("sig", "ioc", "ref", "new", "freq")
    def kindScore(k: String): Column =
      aggregate(filter(col("hits"), h => h.getField("kind") === k),
        lit(0), (acc, h) => acc + h.getField("score"))
    val withKs = kinds.foldLeft(enriched)((df, k) =>
      df.withColumn(s"_ks_$k", kindScore(k)))
    val category = kinds.init.zipWithIndex.foldLeft(None: Option[Column]) {
      case (acc, (k, i)) =>
        val rest = kinds.drop(i + 1).map(r => col(s"_ks_$r"))
        val hi = if (rest.size == 1) rest.head else greatest(rest: _*)
        Some(acc match {
          case None => when(col(s"_ks_$k") >= hi, k)
          case Some(w) => w.when(col(s"_ks_$k") >= hi, k)
        })
    }.get.otherwise(kinds.last)
    withKs
      .withColumn("category", category)
      .withColumn("subject", concat(
        lit("["), col("severity"), lit("] "), col("category"),
        lit(" conv="), col("conv_id"), lit("#"), col("turn_idx"),
        lit(" note="), col("note")))
      .drop(kinds.map(k => s"_ks_$k"): _*)
  }

  /** Per-signature rollup: counts + score mass + distinct conversations
    * (approx at scale; exact variant used in tests). */
  def rollupBySignature(enriched: DataFrame): DataFrame =
    enriched.select(explode(col("hits")).as("h"), col("conv_id"))
      .groupBy(col("h.kind").as("kind"), col("h.rule_id").as("rule_id"),
        col("h.name").as("name"))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("h.score")).cast("long").as("score_sum"),
        approx_count_distinct(col("conv_id")).as("approx_convs"))

  /** Per-sink (severity) rollup over routed rows. */
  def rollupBySink(enriched: DataFrame): DataFrame =
    enriched.filter(col("routed")).groupBy(col("severity")).agg(count(lit(1)).as("n"))

  /** Salted repartition for the sink write (SURVEY §2.9 R1 / north_star
    * "hash(conv_id) with salted keys"): distributing by (severity,
    * hash(conv_id) % salt) keeps one skewed severity band — routed alerts are
    * heavily skewed toward 'high' — from concentrating in few write tasks,
    * while still clustering each conversation's alerts into one file. */
  def saltedBySeverity(df: DataFrame, saltBuckets: Int): DataFrame =
    df.repartition(col("severity"), pmod(xxhash64(col("conv_id")), lit(saltBuckets)))

  /** Write-once C9 fan-out for very large batches (SURVEY §2.9 R2 at
    * 100 TB): [[route]]'s MEMORY_AND_DISK persist of the full-width enriched
    * set is right for in-memory-sized batches but becomes a 100-TB spill at
    * target scale. Here `enriched` is written EXACTLY ONCE to
    * `outDir/enriched` (salted for balanced files), and alerts + rollups are
    * derived from the WRITTEN table — each derivation is a column-pruned
    * parquet scan (hits/conv_id for the signature rollup, severity/routed
    * for the sink rollup), never a second pass over the source or a
    * full-width cache. Same sink-count contract as [[route]] (RouteSpec pins
    * equality). The incremental path batches by time range, so the written
    * table doubles as the queryable enriched archive. */
  def routeViaTable(spark: SparkSession, enriched: DataFrame, conf: PipelineConf,
      outDir: String): Map[String, Long] = {
    import graft.sources.Source
    Source.writeTable(saltedBySeverity(enriched, conf.saltBuckets),
      conf.sinkFormat, s"$outDir/enriched")
    // read back with the KNOWN schema: schema-light sink formats (json/csv)
    // would otherwise infer drifted types and drop all-null columns
    val written = Source.readTable(spark, conf.sinkFormat, s"$outDir/enriched",
      schema = Some(enriched.schema))
    // r6: the three derivations are independent column-pruned scans of the
    // written table — run them concurrently (guide §2.6), same as route
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val derivations = Seq[() => Unit](
      () => Source.writeTable(
        saltedBySeverity(alertDocs(written.filter(col("routed"))), conf.saltBuckets),
        conf.sinkFormat, s"$outDir/alerts_all", partitionCols = Seq("severity")),
      () => Source.writeTable(rollupBySignature(written), conf.sinkFormat,
        s"$outDir/rollup_signature"),
      () => Source.writeTable(rollupBySink(written), conf.sinkFormat,
        s"$outDir/rollup_sink"))
    derivations.map(w => Future(w())).foreach(Await.result(_, Duration.Inf))
    // per-sink counts from ONE pruned aggregation over the written table
    // (severity + routed columns only — not an observe over a full pass)
    val severities = conf.severityBands.map(_._2)
    val aggs = count(lit(1)).as("n_total") +: severities.map(s =>
      sum(when(col("routed") && col("severity") === s, 1L).otherwise(0L)).as(s"n_$s"))
    val m = written.agg(aggs.head, aggs.tail: _*).first()
    severities.zipWithIndex.map { case (s, i) => s -> m.getLong(i + 1) }.toMap +
      ("total" -> m.getLong(0))
  }

  /** C9 fan-out: ONE pass over the enriched rows (persist), then K filtered
    * sink writes + alerts_all partitioned by severity (SURVEY §2.9 R2 — never
    * K source re-reads). Returns per-sink counts from `observe` metrics,
    * plus "total" = all enriched rows. */
  def route(spark: SparkSession, enriched: DataFrame, conf: PipelineConf,
      outDir: String): Map[String, Long] = {
    import org.apache.spark.sql.Observation
    val cached = enriched.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val obs = Observation("sinks")
      val severities = conf.severityBands.map(_._2)
      val aggs = count(lit(1)).as("n_total") +: severities.map(s =>
        sum(when(col("routed") && col("severity") === s, 1L).otherwise(0L)).as(s"n_$s"))
      // materialize the cache + deliver the observation with a PLAIN action
      // first: a partitioned write whose routed subset is empty drops
      // observed metrics entirely (Spark 4.1) and obs.get would hang
      cached.observe(obs, aggs.head, aggs.tail: _*).count()
      // r6: the three sink writes are INDEPENDENT jobs over the already
      // materialized cache — submit them from a small thread pool (guide
      // §2.6) so each write's straggler tail and commit phase overlaps the
      // others' tasks instead of serializing three full job walls. FIFO
      // scheduling back-fills freed cores; failures propagate via Await.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val writes = Seq[() => Unit](
        () => graft.sources.Source.writeTable(
          saltedBySeverity(alertDocs(cached.filter(col("routed"))), conf.saltBuckets),
          conf.sinkFormat, s"$outDir/alerts_all", partitionCols = Seq("severity")),
        () => graft.sources.Source.writeTable(rollupBySignature(cached),
          conf.sinkFormat, s"$outDir/rollup_signature"),
        () => graft.sources.Source.writeTable(rollupBySink(cached),
          conf.sinkFormat, s"$outDir/rollup_sink"))
      writes.map(w => Future(w())).foreach(Await.result(_, Duration.Inf))
      val m = obs.get
      severities.map(s => s -> m(s"n_$s").asInstanceOf[Long]).toMap +
        ("total" -> m("n_total").asInstanceOf[Long])
    } finally cached.unpersist()
  }
}
