package graft.entry

import org.apache.spark.sql.DataFrame

/** Latest-only persist registry for harness queries that fan one expensive
  * subtree into several consumers (or whose subtree would be duplicated by
  * Catalyst alias substitution — e.g. the adapter's synthesized text column
  * feeding many grok references): `cycle(df)` releases the PREVIOUS query's
  * cache and persists df for this one. The harness runs queries
  * sequentially, so at most one query's cache is ever live (same pattern as
  * Pipeline.enrichManaged). */
private[entry] object QueryCache {
  private val handles =
    new java.util.concurrent.atomic.AtomicReference[List[DataFrame]](Nil)

  /** Release every cache of the PREVIOUS query, persist df for this one. */
  def cycle(df: DataFrame): DataFrame = {
    handles.getAndSet(Nil).foreach(_.unpersist())
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    handles.set(List(cached))
    cached
  }

  /** Persist an ADDITIONAL subtree of the SAME query (released together with
    * it on the next cycle). Call only after this query's cycle(). */
  def retain(df: DataFrame): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    handles.updateAndGet(cached :: _)
    cached
  }
}
