package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two text units the curation family chunks documents into — shared by
  * the batch queries (entry/DataPipeQueries) and the resumable curation-state
  * runner (operators/CurationState), so the incremental path can never drift
  * from the single-pass differential semantics. DuckDB oracle twins live next
  * to the queries that render them. */
object TextUnits {

  /** Non-overlapping 10-word segment windows of `text`, as
    * struct(seg_idx, seg) — the CCNet-style "line" unit for boilerplate
    * removal. */
  def segWindows: Column = expr(
    """transform(
      |  sequence(0, CAST(floor((size(split(text, ' ')) + 9) / 10) AS INT) - 1),
      |  k -> struct(k AS seg_idx,
      |    array_join(slice(split(text, ' '), k * 10 + 1, 10), ' ') AS seg))""".stripMargin)

  /** Distinct md5-hashed word-8-gram shingles of `text` (the
    * eval-contamination screen unit). Caller filters to docs of ≥ 8 words. */
  def gram8: Column = expr(
    """array_distinct(transform(sequence(0, size(split(text, ' ')) - 8),
      |  i -> md5(array_join(slice(split(text, ' '), i + 1, 8), ' '))))""".stripMargin)
}
