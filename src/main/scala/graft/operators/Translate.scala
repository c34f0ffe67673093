package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P15 translate filter, full surface (SURVEY §2.2 — Logstash translate
  * supports an inline dictionary, a dictionary FILE, and regex-key mode).
  *
  *  - inline dict  → `typedlit(Map…)` (see LogQueries p15_translate);
  *  - dict file    → any tabular source read at the call site (csv/parquet/
  *    …) becomes a BROADCAST hash join — dictionaries are broadcast-small
  *    by contract, and hot-reloading the file re-plans only this join;
  *  - regex keys   → compiled at plan time into a first-match-wins
  *    when-chain (the translate filter's `regex => true` mode), zero joins.
  */
object Translate {

  /** Dictionary-table mode: dict(key, value) joined broadcast-left; misses
    * get `default`. Duplicate keys are REJECTED loudly (a silently-arbitrary
    * pick would mask a corrupt dictionary file; dictionaries are
    * broadcast-small by contract, so the check is cheap). */
  def byTable(df: DataFrame, dict: DataFrame, src: Column, out: String,
      default: String): DataFrame = {
    val dups = dict.groupBy(col("key")).count().filter(col("count") > 1)
      .select("key").limit(5).collect().map(_.get(0))
    require(dups.isEmpty,
      s"translate dictionary has duplicate keys: ${dups.mkString(", ")}")
    val d = broadcast(dict.select(col("key").as("_tr_k"), col("value").as("_tr_v")))
    df.join(d, src === col("_tr_k"), "left_outer")
      .withColumn(out, coalesce(col("_tr_v"), lit(default)))
      .drop("_tr_k", "_tr_v")
  }

  /** Regex-key mode: (pattern → value) pairs tried in order, first match
    * wins; misses get `default`. Fully codegen'd, no joins. */
  def byRegex(df: DataFrame, pairs: Seq[(String, String)], src: Column,
      out: String, default: String): DataFrame = {
    require(pairs.nonEmpty, "at least one (pattern, value) pair")
    val chain = pairs.foldLeft(None: Option[Column]) { case (acc, (p, v)) =>
      Some(acc match {
        case None => when(src.isNotNull && src.rlike(p), v)
        case Some(c) => c.when(src.isNotNull && src.rlike(p), v)
      })
    }.get.otherwise(default)
    df.withColumn(out, chain)
  }
}
