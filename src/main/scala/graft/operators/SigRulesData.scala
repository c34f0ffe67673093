package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.PipelineConf

/** C4b — the data-driven signature-rule tier (SURVEY §2.4).
  *
  * The compiled tier (operators.SigRules) folds plan-time-known rules into
  * boolean Columns — zero joins, codegen'd, and the default. This tier keeps
  * the rules AS DATA: a broadcast theta-join probes every (row, clause) pair,
  * so rules can change without re-planning (hot-reload, rules too numerous to
  * compile). Bounded: |clauses| is broadcast-small, so the
  * BroadcastNestedLoopJoin does |rows|×|clauses| predicate evaluations — the
  * same work the reference's Ruby loop does per event, but distributed.
  *
  * Multi-clause rules AND together: a rule fires on a row iff its matched
  * clause count equals its total clause count. Output is identical to the
  * compiled tier (equivalence pinned in SigRulesDataSpec).
  */
object SigRulesData {

  def apply(df: DataFrame, rulesDf: DataFrame, conf: PipelineConf): DataFrame = {
    val spark = df.sparkSession
    // the probe map carries SCALAR fields only — an array-field rule (tags)
    // would silently never match here; fail loud and point at the compiled
    // tier (rulesDf is broadcast-small by contract, so this check is cheap)
    require(rulesDf.filter(col("field")
      .isin(ClauseCompiler.ArrayFields.toSeq: _*)).limit(1).count() == 0,
      s"SigRulesData supports scalar fields only; use the compiled SigRules " +
        s"tier for array-field rules (${ClauseCompiler.ArrayFields.mkString(",")})")

    // field-name → value map evaluated per row (status canonicalized as string)
    val fieldMap = map(
      lit("action"), col("action"), lit("user"), col("user"),
      lit("src_ip"), col("src_ip"), lit("dst_host"), col("dst_host"),
      lit("hashv"), col("hashv"), lit("uri"), col("uri"),
      lit("role"), col("role"), lit("tool"), col("tool"),
      lit("conv_id"), col("conv_id"),
      lit("status"), col("status").cast("string"))

    val clauseTotals = rulesDf.groupBy("rule_id")
      .agg(count(lit(1)).as("_n_clauses"),
        first(col("name")).as("_name"),
        sum(col("score")).cast("int").as("_score"))

    val r = broadcast(rulesDf)
    val v = element_at(col("_fm"), r("field"))
    // status clauses compare NUMERICALLY with trimmed args — the compiled
    // tier does arg.trim.toInt, so ' 503' / '0503' must behave identically
    // in both tiers (tier-equivalence is the contract, SigRulesDataSpec)
    // try_cast throughout: ANSI cast throws on malformed input, and codegen
    // subexpression elimination hoists casts OUT of the conditional guards
    val isStatus = r("field") === "status"
    val eqOk = when(isStatus, v.try_cast("int") === trim(r("arg")).try_cast("int"))
      .otherwise(v === r("arg"))
    val inOk = when(isStatus,
      array_contains(transform(split(r("arg"), ","),
        x => trim(x).try_cast("int")), v.try_cast("int")))
      .otherwise(array_contains(split(r("arg"), ","), v))
    val matches =
      (r("op") === "rx" && v.isNotNull && regexp_like(v, r("arg"))) ||
        (r("op") === "eq" && eqOk) ||
        (r("op") === "in" && inOk) ||
        (r("op") === "lt" && v.try_cast("double") < trim(r("arg")).try_cast("double")) ||
        (r("op") === "gt" && v.try_cast("double") > trim(r("arg")).try_cast("double")) ||
        (r("op") === "exists" && v.isNotNull && v =!= "")

    val probed = df.select(col("conv_id"), col("turn_idx"), fieldMap.as("_fm"),
      col("parse_ok"))
      .filter(col("parse_ok"))
      .join(r, matches, "inner")
      .groupBy(col("conv_id"), col("turn_idx"), col("rule_id"))
      .agg(count(lit(1)).as("_matched"))
      .join(broadcast(clauseTotals), "rule_id")
      .filter(col("_matched") === col("_n_clauses"))
      .groupBy("conv_id", "turn_idx")
      .agg(array_sort(collect_list(struct(
        col("rule_id"), col("_name").as("name"), col("_score").as("score"),
        lit("sig").as("kind")))).as("hits_sig"))

    df.join(probed, Seq("conv_id", "turn_idx"), "left_outer")
      .withColumn("hits_sig", coalesce(col("hits_sig"),
        array().cast("array<struct<rule_id:int,name:string,score:int,kind:string>>")))
  }
}
