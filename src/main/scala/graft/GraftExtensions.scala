package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{GrokCompiler, RegexStructExtract}

/** SparkSessionExtensions hook: exposes the native grok expression to SQL as
  * `grok_struct(text, '<pattern>'[, '<fallback>', …])` — patterns must be
  * literals; the list compiles at plan time and is tried first-match-wins
  * per row (SURVEY §2.2 P1, Logstash `match`-list semantics).
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or retro-fit an existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.grokStructDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.size >= 2, "grok_struct(text, 'pattern'[, 'fallback', ...])")
    val pats = exprs.tail.map {
      case lit if lit.foldable =>
        val v = lit.eval()
        // a foldable NULL would otherwise stringify to the 4-char pattern
        // "null" and compile into a regex that silently matches nothing
        require(v != null, "grok_struct pattern literal must not be NULL")
        String.valueOf(v)
      case other => throw new IllegalArgumentException(
        s"grok_struct patterns must be literals, got $other")
    }
    val g = GrokCompiler.compileMulti(pats)
    RegexStructExtract(exprs.head, g.patterns.map(_.regex), g.groupMaps, g.fields)
  }

  val grokStructDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("grok_struct"),
      new ExpressionInfo(classOf[RegexStructExtract].getName, "grok_struct"),
      build _)

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "grok_struct", build, "built-in")
}
