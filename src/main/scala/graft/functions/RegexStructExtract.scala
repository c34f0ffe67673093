package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-thread, per-regex memo of the last (text → parsed row). Catalyst's
  * filter-pushdown substitutes aliases by their defining expressions, which
  * can duplicate a grok extraction dozens of times across a plan (one per
  * referenced field / rule clause). Conditional contexts (CASE WHEN) also
  * defeat codegen subexpression elimination. All duplicates of one logical
  * extraction evaluate the SAME input row back-to-back on the same task
  * thread, so a one-entry memo collapses N regex matches per row to 1
  * (measured 327s → ~9s on the 4.4M-row bench for the rule stage). */
private object GrokMemo {
  final class Entry { var text: UTF8String = _; var row: InternalRow = _ }
  private val tl = new ThreadLocal[java.util.HashMap[String, Entry]] {
    override def initialValue() = new java.util.HashMap[String, Entry]
  }
  def entry(regex: String): Entry = {
    val m = tl.get()
    var e = m.get(regex)
    if (e == null) { e = new Entry; m.put(regex, e) }
    e
  }
}

/** Serializable one-regex-many-groups matcher shared by interpreted eval and
  * generated code. `Pattern` is not serializable → compile lazily per JVM. */
final class GrokMatcher(val regex: String, val numFields: Int) extends Serializable {
  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  /** One `find()` per row; returns null when the pattern does not match
    * (grok `_grokparsefailure` semantics), else a row of UTF8String|null.
    * Memoized per (thread, regex) on the last input — duplicate evaluations
    * of the same row (plan-duplicated expressions) are near-free. */
  def matchRow(text: UTF8String): InternalRow = {
    if (text == null) return null
    val memo = GrokMemo.entry(regex)
    if (memo.text != null && memo.text.equals(text)) return memo.row
    val m = pattern.matcher(text.toString)
    val row: InternalRow =
      if (!m.find()) null
      else {
        val vals = new Array[Any](numFields)
        var i = 0
        while (i < numFields) {
          val g = m.group(i + 1)
          vals(i) = if (g == null) null else UTF8String.fromString(g)
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      }
    // UTF8String may be backed by reused buffers upstream — copy the key
    memo.text = text.clone()
    memo.row = row
    row
  }
}

/** Catalyst-native grok: match the compiled grok regex ONCE per row and emit a
  * struct of all capture groups (SURVEY.md §2.2 P1).
  *
  * k× `regexp_extract(text, pat, i)` would run the same regex k times per row;
  * this runs it once, and stays inside whole-stage codegen (the generated code
  * is a single virtual call into [[GrokMatcher]], no interpreted `eval` path).
  * Null result ⇔ no match ⇔ Logstash's `_grokparsefailure`.
  */
case class RegexStructExtract(child: Expression, regex: String, fields: Seq[String])
    extends UnaryExpression {

  private val matcher = new GrokMatcher(regex, fields.size)

  override def dataType: DataType =
    StructType(fields.map(f => StructField(f, StringType, nullable = true)))

  override def nullable: Boolean = true

  override def prettyName: String = "grok_struct"

  override def nullSafeEval(input: Any): Any =
    matcher.matchRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("grokMatcher", matcher, classOf[GrokMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |InternalRow ${ev.value}$$r = $ref.matchRow($c);
         |if (${ev.value}$$r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}$$r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexStructExtract =
    copy(child = newChild)
}

object RegexStructExtract {
  import GrokCompiler.CompiledGrok

  /** `grok_struct($"text")` — struct column of all grok fields, null on miss. */
  def grokStruct(c: Column, g: CompiledGrok): Column =
    columnOf(RegexStructExtract(expressionOf(c), g.regex, g.fields))
}
