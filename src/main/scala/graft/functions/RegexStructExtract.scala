package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serializable one-regex-many-groups matcher shared by interpreted eval and
  * generated code. `Pattern` is not serializable → compile lazily per JVM. */
final class GrokMatcher(val regex: String, val numFields: Int) extends Serializable {
  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  /** One `find()` per row; returns null when the pattern does not match
    * (grok `_grokparsefailure` semantics), else a row of UTF8String|null. */
  def matchRow(text: UTF8String): InternalRow = {
    if (text == null) return null
    val m = pattern.matcher(text.toString)
    if (!m.find()) return null
    val vals = new Array[Any](numFields)
    var i = 0
    while (i < numFields) {
      val g = m.group(i + 1)
      vals(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
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
