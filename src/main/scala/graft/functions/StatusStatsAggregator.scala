package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The custom-UDAF escape hatch of SURVEY §2.6, demonstrated as a typed
  * `Aggregator`: per-group count / sum / max over a nullable int column
  * (registered with `functions.udaf`, codegen-compatible, partial-merge
  * aggregation — the Spark-native replacement for the reference's per-event
  * metric counters). */
object StatusStatsAggregator {

  final case class In(value: Int, valid: Boolean)
  final case class Buf(n: Long, sum: Long, max: Int)
  final case class Out(n: Long, sum: Long, max: Option[Int])

  val agg: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = Buf(0L, 0L, Int.MinValue)
    def reduce(b: Buf, a: In): Buf =
      if (!a.valid) b
      else Buf(b.n + 1, b.sum + a.value, math.max(b.max, a.value))
    def merge(x: Buf, y: Buf): Buf =
      Buf(x.n + y.n, x.sum + y.sum, math.max(x.max, y.max))
    def finish(b: Buf): Out =
      Out(b.n, b.sum, if (b.n == 0) None else Some(b.max))
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Column form: `statusStats(struct(coalesce(c, 0), c.isNotNull))`. */
  def udafColumn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg, Encoders.product[In])
}
