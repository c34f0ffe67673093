package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CIDR subnet compiler (SURVEY §2.2 P14 — the Logstash cidr filter's
  * `network` option takes "a.b.c.d/n" subnet strings). Subnets are parsed at
  * PLAN time into inclusive (lo, hi) numeric ranges feeding a pure-Catalyst
  * octet-math range check — no UDF, fully codegen'd, and a list of subnets
  * compiles to an OR of range predicates that Catalyst can reorder. */
object Cidr {

  /** "10.0.0.0/8" → inclusive (lo, hi) numeric IPv4 range. The base address
    * is masked, so "10.0.0.77/24" means the containing /24 block. */
  def range(cidr: String): (Long, Long) = {
    val parts = cidr.split("/")
    require(parts.length == 2, s"bad CIDR '$cidr' (want a.b.c.d/n)")
    val prefix = parts(1).toInt
    require(prefix >= 0 && prefix <= 32, s"bad prefix length in '$cidr'")
    val octets = parts(0).split("\\.")
    require(octets.length == 4, s"bad IPv4 address in '$cidr'")
    val ipn = octets.foldLeft(0L) { (acc, o) =>
      val v = o.toLong
      require(v >= 0 && v <= 255, s"bad octet $o in '$cidr'")
      (acc << 8) | v
    }
    val mask = if (prefix == 0) 0L else (0xffffffffL << (32 - prefix)) & 0xffffffffL
    val lo = ipn & mask
    (lo, lo | (~mask & 0xffffffffL))
  }

  /** Dotted-quad string column → numeric IPv4; NULL (⇒ no subnet matches,
    * the Logstash cidr behavior) on malformed input — wrong octet count,
    * non-numeric octets, or octets outside 0..255 ('10.0.0.999' passes the
    * grok IP pattern's \d{1,3} but is not an address). try_cast + get()
    * because ANSI-mode cast/element_at THROW on bad input. */
  def ipNum(ip: Column): Column = {
    val parts = split(ip, "\\.")
    val o = (i: Int) => get(parts, lit(i)).try_cast("long")
    val valid = size(parts) === 4 &&
      (0 to 3).map(i => o(i).isNotNull && o(i) >= 0L && o(i) <= 255L)
        .reduce(_ && _)
    when(valid, o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3))
  }

  /** true iff the dotted-quad `ip` column falls inside ANY of the subnets. */
  def inAnySubnet(ip: Column, subnets: Seq[String]): Column = {
    require(subnets.nonEmpty, "at least one subnet required")
    val n = ipNum(ip)
    subnets.map(range).map { case (lo, hi) => n.between(lo, hi) }.reduce(_ || _)
  }

  def inSubnet(ip: Column, cidr: String): Column = inAnySubnet(ip, Seq(cidr))
}
