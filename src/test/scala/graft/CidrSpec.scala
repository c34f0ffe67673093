package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cidr

class CidrSpec extends AnyFunSuite {

  test("aligned prefixes") {
    assert(Cidr.range("10.0.0.0/8") === (167772160L, 184549375L))
    assert(Cidr.range("203.0.113.0/24") === (3405803776L, 3405804031L))
    assert(Cidr.range("192.168.0.0/16") === (3232235520L, 3232301055L))
  }

  test("arbitrary (non-octet) prefix lengths") {
    // /15 spans two /16s
    assert(Cidr.range("10.2.0.0/15") === (167903232L, 168034303L))
    // /31 is a 2-address block, /32 a host route
    assert(Cidr.range("10.0.0.6/31") === (167772166L, 167772167L))
    assert(Cidr.range("255.255.255.255/32") === (4294967295L, 4294967295L))
    assert(Cidr.range("0.0.0.0/0") === (0L, 4294967295L))
  }

  test("base address is masked to the block start") {
    assert(Cidr.range("10.0.0.77/24") === (167772160L, 167772415L))
  }

  test("malformed input rejected") {
    intercept[IllegalArgumentException](Cidr.range("10.0.0.0"))
    intercept[IllegalArgumentException](Cidr.range("10.0.0.0/33"))
    intercept[IllegalArgumentException](Cidr.range("10.0.0/8"))
    intercept[IllegalArgumentException](Cidr.range("10.0.0.256/8"))
  }
}
