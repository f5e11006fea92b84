package graft.query

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class EdnSpec extends AnyFunSuite {

  test("primitives") {
    assert(Edn.toJson("nil") == "null")
    assert(Edn.toJson("true") == "true")
    assert(Edn.toJson("42") == "42")
    assert(Edn.toJson("-7.5") == "-7.5")
    assert(Edn.toJson("\"hi\\nthere\"") == "\"hi\\nthere\"")
    assert(Edn.toJson(":a/b") == "\"a/b\"")
  }

  test("collections: vector, list, set, map") {
    assert(Edn.toJson("[1 2 3]") == "[1,2,3]")
    assert(Edn.toJson("(1 2)") == "[1,2]")
    assert(Edn.toJson("#{1 2}") == "[1,2]")
    assert(Edn.toJson("{:a 1 :b \"x\"}") == """{"a":1,"b":"x"}""")
  }

  test("nested kafka-message shape (kafka.clj:93-100)") {
    val edn = """{:key :event/click, :value {:user 42 :amount 9.5}, :timestamp #inst "2024-01-01T00:00:00Z"}"""
    assert(Edn.toJson(edn) ==
      """{"key":"event/click","value":{"user":42,"amount":9.5},"timestamp":"2024-01-01T00:00:00Z"}""")
  }

  test("comments, commas, and #_ discard are skipped") {
    assert(Edn.toJson("[1, 2, ;; comment\n 3]") == "[1,2,3]")
    assert(Edn.toJson("[1 #_ 99 2]") == "[1,2]")
  }

  test("malformed input returns null, never throws") {
    for (bad <- Seq("{:a", "[1 2", "\"open", "#", "{:a 1 :b}", ""))
      assert(Edn.toJson(bad) == null, s"input: $bad")
  }

  test("json output is parseable by a JSON reader (spot check via spark later)") {
    // quick structural sanity: braces balance on a gnarly doc
    val j = Edn.toJson("""{:fn/name "add", :args [1 2 -3.5], :opts #{:a :b}, :meta nil}""")
    assert(j == """{"fn/name":"add","args":[1,2,-3.5],"opts":["a","b"],"meta":null}""")
  }

  test("property: parser is total on arbitrary strings") {
    val gen = Gen.asciiPrintableStr
    (1 to 500).foreach(n => gen.apply(Gen.Parameters.default.withSize(n % 60),
      org.scalacheck.rng.Seed(n.toLong)).foreach(s => Edn.toJson(s)))
  }
}
