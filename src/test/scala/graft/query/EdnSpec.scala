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

  test("F9 recursive-replace: atoms replaced at any depth, keys included") {
    import Edn._
    val form = parse("""{:topic :raw, :routes [{:raw 1} #{:raw "raw"}], :fn (inc :raw)}""").get
    val out = recursiveReplace(form, Kw("raw"), Kw("clean"))
    assert(render(out) ==
      """{:topic :clean, :routes [{:clean 1} #{:clean "raw"}], :fn (inc :clean)}""")
    // strings are distinct from keywords — "raw" above survived; and the
    // reference's cond order means a COLLECTION equal to the find target
    // is recursed into, never replaced wholesale
    val nested = parse("[[1 2] [1 2]]").get
    assert(recursiveReplace(nested, parse("[1 2]").get, Lng(9L)) == nested)
  }

  test("F9 replace-these: tuples apply left-to-right, later sees earlier") {
    import Edn._
    val form = parse("[:a :b]").get
    // :a → :b first, then :b → :c — BOTH end as :c, like the reference's recur
    assert(render(replaceThese(form, (Kw("a"), Kw("b")), (Kw("b"), Kw("c"))))
      == "[:c :c]")
  }

  test("property: render/parse round-trip on generated finite forms") {
    import Edn._
    val rnd = new scala.util.Random(7)
    def gen(depth: Int): Value = rnd.nextInt(if (depth > 2) 7 else 10) match {
      case 0 => Nil
      case 1 => Bool(rnd.nextBoolean())
      case 2 => Lng(rnd.nextLong() % 1000)
      case 3 => Dbl(math.round(rnd.nextDouble() * 1e4) / 1e2) // finite, exact
      case 4 => Str(rnd.alphanumeric.take(rnd.nextInt(6)).mkString + "\n\"x")
      case 5 => Kw("k" + rnd.nextInt(100))
      case 6 => Sym("s" + rnd.nextInt(100))
      case 7 => Vec(List.fill(rnd.nextInt(4))(gen(depth + 1)))
      case 8 => Lst(List.fill(rnd.nextInt(4))(gen(depth + 1)))
      case 9 => MapV(List.fill(rnd.nextInt(3))((Kw("f" + rnd.nextInt(50)), gen(depth + 1)))
        .distinctBy(_._1))
    }
    for (i <- 1 to 300) {
      val v = gen(0)
      assert(parse(render(v)).contains(v), s"seed-case $i: ${render(v)}")
    }
  }

  test("property: parser is total on arbitrary strings") {
    val gen = Gen.asciiPrintableStr
    (1 to 500).foreach(n => gen.apply(Gen.Parameters.default.withSize(n % 60),
      org.scalacheck.rng.Seed(n.toLong)).foreach(s => Edn.toJson(s)))
  }
}
