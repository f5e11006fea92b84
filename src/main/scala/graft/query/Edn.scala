package graft.query

import scala.collection.mutable

/** Minimal EDN reader (X6, SURVEY.md §2.5): the reference's Kafka topics
  * carry EDN payloads decoded by a non-evaluating reader with time-literal
  * support (`/root/reference/src/dataworks/utils/common.clj:112-118`,
  * `/root/reference/src/dataworks/utils/kafka.clj:112-128`). Spark has no
  * EDN builtin, so this parser converts EDN → JSON text; downstream the
  * standard `from_json`/`get_json_object` machinery applies. Registered as
  * the `edn_to_json` UDF by [[Functions.register]].
  *
  * Supported: nil, booleans, longs, doubles, strings, characters,
  * keywords, symbols, vectors, lists, sets (→ arrays), maps, #inst/#uuid
  * tagged literals, #_ discard, ; comments, commas-as-whitespace.
  * Non-evaluating and total: malformed input → null (no throw), matching
  * the reference's safe-read posture.
  */
object Edn {

  sealed trait Value
  case object Nil extends Value
  final case class Bool(b: Boolean) extends Value
  final case class Lng(l: Long) extends Value
  final case class Dbl(d: Double) extends Value
  final case class Str(s: String) extends Value
  final case class Kw(name: String) extends Value      // :ns/name → name "ns/name"
  final case class Sym(name: String) extends Value
  final case class Vec(items: List[Value]) extends Value
  /** Lists are kept distinct from vectors: Datalog clause syntax relies on
    * it (`[?e :a ?v]` pattern vs `(not …)`/`(or …)`/`(rule ?x)` call). */
  final case class Lst(items: List[Value]) extends Value
  final case class SetV(items: List[Value]) extends Value
  final case class MapV(entries: List[(Value, Value)]) extends Value
  final case class Tagged(tag: String, value: Value) extends Value

  def parse(s: String): Option[Value] =
    try {
      val p = new Parser(s)
      val v = p.readValue()
      p.skipWs()
      if (p.atEnd) Some(v) else None
    } catch { case _: Throwable => None }

  /** EDN text → JSON text (null on malformed input). */
  def toJson(edn: String): String =
    if (edn == null) null
    else parse(edn).map(jsonify).orNull

  private def jsonify(v: Value): String = v match {
    case Nil => "null"
    case Bool(b) => b.toString
    case Lng(l) => l.toString
    case Dbl(d) => if (d.isNaN || d.isInfinite) "null" else d.toString
    case Str(s) => quote(s)
    case Kw(n) => quote(n)
    case Sym(n) => quote(n)
    case Vec(xs) => xs.map(jsonify).mkString("[", ",", "]")
    case Lst(xs) => xs.map(jsonify).mkString("[", ",", "]")
    case SetV(xs) => xs.map(jsonify).mkString("[", ",", "]")
    case MapV(es) => es.map { case (k, value) =>
        val key = k match {
          case Kw(n) => quote(n)
          case Str(s) => quote(s)
          case other => quote(jsonify(other))
        }
        s"$key:${jsonify(value)}"
      }.mkString("{", ",", "}")
    case Tagged(_, value) => jsonify(value) // #inst "..." → the ISO string
  }

  /** F9 (`recursive-replace`, `/root/reference/src/dataworks/utils/
    * common.clj:505-522`): deep find/replace over a parsed form. Matches
    * the reference's semantics exactly: collections are RECURSED INTO,
    * never compared wholesale (its `cond` checks `map?`/`vector?`/`set?`/
    * `seq?` before `=`), so only atoms are ever replaced — and map KEYS
    * participate (a Clojure MapEntry is a vector, so its `once-more` hits
    * both slots). Naive and total, as documented there. */
  def recursiveReplace(form: Value, find: Value, replacement: Value): Value =
    form match {
      case Vec(xs) => Vec(xs.map(recursiveReplace(_, find, replacement)))
      case Lst(xs) => Lst(xs.map(recursiveReplace(_, find, replacement)))
      case SetV(xs) => SetV(xs.map(recursiveReplace(_, find, replacement)).distinct)
      case MapV(es) => MapV(es.map { case (k, v) =>
        (recursiveReplace(k, find, replacement), recursiveReplace(v, find, replacement)) })
      case Tagged(t, v) => Tagged(t, recursiveReplace(v, find, replacement))
      case atom => if (atom == find) replacement else atom
    }

  /** `replace-these` (common.clj:524-533): fold [[recursiveReplace]] over
    * find/replacement tuples left-to-right — later tuples see the results
    * of earlier ones, exactly like the reference's `recur` loop. */
  def replaceThese(form: Value, tuples: (Value, Value)*): Value =
    tuples.foldLeft(form) { case (f, (find, repl)) => recursiveReplace(f, find, repl) }

  /** Canonical EDN text for a form — the `pr-str` the reference puts
    * recursive-replace in front of ("ensure that maps actually end up
    * quoted as maps, sets as sets"). Round-trips through [[parse]] for
    * every finite value. */
  def render(v: Value): String = v match {
    case Nil => "nil"
    case Bool(b) => b.toString
    case Lng(l) => l.toString
    case Dbl(d) =>
      if (d.isNaN) "##NaN" else if (d == Double.PositiveInfinity) "##Inf"
      else if (d == Double.NegativeInfinity) "##-Inf" else d.toString
    case Str(s) => quote(s)
    case Kw(n) => s":$n"
    case Sym(n) => n
    case Vec(xs) => xs.map(render).mkString("[", " ", "]")
    case Lst(xs) => xs.map(render).mkString("(", " ", ")")
    case SetV(xs) => xs.map(render).mkString("#{", " ", "}")
    case MapV(es) => es.map { case (k, value) => s"${render(k)} ${render(value)}" }
      .mkString("{", ", ", "}")
    case Tagged(tag, value) => s"#$tag ${render(value)}"
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length

    def skipWs(): Unit = {
      while (!atEnd && (s(i).isWhitespace || s(i) == ',' || s(i) == ';')) {
        if (s(i) == ';') { while (!atEnd && s(i) != '\n') i += 1 }
        else i += 1
      }
      // #_ discard: skip the next form entirely
      if (i + 1 < s.length && s(i) == '#' && s(i + 1) == '_') {
        i += 2; readValue(); skipWs()
      }
    }

    def readValue(): Value = {
      skipWs()
      if (atEnd) throw new IllegalArgumentException("eof")
      s(i) match {
        case '[' => i += 1; Vec(readSeq(']'))
        case '(' => i += 1; Lst(readSeq(')'))
        case '{' => i += 1; readMap()
        case '"' => Str(readString())
        case ':' => i += 1; Kw(readToken())
        case '\\' => i += 1; Str(readChar())
        case '#' => readDispatch()
        case _ => readAtom()
      }
    }

    private def readSeq(close: Char): List[Value] = {
      val buf = mutable.ListBuffer.empty[Value]
      skipWs()
      while (!atEnd && s(i) != close) { buf += readValue(); skipWs() }
      if (atEnd) throw new IllegalArgumentException(s"unclosed $close")
      i += 1
      buf.toList
    }

    private def readMap(): MapV = {
      val items = readSeq('}')
      if (items.length % 2 != 0) throw new IllegalArgumentException("odd map")
      MapV(items.grouped(2).collect { case List(k, v) => (k, v) }.toList)
    }

    private def readDispatch(): Value = {
      i += 1 // past '#'
      if (atEnd) throw new IllegalArgumentException("eof after #")
      if (s(i) == '{') { i += 1; SetV(readSeq('}')) }
      else { // tagged literal: #inst "...", #uuid "..."
        val tag = readToken()
        val v = readValue()
        Tagged(tag, v)
      }
    }

    private def readString(): String = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (!atEnd && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '"' => '"'; case '\\' => '\\'
            case 'u' =>
              val hex = s.substring(i + 1, i + 5); i += 4
              Integer.parseInt(hex, 16).toChar
            case c => c
          })
          i += 1
        } else { sb.append(s(i)); i += 1 }
      }
      if (atEnd) throw new IllegalArgumentException("unclosed string")
      i += 1
      sb.toString
    }

    private def readChar(): String = {
      val tok = readToken()
      tok match {
        case "newline" => "\n"; case "space" => " "; case "tab" => "\t"
        case "return" => "\r"
        case t if t.nonEmpty => t.take(1)
        case _ => throw new IllegalArgumentException("bad char")
      }
    }

    private def readToken(): String = {
      val start = i
      while (!atEnd && !s(i).isWhitespace && !",[](){}\";".contains(s(i))) i += 1
      if (i == start) throw new IllegalArgumentException("empty token")
      s.substring(start, i)
    }

    private def readAtom(): Value = {
      val tok = readToken()
      tok match {
        case "nil" => Nil
        case "true" => Bool(true)
        case "false" => Bool(false)
        case t =>
          try Lng(java.lang.Long.parseLong(t))
          catch {
            case _: NumberFormatException =>
              try Dbl(java.lang.Double.parseDouble(t))
              catch { case _: NumberFormatException => Sym(t) }
          }
      }
    }
  }
}
