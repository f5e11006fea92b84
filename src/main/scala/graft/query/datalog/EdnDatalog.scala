package graft.query.datalog

import graft.query.Edn
import graft.query.Edn.{Bool, Dbl, Kw, Lng, Lst, Str, Sym, Value, Vec}
import Ast._

/** Parses the reference's ACTUAL query syntax — Crux EDN Datalog as it
  * appears throughout the repo (`/root/reference/src/dataworks/utils/alert.clj:9-15`,
  * `/root/reference/src/dataworks/db/app_db.clj:58-69,115-126`,
  * `/root/reference/src/dataworks/utils/auth.clj:91-96`) — into the
  * [[Ast.Query]] IR, so a dataworks user can submit the same query maps
  * they run today:
  *
  * ```clojure
  * {:find  [?n (sum ?s)]
  *  :where [[?e :dept "eng"] [?e :name ?n] [?e :salary ?s]
  *          [(>= ?s 90)] (not [?e :on-leave true])]
  *  :rules [[(senior ?p) [?p :level "l6"]]]
  *  :args  [{?d "eng"}]
  *  :order-by [[?n :asc]] :limit 10}
  * ```
  *
  * Syntax mapping: vectors = patterns / predicate-binding clauses; lists =
  * `(not …)`, `(or …)`, `(agg ?v)` in :find, and rule invocations.
  * Keyword attributes map to wide-table column names with `/` and `-`
  * folded to `_` (`:stored-function/type` → `stored_function_type`,
  * SURVEY.md §1.1). Total: malformed queries → Left(reason), no throw.
  */
object EdnDatalog {

  private val aggFns = Set("count", "count-distinct", "sum", "avg", "min",
    "max", "median", "variance", "stddev", "distinct")

  /** crux 1.16 two-argument aggregates: `(rand N ?x)` / `(sample N ?x)`. */
  private val aggFns2 = Set("rand", "sample")

  private val freshId = new java.util.concurrent.atomic.AtomicLong(0L)

  def kwToAttr(k: String): String = k.replace('/', '_').replace('-', '_')

  def parseQuery(edn: String): Either[String, Query] =
    Edn.parse(edn).toRight(s"unparseable EDN: $edn").flatMap {
      case Edn.MapV(entries) =>
        val m = entries.collect { case (Kw(k), v) => k -> v }.toMap
        for {
          findV <- m.get("find").toRight(":find is required")
          find <- parseFind(findV)
          whereV <- m.get("where").toRight(":where is required")
          where <- parseClauses(whereV)
          rules <- m.get("rules").map(parseRules).getOrElse(Right(Nil))
          args <- m.get("args").map(parseArgs).getOrElse(Right(Nil))
          withVars <- m.get("with").map(parseWith).getOrElse(Right(Nil))
          orderBy <- m.get("order-by").map(parseOrderBy).getOrElse(Right(Nil))
          limit <- parseIntOpt(m.get("limit"), "limit")
          offset <- parseIntOpt(m.get("offset"), "offset")
          keys <- parseKeys(m, find.length)
          in <- m.get("in").map(parseIn).getOrElse(Right(Nil))
          _ <- if (in.nonEmpty && args.nonEmpty)
                 Left(":in and the legacy :args cannot be combined") else Right(())
          timeout <- parseTimeout(m.get("timeout"))
        } yield Query(find, where, rules, args, withVars, orderBy, limit, offset,
                      keys, in, timeout)
      case _ => Left("query must be an EDN map")
    }

  /** Run an EDN query directly against a wide document relation. Fully
    * total: parse errors AND plan-compilation errors (unknown attributes,
    * unbound or-join/not-join vars, arity mismatches) land in Left. */
  def run(docs: org.apache.spark.sql.DataFrame, edn: String,
          compiler: DatalogCompiler = new DatalogCompiler())
      : Either[String, org.apache.spark.sql.DataFrame] =
    runWith(docs, edn, Nil, compiler)

  /** [[run]] with positional runtime arguments consumed by the query's
    * `:in` bindings (crux's `(q db query arg1 arg2 …)` calling shape). */
  def runWith(docs: org.apache.spark.sql.DataFrame, edn: String,
              inputs: Seq[Any],
              compiler: DatalogCompiler = new DatalogCompiler())
      : Either[String, org.apache.spark.sql.DataFrame] =
    parseQuery(edn).flatMap { q =>
      try Right(compiler.run(docs, q, inputs))
      catch { case e: Exception =>
        // the Left carries only the message (the total-function contract);
        // SPARK_GRAFT_DEBUG=1 surfaces the full stack for forensics
        if (sys.env.get("SPARK_GRAFT_DEBUG").contains("1")) e.printStackTrace()
        // some Spark exceptions (ParseException) have messages that START
        // with a newline — a trimmed-blank message reads as "no reason",
        // so fall back to toString
        Left(Option(e.getMessage).map(_.trim).filter(_.nonEmpty).getOrElse(e.toString))
      }
    }

  // ------------------------------------------------------------------ pieces

  private def parseVar(v: Value): Either[String, V] = v match {
    case Sym(n) if n.startsWith("?") => Right(V(n.stripPrefix("?")))
    case other => Left(s"expected logic variable (?x), got $other")
  }

  private def term(v: Value): Term = v match {
    case Sym(n) if n.startsWith("?") => V(n.stripPrefix("?"))
    case other => C(const(other))
  }

  private def const(v: Value): Any = v match {
    case Str(s) => s
    case Lng(l) => l
    case Dbl(d) => d
    case Bool(b) => b
    case Kw(k) => k        // keyword constants compare as their name string
    case Sym(s) => s
    case Edn.Nil => null
    case other => other.toString
  }

  private def parseFind(v: Value): Either[String, Seq[FindElem]] = v match {
    case Vec(items) if items.nonEmpty =>
      sequenceE(items.map {
        case Sym(n) if n.startsWith("?") => Right(FindVar(V(n.stripPrefix("?"))))
        case Lst(Sym(fn) :: rest) if aggFns.contains(fn) =>
          rest match {
            case List(Sym(n)) if n.startsWith("?") =>
              Right(FindAgg(fn, V(n.stripPrefix("?"))))
            case _ => Left(s"aggregate ($fn …) takes one variable")
          }
        case Lst(Sym(fn) :: rest) if aggFns2.contains(fn) =>
          rest match {
            case List(Lng(k), Sym(n)) if n.startsWith("?") && k > 0 =>
              Right(FindAgg(fn, V(n.stripPrefix("?")), n = Some(k.toInt)))
            case _ => Left(s"aggregate ($fn …) takes a positive count and a variable")
          }
        // crux pull projection: (pull ?e [:a * {:ref [:sub …]}]) —
        // attribute keywords, the * wildcard, and nested join maps
        case Lst(List(Sym("pull"), Sym(e), spec)) if e.startsWith("?") =>
          parsePullSpec(spec).map(s => FindPull(V(e.stripPrefix("?")), s))
        case other => Left(s"bad :find element $other")
      })
    case _ => Left(":find must be a non-empty vector")
  }

  /** Crux pull spec (EQL subset): `[:attr …]`, `*`, parameterized
    * attributes `(:attr {:as … :default … :limit …})`, single-entry join
    * maps `{:ref-attr [subspec …]}` (key optionally parameterized with
    * `:as`; nested arbitrarily), and bounded recursion `{:ref-attr N}`. */
  private def parsePullSpec(v: Value): Either[String, Seq[PullEntry]] = v match {
    case Vec(items) if items.nonEmpty =>
      sequenceE(items.map[Either[String, PullEntry]](parsePullEntry))
    case _ => Left("(pull …) spec must be a non-empty vector")
  }

  private def parsePullEntry(item: Value): Either[String, PullEntry] = item match {
    case Kw(k) => Right(PullAttr(kwToAttr(k)))
    case Sym("*") => Right(PullWildcard)
    case Lst(List(Kw(k), Edn.MapV(opts))) =>
      pullOpts(opts).map { case (as, dflt, lim) =>
        PullAttr(kwToAttr(k), as, dflt, lim) }
    case Edn.MapV(List((key, sub))) =>
      val keyed: Either[String, (String, Option[String])] = key match {
        case Kw(k) => Right((kwToAttr(k), None))
        // parameterized join key {(:ref {:as :alias}) [subspec …]}
        case Lst(List(Kw(k), Edn.MapV(opts))) => pullOpts(opts).flatMap {
          case (as, None, None) => Right((kwToAttr(k), as))
          case _ => Left("(pull …) join-key options support only :as")
        }
        case other => Left(s"bad (pull …) join key $other")
      }
      keyed.flatMap { case (attr, as) => sub match {
        case Vec(_) => parsePullSpec(sub).map(PullJoin(attr, _, as))
        // bounded recursion: re-apply the enclosing spec N levels deep.
        // The cap is the SAME limit the unbounded `...` discovery uses
        // (each level is one static join in the plan; a deeper chain
        // belongs in a recursive RULE, not a pull) — an explicit depth a
        // user can write must never be lower than one the planner would
        // discover and unroll for the same data.
        case Lng(d) if d >= 1 && d <= PullRecur.MaxDiscoveredDepth && as.isEmpty =>
          Right(PullRecur(attr, d.toInt))
        case Lng(d) if as.isEmpty => Left(
          s"recursive pull depth must be 1..${PullRecur.MaxDiscoveredDepth} " +
            s"(each level is one static join), got $d")
        // unbounded recursion {:attr ...}: depth is discovered from the
        // data at compile (longest resolvable ref chain), then unrolled
        // like the bounded form — crux EQL's `...` over an acyclic universe
        case Sym("...") if as.isEmpty =>
          Right(PullRecur(attr, PullRecur.Unbounded))
        case Sym("...") => Left("(pull …) recursive join key takes no :as")
        case other => Left(s"bad (pull …) join value $other")
      }}
    case Edn.MapV(_) =>
      Left("(pull …) join entry must be a single-entry map {:ref-attr [subspec …]}")
    case other => Left(
      s"(pull …) spec entries must be attribute keywords, *, parameterized attributes, or join maps, got $other")
  }

  /** `(:attr {…})` option map: `:as` (keyword/string rename), `:default`
    * (constant substituted for an absent value), `:limit` (positive int;
    * array attributes only — enforced at compile). */
  private def pullOpts(entries: List[(Value, Value)])
      : Either[String, (Option[String], Option[Any], Option[Int])] =
    entries.foldLeft[Either[String, (Option[String], Option[Any], Option[Int])]](
        Right((None, None, None))) {
      case (acc, (Kw("as"), v)) => acc.flatMap { case (_, d, l) => v match {
        case Kw(k) => Right((Some(kwToAttr(k)), d, l))
        case Str(s) => Right((Some(s), d, l))
        case other => Left(s":as takes a keyword or string, got $other")
      }}
      case (acc, (Kw("default"), v)) =>
        acc.map { case (a, _, l) => (a, Some(const(v)), l) }
      case (acc, (Kw("limit"), Lng(n))) if n >= 1 =>
        acc.map { case (a, d, _) => (a, d, Some(n.toInt)) }
      case (_, (Kw("limit"), other)) =>
        Left(s":limit takes a positive integer, got $other")
      case (_, (k, _)) => Left(s"unsupported (pull …) attribute option $k")
    }

  private def parseClauses(v: Value): Either[String, Seq[Clause]] = v match {
    case Vec(items) if items.nonEmpty => sequenceE(items.map(parseClause))
    case _ => Left(":where must be a non-empty vector")
  }

  private def parseClause(v: Value): Either[String, Clause] = v match {
    // triple pattern [e :attr v?] — attr-exists form has 2 elements; the
    // value binds a fresh throwaway var (unique per occurrence so two
    // exists-checks on the same attribute never accidentally unify)
    case Vec(List(e, Kw(a))) =>
      Right(Pattern(term(e), kwToAttr(a),
        V(s"__exists_${kwToAttr(a)}_${freshId.incrementAndGet()}")))
    case Vec(List(e, Kw(a), value)) =>
      Right(Pattern(term(e), kwToAttr(a), term(value)))
    // [(pred args…)] or [(fn args…) ?out]
    case Vec(List(Lst(Sym(op) :: args))) =>
      Right(Pred(op, args.map(term)))
    case Vec(List(Lst(Sym(fn) :: args), out)) =>
      parseVar(out).map(o => Bind(fn, args.map(term), o))
    // (not …) / (not-join [vars] …) / (or …) / (or-join [vars] …) / (rule args…)
    case Lst(Sym("not") :: inner) =>
      sequenceE(inner.map(parseClause)).map(Not(_))
    case Lst(Sym("not-join") :: Vec(vars) :: inner) =>
      for {
        vs <- sequenceE(vars.map(parseVar))
        cs <- sequenceE(inner.map(parseClause))
      } yield Not(cs, vs)
    case Lst(Sym("or") :: branches) =>
      sequenceE(branches.map {
        case Lst(Sym("and") :: cs) => sequenceE(cs.map(parseClause))
        case single => parseClause(single).map(Seq(_))
      }).map(Or(_))
    case Lst(Sym("or-join") :: Vec(vars) :: branches) =>
      for {
        vs <- sequenceE(vars.map(parseVar))
        bs <- sequenceE(branches.map {
          case Lst(Sym("and") :: cs) => sequenceE(cs.map(parseClause))
          case single => parseClause(single).map(Seq(_))
        })
      } yield Or(bs, vs)
    case Lst(Sym(rule) :: args) =>
      Right(RuleApp(rule, args.map(term)))
    case other => Left(s"bad :where clause $other")
  }

  private def parseRules(v: Value): Either[String, Seq[Rule]] = v match {
    case Vec(ruleVecs) =>
      // group multiple bodies of the same rule name (crux multi-body form:
      // each [[(name params…) body…]] entry contributes one body)
      sequenceE(ruleVecs.map {
        case Vec(Lst(Sym(name) :: params) :: body) =>
          for {
            ps <- sequenceE(params.map(parseVar))
            cs <- sequenceE(body.map(parseClause))
          } yield Rule(name, ps, Seq(cs))
        case other => Left(s"bad rule $other")
      })
      // one Rule entry per body vec, each keeping ITS OWN head param names
      // (legal in crux: bodies of one rule may name params differently) —
      // the compiler's mergeRules unifies them with α-renaming
    case _ => Left(":rules must be a vector")
  }

  /** `:with [?e …]` — vars joining the pre-aggregation dedup tuple
    * without being returned (crux duplicate-preserving aggregation). */
  private def parseWith(v: Value): Either[String, Seq[String]] = v match {
    case Vec(items) if items.nonEmpty =>
      sequenceE(items.map {
        case Sym(n) if n.startsWith("?") => Right(n.stripPrefix("?"))
        case other => Left(s":with entries must be ?vars, got $other")
      })
    case _ => Left(":with must be a non-empty vector of ?vars")
  }

  /** Crux `:in` parameter bindings (1.15+; supersedes `:args`): one entry
    * per positional argument of `q`. The four crux binding forms:
    * `?x` scalar, `[?x ...]` collection, `[?x ?y]` tuple, `[[?x ?y]]`
    * relation. */
  private def parseIn(v: Value): Either[String, Seq[Ast.InBinding]] = v match {
    case Vec(items) if items.nonEmpty =>
      sequenceE(items.map[Either[String, Ast.InBinding]] {
        case s @ Sym(n) if n.startsWith("?") => parseVar(s).map(InScalar(_))
        case Vec(List(s @ Sym(n), Sym("..."))) if n.startsWith("?") =>
          parseVar(s).map(InColl(_))
        case Vec(List(Vec(inner))) if inner.nonEmpty =>
          sequenceE(inner.map(parseVar)).map(InRel(_))
        case Vec(inner) if inner.nonEmpty =>
          sequenceE(inner.map(parseVar)).map(InTuple(_))
        case other => Left(
          s":in entries must be ?x, [?x ...], [?x ?y] or [[?x ?y]], got $other")
      }).flatMap { bs =>
        val vars = bs.flatMap(_.vars.map(_.name))
        if (vars.distinct.length != vars.length)
          Left(s":in binds a variable twice: ${vars.mkString(" ")}")
        else Right(bs)
      }
    case _ => Left(":in must be a non-empty vector of bindings")
  }

  /** Crux `:keys`/`:syms`/`:strs` — names for the :find tuple elements
    * (crux returns maps keyed by keyword/symbol/string respectively; the
    * relational face is a positional column rename, so all three parse the
    * same way). Exactly one of the three may appear; entry count must
    * equal the :find arity; names must be distinct (duplicate map keys
    * would silently collapse in crux and would be ambiguous columns here).
    * Entries are plain symbols (crux's syntax even for :strs). */
  private def parseKeys(m: Map[String, Value], findArity: Int)
      : Either[String, Option[Seq[String]]] = {
    val present = Seq("keys", "syms", "strs").filter(m.contains)
    present match {
      case Nil => Right(None)
      case Seq(k) => m(k) match {
        case Vec(items) if items.nonEmpty =>
          sequenceE(items.map[Either[String, String]] {
            case Sym(n) if !n.startsWith("?") => Right(n)
            case Str(s) if k == "strs" => Right(s)
            case other => Left(s":$k entries must be plain symbols, got $other")
          }).flatMap { names =>
            if (names.length != findArity)
              Left(s":$k names ${names.length} elements but :find has $findArity")
            else if (names.distinct.length != names.length)
              Left(s":$k names must be distinct, got $names")
            else Right(Some(names))
          }
        case _ => Left(s":$k must be a non-empty vector of symbols")
      }
      case several =>
        Left(s"at most one of :keys/:syms/:strs may appear, got ${several.map(":" + _).mkString(" ")}")
    }
  }

  /** `:args` rows — each map is one row of crux's args RELATION (several
    * maps = set-union over parameter tuples, not last-map-wins). */
  private def parseArgs(v: Value): Either[String, Seq[Map[String, Any]]] = v match {
    case Vec(maps) =>
      sequenceE(maps.map[Either[String, Map[String, Any]]] {
        case Edn.MapV(entries) =>
          sequenceE(entries.map {
            case (Sym(n), value) if n.startsWith("?") =>
              Right(n.stripPrefix("?") -> const(value))
            case (k, _) => Left(s"args keys must be ?vars, got $k")
          }).map(_.toMap)
        case other => Left(s":args entries must be maps, got $other")
      })
    case _ => Left(":args must be a vector of maps")
  }

  private def parseOrderBy(v: Value): Either[String, Seq[(String, Boolean)]] = v match {
    case Vec(items) =>
      sequenceE(items.map {
        case Vec(List(Sym(n), Kw(dir))) if n.startsWith("?") =>
          Right(n.stripPrefix("?") -> (dir == "asc"))
        case Vec(List(Sym(n))) if n.startsWith("?") =>
          Right(n.stripPrefix("?") -> true)
        case other => Left(s"bad :order-by entry $other")
      })
    case _ => Left(":order-by must be a vector")
  }

  /** Crux `:timeout` — positive milliseconds (crux takes a millisecond
    * count or a Duration; the EDN face carries the number form). */
  private def parseTimeout(v: Option[Value]): Either[String, Option[Long]] =
    v match {
      case None => Right(None)
      case Some(Lng(l)) if l > 0 => Right(Some(l))
      case Some(other) => Left(s":timeout must be positive milliseconds, got $other")
    }

  private def parseIntOpt(v: Option[Value], what: String): Either[String, Option[Int]] =
    v match {
      case None => Right(None)
      case Some(Lng(l)) => Right(Some(l.toInt))
      case Some(other) => Left(s":$what must be an integer, got $other")
    }

  private def sequenceE[A](xs: Seq[Either[String, A]]): Either[String, Seq[A]] =
    xs.foldRight(Right(Nil): Either[String, List[A]]) {
      case (e, acc) => for (x <- e; rest <- acc) yield x :: rest
    }
}
