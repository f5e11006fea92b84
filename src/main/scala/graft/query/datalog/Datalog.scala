package graft.query.datalog

/** Datalog IR — the query language the reference exposes through `crux/q`
  * (`/root/reference/src/dataworks/db/user_db.clj:28-48`, examples at
  * `/root/reference/src/dataworks/utils/alert.clj:9-15`,
  * `/root/reference/src/dataworks/utils/auth.clj:91-96`,
  * `/root/reference/src/dataworks/db/app_db.clj:115-126`).
  *
  * EDN form                                  | IR
  * ------------------------------------------|------------------------------
  * `[?e :attr ?v]`                           | `Pattern(V("e"), "attr", V("v"))`
  * `[?e :attr const]`                        | `Pattern(V("e"), "attr", C(const))`
  * `[(< ?x 5)]`                              | `Pred("<", Seq(V("x"), C(5)))`
  * `[(f ?x) ?y]`                             | `Bind("f", Seq(V("x")), V("y"))`
  * `(not …)`                                 | `Not(clauses)`
  * `(or … …)`                                | `Or(branches)`
  * `(rule ?a ?b)`                            | `RuleApp("rule", Seq(V("a"), V("b")))`
  * `:find [?a (sum ?x)]`                     | `Seq(FindVar, FindAgg("sum", x))`
  * `:args [{?x 42}]`                         | `args Map("x" -> 42)`
  * `:rules [[(r ?a ?b) body…] …]`            | `Rule("r", params, bodies)` (multi-body = union; self-reference = recursion)
  */
object Ast {
  sealed trait Term
  final case class V(name: String) extends Term   // logic variable
  final case class C(value: Any) extends Term     // constant

  sealed trait Clause
  /** Triple pattern `[e :attr v]` — entity/attribute/value (Q2/Q3). */
  final case class Pattern(e: Term, attr: String, v: Term) extends Clause
  /** Predicate clause `[(op args…)]` (Q6/Q12). */
  final case class Pred(op: String, args: Seq[Term]) extends Clause
  /** Function/binding clause `[(f args…) ?out]` (Q17). */
  final case class Bind(fn: String, args: Seq[Term], out: V) extends Clause
  /** Negation `(not …)` (Q14); `unifyVars` nonempty = `(not-join [vars] …)`
    * — only the declared vars unify with the outer query. */
  final case class Not(clauses: Seq[Clause],
                       unifyVars: Seq[V] = Nil) extends Clause
  /** Disjunction `(or …)` — each branch a clause seq (Q13); `unifyVars`
    * nonempty = `(or-join [vars] …)` — branches join the outer query only
    * on the declared vars (branches may bind private vars freely). */
  final case class Or(branches: Seq[Seq[Clause]],
                      unifyVars: Seq[V] = Nil) extends Clause
  /** Rule application (Q8/Q9). */
  final case class RuleApp(name: String, args: Seq[Term]) extends Clause

  /** `:rules` entry: multiple bodies union; a body mentioning the rule
    * itself makes the rule recursive (evaluated via semi-naive fixpoint). */
  final case class Rule(name: String, params: Seq[V], bodies: Seq[Seq[Clause]])

  /** One `:in` entry (crux 1.15+ parameter bindings; supersedes `:args`).
    * The four crux binding forms, each consuming one positional runtime
    * argument of `q`: `?x` a single value, `[?x ...]` each element of a
    * collection, `[?x ?y]` one tuple, `[[?x ?y]]` each tuple of a
    * relation. */
  sealed trait InBinding { def vars: Seq[V] }
  final case class InScalar(v: V) extends InBinding { def vars = Seq(v) }
  final case class InColl(v: V) extends InBinding { def vars = Seq(v) }
  final case class InTuple(vs: Seq[V]) extends InBinding { def vars = vs }
  final case class InRel(vs: Seq[V]) extends InBinding { def vars = vs }

  sealed trait FindElem
  final case class FindVar(v: V) extends FindElem
  /** Crux 1.16 `:find` aggregates (Q15): count, count-distinct, sum, avg,
    * min, max, median, variance, stddev, distinct — plus the two-argument
    * forms `(rand N ?x)` (N picks with replacement) and `(sample N ?x)`
    * (N distinct picks), whose N rides in `n`. */
  final case class FindAgg(fn: String, v: V, alias: Option[String] = None,
                           n: Option[Int] = None) extends FindElem
  /** One entry of a crux pull spec: a named attribute (optionally
    * parameterized), the `*` wildcard (every attribute of the document), a
    * nested join `{:ref-attr [subspec…]}` following a reference-valued
    * attribute to the document it identifies, or a bounded recursive join
    * `{:ref-attr N}`. */
  sealed trait PullEntry
  /** Attribute options are crux's EQL parameterization
    * `(:attr {:as … :default … :limit …})`: `as` renames the output
    * field, `default` substitutes a constant when the attribute is absent
    * (null), `limit` truncates a cardinality-many (array) attribute to
    * its first n elements. */
  final case class PullAttr(name: String, as: Option[String] = None,
                            default: Option[Any] = None,
                            limit: Option[Int] = None) extends PullEntry
  case object PullWildcard extends PullEntry
  final case class PullJoin(attr: String, spec: Seq[PullEntry],
                            as: Option[String] = None) extends PullEntry
  /** `{:ref-attr N}` re-applies the ENCLOSING spec through `attr` N levels
    * deep (the unrolled-static face of EQL's bounded recursion). The
    * unbounded `{:ref-attr ...}` form parses to the [[PullRecur.Unbounded]]
    * sentinel: the compiler DISCOVERS the longest resolvable ref chain in
    * the doc relation at plan time (a handful of frontier probes over the
    * ref column) and unrolls to that depth — Spark schemas are computed
    * per plan, so a data-dependent depth is still a static schema for the
    * query. Chains deeper than [[PullRecur.MaxDiscoveredDepth]] (or a ref
    * cycle, which has no finite chain) are rejected with a pointer at
    * recursive rules, whose fixpoint handles unbounded depth properly. */
  final case class PullRecur(attr: String, depth: Int) extends PullEntry
  object PullRecur {
    /** Depth sentinel for the `...` form (resolved at compile). */
    val Unbounded: Int = Int.MaxValue
    /** Cap on discovered depth: each level is one static self-join; a
      * deeper chain belongs in a recursive rule, not a pull. */
    val MaxDiscoveredDepth: Int = 32
  }

  /** Crux `(pull ?e [:attr …])` projection: the spec'd attributes of the
    * bound entity, returned as one struct column (crux returns a map; a
    * struct is its typed relational face). Supports flat attribute
    * vectors, the `*` wildcard, and nested `{:ref [:sub …]}` joins —
    * each nesting level is one more id equi-join against the doc
    * relation, so depth-d pull costs d hash joins, never a per-row
    * lookup. */
  final case class FindPull(v: V, spec: Seq[PullEntry]) extends FindElem

  final case class Query(
      find: Seq[FindElem],
      where: Seq[Clause],
      rules: Seq[Rule] = Nil,
      /** Q7 parameter binding. Crux's `:args` is a RELATION — each map is
        * one row, and the query result is the set-union over rows (binding
        * tuples dedup across rows BEFORE any aggregation). One map is the
        * common parameterization case; several express an OR over
        * parameter tuples. */
      args: Seq[Map[String, Any]] = Nil,
      /** Crux `:with`: vars added to the pre-aggregation dedup tuple but
        * NOT returned — `(sum ?price)` with `:with [?order]` sums one
        * price per order instead of one per distinct price value. */
      withVars: Seq[String] = Nil,
      orderBy: Seq[(String, Boolean)] = Nil,    // (var, ascending) — Q16
      limit: Option[Int] = None,
      offset: Option[Int] = None,
      /** Crux `:keys`/`:syms`/`:strs`: names for the find tuple elements —
        * crux returns result MAPS keyed by these instead of positional
        * vectors; the relational face is a positional column rename. One
        * name per :find element, applied after projection/aggregation, so
        * they override the default `?var` / `fn_var` column names. (The
        * keyword/symbol/string distinction is representation-level in crux;
        * all three are the same column rename here.) */
      keys: Option[Seq[String]] = None,
      /** Crux `:in` parameter bindings — one entry per positional runtime
        * argument (supplied to the compiler's `run` alongside the query).
        * Expanded to binding ROWS like `:args` (whose legacy form it
        * supersedes; combining both is an error): small binding sets
        * substitute constants per row (per-branch predicate pushdown),
        * large ones become one broadcast equi-join against a binding
        * relation — never N unioned bodies. */
      in: Seq[InBinding] = Nil,
      /** Crux `:timeout` (milliseconds). Crux's `q` with a timeout is
        * EAGER — it returns the full result set within the budget or
        * throws. The relational face keeps that contract: the compiled
        * plan is materialized under a cancellable job group and the
        * driver-side loops (rule fixpoints, pull chain discovery,
        * per-binding-row compilation) poll the same deadline, so on
        * timeout the in-flight Spark jobs are cancelled and the caller
        * gets a timeout error (a Left at the EDN boundary). Without
        * `:timeout` queries stay lazy DataFrames. */
      timeout: Option[Long] = None)
}
