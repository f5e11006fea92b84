package graft.query.datalog

import graft.SparkSpec

/** The reference's own EDN query syntax, end-to-end: these are the query
  * shapes that appear verbatim in the reference repo, run against a wide
  * doc relation through EdnDatalog → DatalogCompiler → Catalyst. */
class EdnDatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("e1", "ada", "eng", 120.0, null, null),
    ("e2", "bob", "eng", 90.0, "e1", null),
    ("e3", "cid", "ops", 80.0, "e1", "t1"),
    ("e4", "dee", "eng", 100.0, "e2", null),
    ("e5", "eva", "ops", 70.0, "e3", "t2")
  ).toDF("id", "name", "dept", "salary", "manager", "stored_function_type")

  private def run(edn: String) =
    EdnDatalog.run(docs, edn).fold(e => fail(e), identity)

  test("app_db.clj:58-63 shape — attr-exists scan") {
    val got = run("{:find [?e] :where [[?e :stored-function/type]]}")
      .as[String].collect().toSet
    assert(got == Set("e3", "e5"))
  }

  test("app_db.clj:64-69 shape — triple with constant") {
    val got = run("""{:find [?e] :where [[?e :dept "ops"]]}""")
      .as[String].collect().toSet
    assert(got == Set("e3", "e5"))
  }

  test("alert.clj:11-15 shape — same-entity multi-attribute join") {
    val got = run(
      """{:find [?n ?s]
          :where [[?e :dept "eng"] [?e :name ?n] [?e :salary ?s]]}""")
      .as[(String, Double)].collect().toSet
    assert(got == Set(("ada", 120.0), ("bob", 90.0), ("dee", 100.0)))
  }

  test("(pull ?e [:attr …]) projection — flat attribute vectors (crux 1.16)") {
    // struct column carrying the pulled attributes, in :find order with
    // plain vars; entity stays joinable alongside its pull
    val got = run(
      """{:find [?e (pull ?e [:name :salary])]
          :where [[?e :dept "eng"]]}""")
      .as[(String, (String, Double))].collect().toSet
    assert(got == Set(
      ("e1", ("ada", 120.0)), ("e2", ("bob", 90.0)), ("e4", ("dee", 100.0))))
    // set semantics on the RESULT tuple: a pull of a non-key attribute
    // collapses distinct entities to one tuple (crux's q returns a set)
    val depts = run("{:find [(pull ?e [:dept])] :where [[?e :salary ?s]]}")
      .collect().map(_.getStruct(0).getString(0)).toSeq
    assert(depts.sorted == Seq("eng", "ops"), s"collapsed to distinct: $depts")
    // a pulled attribute the entity lacks is a null field, not a lost row
    val mgr = run("""{:find [?e (pull ?e [:manager])] :where [[?e :name "ada"]]}""")
      .collect().map(r => (r.getString(0), r.getStruct(1).isNullAt(0))).toSet
    assert(mgr == Set(("e1", true)))
    // malformed pull specs are compile errors, not crashes
    assert(EdnDatalog.run(docs, "{:find [(pull ?e [])] :where [[?e :name ?n]]}").isLeft)
    assert(EdnDatalog.run(docs, """{:find [(pull ?e ["x"])] :where [[?e :name ?n]]}""").isLeft)
  }

  test("(pull ?e [* {:ref […]}]) — wildcard and nested join specs") {
    // * = every attribute of the doc, eid included (crux's * keeps
    // :crux.db/id); spec entries dedup by field name, so [:name *] is
    // legal and names each field once
    val star = run("""{:find [(pull ?e [:name *])] :where [[?e :name "ada"]]}""")
    val fields = star.schema.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(fields == Seq("name", "id", "dept", "salary", "manager",
      "stored_function_type"), s"wildcard fields: $fields")
    val ada = star.collect().map(_.getStruct(0)).head
    assert(ada.getString(0) == "ada" && ada.getString(1) == "e1")
    // nested join: follow the manager ref to its doc; a missing ref is a
    // null child struct (ada has no manager), not a lost row
    val got = run(
      """{:find [?e (pull ?e [:name {:manager [:name :dept]}])]
          :where [[?e :dept "eng"]]}""")
      .collect().map { r =>
        val s = r.getStruct(1)
        (r.getString(0), s.getString(0),
          if (s.isNullAt(1)) null else s.getStruct(1).getString(0))
      }.toSet
    assert(got == Set(("e1", "ada", null), ("e2", "bob", "ada"),
      ("e4", "dee", "bob")), s"nested pull: $got")
    // two levels deep: dee → bob → ada
    val deep = run(
      """{:find [(pull ?e [:name {:manager [:name {:manager [:name]}]}])]
          :where [[?e :name "dee"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(deep.getString(0) == "dee" &&
      deep.getStruct(1).getString(0) == "bob" &&
      deep.getStruct(1).getStruct(1).getString(0) == "ada")
    // a multi-entry join map is ambiguous EQL here — compile error
    assert(EdnDatalog.run(docs,
      "{:find [(pull ?e [{:manager [:name] :dept [:name]}])] :where [[?e :name ?n]]}").isLeft)
    // EQL precedence: an explicit entry beats * REGARDLESS of order —
    // [* {:manager […]}] must return the joined struct, not the raw ref
    // id the wildcard would emit (review r11)
    val prec = run(
      """{:find [(pull ?e [* {:manager [:name]}])] :where [[?e :name "bob"]]}""")
      .collect().map(_.getStruct(0)).head
    val mIdx = prec.schema.fieldNames.indexOf("manager")
    assert(prec.getStruct(mIdx).getString(0) == "ada",
      s"explicit join must win over *: ${prec.getStruct(mIdx)}")
  }

  test("pull respects :with — entities stay distinct by the with var") {
    // two eng employees share dept: a pull of [:dept] alone collapses them
    // (set semantics); :with [?e] keeps one row per entity (bag)
    val collapsed = run(
      """{:find [(pull ?e [:dept])] :where [[?e :dept "eng"]]}""").count()
    assert(collapsed == 1L)
    val bag = run(
      """{:find [(pull ?e [:dept])] :with [?e] :where [[?e :dept "eng"]]}""").count()
    assert(bag == 3L, s":with [?e] must keep one pulled row per entity, got $bag")
  }

  test("pull attribute options — :as, :default, :limit, parameterized join key") {
    // :as renames the output field; :default fills an ABSENT (null) value
    val got = run(
      """{:find [(pull ?e [(:name {:as :who})
                           (:manager {:as :boss, :default "none"})])]
          :where [[?e :dept "eng"]]}""")
    val fields = got.schema.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(fields == Seq("who", "boss"), s"renamed fields: $fields")
    val rows = got.collect().map(_.getStruct(0))
      .map(s => (s.getString(0), s.getString(1))).toSet
    assert(rows == Set(("ada", "none"), ("bob", "e1"), ("dee", "e2")))
    // parameterized JOIN key: {(:manager {:as :mgr}) [:name]}
    val j = run(
      """{:find [(pull ?e [:name {(:manager {:as :mgr}) [:name]}])]
          :where [[?e :name "bob"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(j.schema.fieldNames.toSeq == Seq("name", "mgr"))
    assert(j.getString(0) == "bob" && j.getStruct(1).getString(0) == "ada")
    // :limit slices a cardinality-many (array) attribute; non-array → error
    val arr = Seq(("a1", Seq("x", "y", "z")), ("a2", Seq("p")))
      .toDF("id", "tags")
    val lim = EdnDatalog.run(arr,
      """{:find [(pull ?e [(:tags {:limit 2})])] :where [[?e :tags]]}""")
      .fold(e => fail(e), identity)
      .collect().map(_.getStruct(0).getSeq[String](0)).toSet
    assert(lim == Set(Seq("x", "y"), Seq("p")))
    val nonArr = EdnDatalog.run(docs,
      """{:find [(pull ?e [(:name {:limit 2})])] :where [[?e :name ?n]]}""")
    assert(nonArr.isLeft && nonArr.swap.exists(_.contains("cardinality-many")),
      s"got $nonArr")
    // unknown options and malformed values are compile errors
    assert(EdnDatalog.run(docs,
      "{:find [(pull ?e [(:name {:frobnicate 1})])] :where [[?e :name ?n]]}").isLeft)
    assert(EdnDatalog.run(docs,
      "{:find [(pull ?e [(:name {:limit 0})])] :where [[?e :name ?n]]}").isLeft)
  }

  test("pull bounded recursion {:ref N} — unrolled static self-joins") {
    // {:manager 2} re-applies the enclosing spec two levels up the chain;
    // the leaf level's struct simply lacks the recursive field
    val eva = run(
      """{:find [(pull ?e [:name {:manager 2}])] :where [[?e :name "eva"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(eva.getString(0) == "eva")
    val l1 = eva.getStruct(1) // cid
    assert(l1.getString(0) == "cid")
    val l2 = l1.getStruct(1) // ada — leaf: name only, no manager field
    assert(l2.getString(0) == "ada" && l2.schema.fieldNames.toSeq == Seq("name"))
    // chain shorter than the depth: nulls, not lost rows
    val ada = run(
      """{:find [(pull ?e [:name {:manager 2}])] :where [[?e :name "ada"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(ada.getString(0) == "ada" && ada.isNullAt(1))
    // an ALL-recursive spec bottoms out with the raw ref id at the leaf
    val leaf = run(
      """{:find [(pull ?e [{:manager 1}])] :where [[?e :name "bob"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(leaf.getString(0) == "e1", s"leaf keeps the ref id: $leaf")
    // out-of-range literal depths are descriptive compile errors; the
    // explicit cap is the SAME limit `...` discovery unrolls to (advice
    // r12: a user-writable depth must not be lower than a discovered one)
    assert(EdnDatalog.run(docs,
      s"{:find [(pull ?e [{:manager ${Ast.PullRecur.MaxDiscoveredDepth + 1}}])] :where [[?e :name ?n]]}").isLeft)
    assert(EdnDatalog.run(docs,
      "{:find [(pull ?e [{:manager 0}])] :where [[?e :name ?n]]}").isLeft)
    // a depth past the old 10 cap but within the shared cap compiles and
    // runs (short chain: extra levels are nulls, not errors)
    val deep = run(
      """{:find [(pull ?e [:name {:manager 12}])] :where [[?e :name "ada"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(deep.getString(0) == "ada" && deep.isNullAt(1))
  }

  test("pull unbounded recursion {:ref ...} — depth discovered from the data") {
    // the manager graph's longest chain is eva→cid→ada (2 edges): `...`
    // must discover depth 2 at plan time and unroll exactly like
    // {:manager 2} — full chain expanded, leaf struct lacks the field
    val eva = run(
      """{:find [(pull ?e [:name {:manager ...}])] :where [[?e :name "eva"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(eva.getString(0) == "eva")
    val l1 = eva.getStruct(1)
    assert(l1.getString(0) == "cid")
    val l2 = l1.getStruct(1)
    assert(l2.getString(0) == "ada" && l2.schema.fieldNames.toSeq == Seq("name"),
      "discovered depth expands the FULL chain; the leaf level drops the recur field")
    // a root entity (no manager): nulls at every level, row kept
    val ada = run(
      """{:find [(pull ?e [:name {:manager ...}])] :where [[?e :name "ada"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(ada.getString(0) == "ada" && ada.isNullAt(1))
    // identical result to the explicitly-bounded discovered depth
    val bounded = run(
      """{:find [(pull ?e [:name {:manager 2}])] :where [[?e :name "eva"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(eva == bounded, s"`...` ≡ {:manager <discovered>}: $eva vs $bounded")
    // dangling refs end a chain like null does (they can't expand): a
    // universe whose only refs dangle discovers depth 0 → compiled as one
    // left join, child struct null
    val dangling = Seq(("d1", "solo", "zz9")).toDF("id", "name", "manager")
    val d = EdnDatalog.run(dangling,
      """{:find [(pull ?e [:name {:manager ...}])] :where [[?e :name "solo"]]}""")
      .fold(e => fail(e), identity).collect().map(_.getStruct(0)).head
    assert(d.getString(0) == "solo" && d.isNullAt(1))
    // a ref CYCLE has no finite chain — rejected with a pointer at rules
    val cyc = Seq(("a", "x", "b"), ("b", "y", "a")).toDF("id", "name", "manager")
    val bad = EdnDatalog.run(cyc,
      "{:find [(pull ?e [:name {:manager ...}])] :where [[?e :name ?n]]}")
    assert(bad.isLeft && bad.swap.exists(_.contains("recursive rule")), s"got $bad")
    // :as on a recursive join key is still rejected at parse
    assert(EdnDatalog.run(docs,
      """{:find [(pull ?e [{(:manager {:as :boss}) ...}])] :where [[?e :name ?n]]}""").isLeft)
    // `...` nested INSIDE a join sub-spec: each pullSide resolves its own
    // unbounded entries, so the chain discovery runs on the child level too
    val nested = run(
      """{:find [(pull ?e [:dept {:manager [:name {:manager ...}]}])]
          :where [[?e :name "eva"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(nested.getString(0) == "ops")
    val n1 = nested.getStruct(1) // cid's sub-spec view
    assert(n1.getString(n1.fieldIndex("name")) == "cid")
    val n2 = n1.getStruct(n1.fieldIndex("manager")) // ada via inner `...`
    assert(n2.getString(n2.fieldIndex("name")) == "ada")
    // `...` alongside the * wildcard: explicit recursion claims `manager`,
    // the wildcard fills every other attribute
    val wild = run(
      """{:find [(pull ?e [* {:manager ...}])] :where [[?e :name "dee"]]}""")
      .collect().map(_.getStruct(0)).head
    assert(wild.schema.fieldNames.contains("dept") &&
      wild.schema.fieldNames.contains("manager"))
    val w1 = wild.getStruct(wild.fieldIndex("manager")) // bob
    assert(w1.getString(w1.fieldIndex("name")) == "bob")
    val w2 = w1.getStruct(w1.fieldIndex("manager")) // ada
    assert(w2.getString(w2.fieldIndex("name")) == "ada")
  }

  test(":with — duplicate-preserving aggregation and bag projection") {
    // without :with, crux aggregates over DISTINCT (dept, salary) tuples:
    // bob(90) and a second eng 90.0 would collapse. The fixture has eng
    // salaries 120/90/100 → distinct-sum 310; adding e5b(eng, 90) leaves
    // distinct-sum at 310 while :with [?e] sums per-employee → 400
    val docs2 = docs.unionByName(
      Seq(("e9", "gil", "eng", 90.0, "e1",
        null.asInstanceOf[String])).toDF(docs.columns: _*))
    val noWith = EdnDatalog.run(docs2,
      "{:find [?d (sum ?s)] :where [[?e :dept ?d] [?e :salary ?s]]}")
      .fold(e => fail(e), identity)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(noWith("eng") == 310.0, s"set semantics collapse equal salaries: $noWith")
    val withE = EdnDatalog.run(docs2,
      "{:find [?d (sum ?s)] :with [?e] :where [[?e :dept ?d] [?e :salary ?s]]}")
      .fold(e => fail(e), identity)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(withE("eng") == 400.0, s":with [?e] keeps one salary per employee: $withE")
    // plain find + :with = bag: dedup includes ?e then drops it, so the
    // two 90.0 eng salaries BOTH surface
    val bag = EdnDatalog.run(docs2,
      """{:find [?s] :with [?e] :where [[?e :dept "eng"] [?e :salary ?s]]}""")
      .fold(e => fail(e), identity)
      .collect().map(_.getDouble(0)).toSeq.sorted
    assert(bag == Seq(90.0, 90.0, 100.0, 120.0), s"bag projection: $bag")
    // malformed :with is a compile error
    assert(EdnDatalog.run(docs, "{:find [?n] :with [x] :where [[?e :name ?n]]}").isLeft)
  }

  test("recursive rule written via (or …) — distributed into the fixpoint (review r11)") {
    // a disjunctive recursive body IS several bodies; nesting the
    // self-reference in an or-branch used to bypass SCC detection and die
    // on the internal re-entry guard
    val got = run(
      """{:find [?n ?bn]
          :where [[?e :name "eva"] [?e :name ?n] (boss ?e ?b) [?b :name ?bn]]
          :rules [[(boss ?a ?c)
                   (or [?a :manager ?c]
                       (and [?a :manager ?x] (boss ?x ?c)))]]}""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("eva", "cid"), ("eva", "ada")), s"or-bodied closure: $got")
    // recursion through (not …) is unstratified — a CLEAR error, not the
    // internal guard's IllegalStateException
    val neg = EdnDatalog.run(docs,
      """{:find [?x] :where [(p ?x)]
          :rules [[(p ?x) [?x :name ?n] (not (p ?x))]]}""")
    assert(neg.isLeft && neg.swap.exists(_.contains("unstratified")), s"got $neg")
  }

  test(":with var supplied via :args attaches as a constant (review r11)") {
    // each args row contributes its own (d, e, w) dedup tuple, so every
    // entity counts once PER ROW — the args-relation bag semantics
    val got = run(
      """{:find [?d (count ?e)] :with [?w]
          :where [[?e :dept ?d]]
          :args [{?w 1} {?w 2}]}""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("eng" -> 6L, "ops" -> 4L), s"doubled by the args rows: $got")
  }

  test("auth.clj:91-96 shape — string predicate clause") {
    val got = run(
      """{:find [?n]
          :where [[?e :name ?n]
                  [(clojure.string/starts-with? ?n "b")]]}""")
      .as[String].collect().toSeq
    assert(got == Seq("bob"))
  }

  test("predicates, binds, not, or") {
    assert(run(
      """{:find [?n] :where [[?e :name ?n] [?e :salary ?s] [(>= ?s 100)]]}""")
      .as[String].collect().toSet == Set("ada", "dee"))
    assert(run(
      """{:find [?u] :where [[?e :dept "ops"] [?e :name ?n] [(upper ?n) ?u]]}""")
      .as[String].collect().toSet == Set("CID", "EVA"))
    assert(run(
      """{:find [?n] :where [[?e :name ?n] (not [?e :dept "eng"])]}""")
      .as[String].collect().toSet == Set("cid", "eva"))
    assert(run(
      """{:find [?n] :where [[?e :name ?n]
                             (or (and [?e :salary ?s] [(> ?s 110)])
                                 [?e :dept "ops"])]}""")
      .as[String].collect().toSet == Set("ada", "cid", "eva"))
  }

  test("or-join and not-join restrict unification to declared vars") {
    // or-join: each branch binds ?e via different private vars
    val orj = run(
      """{:find [?n]
          :where [[?e :name ?n]
                  (or-join [?e]
                    (and [?e :salary ?s1] [(> ?s1 110)])
                    (and [?e :dept ?d2] [(= ?d2 "ops")]))]}""")
      .as[String].collect().toSet
    assert(orj == Set("ada", "cid", "eva"))
    // not-join: negate on ?m only — people who manage nobody
    val nj = run(
      """{:find [?n]
          :where [[?e :name ?n]
                  (not-join [?e] [?x :manager ?e])]}""")
      .as[String].collect().toSet
    assert(nj == Set("dee", "eva"), s"leaf employees: $nj")
  }

  test("aggregates with group keys") {
    val got = run(
      """{:find [?d (sum ?s) (count ?e)]
          :where [[?e :dept ?d] [?e :salary ?s]]}""")
      .as[(String, Double, Long)].collect().toSet
    assert(got == Set(("eng", 310.0, 3L), ("ops", 150.0, 2L)))
  }

  test("app_db.clj:115-126 shape — recursive depends rule") {
    val got = run(
      """{:find [?a]
          :where [(reports ?a "e1")]
          :rules [[(reports ?a ?b) [?a :manager ?b]]
                  [(reports ?a ?b) [?a :manager ?m] (reports ?m ?b)]]}""")
      .as[String].collect().toSet
    assert(got == Set("e2", "e3", "e4", "e5"))
  }

  test("args, order-by, limit") {
    val got = run(
      """{:find [?n ?s]
          :where [[?e :dept ?d] [?e :name ?n] [?e :salary ?s]]
          :args [{?d "eng"}]
          :order-by [[?s :desc]] :limit 2}""")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("ada", 120.0), ("dee", 100.0)))
  }

  test("(rand N ?x) / (sample N ?x) two-arg aggregates (crux 1.16 Q15)") {
    // sample: N DISTINCT values drawn from the group's value set
    val sampled = run(
      """{:find [?d (sample 2 ?n)] :where [[?e :dept ?d] [?e :name ?n]]}""")
      .as[(String, Seq[String])].collect().toMap
    assert(sampled.keySet == Set("eng", "ops"))
    assert(sampled("eng").size == 2 && sampled("eng").distinct.size == 2)
    assert(sampled("eng").toSet.subsetOf(Set("ada", "bob", "dee")))
    assert(sampled("ops").toSet.subsetOf(Set("cid", "eva")))
    // sample N > group size returns the whole set
    val all = run("""{:find [(sample 10 ?d)] :where [[?e :dept ?d]]}""")
      .as[Seq[String]].collect().head
    assert(all.toSet == Set("eng", "ops"))
    // rand: exactly N picks WITH replacement, all from the group
    val rand = run(
      """{:find [(rand 7 ?n)] :where [[?e :dept "ops"] [?e :name ?n]]}""")
      .as[Seq[String]].collect().head
    assert(rand.size == 7 && rand.toSet.subsetOf(Set("cid", "eva")))
    // deterministic: the same query twice gives the same picks
    val again = run(
      """{:find [(rand 7 ?n)] :where [[?e :dept "ops"] [?e :name ?n]]}""")
      .as[Seq[String]].collect().head
    assert(rand == again)
    // malformed two-arg forms are rejected totally
    assert(EdnDatalog.run(docs, "{:find [(rand ?x)] :where [[?e :name ?x]]}").isLeft)
    assert(EdnDatalog.run(docs, "{:find [(sample 0 ?x)] :where [[?e :name ?x]]}").isLeft)
  }

  test("(rand N ?x) picks are partitioning-invariant, not collect-order luck") {
    // collect_list order changes with physical partitioning; rand must index
    // a deterministically ordered bag so picks survive any shuffle layout
    val q = """{:find [(rand 5 ?n)] :where [[?e :name ?n]]}"""
    val a = EdnDatalog.run(docs.repartition(7), q).fold(e => fail(e), identity)
      .as[Seq[String]].collect().head
    val b = EdnDatalog.run(docs.repartition(2), q).fold(e => fail(e), identity)
      .as[Seq[String]].collect().head
    assert(a == b)
  }

  test("rule call with permuted arg names (α-conversion, not column collision)") {
    // calling (boss ?b ?a) against params (?a ?b) used to rename through a
    // transient column collision and throw/corrupt
    val got = run(
      """{:find [?a ?b] :where [(boss ?b ?a)]
          :rules [[(boss ?a ?b) [?a :manager ?b]]]}""")
      .as[(String, String)].collect().toSet
    assert(got == Set(("e1", "e2"), ("e1", "e3"), ("e2", "e4"), ("e3", "e5")))
  }

  test("rule call with a repeated variable unifies instead of duplicating columns") {
    val got = run(
      """{:find [?x] :where [(boss ?x ?x)]
          :rules [[(boss ?a ?b) [?a :manager ?b]]]}""")
      .collect()
    assert(got.isEmpty, "no entity is its own manager")
  }

  test("multi-body rule whose bodies name their params differently (crux-legal)") {
    val got = run(
      """{:find [?to] :where [(reach "e1" ?to)]
          :rules [[(reach ?f ?t) [?t :manager ?f]]
                  [(reach ?x ?y) [?z :manager ?x] (reach ?z ?y)]]}""")
      .as[String].collect().toSet
    assert(got == Set("e2", "e3", "e4", "e5"))
  }

  test(":keys/:syms/:strs — result-map names as a positional column rename") {
    // plain vars
    val k = run("""{:find [?n ?s] :keys [emp-name pay]
                    :where [[?e :dept "eng"] [?e :name ?n] [?e :salary ?s]]}""")
    assert(k.columns.toSeq == Seq("emp-name", "pay"))
    assert(k.as[(String, Double)].collect().toSet ==
      Set(("ada", 120.0), ("bob", 90.0), ("dee", 100.0)))
    // aggregate-FIRST find: the rename must track :find tuple order, not
    // groupBy output order (group cols lead in Spark's agg output)
    val a = run("""{:find [(count ?e) ?d] :syms [n dept]
                    :where [[?e :dept ?d]]}""")
    assert(a.columns.toSeq == Seq("n", "dept"))
    assert(a.as[(Long, String)].collect().toSet == Set((3L, "eng"), (2L, "ops")))
    // :strs accepts strings too
    val s = run("""{:find [?d] :strs ["the dept"] :where [[?e :dept ?d]]}""")
    assert(s.columns.toSeq == Seq("the dept"))
    // pull keeps its struct under the renamed column
    val p = run("""{:find [(pull ?e [:name])] :keys [doc]
                    :where [[?e :dept "ops"]]}""")
    assert(p.columns.toSeq == Seq("doc"))
    assert(p.collect().map(_.getStruct(0).getString(0)).toSet == Set("cid", "eva"))
    // malformed: arity mismatch, duplicates, ?vars, several of the three
    for (bad <- Seq(
        "{:find [?n ?s] :keys [one] :where [[?e :name ?n] [?e :salary ?s]]}",
        "{:find [?n ?s] :keys [x x] :where [[?e :name ?n] [?e :salary ?s]]}",
        "{:find [?n] :keys [?n] :where [[?e :name ?n]]}",
        "{:find [?n] :keys [a] :syms [b] :where [[?e :name ?n]]}",
        "{:find [?n] :keys [] :where [[?e :name ?n]]}"))
      assert(EdnDatalog.run(docs, bad).isLeft, s"should reject: $bad")
  }

  test(":find tuple order is restored when aggregates precede group vars") {
    // even WITHOUT :keys, crux returns tuples in :find order
    val got = run("""{:find [(sum ?s) ?d] :where [[?e :dept ?d] [?e :salary ?s]]}""")
    assert(got.columns.toSeq == Seq("sum_s", "d"))
    assert(got.as[(Double, String)].collect().toSet ==
      Set((310.0, "eng"), (150.0, "ops")))
  }

  test(":in bindings — scalar, collection, tuple, relation (crux 1.15+)") {
    def runIn(edn: String, args: Any*) =
      EdnDatalog.runWith(docs, edn, args.toSeq).fold(e => fail(e), identity)
    // scalar
    val sc = runIn("""{:find [?n] :in [?d] :where [[?e :dept ?d] [?e :name ?n]]}""", "ops")
      .as[String].collect().toSet
    assert(sc == Set("cid", "eva"))
    // collection — an IN list; small set takes the substitution path
    val cl = runIn("""{:find [?n] :in [[?d ...]] :where [[?e :dept ?d] [?e :name ?n]]}""",
        Seq("ops", "eng"))
      .as[String].collect().toSet
    assert(cl == Set("ada", "bob", "cid", "dee", "eva"))
    // tuple
    val tp = runIn("""{:find [?n] :in [[?d ?s]] :where [[?e :dept ?d] [?e :salary ?s] [?e :name ?n]]}""",
        Seq("eng", 90.0))
      .as[String].collect().toSet
    assert(tp == Set("bob"))
    // relation
    val rl = runIn("""{:find [?n] :in [[[?d ?s]]] :where [[?e :dept ?d] [?e :salary ?s] [?e :name ?n]]}""",
        Seq(Seq("eng", 90.0), Seq("ops", 70.0)))
      .as[String].collect().toSet
    assert(rl == Set("bob", "eva"))
    // scalar × collection cross product, bound var returned in :find
    val xp = runIn("""{:find [?d ?n] :in [?d [?n ...]] :where [[?e :dept ?d] [?e :name ?n]]}""",
        "eng", Seq("ada", "cid", "dee"))
      .as[(String, String)].collect().toSet
    assert(xp == Set(("eng", "ada"), ("eng", "dee")))
  }

  test(":in large relation takes the broadcast-join path, not N unioned bodies") {
    // 20 (dept, salary) pairs — only 2 real; > 16 rows triggers the join
    val pairs = (1 to 18).map(i => Seq("ghost", i.toDouble)) ++
      Seq(Seq("eng", 90.0), Seq("ops", 70.0))
    val q = """{:find [?n] :in [[[?d ?s]]] :where [[?e :dept ?d] [?e :salary ?s] [?e :name ?n]]}"""
    val df = EdnDatalog.runWith(docs, q, Seq(pairs)).fold(e => fail(e), identity)
    assert(df.as[String].collect().toSet == Set("bob", "eva"))
    // one body + one binding join — no per-row union fan-out
    val unions = df.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }.size
    assert(unions == 0, s"expected no Union fan-out for a large :in relation, got $unions")
    // an empty collection yields an empty result, not an error
    val empty = EdnDatalog.runWith(docs,
      """{:find [?n] :in [[?d ...]] :where [[?e :dept ?d] [?e :name ?n]]}""",
      Seq(Seq.empty[String])).fold(e => fail(e), identity)
    assert(empty.count() == 0)
  }

  test(":in 10k-element collection compiles flat — join path, bounded plan") {
    // a web-scale IN list (10k ids) must neither fan out 10k bodies nor
    // take super-linear driver time to plan; the whole run (parse →
    // expand → binding DF → join → collect) must stay in test-suite time
    val big = (1 to 10000).map(i => s"dept_$i") ++ Seq("eng", "ops")
    val t0 = System.nanoTime()
    val df = EdnDatalog.runWith(docs,
      """{:find [?n] :in [[?d ...]] :where [[?e :dept ?d] [?e :name ?n]]}""",
      Seq(big)).fold(e => fail(e), identity)
    assert(df.as[String].collect().toSet == Set("ada", "bob", "cid", "dee", "eva"))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, f"10k-element :in took $secs%.1f s — planning blew up")
    val unions = df.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }.size
    assert(unions == 0, s"10k-element :in must not union bodies, got $unions")
  }

  test(":in/:args value unifies with a Bind-clause output (review r11)") {
    // ?y is BOUND by the bind clause — substitution can't reach an output
    // position, so the runtime argument must act as an equality filter;
    // before the fix it was silently ignored and all employees returned
    val viaIn = EdnDatalog.runWith(docs,
      """{:find [?n] :in [?y] :where [[?e :salary ?s] [(* ?s 2.0) ?y] [?e :name ?n]]}""",
      Seq(180.0)).fold(e => fail(e), identity).as[String].collect().toSet
    assert(viaIn == Set("bob"), s"the :in value must constrain the bind output: $viaIn")
    val viaArgs = run(
      """{:find [?n] :args [{?y 180.0}]
          :where [[?e :salary ?s] [(* ?s 2.0) ?y] [?e :name ?n]]}""")
      .as[String].collect().toSet
    assert(viaArgs == Set("bob"), s":args too: $viaArgs")
    // a non-matching value yields empty, not everything
    val none = EdnDatalog.runWith(docs,
      """{:find [?n] :in [?y] :where [[?e :salary ?s] [(* ?s 2.0) ?y] [?e :name ?n]]}""",
      Seq(7.5)).fold(e => fail(e), identity)
    assert(none.count() == 0)
  }

  test(":in var bound only inside (or …) branches still takes the join path (review r11)") {
    // dept OR name matches the binding; a syntactic top-level-pattern scan
    // missed the or-bound var and fanned 20 rows into 20 unioned bodies
    val vals = (1 to 18).map(i => s"ghost_$i") ++ Seq("ops", "ada")
    val df = EdnDatalog.runWith(docs,
      """{:find [?e] :in [[?x ...]]
          :where [(or [?e :dept ?x] [?e :name ?x])]}""",
      Seq(vals)).fold(e => fail(e), identity)
    assert(df.as[String].collect().toSet == Set("e1", "e3", "e5"))
    // the only Union is the or's two branches — no 20-way fan-out
    val unions = df.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u.children.size }
    assert(unions.forall(_ <= 2) && unions.size <= 1,
      s"or-bound :in must not fan out per binding row: $unions")
  }

  test(":in mixed numeric bindings unify to double; string+number is a Left (review r11)") {
    // 17 longs + 1 double crosses the join threshold: the schema must
    // unify to double instead of crashing inside a task after Right
    val longsAndDouble: Seq[Any] = (1 to 17).map(_ * 1000L) ++ Seq(90.0, 70.0)
    val got = EdnDatalog.runWith(docs,
      """{:find [?n] :in [[?s ...]] :where [[?e :salary ?s] [?e :name ?n]]}""",
      Seq(longsAndDouble)).fold(e => fail(e), identity).as[String].collect().toSet
    assert(got == Set("bob", "eva"), s"long/double mix must join as double: $got")
    // a genuinely mixed var (string + number) is a Left, not a task crash
    val mixed: Seq[Any] = (1 to 18).map(i => s"x$i") ++ Seq(90.0)
    assert(EdnDatalog.runWith(docs,
      """{:find [?n] :in [[?s ...]] :where [[?e :salary ?s] [?e :name ?n]]}""",
      Seq(mixed)).isLeft)
  }

  test("not-join/or-join whose every declared var is parameter-bound gives a clear Left") {
    val r = EdnDatalog.runWith(docs,
      """{:find [?n] :in [?d]
          :where [[?e :name ?n] (not-join [?d] [?x :dept ?d])]}""",
      Seq("eng"))
    assert(r.isLeft && r.swap.exists(_.contains("not-join")), s"got $r")
    // a PARTIALLY substituted join keeps unifying on the remaining vars
    val ok = EdnDatalog.runWith(docs,
      """{:find [?n] :in [?d]
          :where [[?e :name ?n] [?e :salary ?s]
                  (not-join [?e ?d] [?e :dept ?d])]}""",
      Seq("eng")).fold(e => fail(e), identity).as[String].collect().toSet
    assert(ok == Set("cid", "eva"), s"non-eng employees: $ok")
  }

  test("find var colliding with an aggregate's default alias keeps tuple positions (review r11)") {
    // ?count_e is a real var whose NAME equals (count ?e)'s default alias —
    // a name-keyed reorder silently swapped the two columns
    val got = run("""{:find [(count ?e) ?count_e] :where [[?e :dept ?count_e]]}""")
      .as[(Long, String)].collect().toSet
    assert(got == Set((3L, "eng"), (2L, "ops")), s"count first, dept second: $got")
    // a duplicated aggregate in non-find order compiles (was: ambiguous ref)
    val dup = run("""{:find [(sum ?s) ?d (sum ?s)] :where [[?e :dept ?d] [?e :salary ?s]]}""")
      .as[(Double, String, Double)].collect().toSet
    assert(dup == Set((310.0, "eng", 310.0), (150.0, "ops", 150.0)), s"$dup")
  }

  test(":in misuse is a Left, never a throw") {
    for ((edn, args) <- Seq[(String, Seq[Any])](
        // arg-count mismatch, both directions
        ("{:find [?n] :in [?d] :where [[?e :dept ?d] [?e :name ?n]]}", Nil),
        ("{:find [?n] :where [[?e :name ?n]]}", Seq("x")),
        // :in + :args combined
        ("{:find [?n] :in [?d] :args [{?d \"eng\"}] :where [[?e :dept ?d] [?e :name ?n]]}", Seq("x")),
        // collection binding fed a scalar; tuple arity mismatch
        ("{:find [?n] :in [[?d ...]] :where [[?e :dept ?d] [?e :name ?n]]}", Seq("eng")),
        ("{:find [?n] :in [[?d ?s]] :where [[?e :dept ?d] [?e :salary ?s] [?e :name ?n]]}", Seq(Seq("eng"))),
        // a variable bound twice across entries
        ("{:find [?n] :in [?d [?d ...]] :where [[?e :dept ?d] [?e :name ?n]]}", Seq("a", Seq("b"))),
        // malformed binding form
        ("{:find [?n] :in [42] :where [[?e :name ?n]]}", Seq(1)),
        // driver-side cross-product blowup across entries: 3 × 1,500-element
        // collections = 3.4e9 combined rows — must be a diagnosed Left
        // (naming the pre-joined-relation fix), never a silent driver OOM
        ("{:find [?n] :in [[?a ...] [?b ...] [?c ...]] :where [[?e :dept ?a] [?e :dept ?b] [?e :dept ?c] [?e :name ?n]]}",
          Seq(0 until 1500, 0 until 1500, 0 until 1500))))
      assert(EdnDatalog.runWith(docs, edn, args).isLeft, s"should reject: $edn with $args")
  }

  test("malformed queries give Left, never throw") {
    for (bad <- Seq("{}", "{:find []}", "{:find [?x]}", "[1 2 3]", "{:find [?x] :where [[?x",
                    "{:find [?x] :where [[?x :name ?n]] :limit \"ten\"}"))
      assert(EdnDatalog.run(docs, bad).isLeft, s"should reject: $bad")
  }

  test("crux :timeout — generous budget returns the plain query's answer, eagerly") {
    // a recursive rule keeps the fixpoint deadline poll on the executed
    // path; the result must match the same query without :timeout
    val q = """{:find [?n]
                :where [(boss ?e "e1") [?e :name ?n]]
                :rules [[(boss ?x ?b) [?x :manager ?b]]
                        [(boss ?x ?b) [?x :manager ?m] (boss ?m ?b)]]%s}"""
    val plain = run(q.format("")).as[String].collect().toSet
    val timed = run(q.format(" :timeout 300000")).as[String].collect().toSet
    assert(timed == plain && plain == Set("bob", "cid", "dee", "eva"))
  }

  test("crux :timeout — an elapsed budget is a Left naming the timeout, never a throw") {
    // 1 ms cannot cover even plan compilation, so one of the deadline
    // sites fires: a driver-loop poll, or the boundary materialization
    val got = EdnDatalog.run(docs,
      """{:find [?n]
          :where [(boss ?e "e1") [?e :name ?n]]
          :rules [[(boss ?x ?b) [?x :manager ?b]]
                  [(boss ?x ?b) [?x :manager ?m] (boss ?m ?b)]]
          :timeout 1}""")
    assert(got.isLeft && got.left.exists(_.contains("timed out")), s"got $got")
  }

  test("crux :timeout — zero/negative/non-integer values are parse Lefts") {
    for (bad <- Seq(":timeout 0", ":timeout -5", ":timeout \"3s\""))
      assert(EdnDatalog.run(docs,
        s"{:find [?n] :where [[?e :name ?n]] $bad}")
        .left.exists(_.contains("positive milliseconds")), s"should reject: $bad")
  }
}
