package graft.query

import graft.SparkSpec

/** Plan-quality guards: these assertions pin the 100 TB design posture —
  * filters/projections reach the parquet scan, dimension joins broadcast,
  * aggregates map-side combine, vector math stays in whole-stage codegen.
  * A regression here is a performance bug even while results stay correct. */
class PlanQualitySpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  /** Root paths of every parquet scan, traversing INTO finalized AQE query
    * stages and reused exchanges — plan.toString truncates Location fields,
    * so path assertions must read the scans' FileIndex directly. */
  /** Every FileSourceScanExec in an (adaptive) plan — ONE traversal shared
    * by every plan-shape assertion; a new wrapper node gets handled here,
    * once. */
  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, ReusedSubqueryExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val own = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case r: ReusedExchangeExec    => scans(r.child)
      case r: ReusedSubqueryExec    => scans(r.child)
      case s: FileSourceScanExec    => Seq(s)
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        scans(i.relation.cachedPlan) // cached subplans still have file scans
      case _                        => Seq.empty
    }
    own ++ p.children.flatMap(scans) ++ p.subqueries.flatMap(scans)
  }

  private def scanPaths(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    scans(p).flatMap(_.relation.location.rootPaths.map(_.toString))
  test("filter_range pushes predicate and prunes columns at the scan") {
    val df = Relational.filterRange(spark, sf("sf0.001"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") &&
      (scan.contains("GreaterThanOrEqual(l_quantity,5.0)") ||
       scan.contains("GreaterThanOrEqual(l_quantity")),
      s"range filter must reach parquet: $scan")
    assert(!scan.contains("l_extendedprice"),
      "unprojected columns must not be read (column pruning)")
  }

  test("join_multiway broadcasts every dimension table") {
    val plan = executedPlan(Relational.joinMultiway(spark, sf("sf0.001")))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3,
      s"customer/nation/region joins must broadcast, got $broadcasts in:\n$plan")
  }

  test("agg_group_by does a map-side partial aggregate before the shuffle") {
    val plan = executedPlan(Relational.aggGroupBy(spark, sf("sf0.001")))
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, s"expect partial+final HashAggregate:\n$plan")
    assert(plan.contains("Exchange"), "grouped agg shuffles exactly on the keys")
  }

  test("order_by_limit is a TakeOrdered, not a global sort") {
    val plan = executedPlan(Relational.orderByLimit(spark, sf("sf0.001")))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort:\n$plan")
  }

  test("entity_lookup pushes the key equality to the scan") {
    val scan = Relational.entityLookup(spark, sf("sf0.001"))
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("EqualTo(o_orderkey,1)"),
      s"point lookup must push to parquet: $scan")
  }

  test("similarity top-k keeps the scan unshuffled (broadcast target, take-ordered)") {
    val df = graft.ext.Similarity.similarityTopK(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"), "top-k must be take-ordered")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the single target vector must broadcast")
  }

  test("scale_bucketed_join sort-merges co-located buckets with no join-side exchange") {
    val df = graft.query.Scale.bucketedJoinQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    assert(plan.contains("SortMergeJoin"),
      s"bucketed join must sort-merge (broadcast would hide the layout):\n$plan")
    // the ONLY acceptable shuffle is the 5-row final priority agg — the
    // join itself reads co-located buckets on both sides (the AQE string
    // prints Final AND Initial plans; count the final section only)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(finalPlan).length
    assert(exchanges <= 1,
      s"join-side shuffle detected ($exchanges exchanges) — bucket layout not used:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scans must report the bucketed layout:\n$plan")
  }

  test("interval join is a keyed equi-join, never a cartesian range scan") {
    val df = graft.stream.StreamJoin.intervalJoinQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"time bounds must ride the user_id equi-join, not replace it:\n$plan")
  }

  test("datalog same-entity patterns compile to a single scan per table") {
    val df = graft.query.datalog.DatalogDb.datalogQuery(spark, sf("sf0.001"))
    // count relation leaves in the optimized logical plan (the compiler's
    // output; the AQE physical string double-prints stages)
    val scans = df.queryExecution.optimizedPlan.collectLeaves().length
    assert(scans == 2, s"orders + customer = exactly 2 scans, got $scans")
  }

  test("datalog arithmetic binds stay whole-stage projections on the scan side") {
    val df = graft.query.datalog.DatalogDb.datalogBindArithQuery(spark, sf("sf0.001"))
    // the bind chain + derived-value predicate must collapse into the
    // orders-side scan/filter (2 relation leaves, no extra shuffle beyond
    // the join + final aggregate), not materialize per-bind projections
    val scans = df.queryExecution.optimizedPlan.collectLeaves().length
    assert(scans == 2, s"orders + customer = exactly 2 scans, got $scans")
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bind arithmetic must not break the equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the dim side must broadcast — no fact-side join shuffle:\n$plan")
    // the derived-value predicate must reach the SCAN STAGE's filter (the
    // binds fold into one projection), not sit above the join
    assert(plan.contains("* 2.0") && plan.contains("- 100000.0"),
      s"bind arithmetic must fold into the scan-side filter:\n$plan")
  }

  test(":args relation rows each push their constant into the branch scan") {
    // the args fan-out compiles one body per row with the row's constants
    // substituted — each branch's scan must carry its own pushed filter
    // (the OR-expansion plan shape); a post-scan filter would read the
    // store unpruned once per row at 100 TB
    import org.apache.spark.sql.functions.col
    val docs = graft.query.datalog.DatalogDb.ordersCustomers(spark, sf("sf0.001"))
    val df = graft.query.datalog.EdnDatalog.run(docs,
      """{:find [?n] :where [[?c :c-mktsegment ?seg] [?c :c-name ?n]]
          :args [{?seg "BUILDING"} {?seg "MACHINERY"}]}""")
      .fold(e => fail(e), identity)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val pushed = scans(plan).map(_.metadata.getOrElse("PushedFilters", ""))
    assert(pushed.exists(_.contains("BUILDING")) &&
      pushed.exists(_.contains("MACHINERY")),
      s"each args row's constant must reach a scan: $pushed")
  }

  test(":in relation binding broadcasts; collection binding pushes per-branch") {
    // join path (20-pair relation): the binding side must broadcast — a
    // shuffled join keyed on a 20-row driver relation would re-key the
    // whole store at 100 TB. Union fan-out must also be absent.
    val relDf = graft.query.datalog.DatalogDb.datalogInRelQuery(spark, sf("sf0.001"))
    relDf.collect()
    // the orders⋈customer dimension join broadcasts at test scale on its
    // own, so a plan-string grep can't catch a regression — pin that the
    // BINDING relation (the parallelized driver rows, an RDD scan) sits
    // under a BroadcastExchange/BroadcastQueryStage specifically
    import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec}
    def bindingBroadcasts(p: SparkPlan, underBroadcast: Boolean = false): Boolean = {
      val (here, flag) = p match {
        case a: AdaptiveSparkPlanExec => return bindingBroadcasts(a.executedPlan, underBroadcast)
        case q: QueryStageExec => return bindingBroadcasts(q.plan, underBroadcast)
        case r: ReusedExchangeExec => return bindingBroadcasts(r.child, underBroadcast)
        case _: BroadcastExchangeLike => (false, true)
        case _: RDDScanExec => (underBroadcast, underBroadcast)
        case _ => (false, underBroadcast)
      }
      here || p.children.exists(bindingBroadcasts(_, flag))
    }
    assert(bindingBroadcasts(relDf.queryExecution.executedPlan),
      s"the 20-row :in binding relation (RDD scan) must sit under a broadcast " +
        s"exchange:\n${executedPlan(relDf)}")
    assert(!executedPlan(relDf).contains("CartesianProduct"),
      "binding join must stay an equi-join")
    // substitution path (3-element collection): each branch's constant
    // reaches its own scan, like the :args fan-out
    val collDf = graft.query.datalog.DatalogDb.datalogInCollQuery(spark, sf("sf0.001"))
    collDf.collect()
    val pushed = scans(collDf.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("PushedFilters", ""))
    assert(pushed.exists(_.contains("BUILDING")) && pushed.exists(_.contains("MACHINERY")),
      s"each :in collection element must reach a scan as a pushed constant: $pushed")
  }

  test("datalog pull join is a keyed equi-join, never a cartesian") {
    // (pull ?e [...]) enriches the binding tuple via an id equi-join
    // against the doc relation — hash/broadcast-joinable at any scale; a
    // nested-loop here would be all-pairs over the document universe
    val df = graft.query.datalog.DatalogDb.datalogPullQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pull must stay an equi-join:\n$plan")
  }

  test("unbounded recursive pull unrolls to equi-joins, never a cartesian") {
    // {:link ...}: plan-time depth discovery + static unroll — the final
    // plan must look exactly like the bounded form's (chain of id
    // equi-joins over the doc relation), with no cartesian/NL join from
    // the discovery machinery leaking into the query plan
    val df = graft.query.datalog.DatalogDb
      .datalogPullRecursiveQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unbounded pull must stay an equi-join chain:\n$plan")
  }

  test("datalog rand/sample aggregates are bounded — no collect_list/collect_set state") {
    // (rand N ?x)/(sample N ?x) must run as O(k)-state partial aggregates
    // (PickExpressions), not whole-group collect_* buffers: a hot group at
    // 100 TB would otherwise buffer everything on one reducer (VERDICT r10)
    val df = graft.query.datalog.DatalogDb.datalogSampleQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    assert(!plan.contains("collect_list") && !plan.contains("collect_set"),
      s"rand/sample must not materialize whole groups:\n$plan")
    assert(plan.contains("ObjectHashAggregate") &&
      (plan.contains("samplebottomk") || plan.contains("SampleBottomK")),
      s"bounded pick aggregates must drive the plan:\n$plan")
    assert(plan.contains("partial_samplebottomk") || plan.contains("partial samplebottomk") ||
      "(?i)partial.*samplebottomk".r.findFirstIn(plan).nonEmpty,
      s"pick aggregate must run PARTIAL before the shuffle:\n$plan")
  }

  test("near-dup candidate generation never degenerates to a cartesian product") {
    // the 100 TB contract of every LSH path: candidates come from an
    // EQUI-join on a small hash key; a CartesianProduct/BroadcastNestedLoop
    // anywhere means an O(n²) regression snuck in
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(200)
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001")).limit(200)
    for ((name, df) <- Seq(
        "simhash" -> graft.ext.Dedup.simhashNearDups(docs),
        "minhash" -> graft.ext.Dedup.minhashNearDups(docs),
        "ngram" -> graft.ext.Dedup.ngramJaccardPairs(docs),
        "embedding-lsh" -> graft.ext.Dedup.embeddingNearDups(emb, threshold = 0.9))) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name candidate join must be an equi-join:\n$plan")
      graft.core.CacheRegistry.unpersistAll()
    }
  }

  test("scale_salted_agg: partial aggregation on BOTH phases, two exchanges max") {
    val df = Scale.saltedAggQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    // salt phase + key phase, each with map-side partials — never more
    // shuffles than phases
    assert("HashAggregate".r.findAllIn(plan).length >= 4,
      s"expect partial+final per phase:\n$plan")
    // AQE prints initial+final plans with fresh ids — count only the final
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 2,
      s"salted agg is exactly two shuffles:\n$plan")
  }

  test("stream_windowed_agg prunes the scan to (ts, event_type, value)") {
    val df = Relational.streamWindowedAggBatch(spark, sf("sf0.001"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scan.contains("props") && !scan.contains("event_id"),
      s"windowed agg must read only its three columns: $scan")
  }

  test("text_repetition is a pure scan: zero exchanges, whole-stage codegen") {
    val df = graft.ext.TextOps.textRepetitionQuery(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc signals must not shuffle anything:\n$plan")
    // "*(n)" prefixes mark whole-stage-codegen stages in simpleString
    assert(plan.contains("*(1)"),
      s"the native expression must stay inside codegen:\n$plan")
  }

  test("text_top_terms ranks per-doc without a global sort; scan pruned to 2 columns") {
    val df = graft.ext.TextOps.textTopTermsQuery(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // rangepartitioning = a global sort snuck in; the window must rank
    // inside doc_id hash partitions only
    assert(!plan.contains("rangepartitioning"),
      s"per-doc rank must not global-sort:\n$plan")
    // the document-frequency side is vocabulary-sized (sublinear, Heaps'
    // law) and must broadcast — a sort-merge join here re-shuffles the
    // corpus-sized tf table onto term (the r7 bench regression flag)
    assert(plan.contains("BroadcastHashJoin"),
      s"df side must broadcast onto tf:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"tf must never re-shuffle onto term:\n$plan")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("doc_id") && scan.contains("text") && !scan.contains("n_chars"),
      s"scan must read only (doc_id, text): $scan")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("cluster stats: label rides the argmin; no corpus self-join re-attaches it") {
    try {
      graft.core.ModelCache.clear()
      val df = graft.ext.Similarity.clusterStatsQuery(spark, sf("sf0.001"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the ONLY join may be the centroid argmin (16 model rows broadcast
      // against the scan); re-attaching `label` by joining the corpus to
      // itself on vec_id was the r7 shape this replaced. Count joins in
      // the FINAL plan only — AQE's "Initial Plan" section echoes them.
      val finalPlan = plan.split("== Initial Plan ==").head
      // BroadcastHashJoin is forbidden too: at test scale a re-introduced
      // vec_id self-join would be planned as one (tiny tables under the
      // 10 MB auto-broadcast threshold) and slip past a shuffle-join-only
      // assertion — the pinned plan legitimately has NO equi-join at all
      assert(!finalPlan.contains("SortMergeJoin") &&
          !finalPlan.contains("ShuffledHashJoin") &&
          !finalPlan.contains("BroadcastHashJoin"),
        s"no equi-join may appear (label must ride the argmin):\n$finalPlan")
      assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).length <= 1,
        s"only the centroid argmin may nest-loop:\n$finalPlan")
    } finally graft.core.CacheRegistry.unpersistAll()
  }

  test("clean-corpus pipeline: no cartesian; staged pairs cut documents scans to two") {
    try {
      val df = graft.ext.Corpus.cleanCorpusQuery(spark, sf("sf0.001"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"composition must stay equi-joined:\n$plan")
      // the gate consumes the STAGED pair artifact, so the pair pipeline's
      // document pass happened once at staging time — the cleaning plan
      // itself reads documents only for the anti-join base + repetition/
      // quality signals (2 scans; it was 3 when pairs were regenerated
      // inline). The staged parquet itself doesn't appear here: the CC
      // loop consumes it eagerly and the final plan reads the materialized
      // cluster labels (CorpusSpec pins staged-vs-inline result parity).
      val paths = scanPaths(df.queryExecution.executedPlan)
      val docScans = paths.count(_.contains("documents.parquet"))
      assert(docScans <= 2, s"expected <= 2 documents scans via staged pairs, got $paths")
    } finally graft.core.CacheRegistry.unpersistAll()
  }

  test("decontamination probe broadcasts the eval universe; two shuffles total") {
    // the scale contract: the benchmark side collapses + broadcasts, the
    // training side is probed WITHOUT a shuffle — the only exchanges are
    // the eval-side distinct and the final per-doc count
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val df = graft.ext.Corpus.contamination(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0))
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingle universe must broadcast:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==").head
    // r16: + the two explode-width doc-row spreads (train + eval); the
    // per-doc count rides the train spread's doc_id clustering for free
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 4,
      s"spreads + eval distinct + per-doc count are the only shuffles:\n$plan")
  }

  test("admission-filter probe: hash-keyed equi-joins only, never a cartesian") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val path = java.nio.file.Files.createTempDirectory("graft-pq-index-").toString
    graft.ext.Dedup.stageShingleIndex(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0), path)
    val index = graft.ext.Dedup.loadShingleIndex(spark, path)
    val plan = executedPlan(graft.ext.Dedup.nearDupMatches(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1), index))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"probe must stay equi-joined:\n$plan")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("semantic dedup: pair prune is a cid equi-join; only the centroid argmin may nest-loop") {
    try {
      val emb = graft.core.Tables.embeddings(spark, sf("sf0.001")).limit(200)
      val df = graft.ext.Dedup.semanticDedup(
        graft.ext.Dedup.withPlantedTwinsExact(emb), kCentroids = 8, iters = 1)
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"),
        s"semantic dedup must never go cartesian:\n$plan")
      // the centroid argmin is a deliberate broadcast nested loop (k-row
      // model state against the corpus); the O(c²)-RISKY join — pairs
      // within a cluster — must be hash-keyed on centroid id
      val finalPlan = plan.split("== Initial Plan ==").head
      assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).length <= 1,
        s"only the centroid argmin may nest-loop:\n$plan")
      // the cid join sits in a nested adaptive subtree (cache/broadcast
      // stage), so search the FULL plan dump, not just the outer final plan
      assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cid#".r
          .findFirstIn(plan).isDefined,
        s"within-cluster prune must equi-join on cid:\n$plan")
    } finally graft.core.CacheRegistry.unpersistAll()
  }

  test("corpus_vocab: hot-token-safe two-phase aggregation; scan pruned to (doc_id, text)") {
    val df = graft.ext.Corpus.vocabularyQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // count(distinct doc_id) must plan as the (token, doc_id) partial-dedup
    // rewrite: ≥2 aggregate phases with partials, ≤2 exchanges — a single
    // groupBy(token) shuffle would pile every occurrence of a hot token
    // ("the") onto one reducer
    assert("HashAggregate".r.findAllIn(finalPlan).length >= 4,
      s"expect partial+final aggregate pairs:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 2,
      s"vocab is at most two shuffles:\n$plan")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("doc_id") && scan.contains("text") && !scan.contains("n_chars"),
      s"scan must read only (doc_id, text): $scan")
  }

  test("sessionize: one user_id shuffle serves both windows and the session aggregate") {
    val df = graft.query.Relational.streamSessionizeBatch(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // hashpartitioning(user_id) satisfies the (user_id, session_seq)
    // clustered distribution, so the group-by must NOT re-shuffle
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 1,
      s"sessionize is exactly one shuffle:\n$plan")
    assert(!finalPlan.contains("rangepartitioning"),
      s"per-user ordering must not global-sort:\n$plan")
  }

  test("streaming as-of enrichment broadcasts the version arrays") {
    import org.apache.spark.sql.functions._
    val left = spark.range(100).selectExpr("id % 5 AS k", "id AS ts", "id AS v")
    val dim = spark.range(20).selectExpr("id % 5 AS k", "id AS vts", "id * 2 AS price")
    val df = graft.stream.StreamAsOf.enrichAsOf(left, dim, "k", "ts", "vts", Seq("price"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension side must broadcast (stream side never shuffles):\n$plan")
  }

  test("document-store as-of prunes valid_date partitions at the scan") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-store-prune").toString
    val store = graft.store.DocumentStore(spark, dir + "/docs")
    for (d <- 1 to 5)
      store.put(s"e$d", s"""{"v":$d}""", Some(Timestamp.valueOf(f"2024-01-0$d 00:00:00")))
    store.compact() // date-partitioned + id-sorted layout
    val df = store.asOf(Timestamp.valueOf("2024-01-02 12:00:00"))
    // collect() (not count()) so the metrics land on THIS queryExecution
    assert(df.collect().length == 2, "two docs valid at the cut")
    val scan = scans(df.queryExecution.executedPlan).head
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("valid_date")),
      s"the derived valid_date cut must be a PARTITION filter: ${scan.partitionFilters}")
    // 5 date partitions exist; an as-of at day 2 reads days 1-4 — the cut
    // plus the 2-day timezone slack (writer/reader sessions may render one
    // instant as dates up to 2 days apart) — and still prunes day 5
    val read = scan.metrics.get("numPartitions").map(_.value)
    assert(read.contains(4L), s"expected 4 of 5 date partitions read " +
      s"(day-2 cut + 2-day TZ slack), got $read")
  }

  test("bitemporal as-of filters before the window (partition pruning path)") {
    val df = Relational.asofSnapshot(spark, sf("sf0.001"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    // the valid-time cut must reach the scan (raw-nanos comparison), not
    // sit above the window behind a timestamp conversion
    assert(scan.contains("LessThanOrEqual(ts,"),
      s"as-of time cut must push down: $scan")
  }

  test("dsir: the ratio table broadcasts; no cartesian; scan pruned to (doc_id, text)") {
    val df = graft.ext.Corpus.dsirWeightsQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // the scoring join against the buckets-bounded ratio table must be a
    // broadcast — a shuffled scoring join would move the exploded corpus
    // features a second time for a table that never exceeds `buckets` rows
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"ratio join must broadcast:\n$plan")
    assert(!finalPlan.contains("CartesianProduct"),
      s"dsir must never cartesian (1-row totals are broadcast loops):\n$plan")
    val docScans = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("documents")))
    assert(docScans.nonEmpty &&
      docScans.forall(s => { val c = s.schema.fieldNames.toSet
        c.contains("doc_id") && c.contains("text") && !c.contains("n_chars") }),
      s"documents scans must read only (doc_id, text): ${docScans.map(_.schema.catalogString)}")
  }

  test("lm perplexity: no cartesian; doc aggregate map-side combines") {
    val df = graft.ext.Corpus.lmPerplexityQuery(spark, sf("sf0.001"))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"),
      s"the 1-row vocab-size table must broadcast, not cartesian:\n$plan")
    // final per-doc NLL: partial+final HashAggregate pair around one
    // doc_id exchange — integer sums combine map-side
    assert("HashAggregate".r.findAllIn(finalPlan).length >= 2,
      s"doc aggregate must have a partial phase:\n$plan")
  }

  test("pq encode + ADC search: zero exchanges — a narrow map and a TakeOrdered") {
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val model = graft.ext.Similarity.trainPqCodebooks(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 0),
      m = 4, ksub = 16, iters = 1)
    try {
      val q = (0 until 64).map(_.toDouble)
      val df = graft.ext.Similarity.pqTopK(
        graft.ext.Similarity.pqEncode(emb, model), model, q, k = 10)
      val plan = executedPlan(df)
      val finalPlan = plan.split("== Initial Plan ==").head
      // everything is literal-codebook arithmetic per row: the only plan
      // nodes between scan and result are Project and TakeOrdered — at
      // 100 TB the encode+search never shuffles a vector
      assert(!finalPlan.contains("Exchange hashpartitioning"),
        s"pq encode/search must not shuffle:\n$plan")
      assert(finalPlan.contains("TakeOrderedAndProject"),
        s"top-k must be a TakeOrdered, not a global sort:\n$plan")
      assert(!finalPlan.contains("Sort "), s"no global sort:\n$plan")
    } finally graft.core.CacheRegistry.unpersistAll()
  }

  test("bm25: map-side tf/dl, model-sized shuffles only, TakeOrdered top-k") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val df = graft.ext.TextOps.bm25TopK(docs, Seq("join", "vector", "merge"), k = 20)
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // tf and dl are array ops over one tokenization: the corpus never
    // shuffles as (doc, token) rows — r17 also folded the per-term df
    // aggregate and the per-doc score sum into a single-row stats
    // broadcast + a map-side score over the thin (doc_id, dl, tfs) cache,
    // so the ONLY hash exchange left is the explode-width doc-row spread
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 1,
      s"the id spread is the only hash shuffle:\n$plan")
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the scan reads (doc_id, text) only
    val cols = scans(df.queryExecution.executedPlan)
      .flatMap(_.schema.fieldNames).toSet
    assert(cols.subsetOf(Set("doc_id", "text")),
      s"bm25 scan must prune to (doc_id, text), read $cols")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("CMS probe: fixed-size sketch broadcasts; probe side never shuffles") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val df = graft.ext.TextOps.cmsTermFrequencies(docs, Seq("join", "hash", "qux"))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // the one-row sketch reaches the probe via broadcast; candidate rows
    // are estimated map-side — a hash exchange would mean the probe
    // re-keyed the corpus
    assert(!finalPlan.contains("Exchange hashpartitioning"),
      s"CMS build is a global partial agg + broadcast; no hash shuffle:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the sketch row must broadcast to the probe:\n$plan")
  }

  test("bloom decontamination: bitmap broadcasts; one per-doc shuffle total") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val df = graft.ext.Corpus.bloomContamination(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // vs the distinct-shingle probe: the bloom build is a global partial
    // aggregate — no eval-side distinct shuffle; the r16 explode-width
    // spreads (train + eval doc rows) are the only hash exchanges, and
    // the per-doc hit count rides the train spread's doc_id clustering
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 2,
      s"the two doc-row spreads are the only hash shuffles:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the bitmap row must broadcast to the probe:\n$plan")
  }

  test("fuzzy decontam: candidates form on the band-bucket equi-join, no cartesian") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val df = graft.ext.Corpus.fuzzyContamination(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0))
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"cross-corpus LSH must never nest-loop:\n$plan")
  }

  test("temperature mix: apply side is broadcast-join + filter, corpus never re-keyed") {
    val df = graft.ext.Corpus.temperatureMix(
      graft.core.Tables.documents(spark, sf("sf0.001")))
    val plan = executedPlan(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // the r16 explode-width spread (one, inside the persisted thin token
    // table both consumers share) + the per-source token aggregate + one
    // model-sized re-agg; the keep decision joins the tiny threshold
    // table via broadcast — the corpus is never re-keyed for the apply
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length <= 3,
      s"spread + corpus agg + model-side agg are the only hash shuffles:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"thresholds must broadcast to the keep filter:\n$plan")
  }

  test("constant-limit stratum ranks ride WindowGroupLimit: partial below the exchange") {
    // capPerSource / sampleStratified keep their partitionBy windows ONLY
    // because their rank filters are CONSTANT limits, which Spark 4.1's
    // WindowGroupLimitExec pushes below the exchange (each map task
    // forwards at most `limit` rows per stratum, so the reducer sort is
    // cap-bounded, not corpus-bounded). That pushdown is the entire 100 TB
    // posture of these two operators — AQE cannot split a window key's
    // partition — so its presence is pinned here; if a Spark upgrade or a
    // filter rewrite drops it, these must move to Strata.stratumRank like
    // topQualityFrac/ccnetBuckets/tokenBudgetMix did (VERDICT r15 #2).
    // Pin the AT-SCALE shape: with r16's byte-adaptive spread width, the
    // sf0.001 fixture spreads to ONE partition (Exchange SinglePartition),
    // where Spark rightly plans only the Final group-limit (there is no
    // exchange for a Partial to run below). Force multi-partition spreads
    // for this assertion — the production regime the pin protects.
    spark.conf.set("spark.graft.spread.targetBytesPerTask", "1024")
    try for ((name, df) <- Seq(
        "corpus_cap_source" -> graft.ext.Corpus.capPerSourceQuery(spark, sf("sf0.001")),
        "corpus_sample_stratified" ->
          graft.ext.Corpus.sampleStratifiedQuery(spark, sf("sf0.001")))) {
      val plan = executedPlan(df)
      val finalPlan = plan.split("== Initial Plan ==").head
      val lines = finalPlan.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
      assert(lines.exists(_.contains("Partial")),
        s"$name: the map-side Partial WindowGroupLimit is the skew guard:\n$plan")
      assert(lines.exists(_.contains("Final")),
        s"$name: expected the Final WindowGroupLimit above the exchange:\n$plan")
    } finally spark.conf.unset("spark.graft.spread.targetBytesPerTask")
  }

  test("non-constant stratum ranks carry no per-stratum Window exec at all") {
    // topQualityFrac / ccnetBuckets / tokenBudgetMix / dsirSelect rank with
    // filters WindowGroupLimit can't push (top-frac, running budget,
    // terciles): a partitionBy(lang) Window exec reappearing in any of
    // their plans means the corpus-growing single-reducer sort is back
    for ((name, df) <- Seq(
        "corpus_quality_topfrac" -> graft.ext.Corpus.topQualityFracQuery(spark, sf("sf0.001")),
        "corpus_token_mix" -> graft.ext.Corpus.tokenBudgetMixQuery(spark, sf("sf0.001")),
        "corpus_ccnet_buckets" -> graft.ext.Corpus.ccnetBucketsQuery(spark, sf("sf0.001")))) {
      try {
        val plan = executedPlan(df)
        assert(!plan.linesIterator.exists(_.trim.startsWith("Window")),
          s"$name must rank via Strata.stratumRank, not a Window exec:\n$plan")
      } finally graft.core.CacheRegistry.unpersistAll()
    }
  }

  test("classifier plan-literal scoring: pure scan, no join, codegen intact") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val model = graft.ext.Corpus.QualityModel(Vector.fill(64)(1000L))
    val df = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      graft.ext.Corpus.classifierScoreQ6(
        org.apache.spark.sql.functions.col("text"), model).as("s"))
    val plan = executedPlan(df)
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"staged-model scoring must be a shuffle-free projection:\n$plan")
    // `*(n)` marks whole-stage-codegen'd operators: the native
    // feat_weight_sum keeps the Project inside codegen, where the earlier
    // HOF-lambda fold fell out to the interpreter
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"the score fold must stay inside codegen:\n$plan")
  }
}
