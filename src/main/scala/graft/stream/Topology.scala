package graft.stream

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}
import graft.registry.FunctionRegistry

/** The stream-node dataflow graph (T1, T11-T14, SURVEY.md §2.3).
  *
  * Reference model: named core.async channels carrying transducers, wired
  * by `:upstream` sets into a DAG with `mult`/`tap` fan-out
  * (`/root/reference/src/dataworks/utils/stream.clj:11-17,45-53,87-102`).
  * Spark model: each node's output is a streaming DataFrame; fan-in is
  * `unionByName` of upstream outputs (T12), fan-out falls out of several
  * downstream plans referencing one upstream plan (T11), and the engine's
  * forced `(filter some?)` null-drop after every user transducer
  * (`/root/reference/src/dataworks/stream.clj:47`) is a `value IS NOT NULL`
  * filter.
  *
  * Scale: nodes are narrow transformations over the Kafka-partitioned
  * stream — no shuffle is introduced unless an op-spec aggregates; the DAG
  * compiles into one Catalyst plan per sink, so whole-stage codegen fuses
  * each node chain exactly like transducer composition fused element steps
  * (SURVEY.md §4 row 1).
  */
class Topology(val io: StreamIO, val registry: FunctionRegistry = FunctionRegistry.default) {

  private val nodeMap = TrieMap.empty[String, StreamNode]

  def nodes: Map[String, StreamNode] = nodeMap.toMap
  def node(full: String): Option[StreamNode] = nodeMap.get(full)

  /** Validation mirrors `create-stream!`'s railway
    * (`/root/reference/src/dataworks/stream.clj:117-133,50-57`): an error
    * handler requires a transducer, a transducer requires a buffer. */
  def validate(n: StreamNode): Either[String, StreamNode] =
    if (n.errorSink.isDefined && n.transducer.isEmpty)
      Left(s"${n.name.full}: error-handler requires a transducer")
    else if (n.transducer.isDefined && n.buffer.isEmpty)
      Left(s"${n.name.full}: transducer requires a buffer")
    else n.buffer match {
      // a non-positive size passes parsing but detonates in the executor
      // (Sliding(0) divides by zero, negative sizes allocate negative
      // arrays, Fixed(-n) feeds Kafka a negative rate limit)
      case Some(graft.core.BufferSpec.Fixed(x)) if x <= 0 =>
        Left(s"${n.name.full}: buffer size must be positive, got $x")
      case Some(graft.core.BufferSpec.Sliding(x)) if x <= 0 =>
        Left(s"${n.name.full}: sliding buffer size must be positive, got $x")
      case Some(graft.core.BufferSpec.Dropping(x)) if x <= 0 =>
        Left(s"${n.name.full}: dropping buffer size must be positive, got $x")
      case _ =>
        // interval-join durations must parse NOW: a malformed lookback
        // passes JSON parsing (it's a free string, like watermarks) but
        // would detonate in buildPlan after downstream queries stopped
        def badDuration(spec: OpSpec): Option[String] = spec match {
          case OpSpec.Comp(ss) => ss.flatMap(badDuration(_)).headOption
          case OpSpec.LetExpr(_, body) => body.flatMap(badDuration(_)).headOption
          case OpSpec.IntervalJoin(_, _, lb, la, _, _) =>
            Seq(lb, la).find(d =>
              scala.util.Try(StreamJoin.parseDuration(d)).isFailure)
          case _ => None
        }
        n.transducer.flatMap(badDuration) match {
          case Some(bad) => Left(
            s"${n.name.full}: intervalJoin duration '$bad' — " +
              "expected '<n> seconds|minutes|hours|days'")
          case None => Right(n)
        }
    }

  /** Would swapping `n` into the graph close a cycle? Checked by
    * [[StreamManager.updateNode]] BEFORE stopping any running sink — a
    * cycle must fail the railway, not throw out of `buildPlan` after
    * downstream queries are already stopped. (A MISSING upstream is NOT an
    * error here: creating a processor before its input node is registered
    * is the normal bootstrap/management order — nothing builds a plan until
    * a downstream sink exists, and `applyGraph` isolates any sink whose
    * plan still can't build.) */
  def validateWiring(n: StreamNode): Either[String, StreamNode] = {
    val hypothetical = nodeMap.toMap + (n.name.full -> n)
    // walk downstream edges of the hypothetical graph from n; returning
    // to n means the swap would close a cycle
    val out = hypothetical.values
      .flatMap(m => depsOf(m).map(u => (u, m.name.full)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var acc = Set.empty[String]
    var frontier = out.getOrElse(n.name.full, Set.empty)
    while (frontier.nonEmpty) {
      acc ++= frontier
      frontier = frontier.flatMap(f => out.getOrElse(f, Set.empty)) -- acc
    }
    if (acc.contains(n.name.full))
      Left(s"${n.name.full}: update would create a cycle")
    else Right(n)
  }

  def addNode(n: StreamNode): Either[String, StreamNode] =
    // wiring check here too, not just updateNode: bootstrap replays a
    // store whose recorded graph may already contain a cycle, and a raw
    // addNode caller gets no later validateWiring pass at all (buildPlan's
    // visited-set guard would throw, but registration is where a cycle
    // should fail the railway)
    validate(n).flatMap(validateWiring).map { ok =>
      nodeMap.put(ok.name.full, ok); io.ensureTopic(ok.name.full); ok }

  def removeNode(full: String): Unit = { nodeMap.remove(full); () }

  /** `get-edges` (`utils/stream.clj:11-17`): (upstream, downstream). */
  def edges: Seq[(String, String)] =
    nodeMap.values.flatMap(n => depsOf(n).map(u => (u, n.name.full))).toSeq

  /** T14 `query-graph`: everything reachable downstream of `full`
    * (the affected subgraph on a hot-swap — only these re-wire). */
  def downstreamOf(full: String): Set[String] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var acc = Set.empty[String]
    var frontier = Set(full)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(out.getOrElse(_, Set.empty)) -- acc
      acc ++= next
      frontier = next
    }
    acc
  }

  /** Sink nodes: kafka topics fed by upstreams (producer side of
    * `handle-topic`, `utils/stream.clj:80-85`). */
  def sinkNodes: Seq[StreamNode] =
    nodeMap.values.filter(n => n.upstream.nonEmpty &&
      n.name.isInstanceOf[NodeName.KafkaTopic]).toSeq

  /** Canonical sequence of STATEFUL op-specs in the plan feeding `full`
    * (upstream closure in deterministic order, `Comp` flattened). This is
    * the hot-swap change-class boundary of SURVEY.md §7.4 risk 2:
    * checkpoint reuse across a swap is legal exactly while this signature
    * is unchanged — map/filter/select edits keep committed offsets; adding,
    * removing, or re-parameterizing a windowAgg/sessionAgg/dedupe changes
    * the state-store shape, and Spark rejects the old checkpoint
    * (StateSchemaNotCompatible / changed-stateful-operators). Unknown or
    * currently-missing upstreams contribute nothing — exactly what the
    * built plan would contain. */
  def statefulSignature(full: String, visiting: Set[String] = Set.empty): Seq[String] =
    if (visiting.contains(full)) Seq.empty
    else nodeMap.get(full).fold(Seq.empty[String]) { n =>
      depsOf(n).flatMap(statefulSignature(_, visiting + full)) ++
        n.transducer.toSeq.flatMap(statefulOps)
    }

  /** External source topics of `full`'s plan: the empty-upstream nodes in
    * its upstream closure — exactly the topics whose offsets a checkpoint
    * for this query commits (used to sanity-check legacy-checkpoint
    * adoption against what the checkpoint actually tracked). */
  def sourceTopics(full: String, visiting: Set[String] = Set.empty): Set[String] =
    if (visiting(full)) Set.empty
    else nodeMap.get(full).fold(Set.empty[String]) { n =>
      val deps = depsOf(n) // a join's checkpoint commits BOTH sides' offsets
      if (deps.isEmpty) Set(n.name.full)
      else deps.toSet.flatMap((d: String) => sourceTopics(d, visiting + full))
    }

  private def statefulOps(spec: OpSpec): Seq[String] = spec match {
    case OpSpec.Comp(stages)    => stages.flatMap(statefulOps)
    case OpSpec.LetExpr(_, body) => body.flatMap(statefulOps)
    case s: OpSpec.WindowAgg    => Seq(s.toString)
    case s: OpSpec.SessionAgg   => Seq(s.toString)
    case s: OpSpec.DedupeKeys   => Seq(s.toString)
    case s: OpSpec.IntervalJoin => Seq(s.toString)
    case s: OpSpec.QuotaAdmit   => Seq(s.toString)
    case _                      => Seq.empty
  }

  /** Non-upstream graph dependencies a transducer introduces (today: the
    * right side of an interval join). These are REAL edges — cycle
    * checks, affected-subgraph, stateful signatures, and source-topic
    * closures must all see them, or a hot-swap of the right node would
    * leave a running join reading a stale plan. */
  private def joinDeps(spec: OpSpec): Seq[String] = spec match {
    case OpSpec.Comp(stages)        => stages.flatMap(joinDeps)
    case OpSpec.LetExpr(_, body)    => body.flatMap(joinDeps)
    case OpSpec.IntervalJoin(r, _, _, _, _, _) => Seq(r)
    case _                          => Seq.empty
  }

  private def depsOf(n: StreamNode): Seq[String] =
    (n.upstream.toSeq ++ n.transducer.toSeq.flatMap(joinDeps)).distinct.sorted

  /** Apply an op-spec stage chain (T3-T5) to a node input. */
  def applyOpSpec(df: DataFrame, spec: OpSpec,
                  building: Set[String] = Set.empty): DataFrame = spec match {
    case OpSpec.MapExpr(e)      => df.withColumn("value", expr(e))
    case OpSpec.FilterExpr(p)   => df.filter(expr(p))
    case OpSpec.SelectExpr(es)  => df.selectExpr(es: _*)
    case OpSpec.Named(name, _)  => registry.transform(name, df)
    case OpSpec.Comp(stages)    => stages.foldLeft(df)(applyOpSpec(_, _, building))
    case OpSpec.LetExpr(bindings, body) =>
      // F7 ->let: bind each named definition as a column (later bindings
      // may reference earlier ones — sequential withColumn IS the let*
      // scoping), run the body with every name in scope, then drop any
      // binding the body didn't claim — locals going out of scope. A
      // binding that shadows an input column is a shadow, not a local:
      // it survives, like the reference's let over an outer name.
      // shadow detection is CASE-INSENSITIVE to match Spark's default
      // column resolution: withColumn("Value", …) REPLACES an existing
      // `value`, so treating "Value" as a droppable local would delete the
      // input column outright
      val beforeLc = df.columns.map(_.toLowerCase).toSet
      val bound = bindings.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }
      val result = body.foldLeft(bound)(applyOpSpec(_, _, building))
      val locals = bindings.map(_._1).distinct
        .filter(c => !beforeLc.contains(c.toLowerCase))
        .flatMap(c => result.columns.find(_.equalsIgnoreCase(c)))
      result.drop(locals: _*)
    case OpSpec.WindowAgg(ts, dur, slide, wm, keys, aggs) =>
      val windowed = slide match {
        case Some(s) => window(col(ts), dur, s)
        case None    => window(col(ts), dur)
      }
      val aggCols = aggs.map(expr)
      df.withWatermark(ts, wm)
        .groupBy(windowed.as("window") +: keys.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    case OpSpec.DedupeKeys(keys, ts, wm) =>
      // watermark bounds the dedup state (old keys age out) — at 100 TB/day
      // this is what keeps streaming exact-dedup state finite
      df.withWatermark(ts, wm).dropDuplicatesWithinWatermark(keys)
    case OpSpec.AsOfEnrich(dimPath, key, eventTs, dimTs, carry) =>
      StreamAsOf.enrichAsOf(df, io.spark.read.parquet(dimPath),
        key, eventTs, dimTs, carry)
    case OpSpec.IntervalJoin(right, key, lookback, lookahead, wm, carry) =>
      // the right side is a NODE PLAN — the join composes whatever
      // transducers that node declares; `building` rides along so a join
      // cycle fails with the same loud error as an upstream cycle
      val r = buildPlan(right, building)
      val leftCols = df.columns.toSeq
      StreamJoin.intervalJoin(
          df.withWatermark("ts", wm), r.withWatermark("ts", wm), key,
          StreamJoin.parseDuration(lookback), StreamJoin.parseDuration(lookahead))
        .select(leftCols.map(c => col(s"l.$c")) ++
          carry.map(c => col(s"r.$c").as(s"right_$c")): _*)
    case OpSpec.SessionAgg(ts, gap, wm, keys, aggs) =>
      val aggCols = aggs.map(expr)
      df.withWatermark(ts, wm)
        .groupBy(session_window(col(ts), gap).as("session") +: keys.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    case OpSpec.ScrubPii(tc) => graft.ext.TextOps.scrubPii(df, tc)
    case OpSpec.QuotaAdmit(key, cap, ttl) =>
      Stateful.quotaAdmit(df, key, cap, ttl).toDF()
    case OpSpec.ClassifierAdmit(path, minScoreQ6, textCol) =>
      // same plan-lifecycle contract as BloomAdmit: the staged weights are
      // resolved at plan build, embedded as a literal, probed per row
      val model = graft.ext.Corpus.loadQualityClassifier(io.spark, path)
      df.withColumn("score_q6",
          graft.ext.Corpus.classifierScoreQ6(col(textCol), model))
        .filter(col("score_q6") >= lit(minScoreQ6))
    case OpSpec.BloomAdmit(path, maxFracQ6, textCol) =>
      import graft.functions.SketchExpressions.bloomMightContain
      // params come from the staged row itself (stage/probe mismatch is
      // impossible). The bitmap is embedded as a PLAN LITERAL — m/8 bytes
      // of driver-side model state, the PQ-codebook pattern — because a
      // streaming plan can't cross-join a static side; the probe is then a
      // pure per-row array op with no join at all. Model freshness follows
      // the plan lifecycle: a restage takes effect on node (re)start —
      // the hot-swap contract — unlike StreamScore.admitClean's
      // per-micro-batch resident pin.
      val model = graft.ext.Corpus.loadBloomFilter(io.spark, path)
      val bloomLit = typedLit(model.bitmap.head().getSeq[Long](0))
      df.withColumn("__sh", graft.functions.TextHashExpressions.word_shingles(
          graft.ext.TextOps.tokens(col(textCol)), model.shingleN))
        .withColumn("n_sh", size(col("__sh")).cast("long"))
        .withColumn("n_hit_bloom", size(org.apache.spark.sql.functions.filter(
          col("__sh"),
          s => bloomMightContain(bloomLit, s, model.kHash, model.mBits)))
          .cast("long"))
        .filter(col("n_hit_bloom") * lit(1000000L) <= lit(maxFracQ6) * col("n_sh"))
        .drop("__sh")
  }

  /** Per-topic serde (S10): the reference selects Edn/Json serializers per
    * topic format (`/root/reference/src/dataworks/utils/kafka.clj:77-78,112-128`).
    * JSON payloads pass through; EDN payloads are decoded to JSON text so
    * the whole downstream expression surface (`get_json_object`,
    * `from_json`) applies uniformly. Malformed EDN → null → force-dropped. */
  private lazy val ednToJsonUdf = udf((s: String) => graft.query.Edn.toJson(s))

  private def applyFormat(df: DataFrame, n: StreamNode): DataFrame =
    n.format match {
      case "edn" => df.withColumn("value", ednToJsonUdf(col("value")))
      case _ => df
    }

  // ------------------------------------------------- buffer semantics (T7-T9)

  /** Distinguishes multiple `observe` nodes of the same topology node
    * within one sink plan (fan-in diamonds embed a node's plan twice). */
  private val observeId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Lossy buffer semantics per micro-batch, per partition — the Spark
    * analog of core.async's bounded channel buffers
    * (`/root/reference/src/dataworks/stream.clj:88-91`):
    * `Dropping(x)` keeps the FIRST x rows of a partition's batch (a full
    * buffer rejects new items); `Sliding(x)` keeps the LAST x (new items
    * evict the oldest), with O(x) ring-buffer memory. Rows in/out are
    * `observe`d so [[DropMetrics]] can surface a per-node dropped-rows
    * counter — the observable behavior a reference user relies on.
    * `Fixed(x)` is NOT lossy: it maps to source backpressure (rate limit)
    * in [[nodeInput]]. */
  private def applyBuffer(df: DataFrame, n: StreamNode): DataFrame = {
    def lossy(keep: Iterator[Row] => Iterator[Row]): DataFrame = {
      DropMetrics.forSession(io.spark) // ensure the listener is registered
      val id = observeId.incrementAndGet()
      val observed = df.observe(DropMetrics.inName(n.name.full, id), count(lit(1)).as("rows"))
      observed.mapPartitions(keep)(Encoders.row(df.schema))
        .observe(DropMetrics.outName(n.name.full, id), count(lit(1)).as("rows"))
    }
    n.buffer match {
      case Some(BufferSpec.Dropping(x)) => lossy { it =>
        // consume the WHOLE iterator (the in-observe must see every row the
        // buffer rejected), keep the first x
        val kept = new scala.collection.mutable.ArrayBuffer[Row](x)
        while (it.hasNext) { val r = it.next(); if (kept.size < x) kept += r }
        kept.iterator
      }
      case Some(BufferSpec.Sliding(x)) => lossy { it =>
        val ring = new Array[Row](x)
        var seen = 0L
        var pos = 0
        while (it.hasNext) { ring(pos) = it.next(); pos = (pos + 1) % x; seen += 1 }
        val kept = math.min(seen, x.toLong).toInt
        Iterator.tabulate(kept)(i => ring(((pos - kept + i) % x + x) % x))
      }
      case _ => df
    }
  }

  /** Rows discarded so far by `full`'s sliding/dropping buffer (T8/T9).
    * Counts across every running query that materializes the node's plan —
    * a node with BOTH a lossy buffer and an error sink contributes from
    * its main query and its dead-letter query (each pipeline drops
    * independently, exactly as each reports). */
  def droppedRows(full: String): Long =
    DropMetrics.forSession(io.spark).droppedRows(full)

  /** A node's input relation — shared VERBATIM by [[buildPlan]] and
    * [[deadLetterPlan]] so the error feed sees exactly the rows the main
    * path saw (same serde, same rate limit, same buffer). */
  private def nodeInput(n: StreamNode, building: Set[String]): DataFrame = {
    val rateLimit = n.buffer.collect { case BufferSpec.Fixed(x) => x.toLong }
    val raw =
      if (n.upstream.isEmpty) applyFormat(io.source(n.name.full, rateLimit), n)
      else n.upstream.toSeq.sorted
        .map(buildPlan(_, building + n.name.full))
        .reduce(_.unionByName(_))
    applyBuffer(raw, n)
  }

  /** Build the output plan of a node: fan-in of upstream outputs, user
    * transducer, forced null-drop. Source nodes (no upstream) read their
    * backing topic — pushing into any node by name (T16 `stream!`) is a
    * publish to that topic. */
  def buildPlan(full: String, building: Set[String] = Set.empty): DataFrame = {
    if (building.contains(full))
      throw new IllegalStateException(s"cycle through $full")
    val n = nodeMap.getOrElse(full,
      throw new NoSuchElementException(s"unknown node $full"))
    val input = nodeInput(n, building)
    val transformed = n.transducer.fold(input)(
      applyOpSpec(input, _, building + full))
    // engine-forced (filter some?) — only when the payload column survived
    if (transformed.columns.contains("value"))
      transformed.filter(col("value").isNotNull)
    else transformed
  }

  /** Rows dropped by the forced null-drop (the error-handler feed, T10):
    * user expressions that fail evaluate to NULL under SQL semantics, so
    * the dead rows are exactly the pre-drop/post-transducer nulls. */
  def deadLetterPlan(full: String): Option[DataFrame] = {
    val n = nodeMap(full)
    n.errorSink.map { _ =>
      val input = nodeInput(n, Set.empty)
      val transformed = n.transducer.fold(input)(
        applyOpSpec(input, _, Set(n.name.full)))
      if (transformed.columns.contains("value")) transformed.filter(col("value").isNull)
      else transformed.limit(0)
    }
  }
}
