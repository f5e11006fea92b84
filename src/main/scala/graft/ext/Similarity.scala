package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Embedding similarity search (north-star extension, BASELINE.json).
  *
  * All vector math is built from codegen'd higher-order functions
  * (`zip_with` + `aggregate`) over `array<double>` — no UDFs, so the whole
  * scoring pipeline stays inside whole-stage codegen.
  *
  * Scale path: brute-force top-k is a single scan + broadcast of the query
  * vector (embarrassingly parallel — fine at any scale for one query
  * vector). For many-query or kNN-join workloads use `ivfTopK`: vectors are
  * bucketed by nearest centroid (the IVF coarse quantizer) and only
  * `nprobe` buckets are scanned per query — turning a full-data scan into a
  * pruned partition scan.
  */
object Similarity {

  /** dot/norm/cosine via native codegen'd Catalyst expressions
    * (graft.functions.VectorExpressions): a tight primitive loop inside
    * whole-stage codegen instead of interpreted per-element lambdas —
    * orders of magnitude faster on all-pairs joins. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.vec_dot(a, b)
  def norm(a: Column): Column = graft.functions.VectorExpressions.vec_norm(a)
  def cosine(a: Column, b: Column): Column = graft.functions.VectorExpressions.vec_cosine(a, b)

  /** Project to unit-length vectors once, so pairwise cosine downstream is
    * a single dot product (norms are not recomputed per pair). */
  def normalized(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    emb.withColumn("__n", norm(v))
      .withColumn(vecCol, when(col("__n") > 0, transform(v, x => x / col("__n"))).otherwise(v))
      .drop("__n")
  }

  /** Brute-force cosine top-k of `embeddings` vs the vector with `targetId`.
    * The single target row is broadcast; the scan side is never shuffled
    * (top-k is a TakeOrdered, not a global sort). */
  def bruteForceTopK(emb: DataFrame, targetId: Long, k: Int): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val target = v.filter(col("vec_id") === targetId).select(col("v").as("t"))
    v.crossJoin(broadcast(target))
      .select(col("vec_id"), cosine(col("v"), col("t")).as("sim_raw"))
      .orderBy(col("sim_raw").desc, col("vec_id").asc)
      .limit(k)
  }

  /** SparkEntry query: top-10 cosine neighbours of vec_id=0; similarity
    * rounded to 4 dp for engine-independent comparison. */
  def similarityTopK(s: SparkSession, d: String): DataFrame =
    bruteForceTopK(Tables.embeddings(s, d), targetId = 0L, k = 10)
      .select(col("vec_id"), graft.query.Functions.stableRound(col("sim_raw"), 4).as("sim"))

  /** IVF-style ANN: assign every vector to its nearest centroid (broadcast
    * centroid table), then for a query probe only the `nprobe` closest
    * centroid buckets. `centroids` must carry (centroid_id, cvec).
    * At 100 TB the assignment is written once (partitioned by centroid_id →
    * parquet partition pruning makes each probe read ~nprobe/K of the data).
    */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame =
    assignToNearest(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      centroids)

  /** The `nprobe` centroid ids closest to `qv` — ONE definition of probe
    * selection (distance metric + (dist ASC, id ASC) tie-break) shared by
    * the in-memory and persisted-index search paths, so they cannot
    * silently diverge. */
  private def probeCentroids(centroids: DataFrame, qv: Column,
                             nprobe: Int): DataFrame =
    centroids
      .select(col("centroid_id"),
        (lit(1.0) - cosine(col("cvec").cast("array<double>"), qv)).as("qdist"))
      .orderBy(col("qdist").asc, col("centroid_id").asc)
      .limit(nprobe)
      .select("centroid_id")

  /** Score `(vec_id, v)` rows against `qv` and keep the top `k` — the
    * shared ranking (cosine, (sim DESC, id ASC)) of both search paths. */
  private def rankByCosine(v: DataFrame, qv: Column, k: Int): DataFrame =
    v.select(col("vec_id"), cosine(col("v").cast("array<double>"), qv).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)

  def ivfTopK(assigned: DataFrame, centroids: DataFrame,
              queryVec: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val qv = array(queryVec.map(lit): _*)
    val probed = probeCentroids(centroids, qv, nprobe)
    rankByCosine(
      assigned.join(broadcast(probed), Seq("centroid_id"), "left_semi"), qv, k)
  }

  /** Element-wise mean vector per assigned bucket. The sum is exact
    * DECIMAL (order-independent), CAST TO DOUBLE before the division —
    * decimal-division scale rules are engine-specific, double division of
    * an exact sum is not. Centroids are bit-identical across runs AND
    * across engines (the DuckDB oracle replays them). */
  private def meanPerBucket(assigned: DataFrame): DataFrame =
    meanPairs(assigned)
      .groupBy("centroid_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pairs"))
      .select(col("centroid_id"), expr("transform(pairs, p -> p.mx)").as("cvec"))

  /** Per-(bucket, position) mean — the ONE distributed shuffle of a Lloyd
    * round (map-side partial decimal sums; ≤ k·dim rows out regardless of
    * corpus size). Array assembly happens wherever the consumer wants it:
    * [[meanPerBucket]] for a DataFrame, [[collectCentroidPairs]] for
    * driver-side model state. */
  private def meanPairs(assigned: DataFrame): DataFrame =
    assigned.select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("centroid_id", "pos")
      .agg((sum(col("x").cast("decimal(27,15)")).cast("double") / count(lit(1)))
        .as("mx"))

  /** Deterministic k-means-ish centroids without MLlib: average vector per
    * hash bucket of vec_id — cheap, reproducible coarse quantizer; the
    * init [[trainCentroids]] refines. */
  def hashCentroids(emb: DataFrame, kCentroids: Int): DataFrame =
    meanPerBucket(emb.select(
      (pmod(col("vec_id"), lit(kCentroids.toLong))).as("centroid_id"),
      col("embedding").cast("array<double>").as("v")))

  /** Lloyd-refined IVF coarse quantizer: hash-bucket means as the
    * (reproducible) init, then `iters` rounds of assign-to-nearest +
    * re-average. One round = one scan with a broadcast centroid join + one
    * aggregation — the standard distributed k-means step, linear in data
    * size and embarrassingly parallel at 100 TB. Clusters that lose all
    * members drop out (k shrinks instead of seeding randomly, keeping the
    * whole pipeline deterministic). */
  def trainCentroids(emb: DataFrame, kCentroids: Int, iters: Int = 3): DataFrame =
    centroidsDf(emb.sparkSession, trainCentroidPairs(emb, kCentroids, iters))

  /** [[trainCentroids]] returning the model as driver-side pairs — the
    * form [[graft.core.ModelCache]] stores and the literal-argmin
    * assignment consumes. */
  private[graft] def trainCentroidPairs(emb: DataFrame, kCentroids: Int,
                                        iters: Int): Seq[(Long, Seq[Double])] = {
    val spark = emb.sparkSession
    // explode-width law (r16): every Lloyd round re-scans this cache; at
    // scan-split width (ONE split on fat fixture files) each round ran a
    // single task wide. Spread once at build; rounds then run at cluster
    // width.
    val v = graft.core.CacheRegistry.persisted(
      Strata.spreadById(
        emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
        "vec_id"))
    // Lloyd rounds are model iterations — run them under ModelLoop's
    // AQE-off / narrow-shuffle scope (each round's reduce side is ≤ k
    // centroid rows; the adaptive planner only adds jobs here)
    graft.core.ModelLoop.scoped(spark) {
      val init = v.select(
        pmod(col("vec_id"), lit(kCentroids.toLong)).as("centroid_id"), col("v"))
      var cents = collectCentroidPairs(meanPairs(init))
      // zero centroids would flow downstream as an empty literal array —
      // array_min(array()) is VOID-typed and every consumer dies with an
      // unrelatable AnalysisException. Fail HERE, in the trainer, with the
      // actual requirement instead (EmptyInputTotalitySpec pins this).
      require(cents.nonEmpty,
        "k-means quantizer: cannot train on an empty corpus (no embeddings)")
      // nearest_centroid (reference-object model, same arithmetic and
      // tie-breaks as the literal-struct argmin) keeps the round codegen'd
      // at ANY k: the literal spelling at the auto-scaled k of semanticDedup
      // (k ∝ n, 782 at the sf10 ritual) built a 782-entry expression tree
      // that blew past the codegen method limit into the interpreter
      for (_ <- 1 to iters)
        cents = collectCentroidPairs(meanPairs(
          v.withColumn("centroid_id",
              graft.functions.VectorExpressions.nearest_centroid(col("v"), cents))
            .select("centroid_id", "v")))
      cents
    }
  }

  /** The ONE coarse quantizer over `Tables.embeddings(dir)` that every
    * consumer in a session shares: trained on the deterministic
    * 1-in-`sampleMod` slice on first use, memoized per
    * (dir, k, iters, sampleMod) in [[graft.core.ModelCache]]. This is the
    * in-JVM analog of staging the index once (`writeIndex`) and pointing
    * all consumers at it — similarity_ivf and corpus_cluster_stats consume
    * the same centroids instead of each re-running Lloyd's collect jobs,
    * and since training is deterministic the shared model is bit-identical
    * to what either would have trained (the DuckDB oracle replays the one
    * training chain unchanged). */
  def sharedEmbeddingCentroids(s: SparkSession, d: String, kCentroids: Int,
                               iters: Int, sampleMod: Int = 5): Seq[(Long, Seq[Double])] =
    graft.core.ModelCache.getOrTrain(
      graft.core.ModelCache.key("emb-quantizer", graft.core.ModelCache.dirKey(d), kCentroids, iters, sampleMod)) {
      trainCentroidPairs(
        Tables.embeddings(s, d)
          .filter(pmod(col("vec_id"), lit(sampleMod.toLong)) === 0),
        kCentroids, iters)
    }

  /** Centroids collected as driver-side MODEL STATE between Lloyd rounds —
    * the MLlib k-means shape: a coarse quantizer is a few KB regardless of
    * corpus size, so this is control-plane (model broadcast), not a
    * data-path collect. Each Lloyd round is then exactly ONE distributed
    * job: literal-centroid argmin (narrow) into the partial-agged mean
    * shuffle, collected as (centroid, pos, mean) rows and assembled here.
    * The collected doubles are exactly the bits Spark computed, so
    * downstream arithmetic is bit-identical to the joined formulation (the
    * DuckDB oracle replays either). */
  private def collectCentroidPairs(pairs: DataFrame): Seq[(Long, Seq[Double])] =
    pairs.collect().toSeq
      .map(r => (r.get(0).asInstanceOf[Number].longValue(),
        r.get(1).asInstanceOf[Number].intValue(), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .map { case (c, xs) => (c, xs.sortBy(_._2).map(_._3)) }
      .sortBy(_._1)

  private def centroidsDf(spark: SparkSession,
                          cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.toDF("centroid_id", "cvec")
  }

  /** Nearest-centroid assignment against LITERAL centroids: no join, no
    * shuffle — one codegen'd argmin (`array_min` over (dist, centroid_id)
    * structs, same (dist ASC, id ASC) tie-break as the joined path) per
    * row. The right shape while k fits an expression tree (coarse
    * quantizers do); `assignToNearest` remains the joined fallback. */
  private[graft] def assignToNearestLit(v: DataFrame,
                                        cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val entries = cents.map { case (cid, vec) =>
      struct((lit(1.0) - cosine(col("v"), typedLit(vec))).as("dist"),
        lit(cid).as("centroid_id"))
    }
    // appended (not projected) so payload columns the caller carries —
    // labels, text, quality scores — ride through the argmin for free;
    // there is no join to re-attach them to
    v.withColumn("centroid_id",
      array_min(array(entries: _*)).getField("centroid_id"))
  }

  private def assignToNearest(v: DataFrame, centroids: DataFrame,
                              payload: Seq[String] = Seq("v")): DataFrame = {
    val c = centroids.select(col("centroid_id"), col("cvec").cast("array<double>").as("cvec"))
    // argmin as a partial-aggregable min over (dist, id) structs: the
    // broadcast-join fan-out collapses MAP-SIDE to one row per vec_id
    // (a window formulation would shuffle + sort every (vector, centroid)
    // pair). `first(payload)` is deterministic here: every payload column
    // is functionally dependent on the group key. This joined path is the
    // CORPUS-SCALE assignment: data-as-rows keeps the plan k-independent
    // and fully codegen'd, where the literal-argmin spelling
    // ([[assignToNearestLit]]) pays ~1s of per-execution analyzer/codegen
    // on a k=16×dim=64 expression tree — right for sample-sized Lloyd
    // rounds (fewest jobs), wrong for the full-corpus scan.
    v.crossJoin(broadcast(c))
      .select(col("vec_id") +: payload.map(col) :+
        struct((lit(1.0) - cosine(col("v"), col("cvec"))).as("dist"),
          col("centroid_id").as("centroid_id")).as("dc"): _*)
      .groupBy("vec_id")
      .agg(min(col("dc")).as("dc"), payload.map(p => first(col(p)).as(p)): _*)
      .select(col("vec_id") +: payload.map(col) :+
        col("dc.centroid_id").as("centroid_id"): _*)
  }

  /** Corpus-wide nearest-centroid assignment against a DRIVER-SIDE model
    * (ModelCache pairs or a loaded index): ONE narrow codegen'd pass — the
    * model arrays ride as codegen reference objects inside
    * [[graft.functions.NearestCentroid]], payload columns pass through
    * untouched. Replaces the broadcast crossJoin + struct-min aggregate,
    * which materialized n·k rows (the r14 sf10 ritual measured
    * dedup_semantic at 41× for 10× data, most of it this fan-out);
    * the expression replicates that plan's arithmetic and tie-breaks
    * bit-exactly, so every quantizer oracle stays hash-green. */
  private[graft] def ivfAssignModel(emb: DataFrame, cents: Seq[(Long, Seq[Double])],
                                    payload: Seq[String] = Seq("v")): DataFrame =
    emb.withColumn("centroid_id",
        graft.functions.VectorExpressions.nearest_centroid(col("v"), cents))
      .select(col("vec_id") +: payload.map(col) :+ col("centroid_id"): _*)

  /** kNN JOIN: top-k corpus neighbors for EVERY query vector in one pass —
    * the many-query form of top-k that `bruteForceTopK` (one query) and
    * `ivfTopK` (one query, probed) don't cover.
    *
    * Scale shape: the query batch broadcasts (batches are small — a
    * retrieval request, a dedup probe set), the corpus is scanned ONCE,
    * and the per-(query, partition) partial [[graft.functions.TopKByScore]]
    * aggregate ships at most k pairs per query per map task to the final
    * reduce — no window sort, no per-group spill, shuffle bounded by
    * |queries|·k·partitions regardless of corpus size. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qv"))
    val c = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    c.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
      .groupBy("q_id")
      .agg(graft.functions.TopKExpressions.top_k_by(col("sim"), col("vec_id"), k)
        .as("topk"))
  }

  /** SparkEntry query (DuckDB-oracled): kNN join of the first 5 vectors
    * against the whole corpus, k=5 — the oracle replays it with a window
    * rank, pinning the aggregate's (score DESC, id ASC) tie order. */
  def similarityKnnJoinQuery(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    knnJoin(emb.filter(col("vec_id") < 5), emb, k = 5)
      .select(col("q_id"), explode(col("topk")).as("t"))
      .select(col("q_id"), col("t.id").as("vec_id"),
        graft.query.Functions.stableRound(col("t.score"), 4).as("sim"))
  }

  /** Persist a trained IVF index for the build-once/search-many lifecycle:
    * `<path>/centroids` (the coarse quantizer, a few KB) and
    * `<path>/assignments` PARTITIONED BY centroid_id — so a probe-time
    * read touches only the `nprobe` matching parquet directories. At
    * 100 TB this is the difference between "ANN query = full corpus scan"
    * and "ANN query = read nprobe/k of the data": the pruning happens in
    * the file listing, before a single byte of vector data moves. */
  def writeIndex(emb: DataFrame, path: String, kCentroids: Int,
                 iters: Int = 2, trainSampleMod: Int = 5): Unit = {
    // a small or sparsely-idd corpus can leave the modular sample empty,
    // which would train a degenerate quantizer with no clear error — fall
    // back to training on the full set (cheap exactly when the sample is
    // empty: the corpus is tiny)
    val sample = emb.filter(pmod(col("vec_id"), lit(trainSampleMod.toLong)) === 0)
    val trainSet = if (sample.isEmpty) emb else sample
    val cents = trainCentroids(trainSet, kCentroids, iters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    ivfAssign(emb, cents).write.mode("overwrite")
      .partitionBy("centroid_id").parquet(s"$path/assignments")
  }

  /** Fold new vectors into a persisted index under its FROZEN coarse
    * quantizer: assign ONLY the new vectors with the staged centroids and
    * append their rows into the partitioned assignment layout — the
    * daily-append path of a 100 TB embedding corpus, where re-training and
    * re-encoding the whole index per delta is the thing you never do.
    * Because the quantizer is frozen, the appended index is ROW-IDENTICAL
    * to re-encoding the union with the same model (SimilaritySpec pins
    * it); quantizer drift is a deliberate re-stage ([[writeIndex]]), not a
    * side effect of ingest. Replay-safe: ids already present are
    * anti-joined away, so a re-delivered batch (checkpoint recovery,
    * catch-up) is a no-op — the same idempotence contract as
    * `StoreChanges.maintainShingleIndex`. Appends add whole files to
    * partition dirs, so a concurrent reader sees a consistent prefix
    * (fewer candidates, never corrupt rows). */
  def appendToIndex(newEmb: DataFrame, path: String): Unit = {
    val spark = newEmb.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
    val fresh = newEmb.join(
      spark.read.parquet(s"$path/assignments").select("vec_id"),
      Seq("vec_id"), "left_anti")
    ivfAssign(fresh, cents).write.mode("append")
      .partitionBy("centroid_id").parquet(s"$path/assignments")
  }

  /** Search a persisted index: pick the `nprobe` closest centroids on the
    * driver (the quantizer is model-sized — this is control plane, like
    * the Lloyd rounds), then read assignments with a STATIC
    * `centroid_id IN (...)` filter so parquet partition pruning applies —
    * a semi-join would at best prune dynamically, at worst list every
    * partition. */
  def searchIndex(spark: SparkSession, path: String, queryVec: Seq[Double],
                  k: Int, nprobe: Int): DataFrame = {
    val qv = array(queryVec.map(lit): _*)
    val probed = probeCentroids(spark.read.parquet(s"$path/centroids"), qv, nprobe)
      .collect().map(_.getLong(0)).toSeq
    rankByCosine(
      spark.read.parquet(s"$path/assignments")
        .filter(col("centroid_id").isin(probed: _*)), qv, k)
  }

  // ---------------------------------------------------------------- PQ

  /** Product-quantization model (Jégou et al., TPAMI 2011): `m` contiguous
    * subspaces of `dsub` dims each, an independent codebook per subspace.
    * Model state is m·ksub·dsub doubles — KBs at any corpus size, the same
    * control-plane scale as the IVF coarse quantizer. `books(sub)` lists
    * (code, centroid) sorted by code; codes that lose all members during
    * Lloyd drop out (k shrinks — same determinism rule as
    * [[trainCentroids]]). */
  final case class PqModel(m: Int, dsub: Int,
                           books: Map[Int, Seq[(Int, Seq[Double])]])

  /** Squared L2 — PQ's native metric — spelled dot(a,a) − 2·dot(a,b) +
    * dot(b,b) so both engines evaluate the identical float expression
    * (`list_dot_product` replays `vec_dot` term-for-term). */
  private def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** (vec_id, sub, sv) — each vector split into its m subvectors. Training
    * shape only; the encode path stays columnar (no explode, no shuffle). */
  private def subVectors(v: DataFrame, m: Int, dsub: Int): DataFrame =
    v.select(col("vec_id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub"), slice(col("v"), j * dsub + 1, dsub).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.sub").as("sub"), col("s.sv").as("sv"))

  /** Per-(sub, code) mean subvector, collected as driver-side model state
    * between Lloyd rounds — exact DECIMAL sums cast to double before the
    * division, like [[meanPairs]], so codebooks are bit-identical across
    * runs and engines. */
  private def collectSubMeans(assigned: DataFrame): Map[Int, Seq[(Int, Seq[Double])]] =
    assigned.select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("sub", "code", "pos")
      .agg((sum(col("x").cast("decimal(27,15)")).cast("double") / count(lit(1))).as("mx"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.get(1).asInstanceOf[Number].intValue(),
        r.get(2).asInstanceOf[Number].intValue(), r.getDouble(3)))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((sub, code), xs) => (sub, code, xs.sortBy(_._3).map(_._4)) }
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap

  /** Nearest-code argmin for one subspace's literal codebook — the
    * [[assignToNearestLit]] pattern ((dist ASC, code ASC) struct-min, all
    * codegen, no join). */
  private def nearestCodeLit(sv: Column, book: Seq[(Int, Seq[Double])]): Column =
    array_min(array(book.map { case (code, cvec) =>
      struct(l2sq(sv, typedLit(cvec)).as("dist"), lit(code).as("code"))
    }: _*)).getField("code")

  /** Train PQ codebooks: per subspace, init code = vec_id mod ksub, then
    * `iters` Lloyd rounds (assign by literal-codebook argmin, re-mean).
    * One distributed job per round over the training sample — identical
    * scale shape to [[trainCentroids]], just keyed by (sub, code). */
  def trainPqCodebooks(emb: DataFrame, m: Int, ksub: Int,
                       iters: Int = 2): PqModel = {
    // explode-width law (r16): the per-round subvector agg re-scans the
    // cache — spread once so rounds run at cluster width, not scan-split
    // width (the sf10 ritual read cpu/wall ≈ 1.15 here: serialized rounds)
    val v = graft.core.CacheRegistry.persisted(
      Strata.spreadById(
        emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
        "vec_id"))
    // per-subspace Lloyd rounds: the same model-iteration shape as
    // trainCentroids — reduce side ≤ m·ksub rows, so scope the loop
    graft.core.ModelLoop.scoped(v.sparkSession) {
      val dimRow = v.select(size(col("v"))).take(1)
      require(dimRow.nonEmpty,
        "trainPqCodebooks: cannot train PQ codebooks on an empty corpus (no embeddings)")
      val dim = dimRow(0).getInt(0)
      require(dim % m == 0, s"trainPqCodebooks: dim $dim not divisible by m=$m")
      val dsub = dim / m
      val sub = graft.core.CacheRegistry.persisted(subVectors(v, m, dsub))
      var books = collectSubMeans(
        sub.withColumn("code", pmod(col("vec_id"), lit(ksub.toLong)).cast("int")))
      for (_ <- 1 to iters) {
        val codeExpr = (0 until m).map(j => (j, books(j))).foldLeft(lit(null).cast("int")) {
          case (acc, (j, book)) =>
            when(col("sub") === j, nearestCodeLit(col("sv"), book)).otherwise(acc)
        }
        books = collectSubMeans(sub.withColumn("code", codeExpr))
      }
      PqModel(m, dsub, books)
    }
  }

  /** Encode: m code columns per vector, each a literal-codebook argmin on
    * its slice — a NARROW map over the corpus, no explode, no shuffle (at
    * 100 TB the encode is one pass that writes 8·m bits/vector). */
  def pqEncode(emb: DataFrame, model: PqModel): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    (0 until model.m).foldLeft(v) { (df, j) =>
      df.withColumn(s"code_$j",
        nearestCodeLit(slice(col("v"), j * model.dsub + 1, model.dsub), model.books(j)))
    }.drop("v")
  }

  /** ADC top-k (asymmetric distance): approximate dist(q, x) as the sum
    * over subspaces of L2²(q_sub, codebook[sub][code_sub(x)]) — computed
    * from the codes alone, never touching the original vectors. The
    * per-subspace lookups are literal-map `element_at`s and the sum is a
    * fixed left-fold (j = 0..m−1), so an external engine replays the exact
    * float. Ranking is a TakeOrdered (dist ASC, vec_id ASC), not a global
    * sort. */
  def pqTopK(encoded: DataFrame, model: PqModel, queryVec: Seq[Double],
             k: Int): DataFrame = {
    val dist = (0 until model.m).map { j =>
      val qSub = queryVec.slice(j * model.dsub, (j + 1) * model.dsub)
      val bookMap = typedLit(model.books(j).toMap)
      l2sq(typedLit(qSub), element_at(bookMap, col(s"code_$j")))
    }.reduceLeft(_ + _)
    encoded.select(col("vec_id"), dist.as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Persist an IVF+PQ index — the build-once/search-many compressed-ANN
    * shape: `<path>/centroids` (coarse quantizer), `<path>/codebooks`
    * (the PQ model, m·ksub rows), and `<path>/codes` PARTITIONED BY
    * centroid_id, holding only vec_id + m code columns (8·m bits of
    * payload per vector — at 100 TB of raw embeddings the searchable
    * artifact is ~1% of that, and a probe reads nprobe/k of it via parquet
    * partition pruning, codes-only). PQ codebooks quantize the RAW vectors
    * (IVF prunes, PQ compresses — the residual-encoding variant trades
    * this simplicity for recall and is deliberately not taken: raw-vector
    * codebooks keep staged search ≡ the oracled in-memory [[pqTopK]]
    * bit-for-bit, which is the verification story). */
  def writePqIndex(emb: DataFrame, path: String, kCentroids: Int, m: Int,
                   ksub: Int, iters: Int = 2, trainSampleMod: Int = 5): Unit = {
    val spark = emb.sparkSession
    val sample = emb.filter(pmod(col("vec_id"), lit(trainSampleMod.toLong)) === 0)
    val trainSet = if (sample.isEmpty) emb else sample
    val cents = trainCentroids(trainSet, kCentroids, iters)
    val model = trainPqCodebooks(trainSet, m, ksub, iters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    import spark.implicits._
    model.books.toSeq.flatMap { case (sub, book) =>
      book.map { case (code, cvec) => (sub, code, cvec) }
    }.toDF("sub", "code", "cvec")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    val assigned = ivfAssign(emb, cents)
    (0 until m).foldLeft(assigned) { (df, j) =>
      df.withColumn(s"code_$j",
        nearestCodeLit(slice(col("v"), j * model.dsub + 1, model.dsub), model.books(j)))
    }.drop("v")
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$path/codes")
  }

  /** The PQ model back from a staged index — m·ksub·dsub doubles, model
    * state (the same control-plane scale as the coarse quantizer). */
  def loadPqModel(spark: SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(s"$path/codebooks").collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    require(rows.nonEmpty, s"loadPqModel: no codebooks at $path")
    val books = rows.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    PqModel(books.size, rows.head._3.length, books)
  }

  /** Search a persisted IVF+PQ index: static `centroid_id IN (...)` probe
    * (parquet partition pruning, as [[searchIndex]]), then ADC over the
    * surviving codes — the scan never touches a raw vector. */
  def searchPqIndex(spark: SparkSession, path: String, queryVec: Seq[Double],
                    k: Int, nprobe: Int): DataFrame = {
    val qv = array(queryVec.map(lit): _*)
    val probed = probeCentroids(spark.read.parquet(s"$path/centroids"), qv, nprobe)
      .collect().map(_.getLong(0)).toSeq
    pqTopK(
      spark.read.parquet(s"$path/codes")
        .filter(col("centroid_id").isin(probed: _*)),
      loadPqModel(spark, path), queryVec, k)
  }

  /** SparkEntry query (oracled — init, Lloyd means, argmin tie-breaks, and
    * the ADC fold are all exact-replay arithmetic): 4×16 PQ trained on the
    * deterministic 1-in-5 sample, corpus encoded to 4 codes/vector, ADC
    * top-10 for vec 0's vector. */
  def similarityPqQuery(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // codebooks are deterministic in (dir, m, ksub, iters, sample) →
    // session-staged like the IVF quantizer (ModelCache): consumers pay
    // Lloyd's collect jobs once per session, bit-identically
    val model = graft.core.ModelCache.getOrTrain(
      graft.core.ModelCache.key("pq-codebooks", graft.core.ModelCache.dirKey(d), 4, 16, 2, 5)) {
      trainPqCodebooks(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), m = 4, ksub = 16, iters = 2)
    }
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).first().getSeq[Double](0)
    pqTopK(pqEncode(emb, model), model, q, k = 10)
      .select(col("vec_id"), graft.query.Functions.stableRound(col("adc"), 4).as("adc"))
  }

  /** SparkEntry query (oracled — the full train/assign/probe chain
    * replays): trained-IVF approximate top-10 for vec 0's vector, probing
    * 4 of 16 buckets. The single-row query-vector fetch is control-plane
    * (one `first()`); the search itself is a partition-pruned scan — the
    * 100 TB ANN shape. */
  def similarityIvfQuery(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // quantizer trains on a deterministic 1-in-5 sample (standard IVF
    // practice: centroid quality needs a sample, not the corpus — at
    // 100 TB training on everything would dwarf the search itself) and is
    // SHARED with every other consumer in the session (the staged-index
    // shape); assignment is the broadcast argmin over the model rows
    val pairs = sharedEmbeddingCentroids(s, d, kCentroids = 16, iters = 2)
    val assigned = ivfAssignModel(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), pairs)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).first().getSeq[Double](0)
    ivfTopK(assigned, centroidsDf(s, pairs), q, k = 10, nprobe = 4)
      .select(col("vec_id"), graft.query.Functions.stableRound(col("sim"), 4).as("sim"))
  }

  /** Topic clustering of the embedding corpus (k-means over unit-sphere
    * cosine distance) with per-cluster corpus statistics — the
    * cluster-then-curate stage of training-data pipelines (semantic mix
    * balancing, per-topic quality review, SemDeDup-style curation all
    * start from exactly this table). Reuses the decimal-exact Lloyd
    * trainer, so the gate replays in DuckDB by the same CTE chain as
    * `similarity_ivf` (one source of truth: SparkEntry derives this
    * oracle from that one's training prefix).
    *
    * Returns per cluster: member count, distinct-label count, and the
    * majority label with its count (the purity numerator) — tie-broken
    * (count DESC, label ASC) so the pick is deterministic. */
  def clusterStatsQuery(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // consumes the session-shared quantizer (similarity_ivf trains the
    // identical model) and carries `label` THROUGH the assignment as
    // payload — the former vec_id self-join to re-attach labels was a
    // corpus-sized shuffle for a column the scan already had in hand
    val pairs = sharedEmbeddingCentroids(s, d, kCentroids = 16, iters = 2)
    val perLabel = ivfAssignModel(
        emb.select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v")), pairs,
        payload = Seq("label"))
      .groupBy(col("centroid_id").as("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
      .orderBy(col("c").desc, col("label").asc)
    perLabel
      .withColumn("__rn", row_number().over(w))
      .groupBy("cluster")
      .agg(sum("c").as("n_vecs"), count(lit(1)).as("n_labels"),
        max(when(col("__rn") === 1, col("label"))).as("top_label"),
        max(when(col("__rn") === 1, col("c"))).as("top_label_n"))
  }

}
