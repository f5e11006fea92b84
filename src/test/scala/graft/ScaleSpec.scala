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
    "ts_resample")            // per-key grid explode: span-bounded, users-linear
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
    ratios.foreach { case (g, r) =>
      assert(r <= 30.0, f"$g: ${r}%.1fx wall-clock on 10x data — super-linear")
    }
  }
}
