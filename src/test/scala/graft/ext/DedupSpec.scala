package graft.ext

import graft.SparkSpec

/** Near-dup operators pinned on planted duplicates (the sf fixtures carry
  * no labeled dup pairs, so specs construct their own corpus). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from every hunter"
  private val nearDup = base.replace("green", "dark") // one token changed
  private val unrelated = "completely different words about spark catalyst " +
    "optimizer plans shuffles partitions and codegen stages in a cluster"

  private lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base)
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical text") {
    val d = Dedup.exactDedup(docs)
    val byText = d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byText.contains((base, 1L, 2L)))   // ids 1 and 4 collapse to 1
    assert(d.count() === 3)
  }

  test("minhash finds the planted near-dup pair and the exact pair") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "identical docs must collide")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "one-token-edit near-dup should collide in some band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
  }

  test("simhash: identical docs at distance 0; near-dups close; unrelated far") {
    val fps = docs.select($"doc_id", Dedup.simhash($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)),
      s"near-dup ${ham(fps(1L), fps(2L))} should beat unrelated ${ham(fps(1L), fps(3L))}")
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard scores the planted pair high") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)), "1-token edit over 22 tokens keeps jaccard > 0.5")
  }

  test("embedding near-dup: SRP buckets put identical vectors together") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(1.0f, 0.01f, 0.5f, 0.2f)), // near-identical
      (3L, Array(-1.0f, 0.9f, -0.5f, 0.1f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, threshold = 0.99, nBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding LSH recall: bucketed pairs ⊇ exact O(n²) pairs on planted twins") {
    // the gate-query construction at small scale: every vector gets a
    // hash-perturbed twin at cos ≈ 0.999; the LSH path must find every pair
    // the exact all-pairs baseline finds at the gate threshold
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001")).limit(100)
    val planted = Dedup.withPlantedTwins(emb)
    val exact = Dedup.embeddingExactPairs(planted, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(planted, threshold = 0.95, nBits = 8, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "planted twins must produce exact pairs")
    assert(exact.subsetOf(lsh),
      s"LSH missed ${(exact -- lsh).take(5)} of ${exact.size} exact pairs")
  }

  test("semantic dedup: planted twins are pruned, originals survive, kept ⊆ corpus") {
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001")).limit(200)
    val planted = Dedup.withPlantedTwinsExact(emb)
    val n = planted.count()
    val kept = Dedup.semanticDedup(planted, kCentroids = 8, iters = 1, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    val originals = kept.filter(_ < 1000000000L)
    val twins = kept.filter(_ >= 1000000000L)
    assert(originals.size == 200,
      "every original survives (random fixture vectors have no natural dups at 0.95)")
    // a twin survives only when k-means separates it from its original —
    // SemDeDup's boundary-case recall limit; it must stay the rare exception
    assert(twins.size <= n / 20,
      s"twin leakage ${twins.size} exceeds the 5% cluster-boundary allowance")
    // drop reasons are real: each pruned twin has its original in-cluster at
    // cosine ≈ 0.999, so pruning strictly reduces and never invents ids
    assert(kept.subsetOf(
      planted.select("vec_id").as[Long].collect().toSet))
    // auto-k (the scale default): occupancy-targeted cluster count — same
    // contract, originals all survive
    val keptAuto = Dedup.semanticDedup(planted, targetCluster = 50)
      .select("vec_id").as[Long].collect().toSet
    assert(keptAuto.count(_ < 1000000000L) == 200,
      "auto-scaled k keeps every original too")
  }

  test("simhash: identical-fp classes collapse before the LSH join, pairs survive the cap") {
    // 30 copies of one boilerplate doc + the near-dup: all 435 intra-class
    // pairs and the cross pairs must come out even with a tiny bucket cap —
    // the cap counts DISTINCT fingerprints, not documents
    val many = (10L to 39L).map(i => (i, base)) ++ Seq((40L, nearDup), (41L, unrelated))
    val df = many.toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, maxHamming = 10, maxBucket = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val intra = (for (a <- 10L to 39L; b <- (a + 1) to 39L) yield (a, b)).toSet
    assert(intra.subsetOf(pairs), "all intra-class (hamming 0) pairs must be emitted")
    assert((10L to 39L).forall(a => pairs.contains((a, 40L))),
      "near-dup pairs with every class member must survive fp pre-grouping")
    assert(!pairs.exists(p => p._1 == 41L || p._2 == 41L))
  }

  test("dedupClustersBest: the highest-quality member is canonical, not the min id") {
    import spark.implicits._
    // doc 1 (min id) is junk; doc 3 is clean prose → 3 must be canonical
    val docs = Seq(
      (1L, "!!! ??? ;;; ::: ,,, ((("),
      (2L, "the quick brown fox jumps over the lazy dog near the river"),
      (3L, "the quick brown fox jumps over the lazy dog near the quiet " +
        "river while the morning light settles on the water for a time"),
      (9L, "an unrelated island document about sailing across the sea")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.dedupClustersBest(docs, pairs)
      .select("doc_id", "cluster_id", "canonical_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)),
      s"cluster {1,2,3} must crown doc 3 (best quality): $got")
    // unpaired docs are not emitted (singletons are their own canonical)
    assert(!got.exists(_._1 == 9L))
  }

  test("dedupClustersBest: missing members still emit; string ids work (review r11)") {
    import org.apache.spark.sql.functions.col
    // pairs reference doc "c", which the (filtered) docs table lacks: it
    // must still get a row (is_canonical=false) — an inner join dropped it
    // and a keep/drop pass then KEPT the known duplicate by default
    val docs = Seq(("a", "high quality text with many varied words here"),
                   ("b", "zz")).toDF("doc_id", "text")
    val pairs = Seq(("a", "b", 0.9), ("b", "c", 0.9)).toDF("id_a", "id_b", "jaccard")
    val got = Dedup.dedupClustersBest(docs, pairs)
      .select("doc_id", "is_canonical").as[(String, Boolean)].collect().toMap
    assert(got.keySet == Set("a", "b", "c"),
      s"every clustered member must emit a row: $got")
    assert(got("a") && !got("b") && !got("c"),
      s"the scored best member is canonical; the unscored one never wins: $got")
  }

  test("short-doc dup sharing one HOT shingle still pairs — surviving-count cap (review r11)") {
    // d1 and d2 are identical 4-token docs (2 shingles); one shingle is a
    // corpus stop-shingle (df 13 > maxDf 10, pruned). The minCommon cap
    // must count SURVIVING shingles (1 each) — capping by the total (2)
    // silently exempted exactly this jaccard-1.0 duplicate from pairing
    val hot = (1 to 11).map(i => (100L + i, s"x$i beta gamma delta"))
    val docs = (Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta")) ++ hot)
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      s"the exact short-doc duplicate must pair despite its hot shingle: $pairs")
    // the streaming admission filter must likewise CATCH the duplicate:
    // corpus holds d1 (+ the hot docs), d2 arrives
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdup-idx").toString + "/idx"
    Dedup.stageShingleIndex(
      (Seq((1L, "alpha beta gamma delta")) ++ hot).toDF("doc_id", "text"), dir)
    val idx = Dedup.loadShingleIndex(spark, dir)
    val matches = Dedup.nearDupMatches(
      Seq((2L, "alpha beta gamma delta")).toDF("doc_id", "text"), idx)
      .select("doc_id", "match_id").as[(Long, Long)].collect().toSet
    assert(matches.contains((2L, 1L)),
      s"the admission probe must match the short-doc duplicate: $matches")
    val admitted = Dedup.nearDupFilter(
      Seq((2L, "alpha beta gamma delta")).toDF("doc_id", "text"), idx)
    assert(admitted.count() == 0, "the exact duplicate must NOT be admitted")
  }

  test("simhash block-permuted layouts (b=5,6) return exactly the b=4 pair set (r15)") {
    // the corpus-scaled layouts must be a pure RESOLUTION change: same
    // radius, same verify, full pigeonhole recall at every block count —
    // pin explicit b=5/6 (what a 10x/100x corpus auto-selects) against
    // the minimum layout AND against brute force
    import org.apache.spark.sql.functions.col
    val corpus = (1L to 40L).map { i =>
      val base = s"shared prefix tokens alpha beta gamma delta epsilon zeta eta theta run $i"
      (i, if (i % 4 == 0) base + " tail" else base)
    }.toDF("doc_id", "text")
    val fps = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val want = (for {
      a <- fps.keys; b <- fps.keys if a < b && ham(fps(a), fps(b)) <= 3
    } yield (a, b)).toSet
    for (b <- Seq(4, 5, 6)) {
      val got = Dedup.simhashNearDups(corpus, maxHamming = 3, blocks = b)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"blocks=$b: got ${got.size} want ${want.size} pairs")
      graft.core.CacheRegistry.unpersistAll()
    }
  }

  test("simhash LSH covers maxHamming > 3 via maxHamming+1 chunks (review r11)") {
    // two 60-bit fingerprints at Hamming distance 5 whose flips land in 4
    // DIFFERENT 15-bit chunks shared no chunk key under the fixed 4-chunk
    // split — silently missing from the output despite hamming <= 5. Use
    // text pairs empirically: assert candidates at distance d <= maxHamming
    // equal the brute-force hamming filter over all pairs.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different text about spark query optimization plans"),
      (4L, "totally unrelated musings on bitemporal document storage")
    ).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.col
    val fps = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (mh <- Seq(5, 10)) {
      val want = (for {
        a <- fps.keys; b <- fps.keys if a < b
        if ham(fps(a), fps(b)) <= mh
      } yield (a, b)).toSet
      val got = Dedup.simhashNearDups(docs, maxHamming = mh)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"maxHamming=$mh: got $got want $want")
    }
    // degenerate parameters fail fast
    intercept[IllegalArgumentException] { Dedup.simhashNearDups(docs, maxHamming = 60) }
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDups(docs, bands = 100) // bands > numPerm
    }
  }
}
