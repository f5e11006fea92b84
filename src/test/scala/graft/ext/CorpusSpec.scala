package graft.ext

import graft.SparkSpec

/** End-to-end corpus cleaning: each stage's effect is observable. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from every hunter " +
    "while the evening light settles on the quiet hills for another day"

  test("cleanCorpus drops non-canonical dups, loops, and junk; keeps prose") {
    val docs = Seq(
      (1L, prose, "en"),
      (2L, prose.replace("green", "dark"), "en"),   // near-dup of 1 → dropped
      (3L, Seq.fill(40)("spam ham").mkString(" "), "en"), // loop → repetition fail
      (4L, "!!! ??? ... ;;; ::: ,,, (((", "en"),    // punctuation junk → quality fail
      (5L, "a completely different ordinary sentence about sailing boats " +
        "across the wide open sea during the warm summer months with friends", "en")
    ).toDF("doc_id", "text", "lang")
    val kept = Corpus.cleanCorpus(docs).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L), "canonical cluster member survives")
    assert(!kept.contains(2L), "non-canonical near-dup is dropped")
    assert(!kept.contains(3L), "repetition loop is dropped")
    assert(!kept.contains(4L), "quality junk is dropped")
    assert(kept.contains(5L), "ordinary prose survives")
  }

  test("cleanCorpusAudit: total partition, first-failing-rule precedence, keep ≡ cleanCorpus") {
    val docs = Seq(
      (1L, prose, "en"),
      (2L, prose.replace("green", "dark"), "en"),   // near-dup of 1 → duplicate
      (3L, Seq.fill(40)("spam ham").mkString(" "), "en"), // loop
      (4L, "!!! ??? ... ;;; ::: ,,, (((", "en"),    // junk → low_quality
      (5L, "a completely different ordinary sentence about sailing boats " +
        "across the wide open sea during the warm summer months with friends", "en"),
      // duplicate of the LOOP doc: fails dedup AND repetition — must report
      // 'duplicate' (first rule), never 'repetitive'
      (6L, Seq.fill(40)("spam ham").mkString(" ") + " extra", "en")
    ).toDF("doc_id", "text", "lang")
    val clusters = Dedup.dedupClusters(Dedup.ngramJaccardPairs(docs))
    val audit = Corpus.cleanCorpusAudit(docs, clusters)
      .select("doc_id", "outcome").as[(Long, String)].collect().toMap
    // TOTAL: every document appears exactly once
    assert(audit.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), s"audit must be total: $audit")
    assert(audit(1L) == "keep" && audit(5L) == "keep")
    assert(audit(2L) == "duplicate")
    assert(audit(4L) == "low_quality")
    // 3 and 6 are near-dups of each other; the non-canonical one reports
    // 'duplicate' (precedence), the canonical one its own repetition fail.
    // Canonical = min doc_id under CC labeling = 3.
    assert(audit(6L) == "duplicate", s"dup beats repetitive: ${audit(6L)}")
    assert(Set("repetitive", "low_quality").contains(audit(3L)),
      s"the canonical loop doc fails on its own signals: ${audit(3L)}")
    // the keep rows ARE cleanCorpus's output
    val kept = Corpus.cleanCorpus(docs).select("doc_id").as[Long].collect().toSet
    assert(audit.filter(_._2 == "keep").keySet == kept,
      "audit keep-set must equal the clean pass")
  }

  test("staged pair artifact: dedupClusters and cleanCorpus match the inline path") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val path = java.nio.file.Files.createTempDirectory("graft-pairs").toString + "/pairs"
    Dedup.stagePairs(docs, path)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(Dedup.dedupClustersStaged(spark, path)) ==
      rows(Dedup.dedupClusters(Dedup.ngramJaccardPairs(docs))),
      "staged clusters must equal the inline pipeline")
    assert(rows(Corpus.cleanCorpusStaged(docs, path)) == rows(Corpus.cleanCorpus(docs)),
      "staged cleaning must equal the inline pipeline")
    // the fully-staged form: cluster LABELS staged too (r12) — the clean
    // pass consumes them without re-running connected components
    val cpath = java.nio.file.Files.createTempDirectory("graft-cl").toString + "/clusters"
    Dedup.stageClusters(spark, Dedup.stagedPairs(spark, path), cpath)
    assert(rows(Dedup.stagedClusters(spark, cpath)) ==
      rows(Dedup.dedupClusters(Dedup.ngramJaccardPairs(docs))),
      "staged cluster labels must equal the inline pipeline")
    assert(rows(Corpus.cleanCorpusClustered(docs, cpath)) == rows(Corpus.cleanCorpus(docs)),
      "cluster-staged cleaning must equal the inline pipeline")
    assert(rows(Dedup.dedupClustersBestFrom(docs, Dedup.stagedClusters(spark, cpath))) ==
      rows(Dedup.dedupClustersBest(docs, Dedup.stagedPairs(spark, path))),
      "label-staged canonical argmax must equal the pair-driven one")
  }

  test("token-budget mix: fills each language to its budget, never over") {
    val docs = (1L to 40L).map { i =>
      val lang = if (i % 2 == 0) "en" else "es"
      (i, Seq.fill(10)("w").mkString(" "), lang) // 10 tokens per doc
    }.toDF("doc_id", "text", "lang")
    val mix = Corpus.tokenBudgetMix(docs, Map("en" -> 55L, "es" -> 100L))
      .as[(Long, String, Long, Long)].collect()
    val byLang = mix.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // 10-token docs: en budget 55 fits 5 docs (50), es budget 100 fits 10
    assert(byLang == Map("en" -> 50L, "es" -> 100L), s"got $byLang")
    // running totals never exceed the budget
    assert(mix.forall { case (_, l, _, run) =>
      run <= Map("en" -> 55L, "es" -> 100L)(l) })
    // deterministic: same input → same picks
    val again = Corpus.tokenBudgetMix(docs, Map("en" -> 55L, "es" -> 100L))
      .select("doc_id").as[Long].collect().toSet
    assert(again == mix.map(_._1).toSet)
    // unbudgeted languages are excluded entirely
    val noFr = Corpus.tokenBudgetMix(
      docs.withColumn("lang",
        org.apache.spark.sql.functions.lit("fr")), Map("en" -> 55L))
    assert(noFr.count() == 0)
  }

  test("packSequences: contiguous per-shard token streams, exact window ids") {
    val docs = (1L to 200L).map { i =>
      (i, Seq.fill((i % 37 + 1).toInt)("w").mkString(" ")) // 1..37 tokens
    }.toDF("doc_id", "text")
    val packed = Corpus.packSequences(docs, seqLen = 50L, shards = 4)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(packed.length == 200, "every doc is placed")
    // per shard: offsets tile the token stream with no gaps or overlaps
    packed.groupBy(_._2).foreach { case (shard, ds) =>
      val sorted = ds.sortBy(_._4)
      sorted.foldLeft(0L) { case (expectStart, (_, _, n, start, first, last)) =>
        assert(start == expectStart, s"shard $shard: gap at token $expectStart")
        assert(first == start / 50 && last == (start + n - 1) / 50,
          s"shard $shard: window ids must follow from offsets")
        start + n
      }
    }
    // a doc longer than seqLen must straddle windows
    val long37 = packed.filter(_._3 == 37L)
    assert(long37.nonEmpty)
    // deterministic: same input → identical placement
    val again = Corpus.packSequences(docs, seqLen = 50L, shards = 4)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(again.toSet == packed.toSet)
  }

  test("writeTrainingShards: manifest tiles each (split, shard) stream and " +
    "re-reading a shard file yields the packed order") {
    val docs = (1L to 300L).map { i =>
      // realistic-enough prose that the quality filter keeps most docs
      (i, ("the quick brown fox jumps over the lazy dog and runs to the river " +
        s"bank where document $i tells a slightly different story about " +
        "winter and bread and fire " * (i % 3 + 1).toInt).trim, "en")
    }.toDF("doc_id", "text", "lang")
    val path = java.nio.file.Files.createTempDirectory("graft-shards-").toString
    val manifest = Corpus.writeTrainingShards(docs, path, seqLen = 64L, shards = 2)
      .select("doc_id", "split", "shard", "n_tokens", "start_tok")
      .as[(Long, String, Int, Long, Long)].collect()
    assert(manifest.nonEmpty)
    assert(manifest.map(_._2).toSet.subsetOf(Set("train", "val", "test")))

    // each (split, shard) is a gapless token stream starting at 0
    manifest.groupBy(m => (m._2, m._3)).foreach { case ((sp, sh), ds) =>
      ds.sortBy(_._5).foldLeft(0L) { case (expect, (_, _, _, n, start)) =>
        assert(start == expect, s"($sp,$sh): gap at token $expect")
        start + n
      }
    }

    // the written shard files hold documents IN packed order: for every
    // leaf directory, file order == manifest's start_tok order
    for ((sp, sh) <- manifest.map(m => (m._2, m._3)).distinct) {
      val onDisk = spark.read.parquet(s"$path/shards/split=$sp/shard=$sh")
        .select("doc_id").as[Long].collect().toSeq
      val expected = manifest.filter(m => m._2 == sp && m._3 == sh)
        .sortBy(_._5).map(_._1).toSeq
      assert(onDisk == expected,
        s"($sp,$sh): shard file order must equal packed order")
    }

    // loader-style re-read: concatenating a shard's texts front-to-back
    // reproduces the offsets (token counts line up with start_tok deltas)
    val t0 = spark.read.parquet(s"$path/shards/split=train/shard=0")
      .select("start_tok", "n_tokens").as[(Long, Long)].collect().toSeq
    t0.foldLeft(0L) { case (expect, (start, n)) =>
      assert(start == expect); start + n
    }
    ()
  }

  test("packSequences epochs: each epoch is a different reproducible order") {
    val docs = (1L to 60L).map(i => (i, s"word$i " * (i % 7 + 1).toInt))
      .toDF("doc_id", "text")
    def order(epoch: Int) = Corpus.packSequences(docs, seqLen = 32, shards = 4, epoch = epoch)
      .select("doc_id", "shard", "start_tok")
      .as[(Long, Int, Long)].collect().toSet
    val e0 = order(0); val e1 = order(1)
    assert(e0 != e1, "epoch 1 must reshuffle relative to epoch 0")
    assert(order(1) == e1, "every epoch's placement is reproducible")
    assert(e0.map(_._1) == e1.map(_._1), "every doc is placed in every epoch")
    // partition-layout invariance holds per epoch
    val e1b = Corpus.packSequences(docs.repartition(7), seqLen = 32, shards = 4, epoch = 1)
      .select("doc_id", "shard", "start_tok").as[(Long, Int, Long)].collect().toSet
    assert(e1b == e1)
  }

  test("statsReport: counts, token totals, dup mass, and quality mass per language") {
    val docs = Seq(
      (1L, prose, "en"),
      (2L, prose, "en"),                       // exact dup of 1 (same lang)
      (3L, "Three More Words", "en"),          // normalizes; 3 tokens
      (4L, "palabras distintas aquí para la prueba", "es")
    ).toDF("doc_id", "text", "lang")
    val got = Corpus.statsReport(docs)
      .select("lang", "n_docs", "total_tokens", "distinct_texts", "dup_docs", "quality_mass_4dp")
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val proseTokens = prose.split(" ").length.toLong
    assert(got("en")._2 == 3 && got("en")._3 == 2 * proseTokens + 3)
    assert(got("en")._4 == 2 && got("en")._5 == 1, "one exact-dup doc in en")
    assert(got("es") == (("es", 1L, 6L, 1L, 0L, got("es")._6)))
    // quality mass = Σ round(quality·1e4): cross-check against the per-doc op
    val perDoc = docs.filter($"lang" === "en")
      .select(org.apache.spark.sql.functions.floor(
        TextOps.qualityScore($"text") * 1e4 + 0.5).cast("long"))
      .as[Long].collect().sum
    assert(got("en")._6 == perDoc)
  }

  test("topQualityFrac: per-language percentile keeps ceil(n*frac), best-first") {
    val junk = "!!! ??? ... ;;; ::: ,,, ((("
    val docs = Seq(
      (1L, prose, "en"), (2L, junk, "en"), (3L, prose + " extra", "en"),
      (4L, prose, "es"), (5L, junk, "es")
    ).toDF("doc_id", "text", "lang")
    val kept = Corpus.topQualityFrac(docs, frac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // en: ceil(3*0.5)=2 best of three (junk ranks last); es: ceil(2*0.5)=1
    assert(kept.size == 3 && !kept.contains(2L) && !kept.contains(5L),
      s"junk docs must fall below the per-language cutoff: $kept")
    // frac=1 keeps everything; determinism across runs
    assert(Corpus.topQualityFrac(docs, frac = 1.0).count() == 5)
    assert(Corpus.topQualityFrac(docs, frac = 0.5)
      .select("doc_id").as[Long].collect().toSet == kept)
  }

  test("contamination: verbatim leak scores 1.0, disjoint 0.0, partial in between") {
    val evalDocs = Seq((100L, prose)).toDF("doc_id", "text")
    val half = prose.split(" ").take(18).mkString(" ") + // 16 shingles from prose...
      " plus some entirely novel trailing words never seen in any benchmark"
    val train = Seq(
      (1L, prose),                                       // verbatim copy
      (2L, half),                                        // leading half leaked
      (3L, "unrelated content about compilers registers and stack frames " +
        "emitted by a code generator backend during instruction selection")
    ).toDF("doc_id", "text")
    val c = Corpus.contamination(train, evalDocs)
      .select("doc_id", "contamination").as[(Long, Double)].collect().toMap
    assert(c(1L) == 1.0, s"verbatim leak must be fully contaminated, got ${c(1L)}")
    assert(c(3L) == 0.0, s"disjoint doc must be clean, got ${c(3L)}")
    assert(c(2L) > 0.3 && c(2L) < 0.8, s"partial leak in between, got ${c(2L)}")
    // the filtering form drops exactly the over-threshold docs
    val kept = Corpus.decontaminate(train, evalDocs, maxContamination = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    // shuffled-join fallback is output-identical
    val cShuffle = Corpus.contamination(train, evalDocs, broadcastEval = false)
      .select("doc_id", "contamination").as[(Long, Double)].collect().toMap
    assert(cShuffle == c)
  }

  test("fuzzy decontamination: verbatim and paraphrase flagged, disjoint clean") {
    val evalDocs = Seq((100L, prose)).toDF("doc_id", "text")
    val paraphrase = prose.replace("green", "dark").replace("quiet", "rolling")
    val train = Seq(
      (1L, prose),        // verbatim copy → jaccard 1.0
      (2L, paraphrase),   // two word swaps → high but < 1.0
      (3L, "unrelated content about compilers registers and stack frames " +
        "emitted by a code generator backend during instruction selection")
    ).toDF("doc_id", "text")
    val c = Corpus.fuzzyContamination(train, evalDocs)
      .select("doc_id", "max_jaccard").as[(Long, Double)].collect().toMap
    assert(c(1L) == 1.0, s"verbatim copy must score 1.0, got ${c.get(1L)}")
    assert(c.get(2L).exists(j => j > 0.5 && j < 1.0),
      s"paraphrase flagged below 1.0, got ${c.get(2L)}")
    assert(!c.contains(3L), "disjoint doc must not be flagged")
    // the filtering form drops exactly the flagged docs
    val kept = Corpus.fuzzyDecontaminate(train, evalDocs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("temperature mix: smallest source kept whole, large sources flattened by sqrt") {
    // 20 small docs vs 2000 large-ish docs: 100x token imbalance
    val docs = ((1L to 20L).map(i => (i, "tiny doc here", "rare")) ++
      (1000L to 2999L).map(i => (i, "a somewhat longer document body", "web")))
      .toDF("doc_id", "text", "source")
    val kept = Corpus.temperatureMix(docs)
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("rare") == 20L, "smallest source must survive whole (rate 1.0)")
    // web: 2000 docs * 5 tokens = 10000 tokens vs rare 60 → rate √(60/10000) ≈ 0.0775
    val webKept = bySrc.getOrElse("web", 0L).toDouble / 2000
    assert(webKept > 0.03 && webKept < 0.13,
      s"large source downsampled to ~sqrt share, got rate $webKept")
    // decision is a pure function of doc_id — partition-layout invariant
    val kept2 = Corpus.temperatureMix(docs.repartition(13)).select("doc_id")
      .as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet == kept2)
  }

  test("vocabulary: tf counts occurrences, df counts docs, minCount filters, '' never a token") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, ""),                       // split('') yields [''] — must not leak
      (4L, "   "),                    // whitespace-only likewise
      (5L, "CAT the")                 // lowercased before counting
    ).toDF("doc_id", "text")
    val v = Corpus.vocabulary(docs, minCount = 2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(v("the") == (4L, 3L), s"tf=4 occurrences over df=3 docs, got ${v("the")}")
    assert(v("cat") == (2L, 2L))
    assert(v("sat") == (2L, 2L))
    assert(!v.contains("on"), "minCount=2 drops singletons")
    assert(!v.contains(""), "empty-split artifact must be filtered")
    assert(!v.contains("CAT"), "tokens are lowercased")
  }

  test("capPerSource keeps the best maxPerSource docs per source, quality-first") {
    val docs = Seq(
      (1L, prose, "a"), (2L, prose + " more words here", "a"),
      (3L, "!!! ;;; (((", "a"),                         // worst of source a
      (4L, prose, "b")
    ).toDF("doc_id", "text", "source")
    val kept = Corpus.capPerSource(docs, maxPerSource = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == 3 && !kept.contains(3L),
      s"source a keeps its 2 best, junk doc 3 is the one cut; got $kept")
    // cap larger than any source is the identity
    assert(Corpus.capPerSource(docs, maxPerSource = 10).count() == 4)
  }

  test("assignSplits: pure function of doc_id — stable under repartitioning, pcts honored") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val s1 = Corpus.assignSplits(docs).as[(Long, String)].collect().toMap
    val s2 = Corpus.assignSplits(docs.repartition(17)).as[(Long, String)].collect().toMap
    assert(s1 == s2, "split must not depend on partitioning")
    val byName = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    // the scramble is uniform-ish; 90/5/5 within generous tolerance
    assert(byName("train") > 1600 && byName("val") > 40 && byName("test") > 40,
      s"split sizes off: $byName")
    assert(byName.values.sum == 2000)
  }

  test("lmPerplexity: reference-like prose scores lower NLL/token than gibberish; " +
    "unseen bigrams smooth instead of failing") {
    val ref = (1L to 20L).map(i => (i, prose)).toDF("doc_id", "text")
    val docs = Seq(
      (100L, prose),                                        // verbatim reference text
      (101L, "zzq wvx qqk jjv xxp zrr kwq vvj pqz xkk zzq wvx qqk jjv xxp"),
      (102L, "entirely novel words nowhere in the reference corpus at all")
    ).toDF("doc_id", "text")
    val out = Corpus.lmPerplexity(docs, ref)
      .select($"doc_id", $"n_bigrams", $"nll_q6").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._3.toDouble / r._2)).toMap
    assert(out(100L) < out(101L),
      s"reference prose ${out(100L)} must beat gibberish ${out(101L)}")
    assert(out(102L) > out(100L), "unseen bigrams cost more than seen ones")
    assert(out.keySet == Set(100L, 101L, 102L), "every multi-token doc is scored")
  }

  test("dsirWeights: target-like docs weigh more than off-target docs; " +
    "weights are stable under repartitioning") {
    val target = (1L to 20L).map(i => (i, prose)).toDF("doc_id", "text")
    val raw = Seq(
      (200L, prose),                                        // on-target
      (201L, "buy cheap pills online now best casino bonus click here " +
        "free spins jackpot winner claim prize instantly")  // off-target
    ).toDF("doc_id", "text")
    def weights(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Corpus.dsirWeights(df, target).select($"doc_id", $"dsir_weight_q6")
        .as[(Long, Long)].collect().toMap
    val w = weights(raw)
    assert(w(200L) > w(201L), s"on-target ${w(200L)} must beat off-target ${w(201L)}")
    assert(weights(raw.repartition(7)) == w, "weights are partitioning-invariant")
  }

  test("dsirSelect keeps each language's most target-like half") {
    val target = (1L to 20L).map(i => (i, prose, "en")).toDF("doc_id", "text", "lang")
    val raw = Seq(
      (300L, prose, "en"),
      (301L, "buy cheap pills online now best casino bonus click here", "en"),
      (302L, prose.replace("fox", "cat"), "en"),
      (303L, "jackpot winner claim prize instantly free spins bonus", "en")
    ).toDF("doc_id", "text", "lang")
    val kept = Corpus.dsirSelect(raw, target, frac = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(300L, 302L),
      s"the two prose docs must out-rank the two spam docs: $kept")
  }

  test("bpeMerges: greedy left-to-right pair semantics on crafted runs") {
    // "abab"×3: round 1 merges the most frequent pair — greedy pairing of
    // "a b a b" must yield TWO (a,b) pairs per word (count 6), not split
    // one pair across the middle; "lll" pins non-overlap ("ll l")
    val docs = Seq((1L, "abab abab abab lll")).toDF("doc_id", "text")
    val m = Corpus.bpeMerges(docs, rounds = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) == ((1, "a", "b", 6L)), s"round 1: ${m(0)}")
    // after (a,b)→ab: "ab ab" per word → pair (ab,ab) count 3 beats
    // (l,l) count 1 (non-overlapping: "l l l" has ONE countable pair
    // only after merge; pre-merge adjacent count is 2 — either way < 3)
    assert(m(1) == ((2, "ab", "ab", 3L)), s"round 2: ${m(1)}")
    assert(m(2)._2 == "l" && m(2)._3 == "l", s"round 3: ${m(2)}")
  }

  test("bpeSubwordCounts: learned merges segment exactly as trained") {
    val docs = Seq((1L, "abab abab abab lll"), (2L, "ab ba x!y")).toDF("doc_id", "text")
    val merges = Corpus.bpeMerges(docs, rounds = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).map(m => (m._2, m._3)).toSeq
    val got = Corpus.bpeSubwordCounts(docs, merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // doc 1: "abab"→(a,b)+(ab,ab) merges→1 subword each ×3; "lll"→(l,l)→"ll|l"=2
    assert(got(1L) == ((4L, 5L)), s"doc1: ${got(1L)}")
    // doc 2: "ab"→1 ("a b"→ab), "ba"→2 (no (b,a) merge learned), "x!y"
    // filtered (non-alphanumeric) → 2 words, 3 subwords
    assert(got(2L) == ((2L, 3L)), s"doc2: ${got(2L)}")
  }

  test("bpeMerges: deterministic tie-break and multi-char buildup") {
    val docs = Seq((1L, "xy xy za za")).toDF("doc_id", "text")
    val m = Corpus.bpeMerges(docs, rounds = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    // (x,y) and (z,a) both count 2 — lexicographic (l, r) picks (x,y)
    assert(m(0) == ((1, "x", "y", 2L)), s"tie must break to (x,y): ${m(0)}")
    assert(m(1) == ((2, "z", "a", 2L)), s"then (z,a): ${m(1)}")
  }

  test("bpeMerges: batch=k parity with batch=1 on a provably commuting corpus") {
    // 8 two-char words over DISJOINT alphabets with strictly descending
    // freqs: the top pairs share no symbol and no concatenation, so the
    // batched schedule must select EXACTLY the sequential schedule — same
    // pairs, same order, same counts — and do it in one driver round
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val text = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(20 - i)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val seq1 = Corpus.bpeMerges(docs, rounds = 8, batch = 1)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(seq1.map(m => (m._2, m._3, m._4)) ==
      words.zipWithIndex.map { case (w, i) => (w.substring(0, 1), w.substring(1), (20 - i).toLong) },
      s"sequential schedule sanity: $seq1")
    val (dfK, stats) = Corpus.bpeMergesWithStats(docs, rounds = 8, batch = 8)
    val seqK = dfK.as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(seqK == seq1, s"batched schedule must equal sequential:\n$seqK\nvs\n$seq1")
    assert(stats.driverRounds == 1,
      s"8 mutually non-conflicting merges must take ONE driver round: $stats")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("bpeMerges: conflicting pairs defer to the next round, never corrupt") {
    // (a,b) count 3 and (b,c) count 2 SHARE symbol b — a batch of 2 must
    // select only (a,b) in round 1, then (b,c) in round 2, landing on the
    // exact sequential result
    val docs = Seq((1L, "ab ab ab bc bc")).toDF("doc_id", "text")
    val seq1 = Corpus.bpeMerges(docs, rounds = 2, batch = 1)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val (dfK, stats) = Corpus.bpeMergesWithStats(docs, rounds = 2, batch = 2)
    val seqK = dfK.as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(seq1 == Seq((1, "a", "b", 3L), (2, "b", "c", 2L)), s"sanity: $seq1")
    assert(seqK == seq1, s"conflict deferral must reach the sequential result: $seqK")
    assert(stats.driverRounds == 2, s"the shared-b conflict forces a second round: $stats")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("bpeMerges: chain rebase is value-neutral (same merges with and without)") {
    // deterministic pseudo-random corpus rich enough for 120 merges;
    // rebaseEvery=16 forces repeated mid-run rebases, the 2^20 run never
    // rebases — the learned merge tables must be identical
    val rnd = new scala.util.Random(7)
    val words = (1 to 120).map(_ =>
      (1 to 10).map(_ => "abcdefghij" (rnd.nextInt(10))).mkString)
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val (m1, s1) = Corpus.bpeMergesWithStats(docs, rounds = 120, batch = 4, rebaseEvery = 16)
    val a1 = m1.as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val (m2, s2) = Corpus.bpeMergesWithStats(docs, rounds = 120, batch = 4, rebaseEvery = 1 << 20)
    val a2 = m2.as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(a1.size == 120, s"corpus must sustain 120 merges, got ${a1.size}")
    assert(s1.rebases >= 4, s"rebase must actually fire repeatedly: $s1")
    assert(s2.rebases == 0, s"control run must never rebase: $s2")
    assert(a1 == a2, "rebasing the replace chain must not change any learned merge")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("bpeMerges: 1k+ merges in bounded driver rounds with the default 128-rebase") {
    // the production-shape run VERDICT r10 flagged as untested: >=1024
    // merges, batch=64, default rebaseEvery=128. The corpus is 400
    // deterministic pseudo-random 14-char words (pair mass ~5200, well
    // above 1024). Batching must compress driver rounds >=4x vs
    // sequential, and the 128-merge rebase must fire throughout.
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val words = (1 to 400).map(_ =>
      (1 to 14).map(_ => alpha(rnd.nextInt(36))).mkString).distinct
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val (m, stats) = Corpus.bpeMergesWithStats(docs, rounds = 1024, batch = 64)
    val learned = m.as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(learned.length == 1024, s"corpus must sustain 1024 merges, got ${learned.length}")
    assert(learned.map(_._1).toSeq == (1 to 1024), "merge rounds must be densely numbered")
    assert(stats.rebases >= 6,
      s"default 128-merge rebase must fire ~7 times across 1024 merges: $stats")
    assert(stats.driverRounds <= 256,
      s"batch=64 must compress 1024 merges into <=256 driver rounds (>=4x): $stats")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("quality classifier: training separates prose from gibberish, layout-invariant") {
    import spark.implicits._
    val gib = (1 to 24).map(i => s"qz${i}xv").mkString(" ")
    val labeled = ((1L to 20L).map(i => (i, 1, prose.replace("dog", "dog" + (i % 5)))) ++
      (101L to 120L).map(i => (i, 0, gib.replace("qz1", s"qz$i"))))
      .toDF("doc_id", "y", "text")
    val scored = Corpus.qualityClassifierScores(labeled, buckets = 256, rounds = 5)
      .select($"doc_id", $"label", $"score_q6").as[(Long, Int, Long)].collect()
    graft.core.CacheRegistry.unpersistAll()
    val pos = scored.filter(_._2 == 1).map(_._3)
    val neg = scored.filter(_._2 == 0).map(_._3)
    assert(pos.min > neg.max,
      s"trained model must separate the classes: pos>=${pos.min}, neg<=${neg.max}")
    // all-integer weights + q6-rounded gradients: the trajectory cannot
    // depend on partitioning
    val again = Corpus.qualityClassifierScores(
        labeled.repartition(7, $"doc_id"), buckets = 256, rounds = 5)
      .select($"doc_id", $"label", $"score_q6").as[(Long, Int, Long)].collect()
    graft.core.CacheRegistry.unpersistAll()
    assert(again.toSet == scored.toSet, "training must be partition-invariant")
  }

  test("staged classifier: plan-literal scoring is bit-identical to the trained pipeline") {
    import spark.implicits._
    val gib = (1 to 24).map(i => s"qz${i}xv").mkString(" ")
    val labeled = ((1L to 20L).map(i => (i, 1, prose.replace("dog", "dog" + (i % 5)))) ++
      (101L to 120L).map(i => (i, 0, gib.replace("qz1", s"qz$i"))))
      .toDF("doc_id", "y", "text")
    val inline = Corpus.qualityClassifierScores(labeled, buckets = 256, rounds = 5)
      .select($"doc_id", $"score_q6").as[(Long, Long)].collect().toMap
    graft.core.CacheRegistry.unpersistAll()
    val path = java.nio.file.Files.createTempDirectory("graft-qcls").toString + "/m"
    Corpus.stageQualityClassifier(labeled, path, buckets = 256, rounds = 5)
    graft.core.CacheRegistry.unpersistAll()
    val model = Corpus.loadQualityClassifier(spark, path)
    assert(model.buckets == 256)
    val staged = labeled.select($"doc_id",
        Corpus.classifierScoreQ6($"text", model).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(staged == inline,
      "the plan-literal fold must equal training's cnt*w join scores")
  }

  test("ccnet buckets: gibberish lands in tail, terciles are exact per language") {
    import spark.implicits._
    val gib = "zzq wvx qqk jjv xxp zrr kwq vvj pqz xkk zzq wvx qqk jjv"
    val docs = ((1L to 12L).map(i => (i, prose.replace("dog", "dog" + (i % 4)), "en")) ++
      Seq((13L, gib, "en"), (14L, gib.reverse.toLowerCase, "en")) ++
      (20L to 28L).map(i => (i, prose.replace("fox", "gato " + i), "es")))
      .toDF("doc_id", "text", "lang")
    val ref = (100L to 110L).map(i => (i, prose)).toDF("doc_id", "text")
    val got = Corpus.ccnetBuckets(docs, ref)
      .select($"doc_id", $"lang", $"bucket").as[(Long, String, String)].collect()
    val byLang = got.groupBy(_._2)
    // terciles: |head| = floor(n/3), |tail| = n - floor(2n/3) per language
    byLang.foreach { case (lang, rows) =>
      val n = rows.length
      val c = rows.groupBy(_._3).view.mapValues(_.length).toMap
      assert(c.getOrElse("head", 0) == n / 3,
        s"$lang head must be floor(n/3): $c of $n")
      assert(c.getOrElse("tail", 0) == n - (2 * n) / 3,
        s"$lang tail must be n - floor(2n/3): $c of $n")
    }
    // the two gibberish docs are the worst-scored English docs → tail
    val enTail = got.filter(r => r._2 == "en" && r._3 == "tail").map(_._1).toSet
    assert(Set(13L, 14L).subsetOf(enTail),
      s"gibberish must land in the tail tercile: $enTail")
  }

  test("stratified sample: exact counts, partition-invariant, append-stable") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b", s"text $i"))
      .toDF("doc_id", "lang", "text")
    def ids(df: org.apache.spark.sql.DataFrame, n: Int) =
      Corpus.sampleStratified(df, n).select("doc_id", "lang")
        .as[(Long, String)].collect().toSet
    val got = ids(docs, 25)
    assert(got.count(_._2 == "a") == 25 && got.count(_._2 == "b") == 25,
      s"exactly 25 per stratum: ${got.groupBy(_._2).view.mapValues(_.size).toMap}")
    // small stratum: fewer rows, never an error
    val small = ids(docs.filter($"doc_id" <= 4), 25)
    assert(small.size == 4, s"undersized strata yield what they have: $small")
    // the pick is a function of ids, not partitioning
    assert(ids(docs.repartition(13, $"doc_id"), 25) == got,
      "sample must not depend on partitioning")
    // appending docs only changes a stratum where new ids land in-order:
    // every original pick either survives or is displaced by a NEW id
    val appended = ids(docs.unionByName(
      (301L to 340L).map(i => (i, "a", s"new $i")).toDF("doc_id", "lang", "text")), 25)
    assert(appended.filter(_._2 == "b") == got.filter(_._2 == "b"),
      "untouched strata keep their exact sample")
    assert(got.filter(_._2 == "a").intersect(appended).subsetOf(appended),
      "surviving picks stay picked")
  }

  test("bloom contamination: no false negatives, clean-at-size, layout-invariant") {
    import spark.implicits._
    val evalDocs = Seq((100L, prose)).toDF("doc_id", "text")
    val train = Seq(
      (1L, prose),                                       // verbatim copy
      (2L, "unrelated content about compilers registers and stack frames " +
        "emitted by a code generator backend during instruction selection")
    ).toDF("doc_id", "text")
    def run(m: Int, df: org.apache.spark.sql.DataFrame = train) =
      Corpus.bloomContamination(df, evalDocs, mBits = m)
        .select("doc_id", "n_sh", "n_hit_bloom")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = Corpus.contamination(train, evalDocs)
      .select("doc_id", "n_sh", "n_hit")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val big = run(1 << 20)
    // one-sided: bloom hits dominate true hits; at 2^20 bits for ~40
    // eval shingles the fp rate is ~1e-18, so equality is safe to pin
    assert(big(1L) == exact(1L), s"verbatim doc: ${big(1L)} vs exact ${exact(1L)}")
    assert(big(2L) == exact(2L), s"disjoint doc must read clean: ${big(2L)}")
    assert(big(1L)._2 == big(1L)._1, "every shingle of the verbatim copy hits")
    // a deliberately tiny filter must stay one-sided (hits only inflate)
    val tiny = run(256)
    assert(tiny(1L)._2 == tiny(1L)._1, "true hits survive any filter size")
    assert(tiny(2L)._2 >= exact(2L)._2 && tiny(2L)._2 <= tiny(2L)._1,
      s"fp inflation stays within [true, n_sh]: ${tiny(2L)}")
    // bit-OR is commutative: the bitmap can't depend on partitioning
    assert(run(4096, train.repartition(7,
      org.apache.spark.sql.functions.col("text"))) == run(4096),
      "bloom probe must be partition-layout invariant")
  }
}
