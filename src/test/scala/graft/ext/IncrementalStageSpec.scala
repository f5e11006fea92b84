package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Staged

/** Incremental staged-artifact maintenance: a delta append must be
  * indistinguishable from a full rebuild over old ∪ new (the daily-append
  * contract of a 100 TB pipeline), and versioned staging must keep the
  * previous version readable through one restage cycle. */
class IncrementalStageSpec extends SparkSpec {
  import spark.implicits._

  private val docsA = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "soup recipes for a long cold winter evening with bread and cheese"),
    (3L, "catalyst optimizer plans shuffles partitions and codegen stages"))
  private val docsB = Seq(
    (4L, "the quick brown fox jumps over the lazy cat near the river bank"),
    (5L, "entirely new content about mountains and oceans and deep valleys"))

  test("appendToShingleIndex ≡ full rebuild over old ∪ new (probe parity)") {
    val inc = Files.createTempDirectory("inc-idx-").toString
    val full = Files.createTempDirectory("full-idx-").toString
    Dedup.stageShingleIndex(docsA.toDF("doc_id", "text"), inc)
    Dedup.appendToShingleIndex(docsB.toDF("doc_id", "text"), inc)
    Dedup.stageShingleIndex((docsA ++ docsB).toDF("doc_id", "text"), full)

    // table-level parity: same doc rows, same pruned postings
    def rows(p: String, t: String) =
      spark.read.parquet(Staged.resolve(spark, p) + "/" + t)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(inc, "docs") == rows(full, "docs"))
    assert(rows(inc, "postings") == rows(full, "postings"))

    // probe-level parity: identical admission matches, including against
    // appended docs (arrival 50 near-matches doc 4, which arrived by delta)
    val arrivals = Seq(
      (50L, "the quick brown fox jumps over the lazy cat near the river bend"),
      (51L, "totally unrelated arrival text with none of those words at all"))
      .toDF("doc_id", "text")
    def probe(p: String) =
      Dedup.nearDupMatches(arrivals, Dedup.loadShingleIndex(spark, p))
        .select("doc_id", "match_id").as[(Long, Long)].collect().toSet
    val viaInc = probe(inc)
    assert(viaInc == probe(full))
    assert(viaInc.contains((50L, 4L)), s"delta-appended doc must be probeable: $viaInc")
  }

  test("appendToShingleIndex re-applies the maxDf prune over MERGED counts") {
    // boilerplate df crosses maxDf only after the merge: 6 old + 6 new
    // copies with maxDf=10 — a naive postings concat would keep them all
    val boiler = "all rights reserved worldwide forever"
    val p = Files.createTempDirectory("inc-prune-").toString
    Dedup.stageShingleIndex(
      (1L to 6L).map(i => (i, boiler)).toDF("doc_id", "text"), p)
    assert(spark.read.parquet(Staged.resolve(spark, p) + "/postings").count() > 0,
      "df=6 ≤ maxDf: postings present after the initial stage")
    Dedup.appendToShingleIndex(
      (7L to 12L).map(i => (i, boiler)).toDF("doc_id", "text"), p)
    assert(spark.read.parquet(Staged.resolve(spark, p) + "/postings").count() == 0,
      "merged df=12 > maxDf=10: the prune must apply to old ∪ new counts")
  }

  test("appendToLmModel ≡ retraining on old ∪ new (score parity)") {
    val refA = docsA.toDF("doc_id", "text")
    val refB = docsB.toDF("doc_id", "text")
    val inc = Files.createTempDirectory("inc-lm-").toString
    val full = Files.createTempDirectory("full-lm-").toString
    Corpus.stageLmModel(refA, inc)
    Corpus.appendToLmModel(refB, inc)
    Corpus.stageLmModel(refA.unionByName(refB), full)

    val score = Seq((100L, "the quick brown fox runs over the lazy dog"),
      (101L, "soup and bread and cheese for the cold evening"))
      .toDF("doc_id", "text")
    def scored(p: String) =
      Corpus.lmScoreBatch(score, Corpus.loadLmModel(spark, p))
        .as[(Long, Long, Long)].collect().toSet
    assert(scored(inc) == scored(full),
      "integer-exact NLL parity between delta-merged and retrained models")
  }

  test("versioned staging: previous version stays readable through one restage") {
    val p = Files.createTempDirectory("staged-ver-").toString
    Staged.stageVersion(spark, p)(d => Seq(1).toDF("v").write.parquet(d + "/t"))
    val v1 = Staged.resolve(spark, p)
    val captured = spark.read.parquet(v1 + "/t") // a live consumer's plan
    Staged.stageVersion(spark, p)(d => Seq(2).toDF("v").write.parquet(d + "/t"))
    val v2 = Staged.resolve(spark, p)
    assert(v2 != v1, "resolve moves to the new version")
    assert(spark.read.parquet(v2 + "/t").as[Int].head() == 2)
    assert(captured.as[Int].head() == 1,
      "the un-restarted consumer still reads its consistent old snapshot")
    // a THIRD stage prunes v1 (keep=2): only the newest two remain
    Staged.stageVersion(spark, p)(d => Seq(3).toDF("v").write.parquet(d + "/t"))
    assert(!new java.io.File(v1).exists(), "keep=2: v1 pruned on the 3rd stage")
    assert(new java.io.File(v2).exists())
    assert(spark.read.parquet(Staged.resolve(spark, p) + "/t").as[Int].head() == 3)
  }

  test("resolve falls back to the flat pre-versioning layout") {
    val p = Files.createTempDirectory("staged-flat-").toString
    assert(Staged.resolve(spark, p.toString) == p.toString)
  }
}
