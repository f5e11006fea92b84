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
}
