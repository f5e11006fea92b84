package graft.functions

import org.scalacheck.Gen

import graft.SparkSpec

/** Edge/property coverage for the native text-hash expressions: the md5
  * bases agree with the engines' builtin md5 spelling, and every
  * expression is total on degenerate token arrays (empty, single,
  * whitespace-ish strings) — the shapes real corpora hit constantly. */
class TextHashNativesSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("md5Base28/60 equal the conv(substring(md5 …)) builtin spelling") {
    val words = Seq("", "a", "hello", "héllo wörld", "日本語", " spaces  inside ")
    val viaBuiltin = words.toDF("w")
      .select(
        conv(substring(md5($"w"), 1, 7), 16, 10).cast("long").as("b28"),
        conv(substring(md5($"w"), 1, 15), 16, 10).cast("long").as("b60"))
      .as[(Long, Long)].collect()
    val viaNative = words.map { w =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
      (TextHashes.md5Base28(u), TextHashes.md5Base60(u))
    }
    assert(viaBuiltin.toSeq == viaNative,
      "native md5 prefixes must match the builtin spelling byte for byte")
  }

  test("natives are total on degenerate token arrays") {
    val cases = Seq(
      Seq.empty[String], Seq(""), Seq("a"), Seq("a", "b"),
      Seq.fill(25)("x"), Seq("", "", ""))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select($"id",
        TextHashExpressions.word_bigrams($"t").as("bg"),
        TextHashExpressions.feat_buckets($"t", 10007).as("fb"),
        TextHashExpressions.word_window_hashes($"t", 20).as("wh"),
        TextHashExpressions.minhash_sig(
          TextHashExpressions.word_shingles($"t", 3), 16).as("sig"),
        TextHashExpressions.simhash64($"t").as("fp"))
    val rows = df.collect().sortBy(_.getLong(0))
    // empty tokens: no bigrams, no features, no windows; sig is all-MaxValue
    assert(rows(0).getSeq[Any](1).isEmpty && rows(0).getSeq[Any](2).isEmpty &&
      rows(0).getSeq[Any](3).isEmpty)
    // n tokens → n-1 bigrams, 2n-1 features; windows only at ≥ 20 tokens
    assert(rows(3).getSeq[Any](1).length == 1 && rows(3).getSeq[Any](2).length == 3)
    assert(rows(4).getSeq[Any](3).length == 25 - 20 + 1)
    assert(rows(2).getSeq[Any](3).isEmpty, "19-or-fewer tokens have no window")
  }

  test("property: feature count is 2n-1 for non-empty arrays, buckets in range") {
    val gen = Gen.nonEmptyListOf(Gen.identifier)
    val sampled = (1 to 50).flatMap(n =>
      gen.apply(Gen.Parameters.default.withSize(n % 20 + 1),
        org.scalacheck.rng.Seed(n.toLong)))
    // one Spark job for all samples — per-sample jobs would dominate
    val out = sampled.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      .select($"i", size($"t").as("n"),
        TextHashExpressions.feat_buckets($"t", 101).as("fb"))
      .as[(Int, Int, Seq[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (i, n, fb) =>
      assert(fb.length == 2 * n - 1, s"sample $i: ${fb.length} features for $n tokens")
      assert(fb.forall(b => b >= 0 && b < 101), s"sample $i: bucket out of range")
    }
  }
}
