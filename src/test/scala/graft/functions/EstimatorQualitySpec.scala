package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Statistical quality of the MinHash Jaccard estimator, measured on the
  * PRODUCTION signature path (tokens → word_shingles → minhash_sig) over a
  * randomized corpus — not planted pairs.
  *
  * DedupSpec proves the pipeline FINDS planted near-dups; nothing checked
  * that the estimator's NUMBERS are right. With 128 affine permutations
  * the per-pair match fraction estimates true Jaccard with
  * σ = √(J(1−J)/128) ≤ 0.045, so |est − exact| should stay within ~5σ per
  * pair and within a tight bound in the mean. A biased permutation family
  * (a broken coefficient table, a hash truncation bug) shifts these
  * immediately — this is the differential that would catch it.
  *
  * Also pins Unicode robustness of the byte-level native helpers: astral-
  * plane emoji, combining marks, CJK and RTL text through the signature
  * path — totality plus the identical-text ⇒ identical-signature and
  * nfc-idempotence invariants.
  */
class EstimatorQualitySpec extends SparkSpec {

  private val numPerm = 128

  test("minhash match-fraction tracks exact shingle Jaccard across 50 random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    val vocab = Array.tabulate(60)(i => s"w$i")
    // half independent docs, half mutated copies at controlled overlap —
    // spreads true Jaccard over (0, 1] instead of clustering near 0
    val baseDocs = (0 until 25).map { _ =>
      Seq.fill(20 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.length)))
    }
    val mutated = baseDocs.map { d =>
      d.map(t => if (rnd.nextDouble() < 0.25) vocab(rnd.nextInt(vocab.length)) else t)
    }
    val docs = (baseDocs ++ mutated).zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def shingleSet(toks: Seq[String]): Set[String] =
      if (toks.length < 2) Set(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSet

    val sigs = docs.toDF("id", "toks")
      .select(col("id"), TextHashExpressions.minhash_sig(
        TextHashExpressions.word_shingles(col("toks"), 2), numPerm).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
      .toMap

    val diffs = for {
      i <- docs.indices; j <- (i + 1) until docs.length
    } yield {
      val (ia, ta) = docs(i); val (ib, tb) = docs(j)
      val sa = shingleSet(ta); val sb = shingleSet(tb)
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val est = sigs(ia).zip(sigs(ib)).count { case (x, y) => x == y }.toDouble / numPerm
      math.abs(est - exact)
    }
    val maxDiff = diffs.max
    val meanDiff = diffs.sum / diffs.size
    assert(maxDiff <= 0.25, f"estimator max error $maxDiff%.3f exceeds ~5σ for 128 perms")
    assert(meanDiff <= 0.04, f"estimator mean error $meanDiff%.4f — permutation family is biased")
  }

  test("unicode robustness: signatures and normalization are total and self-consistent") {
    import spark.implicits._
    val gnarly = Seq(
      "🎉🎊 emoji party 🎉🎊",              // astral-plane surrogate pairs
      "élève naïve œuvre",       // combining marks + precomposed
      "日本語 の テスト 文章",                  // CJK
      "مرحبا بالعالم هذا نص",                // RTL Arabic
      "a\u0000b \uFFFD xyz",                // NUL + replacement char
      "ᚠᚢᚦᚨᚱᚲ ᚷᚹ ᚺᚾ")                      // runic
    val df = (gnarly ++ gnarly).zipWithIndex // each text twice → pairs must agree
      .map { case (t, i) => (i.toLong, t, t.split("\\s+").toSeq) }
      .toDF("id", "text", "toks")
      .select(col("id"), col("text"),
        TextHashExpressions.minhash_sig(
          TextHashExpressions.word_shingles(col("toks"), 2), 16).as("sig"),
        TextHashExpressions.simhash64(col("toks")).as("simh"),
        TextHashExpressions.quality_raw(col("text"), Seq("the", "a")).as("q"),
        NormalizeExpressions.nfc_normalize(col("text")).as("nfc"))
    val rows = df.collect().sortBy(_.getLong(0))
    val n = gnarly.length
    for (i <- 0 until n) {
      val first = rows(i); val second = rows(i + n)
      assert(first.getSeq[Int](2) == second.getSeq[Int](2) &&
        first.getLong(3) == second.getLong(3),
        s"identical text '${gnarly(i).take(20)}…' produced different signatures")
      val q = first.getDouble(4)
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of [0,1] on '${gnarly(i).take(20)}…'")
    }
    // NFC idempotence, checked through the engine itself
    val renorm = df.select(col("id"),
      NormalizeExpressions.nfc_normalize(col("nfc")).as("nfc2"), col("nfc"))
      .filter(col("nfc2") =!= col("nfc")).count()
    assert(renorm == 0L, "nfc_normalize must be idempotent")
  }
}
