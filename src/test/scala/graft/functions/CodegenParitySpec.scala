package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Codegen ⇔ interpreted parity for the native expression library.
  *
  * Every custom Catalyst expression here ships TWO implementations: the
  * interpreted `eval`/`nullSafeEval` path and the Java emitted by
  * `doGenCode`. For DotProduct/L2Norm the loop is genuinely duplicated in
  * generated source; the rest delegate to shared static helpers but still
  * duplicate the null/boxing plumbing. A bug in either path is invisible
  * to any test that only runs the session default (whole-stage ON), so
  * this suite runs one battery of adversarial random inputs under
  * FORCED-interpreted (`wholeStage=false` + `factoryMode=NO_CODEGEN`) and
  * FORCED-codegen (`wholeStage=true` + `factoryMode=CODEGEN_ONLY`)
  * projections and diffs the collected results row-for-row.
  */
class CodegenParitySpec extends SparkSpec {

  /** Seeded adversarial corpus: empty vectors, mismatched lengths, nulls,
    * empty strings, unicode (composed and decomposed), stopword-heavy and
    * token-free text, empty version arrays. */
  private lazy val input: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(424242)
    def vec(): Seq[Double] =
      Seq.fill(rnd.nextInt(8))(math.round(rnd.nextGaussian() * 1e6) / 1e6)
    def toks(): Seq[String] = Seq.fill(rnd.nextInt(10))(rnd.nextInt(6) match {
      case 0 => ""
      case 1 => "the"
      case 2 => "naïve" // decomposed umlaut — NFC must compose it
      case 3 => "naïve"
      case 4 => "日本語"
      case _ => rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
    })
    def versions(): Seq[(Long, String)] =
      (1 to rnd.nextInt(6)).map(j => (j * 10L, s"v$j"))
    (1 to 200).map { i =>
      (i,
        if (i % 17 == 0) None else Some(vec()),
        if (i % 13 == 0) None else Some(vec()),
        if (i % 11 == 0) None else Some(toks()),
        if (i % 7 == 0) None else Some(toks()),
        if (i % 19 == 0) None
        else Some(("Some text, the of a! " * (i % 4)) + toks().mkString(" ")),
        versions(),
        (rnd.nextInt(8) * 10).toLong)
    }.toDF("id", "v1", "v2", "toks", "toks2", "text", "versions", "t")
  }

  private def battery(df: DataFrame): Seq[String] = {
    import TextHashExpressions._
    import VectorExpressions._
    val weights = Array.tabulate(64)(i => (i * 2654435761L) % 1001 - 500)
    df.select(
      col("id"),
      vec_dot(col("v1"), col("v2")).as("dot"),
      vec_norm(col("v1")).as("norm"),
      vec_cosine(col("v1"), col("v2")).as("cos"), // NaN on empty — stringified compare
      srp_sig(col("v1"), 4, 2).as("srp"),
      word_bigrams(col("toks")).as("bg"),
      word_window_hashes(col("toks"), 3).as("wh"),
      feat_buckets(col("toks"), 64).as("fb"),
      feat_weight_sum(col("toks"), weights).as("fw"),
      word_shingles(col("toks"), 3).as("sh"),
      quality_raw(col("text"), Seq("the", "a", "of")).as("q"),
      repetition_stats(col("toks")).as("rs"),
      minhash_sig(word_shingles(col("toks"), 2), 16).as("mh"),
      simhash64(col("toks")).as("simh"),
      NormalizeExpressions.nfc_normalize(col("text")).as("nfc"),
      SetExpressions.intersection_size(col("toks"), col("toks2")).as("isz"),
      AsOfExpressions.asof_pick(col("versions"), col("t")).as("ap"))
      .orderBy("id")
      .collect().toSeq
      // Row.equals on Double.NaN is false-by-Scala; the canonical string
      // form compares NaN, nested arrays, and structs uniformly
      .map(_.toString)
  }

  private def underModes[T](wholeStage: String, factory: String)(f: => T): T = {
    val ws0 = spark.conf.get("spark.sql.codegen.wholeStage")
    val fm0 = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
    spark.conf.set("spark.sql.codegen.factoryMode", factory)
    try f
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws0)
      spark.conf.set("spark.sql.codegen.factoryMode", fm0)
    }
  }

  test("native expressions: forced-codegen equals forced-interpreted on 200 adversarial rows") {
    val interpreted = underModes("false", "NO_CODEGEN")(battery(input))
    val codegened = underModes("true", "CODEGEN_ONLY")(battery(input))
    assert(interpreted.size == 200)
    interpreted.zip(codegened).zipWithIndex.foreach { case ((i, c), idx) =>
      assert(i == c, s"row $idx diverged:\n  interpreted: $i\n  codegen:     $c")
    }
  }
}
