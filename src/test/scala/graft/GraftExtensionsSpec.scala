package graft

import graft.SparkSpec

/** The SQL surface injected by [[GraftExtensions]]: every graft native
  * expression callable from pure SQL, planning identically to the
  * DataFrame API (no UDF wrappers). The shared test session can't be
  * rebuilt with extensions, so the spec injects through the same
  * registry path `injectFunction` uses. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit =
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  test("vec_dot / vec_norm work from SQL and match the Scala API") {
    registered
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_norm(array(3.0d, 4.0d)) AS n").as[(Double, Double)].head()
    assert(r == ((11.0, 5.0)))
  }

  test("nfc_normalize from SQL composes a decomposed accent") {
    registered
    // NB not chr(769): Spark's chr() is ASCII-mod-256 (DuckDB's is a
    // codepoint), so the combining acute rides a \u escape instead
    val r = spark.sql(
      "SELECT length(nfc_normalize('cafe\\u0301')) AS n, " +
        "nfc_normalize('plain ascii') AS p").as[(Int, String)].head()
    assert(r == ((4, "plain ascii")))
  }

  test("simhash64 / word_shingles / minhash_sig / srp_sig from SQL") {
    registered
    val (fp, sh, sig, srp) = spark.sql(
      """SELECT
           simhash64(split('the quick brown fox', ' ')) AS fp,
           word_shingles(split('a b c d', ' '), 3) AS sh,
           minhash_sig(word_shingles(split('a b c d', ' '), 3), 16) AS sig,
           srp_sig(array(0.5d, -0.25d, 1.0d), 8, 4) AS srp""")
      .as[(Long, Seq[String], Seq[Int], Seq[Int])].head()
    // parity with the column API on identical inputs
    val colFp = Seq("the quick brown fox").toDF("t")
      .select(graft.functions.TextHashExpressions.simhash64(
        org.apache.spark.sql.functions.split($"t", " ")))
      .as[Long].head()
    assert(fp == colFp)
    assert(sh == Seq("a b c", "b c d"))
    assert(sig.length == 16)
    assert(srp.length == 4 && srp.forall(b => b >= 0 && b < 256))
  }

  test("intersection_size callable from SQL via the registered surface") {
    registered
    val n = spark.sql(
      "SELECT intersection_size(array('a','b','c'), array('b','c','d')) AS n")
      .as[Int].head()
    assert(n == 2)
  }

  test("intersection_size matches size(array_intersect) incl. duplicate elements") {
    val df = Seq(
      (Seq("a", "b", "c", "b"), Seq("b", "c", "d", "c")),
      (Seq("x"), Seq("y")),
      (Seq.empty[String], Seq("a"))
    ).toDF("a", "b")
    val got = df.select(
        graft.functions.SetExpressions.intersection_size($"a", $"b"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect($"a", $"b")))
      .as[(Int, Int)].collect()
    got.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("optimizer rule rewrites size(array_intersect) for non-null-element arrays") {
    import org.apache.spark.sql.functions.{array_intersect, lit, sequence, size}
    // non-literal input, or constant folding erases the expression entirely
    val df = spark.range(3)
      .select(sequence(lit(0L), $"id").as("a"), sequence($"id", lit(4L)).as("b"))
      .select(size(array_intersect($"a", $"b")).as("n"))
    val rewritten = graft.functions.IntersectionSizeRule(df.queryExecution.optimizedPlan)
    assert(rewritten.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.IntersectionSize])),
      s"expected IntersectionSize in: $rewritten")
    // value equivalence of the rewritten expression is pinned by the
    // intersection_size-vs-size(array_intersect) test above
  }

  test("optimizer rule leaves floating-point arrays alone (0.0 vs -0.0 SQL semantics)") {
    import org.apache.spark.sql.functions.{array_intersect, size}
    // ±0.0/NaN set equality for FP arrays has flip-flopped across Spark
    // releases (this 4.1 build: [0.0] ∩ [-0.0] = ∅); the rewrite must never
    // be the thing that changes a pure-SQL answer, so FP element types are
    // excluded wholesale rather than chasing the engine's current choice.
    val df = spark.range(3)
      .select(
        org.apache.spark.sql.functions.array($"id".cast("double") * 0.0).as("a"),
        org.apache.spark.sql.functions.array($"id".cast("double") * -0.0).as("b"))
      .select(size(array_intersect($"a", $"b")).as("n"))
    val rewritten = graft.functions.IntersectionSizeRule(df.queryExecution.optimizedPlan)
    assert(!rewritten.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.IntersectionSize])),
      s"rule must not rewrite double arrays: $rewritten")
  }

  test("repetition_stats / asof_pick / text_quality_score from SQL") {
    registered
    val (nTok, ratio) = spark.sql(
      "SELECT s.n_tokens, s.distinct_token_ratio FROM " +
        "(SELECT repetition_stats(split('a b a b a', ' ')) AS s)")
      .as[(Long, Double)].head()
    assert(nTok == 5L && ratio == 0.4)
    val picked = spark.sql(
      """SELECT asof_pick(array(named_struct('t', 10L, 'v', 100L),
                               named_struct('t', 20L, 'v', 200L)), 15L).v AS v""")
      .as[Long].head()
    assert(picked == 100L)
    // parity with the Scala API the same tree is assembled from
    val viaSql = spark.sql(
      "SELECT text_quality_score('the quick brown fox jumps over the lazy dog') AS q")
      .as[Double].head()
    val viaApi = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .select(graft.ext.TextOps.qualityScore($"t")).as[Double].head()
    assert(viaSql == viaApi)
    assert(viaSql > 0.0 && viaSql <= 1.0)
  }

  test("repetition_stats on an empty array reports 0 tokens, null fractions") {
    registered
    val row = spark.sql(
      "SELECT s.n_tokens, s.distinct_token_ratio, s.top_bigram_frac, " +
        "s.dup_trigram_frac FROM (SELECT repetition_stats(array()) AS s)").head()
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3),
      s"empty input must not produce NaN fractions: $row")
  }

  test("word_bigrams / feat_buckets from SQL match the column API") {
    registered
    val (bg, fb) = spark.sql(
      """SELECT word_bigrams(split('a b c', ' ')) AS bg,
                feat_buckets(split('a b c', ' '), 10007) AS fb""")
      .as[(Seq[(String, String)], Seq[Long])].head()
    assert(bg == Seq(("a", "b"), ("b", "c")))
    val viaApi = Seq("a b c").toDF("t")
      .select(graft.functions.TextHashExpressions.feat_buckets(
        org.apache.spark.sql.functions.split($"t", " "), 10007))
      .as[Seq[Long]].head()
    assert(fb == viaApi && fb.length == 5, // 3 unigrams + 2 bigrams
      s"SQL and column feat_buckets must agree: $fb vs $viaApi")
  }

  test("kmv_distinct from SQL matches the column API and stays exact below k") {
    registered
    val est = spark.sql(
      "SELECT kmv_distinct(v, 64) AS est FROM (SELECT explode(sequence(1, 40)) AS v)")
      .as[Long].head()
    assert(est == 40L, s"40 distinct values under k=64 must be exact, got $est")
    val viaSql = spark.sql(
      "SELECT kmv_distinct(v, 8) AS est FROM (SELECT explode(sequence(1, 500)) AS v)")
      .as[Long].head()
    val viaApi = (1 to 500).toDF("v")
      .agg(graft.functions.SketchExpressions.kmv_distinct(org.apache.spark.sql.functions.col("v"), 8))
      .as[Long].head()
    assert(viaSql == viaApi, s"SQL $viaSql must equal column API $viaApi")
  }

  test("cms_sketch/cms_estimate and bloom_bitmap/bloom_might_contain from SQL") {
    registered
    // CMS: pure-SQL build + probe equals the column API end-to-end
    val viaSql = spark.sql(
      """SELECT cms_estimate(sk, 'a7', 4, 128) AS est FROM (
           SELECT cms_sketch(v, 4, 128) AS sk
           FROM (SELECT concat('a', CAST(v % 20 AS STRING)) AS v
                 FROM (SELECT explode(sequence(1, 400)) AS v)))""")
      .as[Long].head()
    assert(viaSql == 20L, s"a7 occurs 20 times (uncollided at width 128), got $viaSql")
    // Bloom: member values maybe-hit, absent values definitely miss (at
    // this size the fp odds are negligible)
    val hits = spark.sql(
      """SELECT v, bloom_might_contain(b, v, 5, 4096) AS hit FROM
           (SELECT explode(array('x1', 'x2', 'nope')) AS v),
           (SELECT bloom_bitmap(m, 5, 4096) AS b
            FROM (SELECT explode(array('x1', 'x2', 'x3')) AS m))""")
      .as[(String, Boolean)].collect().toMap
    assert(hits("x1") && hits("x2"), s"inserted values must hit: $hits")
    assert(!hits("nope"), s"absent value must miss at m=4096: $hits")
  }

  test("SQL-registered expressions stay codegen'd (no UDF wrapper in the plan)") {
    registered
    val df = spark.range(1).selectExpr("vec_dot(array(1.0d), array(2.0d)) AS d")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"expected a native expression plan:\n$plan")
  }
}
