package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, FeatBuckets, L2Norm, MinHashSig, SimHash64, SrpSig, WordBigrams, WordShingles}

/** Spark-native integration point: `spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) injects the library's
  * codegen'd expressions into the SQL function registry, so pure-SQL users
  * get the hot-path surface without touching the Scala API:
  *
  * {{{
  *   SELECT vec_dot(a.embedding, b.embedding)              -- similarity
  *   SELECT simhash64(split(lower(text), '\\s+'))          -- dedup sigs
  *   SELECT minhash_sig(word_shingles(split(text,' '), 3), 64)
  *   SELECT srp_sig(embedding, 8, 8)                       -- SRP-LSH buckets
  * }}}
  *
  * Every function resolves to a native `Expression` with `doGenCode`, so a
  * SQL query plans identically to the DataFrame API — whole-stage codegen
  * intact, no UDF wrappers (the build contract's preference order). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      // 3-arg ExpressionInfo: the 5-arg form validates `usage`/`source`
      // markup the plain one-liners don't carry
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", null, name),
          builder))
    }
    // size(array_intersect(a, b)) → allocation-free IntersectionSize
    ext.injectOptimizerRule(_ => graft.functions.IntersectionSizeRule)
    // plans graft.plans.AsOfJoin as the native sort-merge AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def one(name: String)(f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every injected function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two array<double>", {
      case Seq(a, b) => DotProduct(a, b)
      case args => throw new IllegalArgumentException(
        s"vec_dot expects 2 arguments, got ${args.length}")
    }),
    ("vec_norm", "vec_norm(a) - L2 norm of array<double>",
      one("vec_norm")(L2Norm)),
    ("nfc_normalize", "nfc_normalize(str) - Unicode canonical composition (NFC)",
      one("nfc_normalize")(graft.functions.NfcNormalize)),
    ("simhash64", "simhash64(tokens) - 60-bit md5-based SimHash of array<string>",
      one("simhash64")(SimHash64)),
    ("word_shingles", "word_shingles(tokens, n) - distinct word n-grams", {
      case Seq(t, n) => WordShingles(t, intLit(n, "word_shingles n"))
      case args => throw new IllegalArgumentException(
        s"word_shingles expects 2 arguments, got ${args.length}")
    }),
    ("minhash_sig", "minhash_sig(shingles, numPerm) - MinHash signature", {
      case Seq(s, p) => MinHashSig(s, intLit(p, "minhash_sig numPerm"))
      case args => throw new IllegalArgumentException(
        s"minhash_sig expects 2 arguments, got ${args.length}")
    }),
    ("word_bigrams", "word_bigrams(tokens) - consecutive (w1, w2) pairs, occurrences kept",
      one("word_bigrams")(WordBigrams)),
    ("feat_buckets", "feat_buckets(tokens, buckets) - md5-prefix unigram+bigram feature buckets", {
      case Seq(t, b) =>
        val buckets = intLit(b, "feat_buckets buckets")
        // fail at analysis, not with a per-row ArithmeticException on the
        // executor (0) or silently-negative bucket ids (<0)
        require(buckets >= 2, s"feat_buckets: buckets must be >= 2, got $buckets")
        FeatBuckets(t, buckets)
      case args => throw new IllegalArgumentException(
        s"feat_buckets expects 2 arguments, got ${args.length}")
    }),
    ("srp_sig", "srp_sig(vec, nBits, tables) - SRP-LSH bucket per hash table", {
      case Seq(v, b, t) =>
        SrpSig(v, intLit(b, "srp_sig nBits"), intLit(t, "srp_sig tables"))
      case args => throw new IllegalArgumentException(
        s"srp_sig expects 3 arguments, got ${args.length}")
    }),
    ("intersection_size",
      "intersection_size(a, b) - |set(a) ∩ set(b)| without materializing the intersection", {
      case Seq(a, b) => graft.functions.IntersectionSize(a, b)
      case args => throw new IllegalArgumentException(
        s"intersection_size expects 2 arguments, got ${args.length}")
    }),
    ("repetition_stats",
      "repetition_stats(tokens) - struct(n_tokens, distinct_token_ratio, top_bigram_frac, dup_trigram_frac)",
      one("repetition_stats")(graft.functions.RepetitionStats)),
    ("asof_pick",
      "asof_pick(versions, t) - latest version struct (time-sorted array, first field = time) at-or-before t", {
      case Seq(v, t) => graft.functions.AsOfPick(v, t)
      case args => throw new IllegalArgumentException(
        s"asof_pick expects 2 arguments, got ${args.length}")
    }),
    ("kmv_distinct",
      "kmv_distinct(value, k) - approximate COUNT(DISTINCT value): bottom-k (KMV) sketch over a 60-bit md5-prefix hash; exact below k", {
      case Seq(v, k) =>
        import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
        import org.apache.spark.sql.types.{LongType, StringType}
        val kk = intLit(k, "kmv_distinct k")
        require(kk > 1, s"kmv_distinct: k must be > 1, got $kk")
        graft.functions.KmvDistinct(
          Cast(Conv(Substring(Md5(Cast(v, StringType)), Literal(1), Literal(15)),
            Literal(16), Literal(10)), LongType), kk).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"kmv_distinct expects 2 arguments, got ${args.length}")
    }),
    ("cms_sketch",
      "cms_sketch(value, depth, width) - count-min sketch: flattened depth×width counter matrix (partial-aggregating)", {
      case Seq(v, d, w) =>
        import org.apache.spark.sql.graft.ColumnBridge
        val depth = intLit(d, "cms_sketch depth")
        val width = intLit(w, "cms_sketch width")
        graft.functions.CmsSketch(
          ColumnBridge.resolvableExpression(
            graft.functions.SketchExpressions.cmsCells(
              ColumnBridge.column(v), depth, width)),
          depth, width).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"cms_sketch expects 3 arguments, got ${args.length}")
    }),
    ("cms_estimate",
      "cms_estimate(sketch, term, depth, width) - min-of-depth-cells frequency estimate from a cms_sketch", {
      case Seq(sk, t, d, w) =>
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.resolvableExpression(
          graft.functions.SketchExpressions.cmsEstimate(
            ColumnBridge.column(sk), ColumnBridge.column(t),
            intLit(d, "cms_estimate depth"), intLit(w, "cms_estimate width")))
      case args => throw new IllegalArgumentException(
        s"cms_estimate expects 4 arguments, got ${args.length}")
    }),
    ("bloom_bitmap",
      "bloom_bitmap(value, kHash, mBits) - Bloom filter bitmap as array<bigint> (bit-OR aggregate)", {
      case Seq(v, k, m) =>
        import org.apache.spark.sql.graft.ColumnBridge
        val kh = intLit(k, "bloom_bitmap kHash")
        val mb = intLit(m, "bloom_bitmap mBits")
        graft.functions.BloomBitmap(
          ColumnBridge.resolvableExpression(
            graft.functions.SketchExpressions.cmsCells(
              ColumnBridge.column(v), kh, mb)),
          mb).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"bloom_bitmap expects 3 arguments, got ${args.length}")
    }),
    ("bloom_might_contain",
      "bloom_might_contain(bloom, value, kHash, mBits) - one-sided membership probe against a bloom_bitmap", {
      case Seq(b, v, k, m) =>
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.resolvableExpression(
          graft.functions.SketchExpressions.bloomMightContain(
            ColumnBridge.column(b), ColumnBridge.column(v),
            intLit(k, "bloom_might_contain kHash"), intLit(m, "bloom_might_contain mBits")))
      case args => throw new IllegalArgumentException(
        s"bloom_might_contain expects 4 arguments, got ${args.length}")
    }),
    // composite heuristic assembled from builtins — registering the SAME
    // Column tree the Scala API builds lets declarative op-specs gate on
    // quality mid-stream: {"filter": "text_quality_score(value) >= 0.6"}
    ("text_quality_score",
      "text_quality_score(text) - composite [0,1] corpus-quality heuristic",
      one("text_quality_score")(e =>
        org.apache.spark.sql.graft.ColumnBridge.resolvableExpression(
          graft.ext.TextOps.qualityScore(
            org.apache.spark.sql.graft.ColumnBridge.column(e))))))
}
