package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "the QUICK brown   fox jumps over the lazy dog"), // case/space variant
    (3L, "el gato y el perro en la casa de la abuela"),
    (4L, "!!! ??? ... ;;; :::")
  ).toDF("doc_id", "text")

  test("token count: whitespace runs collapse; case-insensitive") {
    val counts = docs.select($"doc_id", TextOps.tokenCount($"text"))
      .as[(Long, Int)].collect().toMap
    assert(counts(1L) == 9 && counts(2L) == 9)
  }

  test("bpe-ish count splits punctuation and digits apart") {
    val n = docs.filter($"doc_id" === 4L)
      .select(TextOps.bpeishCount($"text")).as[Int].head
    assert(n == 15, "each punctuation char is its own token + spaces dropped")
    val m = Seq("ab12cd").toDF("t").select(TextOps.bpeishCount($"t")).as[Int].head
    assert(m == 1, "alnum runs stay together")
  }

  test("language ID picks the right stopword family; deterministic") {
    val langs = docs.select($"doc_id", TextOps.langId($"text"))
      .as[(Long, String)].collect().toMap
    assert(langs(1L) == "en" && langs(2L) == "en")
    assert(langs(3L) == "es")
    assert(langs(4L) == "und", "no stopword hits → und")
  }

  test("quality score: clean prose beats punctuation soup; bounded [0,1]") {
    val q = docs.select($"doc_id", TextOps.qualityScore($"text"))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(4L))
  }

  test("fingerprints: exact fp equal only for identical normalized text; robust fp survives 1-token edit") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val edit = base.replace("theta", "THETA") // normalization folds case
    val real = base.replace("theta", "other")
    val df = Seq((1L, base), (2L, edit), (3L, real)).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextOps.fingerprint($"text"),
        TextOps.robustFingerprint($"text")).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(fps(1L)._1 == fps(2L)._1, "case-folded identical text → same fp")
    assert(fps(1L)._1 != fps(3L)._1)
    // robust (min-shingle-hash) fingerprint: a 1-token change far from the
    // minimum shingle usually preserves it; identical docs always match
    assert(fps(1L)._2 == fps(2L)._2)
  }

  test("char n-grams cover the string with stride 1") {
    val grams = Seq(("abcd", 1)).toDF("t", "i")
      .select(TextOps.charNgrams($"t", 2)).as[Seq[String]].head
    assert(grams == Seq("ab", "bc", "cd"))
  }

  test("top terms: tf desc, rare-first df, then term name; stopwords out") {
    val df = Seq(
      (1L, "the alpha alpha beta beta gamma"), // alpha/beta tf=2; gamma tf=1
      (2L, "the beta delta delta")             // delta tf=2; beta tf=1
    ).toDF("doc_id", "text")
    val got = TextOps.topTerms(df, k = 2)
      .select("doc_id", "term", "rank").as[(Long, String, Int)].collect().toSet
    // doc 1: alpha vs beta tie on tf=2 → beta appears in BOTH docs (df=2),
    // alpha only in doc 1 (df=1) → rarer alpha ranks first
    assert(got == Set((1L, "alpha", 1), (1L, "beta", 2),
      (2L, "delta", 1), (2L, "beta", 2)), s"got $got")
  }

  test("repetition signals: hand-computed fractions on a looping doc") {
    // "a b a b a": tokens=5, distinct=2 → ratio 0.4
    // bigrams: "a b","b a","a b","b a" → top "a b"(2)/4 = 0.5
    // trigrams: "a b a","b a b","a b a" → dup mass ("a b a"×2)/3
    val df = Seq(
      (1L, "a b a b a"),
      (2L, "all words here are fully distinct"), // no repeated grams at all
      (3L, "x"),                                 // too short for bi/trigrams
      (4L, "z z z z")                            // total repetition
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(df)
      .as[(Long, Long, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((5L, 0.4, Some(0.5), Some(0.666667))))
    assert(got(2L)._2 == 1.0, "fully distinct text → ratio 1")
    assert(got(2L)._4 == Some(0.0), "no duplicated trigram mass")
    assert(got(3L) == ((1L, 1.0, None, None)), "short doc → null fractions")
    assert(got(4L) == ((4L, 0.25, Some(1.0), Some(1.0))),
      "degenerate loop maxes every signal")
  }

  test("native quality expression is bit-identical to the columnar reference") {
    // the native single-pass QualityRaw must reproduce the HOF Column
    // spelling EXACTLY (same UTF8String ops, same IEEE order) — a 1-ulp
    // drift here silently breaks four DuckDB-oracled gates
    val docs = graft.core.Tables.documents(spark, sf("sf0.01"))
      .select($"doc_id", TextOps.qualityScore($"text").as("native"),
        TextOps.qualityScoreColumnar($"text").as("columnar"))
    assert(docs.filter($"native" =!= $"columnar" ||
      $"native".isNull =!= $"columnar".isNull).count() == 0,
      "native and columnar quality must agree on every fixture doc")
    // edge shapes: empty, whitespace-only, punctuation-only, unicode, null
    val edge = Seq("", "   ", "!!! ???", "the the the", "汉字 文本 aB  Cd",
      "word", " mixed   WS\tand\ttabs ").toDF("text")
      .select(TextOps.qualityScore($"text").as("native"),
        TextOps.qualityScoreColumnar($"text").as("columnar"))
    assert(edge.filter($"native" =!= $"columnar").count() == 0)
    // null text: the native expression propagates null (the deliberate
    // semantic); the columnar reference leaks 0.25 because null-skipping
    // `least(null, 1.0)` turns every null score term into a constant —
    // one of the reasons production goes native. Fixture corpora carry no
    // null texts, so the oracled gates see no difference.
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextOps.qualityScore($"text").as("n"),
        TextOps.qualityScoreColumnar($"text").as("c"))
      .as[(Option[Double], Option[Double])].head()
    assert(nulls._1.isEmpty, "null text → null quality on the native path")
    assert(nulls._2.contains(0.25), "columnar null artifact, documented")
  }

  test("removeBoilerplate strips high-df lines, keeps rare lines and order, drops emptied docs") {
    val footer = "Subscribe now!"
    val docs = Seq(
      (1L, s"alpha body one\n$footer"),
      (2L, s"$footer\nbeta body two"),
      (3L, s"gamma body three\n$footer\nrare closing line"),
      (4L, footer) // nothing but boilerplate → disappears
    ).toDF("doc_id", "text")
    val out = TextOps.removeBoilerplate(docs, minDf = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "alpha body one",
      2L -> "beta body two",
      3L -> "gamma body three\nrare closing line"),
      s"got $out")
  }

  test("scrubPii redacts emails, IPs, and phones; counts on raw text") {
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org or x@y.io today"),
      (2L, "server 10.0.0.1 talked to 192.168.001.255 fine"),
      (3L, "call 555-123-4567 or 555 987 6543 soon"),
      (4L, "user@10.0.0.1.net has a dotted mail domain"), // email wins over IP
      (5L, "no personal data in this row at all"),
      (6L, "version 1.2.3 of lib4 is not an ip or phone")
    ).toDF("doc_id", "text")
    val got = TextOps.scrubPii(df)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "text_clean")
      .as[(Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 2 && got(1L)._5 == "mail <EMAIL> or <EMAIL> today")
    assert(got(2L)._3 == 2 && got(2L)._5 == "server <IP> talked to <IP> fine")
    assert(got(3L)._4 == 2 && got(3L)._5 == "call <PHONE> or <PHONE> soon")
    assert(got(4L)._5 == "<EMAIL> has a dotted mail domain",
      "email pattern must consume the dotted-decimal domain before the IP pass")
    assert(got(4L)._3 == 1, "counts are per-pattern on RAW text: the IP is " +
      "counted even though the email replacement consumed it")
    assert(got(5L) == ((5L, 0L, 0L, 0L, "no personal data in this row at all")))
    assert(got(6L) == ((6L, 0L, 0L, 0L, "version 1.2.3 of lib4 is not an ip or phone")),
      "semver and short digit runs are not PII")
  }

  test("duplicatedSpans flags a pasted paragraph, not unique prose; short docs have no windows") {
    import org.apache.spark.sql.functions.col
    val para = (1 to 25).map(i => s"w$i").mkString(" ") // 25 tokens, pasted into 1 and 2
    val docs = Seq(
      (1L, para + " unique tail one two three four five six"),
      (2L, "different head alpha beta gamma delta " + para),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")), // 30 unique tokens, no dup
      (4L, "too short for any window")
    ).toDF("doc_id", "text")
    val out = TextOps.duplicatedSpans(docs, windowN = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the pasted 25-token paragraph yields 6 shared 20-token windows
    assert(out(1L)._2 == 6 && out(2L)._2 == 6,
      s"both owners of the pasted paragraph flag its windows: $out")
    assert(out(3L) == ((11L, 0L)), "unique prose has windows but no dups")
    assert(!out.contains(4L), "sub-window docs have no spans long enough to count")
  }

  test("removeDuplicatedSpans: canonical owner keeps the span, the copy loses it, " +
    "short docs pass through") {
    val para = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, para + " unique tail one two three four five six"),
      (2L, "different head alpha beta gamma delta " + para),
      (4L, "too short for any window")
    ).toDF("doc_id", "text")
    val out = TextOps.removeDuplicatedSpans(docs, windowN = 20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == para + " unique tail one two three four five six",
      "the lowest-id owner keeps its copy verbatim")
    assert(out(2L) == "different head alpha beta gamma delta",
      s"the duplicate loses exactly the pasted paragraph: '${out(2L)}'")
    assert(out(4L) == "too short for any window",
      "sub-window docs reassemble unchanged")
  }

  test("dedupLinesWithin: repeated lines keep first occurrence, blanks and " +
    "order survive, cross-doc repeats are untouched") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\n\nbeta\ngamma\n"),
      (2L, "alpha\nalpha\nalpha"), // cross-doc repeat of doc1's line is fine
      (3L, "solo line")
    ).toDF("doc_id", "text")
    val out = TextOps.dedupLinesWithin(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // trailing \n yields a final blank line; both blanks pass through
    assert(out(1L) == "alpha\nbeta\n\ngamma\n",
      s"first occurrences + blanks in original order: '${out(1L)}'")
    assert(out(2L) == "alpha", "within-doc triplicate collapses to one")
    assert(out(3L) == "solo line")
  }

  test("removeDuplicatedSpans: overlapping spans with different owners cannot " +
    "destroy each other's canonical copy") {
    // windowN=20. Span S = v1..v20 (owner doc1), span T = v11..v30 (owner
    // doc2, where it overlaps S's copy at positions 10..19). Without
    // owner-position protection, S's removal from doc2 strips T's first
    // half there while doc3's whole T copy is removed as a non-owner — T
    // would survive nowhere.
    def ws(a: Int, b: Int) = (a to b).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, ws(1, 20)),   // exactly S
      (2L, ws(1, 30)),   // S at 0..19, T at 10..29
      (3L, ws(11, 30))   // exactly T
    ).toDF("doc_id", "text")
    val out = TextOps.removeDuplicatedSpans(docs, windowN = 20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == ws(1, 20), "doc1 owns S and keeps it verbatim")
    assert(out(2L) == ws(11, 30),
      s"doc2 owns T: protection must keep T intact, losing only v1..v10: '${out(2L)}'")
    assert(out(3L) == "", "doc3's T copy is fully removed (it lives in doc2)")
  }

  test("reference-span removal: leaked windows cut with no owner exception, rest intact") {
    def ws(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    val bench = Seq((100L, ws(1, 30))).toDF("doc_id", "text")
    val train = Seq(
      (1L, ws(1, 30)),                      // verbatim benchmark copy → ''
      (2L, ws(50, 90) + " " + ws(1, 25) + " " + ws(91, 120)), // mid-doc leak
      (3L, ws(200, 260))                    // disjoint → untouched
    ).toDF("doc_id", "text")
    val out = TextOps.removeReferenceSpans(train, bench, windowN = 20)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "", s"fully-leaked doc must come back empty: '${out(1L)}'")
    assert(out(3L) == ws(200, 260), "disjoint doc passes through untouched")
    // doc 2: w1..w25 contains windows w1-20..w6-25 (all in bench) → tokens
    // w1..w25 covered; surrounding original text survives in order
    assert(out(2L) == ws(50, 90) + " " + ws(91, 120),
      s"only the leaked span is cut: '${out(2L)}'")
    graft.core.CacheRegistry.unpersistAll()
  }

  test("bm25: term-bearing docs rank above term-free, rare terms outweigh common") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),        // has rare 'gamma'
      (2L, "alpha beta beta beta common words here"), // common 'alpha beta' only
      (3L, "totally unrelated text about nothing"),
      (4L, "alpha alpha alpha alpha alpha"),          // tf saturation case
      (5L, "gamma gamma unique document")             // rare term, high tf
    ) ++ (10L to 29L).map(i => (i, "alpha beta filler content number " + i))
    val df = corpus.toDF("doc_id", "text")
    val top = TextOps.bm25TopK(df, Seq("gamma", "alpha"), k = 30)
      .as[(Long, Long)].collect()
    val rank = top.map(_._1).zipWithIndex.toMap
    val score = top.toMap
    assert(!rank.contains(3L), "doc with no query term must not score")
    // 'gamma' df=2 vs 'alpha' df=23: the rare term dominates any alpha tf
    assert(rank(5L) < rank(4L) && rank(1L) < rank(4L),
      s"rare-term docs must outrank the all-alpha doc: $top")
    // BM25 tf saturation: 5x alpha scores above 1x alpha but below gamma docs
    assert(score(4L) > score(2L) || rank(4L) < rank(2L),
      s"higher tf of the same term must not rank lower: $top")
    // total order: scores desc, doc_id tie-break asc
    assert(top.sortBy(t => (-t._2, t._1)).toSeq == top.toSeq, "ordering must be total")
    // determinism under partitioning
    val again = TextOps.bm25TopK(df.repartition(7, col("doc_id")), Seq("gamma", "alpha"), k = 30)
      .as[(Long, Long)].collect()
    assert(again.toSeq == top.toSeq, "ranking must not depend on partitioning")
  }
}
