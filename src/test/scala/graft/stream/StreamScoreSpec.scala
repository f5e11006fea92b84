package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ext.Corpus

/** Streaming LM admission: staged-model lifecycle, batch ≡ streaming
  * scores, and the perplexity ceiling actually separates reference-like
  * prose from gibberish. */
class StreamScoreSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from every hunter"

  private val arrivals = Seq(
    (1L, prose),                                                      // reference-like
    (2L, "zzq wvx qqk jjv xxp zrr kwq vvj pqz xkk zzq wvx qqk jjv"),  // gibberish
    (3L, prose.replace("fox", "cat"))                                 // near-reference
  )

  test("streaming admission matches batch scoring and drops gibberish") {
    val ref = (1L to 20L).map(i => (i + 100L, prose)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-lm").toString + "/model"
    Corpus.stageLmModel(ref, path)
    try {
      // the admission ceiling sits between the batch scores of prose and
      // gibberish — computed from the SAME staged model, proving parity
      val model = Corpus.loadLmModel(spark, path)
      val batchScores = Corpus.lmScoreBatch(
          arrivals.toDF("doc_id", "text"), model)
        .select($"doc_id", ($"nll_q6" / $"n_bigrams").cast("long").as("avg"))
        .as[(Long, Long)].collect().toMap
      assert(batchScores(1L) < batchScores(2L), s"prose must beat gibberish: $batchScores")
      val ceiling = (batchScores(1L) max batchScores(3L)) + 1L

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamScore.admit(
        in.toDF().toDF("doc_id", "text"), path, maxAvgNllQ6 = ceiling,
        sink = df => admitted.synchronized {
          admitted ++= df.select("doc_id").as[Long](implicitly).collect()
        },
        queryName = "lm_admit_test")
      try {
        in.addData(arrivals: _*)
        q.processAllAvailable()
        assert(admitted.toSet == Set(1L, 3L),
          s"prose admitted, gibberish rejected: ${admitted.toSet}")
      } finally q.stop()
    } finally Corpus.releaseLmModel(path)
  }

  test("DSIR streaming admission: staged ratio table, on-target docs pass") {
    val target = (1L to 20L).map(i => (i + 100L, prose)).toDF("doc_id", "text")
    val raw = Seq(
      (1L, prose),
      (2L, "buy cheap pills online now best casino bonus click here free spins"),
      (3L, prose.replace("fox", "cat"))
    )
    val path = java.nio.file.Files.createTempDirectory("graft-dsir").toString + "/model"
    Corpus.stageDsirModel(raw.toDF("doc_id", "text"), target, path)
    try {
      // streaming scores must equal the batch scorer over the same table
      val ratio = Corpus.loadDsirRatio(spark, path)
      val batchW = Corpus.dsirScoreBatch(raw.toDF("doc_id", "text"), ratio)
        .select($"doc_id", $"dsir_weight_q6").as[(Long, Long)].collect().toMap
      assert(batchW(1L) > batchW(2L) && batchW(3L) > batchW(2L),
        s"on-target docs must out-weigh spam: $batchW")
      val floor = batchW(2L) + 1L

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamScore.admitDsir(
        in.toDF().toDF("doc_id", "text"), path, minWeightQ6 = floor,
        sink = df => admitted.synchronized {
          admitted ++= df.select("doc_id").as[Long](implicitly).collect()
        },
        queryName = "dsir_admit_test")
      try {
        in.addData(raw: _*)
        q.processAllAvailable()
        assert(admitted.toSet == Set(1L, 3L),
          s"target-like docs admitted, spam rejected: ${admitted.toSet}")
      } finally q.stop()
    } finally StreamScore.releaseDsirModel(path)
  }

  test("Bloom streaming decontamination: staged filter, contaminated docs rejected") {
    val benchmark = (1L to 10L).map(i => (i + 100L, prose)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-bloom").toString + "/model"
    Corpus.stageBloomFilter(benchmark, path)
    try {
      // batch scores from the same staged filter prove streaming parity
      val model = Corpus.loadBloomFilter(spark, path)
      val batchScores = Corpus.bloomScoreBatch(arrivals.toDF("doc_id", "text"), model)
        .select($"doc_id", $"n_sh", $"n_hit_bloom")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(batchScores(1L)._2 == batchScores(1L)._1,
        s"verbatim benchmark copy: every shingle hits: $batchScores")
      assert(batchScores(2L)._2 == 0L, s"gibberish shares no shingle: $batchScores")

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      // ceiling 50%: the verbatim copy (100%) and the near-copy (most
      // shingles shared) must be rejected, the disjoint doc admitted
      val q = StreamScore.admitClean(
        in.toDF().toDF("doc_id", "text"), path, maxHitFracQ6 = 500000L,
        sink = df => admitted.synchronized {
          admitted ++= df.select("doc_id").as[Long](implicitly).collect()
        },
        queryName = "bloom_admit_test")
      try {
        in.addData(arrivals: _*)
        q.processAllAvailable()
        assert(admitted.toSet == Set(2L),
          s"only the benchmark-disjoint doc may pass: ${admitted.toSet}")
      } finally q.stop()
    } finally Corpus.releaseBloomFilter(path)
  }

  test("Bloom append: incremental filter is bit-identical to the full rebuild") {
    val a = (1L to 8L).map(i => (i, prose + " variant " + i)).toDF("doc_id", "text")
    val b = (9L to 12L).map(i =>
      (i, "entirely different reference material item " + i)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-inc").toString
    val incPath = dir + "/inc"
    val fullPath = dir + "/full"
    Corpus.stageBloomFilter(a, incPath)
    Corpus.appendToBloomFilter(b, incPath)
    Corpus.stageBloomFilter(a.unionByName(b), fullPath)
    try {
      val inc = Corpus.loadBloomFilter(spark, incPath)
      val full = Corpus.loadBloomFilter(spark, fullPath)
      assert(inc.kHash == full.kHash && inc.mBits == full.mBits &&
        inc.shingleN == full.shingleN, "append must preserve the filter params")
      val incBits = inc.bitmap.as[Seq[Long]](implicitly).head()
      val fullBits = full.bitmap.as[Seq[Long]](implicitly).head()
      assert(incBits == fullBits,
        "bit-OR append must equal the union rebuild word-for-word")
      // and the probe sees the appended material
      val probe = Corpus.bloomScoreBatch(
        Seq((99L, "entirely different reference material item 9")).toDF("doc_id", "text"),
        inc)
        .select($"n_sh", $"n_hit_bloom").as[(Long, Long)].head()
      assert(probe._2 == probe._1, s"appended docs must be probeable: $probe")
    } finally Corpus.releaseBloomFilter(incPath)
  }
}
