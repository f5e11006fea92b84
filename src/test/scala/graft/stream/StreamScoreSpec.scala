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
}
