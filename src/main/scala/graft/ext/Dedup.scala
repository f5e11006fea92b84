package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deduplication operators for LLM training-data pipelines (north-star
  * extension, BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale design: every near-dup path is LSH-style — candidate generation is
  * a band/bucket equi-join (shuffle on a small hash key, never an O(n²)
  * cross join); exact pair verification only runs inside buckets.
  * Signatures (shingles, minhash, simhash) are native Catalyst expressions
  * (graft.functions.TextHashExpressions): one tight loop per document
  * inside whole-stage codegen — no UDFs, no driver-side loops.
  */
object Dedup {

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup: keep the lowest-id document per identical text.
    * (hash-groupBy: one shuffle on the text hash). */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** SparkEntry query: survivors per language after exact text dedup. */
  def dedupExactQuery(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min_by(col("lang"), col("doc_id")).as("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))

  // --------------------------------------------------------------- MinHash

  /** MinHash signature: numPerm independent min-hashes over word shingles.
    * Permutation i is murmur3(shingle, seed=i); shingling + signature are
    * single-pass native expressions. */
  def minhashSignature(text: Column, shingleN: Int = 3,
                       numPerm: Int = 64): Column = {
    val sh = graft.functions.TextHashExpressions.word_shingles(TextOps.tokens(text), shingleN)
    graft.functions.TextHashExpressions.minhash_sig(sh, numPerm)
  }

  /** LSH banding: split the signature into `bands` bands of `rows` hashes;
    * each band hashes to a bucket key. Docs sharing ANY band bucket are
    * candidate near-dups. Returns (id, band, bucket). */
  def minhashBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(b, concat_ws(",",
        transform(slice(sig, b * rows + 1, lit(rows)), _.cast("string")))).as("bucket")))

  /** Candidate pairs via LSH buckets, verified by true shingle-set Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold. */
  def minhashNearDups(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", shingleN: Int = 3,
                      numPerm: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    val rows = numPerm / bands
    // persist() is load-bearing twice over: (a) the self-join below would
    // otherwise compute every signature on BOTH sides; (b) it blocks
    // CollapseProject from inlining the signature expression into the
    // per-band slice (which would re-run it per band). At warehouse scale
    // this materialization is the signature table you'd write to storage.
    val withSh = docs.select(
      col(idCol).as("id"),
      graft.functions.TextHashExpressions.word_shingles(
        TextOps.tokens(col(textCol)), shingleN).as("sh"))
      .persist()
    val withSig = docs.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), shingleN, numPerm).as("sig"))
      .persist()
    // buckets carry only (id, band, bucket) — the shingle arrays are joined
    // back in AFTER candidate dedup so the band-explode shuffle stays thin.
    val buckets = withSig
      .select(col("id"), explode(minhashBands(col("sig"), bands, rows)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    pairs
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", // |A∪B| = |A|+|B|−|A∩B| — avoids the costlier array_union
        col("__i") / (size(col("sh_a")) + size(col("sh_b")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SparkEntry query (rows-only): MinHash near-dup pairs at jaccard>=0.5. */
  def minhashQuery(s: SparkSession, d: String): DataFrame =
    minhashNearDups(Tables.documents(s, d), threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over tokens: per-bit majority vote of xxhash64(token);
    * fingerprint bit b set iff the vote count is positive (native
    * single-pass expression). */
  def simhash(text: Column): Column =
    graft.functions.TextHashExpressions.simhash64(TextOps.tokens(text))

  /** SimHash near-dups: LSH on 4×16-bit chunks (two docs within Hamming
    * distance ≤ 3 of each other on 64 bits must share at least one exact
    * 16-bit chunk — pigeonhole), verified by true Hamming distance. */
  def simhashNearDups(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    // persist: self-joined below, and chunk extraction must read the stored
    // fingerprint rather than re-inline the simhash expression per chunk.
    val withFp = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
      .persist()
    val chunks = withFp.select(col("id"), col("fp"),
        explode(transform(sequence(lit(0), lit(3)),
          c => struct(c.as("chunk"),
            call_function("shiftright", col("fp"), c * 16)
              .bitwiseAND(0xFFFFL).as("key")))).as("ck"))
      .select(col("id"), col("fp"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before the dedup shuffle
      .dropDuplicates("id_a", "id_b")
  }

  /** SparkEntry query (rows-only): SimHash near-dup pairs at Hamming ≤ 3 —
    * the regime where the 4-chunk LSH guarantees full recall (pigeonhole:
    * ≤3 flipped bits leave at least one 16-bit chunk intact). */
  def simhashQuery(s: SparkSession, d: String): DataFrame =
    simhashNearDups(Tables.documents(s, d), maxHamming = 3)

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs above a threshold, with cheap LSH-free
    * pruning: candidate pairs must share at least one rare shingle (the
    * shingle inverted index is the join key — same pattern as plagiarism
    * detectors). `maxDf` bounds the posting-list length so a stop-shingle
    * never produces a quadratic bucket. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleN: Int = 3,
                        threshold: Double = 0.5, maxDf: Int = 10,
                        minCommon: Int = 2): DataFrame = {
    val withSh = docs.select(col(idCol).as("id"),
      graft.functions.TextHashExpressions.word_shingles(
        TextOps.tokens(col(textCol)), shingleN).as("sh"))
      .persist()
    val posting = withSh.select(col("id"), explode(col("sh")).as("shingle"))
    val rare = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    val pruned = posting.join(rare, Seq("shingle"), "left_semi")
    // Candidate pairs ranked by how many rare shingles they share: a true
    // near-dup shares many, an incidental vocabulary collision shares one
    // or two — requiring `minCommon` slashes the verify-join fan-in without
    // touching recall at any meaningful threshold (a pair at jaccard ≥ 0.5
    // over ≥ (2·minCommon/(1-maxDf/n))-shingle docs shares far more).
    val cand = pruned.as("a").join(pruned.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .select("id_a", "id_b")
    cand
      .join(withSh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(withSh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", // |A∪B| = |A|+|B|−|A∩B| — avoids the costlier array_union
        col("__i") / (size(col("sh_a")) + size(col("sh_b")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SparkEntry query (rows-only): exact 3-gram Jaccard dup pairs ≥ 0.5. */
  def ngramJaccardQuery(s: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(Tables.documents(s, d))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-dup pairs: bucket by SRP (signed random
    * projection) sign bits — cosine-similar vectors collide — then verify
    * exact cosine within buckets. Projection vectors are deterministic
    * (hash-derived), so results are reproducible. */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.95,
                        nBits: Int = 8): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // srp bit b: sign of Σ_i v[i] * r(b,i), r = deterministic ±1 from hash
    val bits = transform(sequence(lit(0), lit(nBits - 1)), b =>
      when(aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => x * when(pmod(hash(b, i), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x) > 0, 1).otherwise(0))
    val bucketed = v.withColumn("bucket",
      aggregate(bits, lit(0), (acc, x) => acc * 2 + x))
      .persist()
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact all-pairs cosine ≥ threshold (the verification baseline the LSH
    * path is measured against; fine up to ~10⁵ vectors, after which
    * `embeddingNearDups`' SRP bucketing is the scale path). */
  def embeddingExactPairs(emb: DataFrame, threshold: Double): DataFrame = {
    // pre-normalize once (persisted; both join sides reuse), so each of the
    // O(n²) pairs costs exactly one codegen'd dot product
    val v = Similarity.normalized(
        emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")))
      .withColumnRenamed("embedding", "v")
      .persist()
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.dot(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SparkEntry query (DuckDB-oracled): exact embedding-similarity pairs at
    * cosine ≥ 0.4 (the fixture vectors' top-pair range — near-dup semantics
    * with a data-appropriate threshold). */
  def embeddingDedupQuery(s: SparkSession, d: String): DataFrame =
    embeddingExactPairs(Tables.embeddings(s, d), threshold = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
}
