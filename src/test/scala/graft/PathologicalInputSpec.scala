package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Totality of the query surface on a PATHOLOGICAL (non-empty) dataset —
  * the degenerate shapes a 100 TB corpus is guaranteed to contain
  * somewhere: empty and whitespace-only documents, a corpus that is one
  * document repeated, all-zero and identical embeddings, an event stream
  * with zero variance and a single timestamp, single-row dimension tables.
  *
  * Empty input (EmptyInputTotalitySpec) catches head-of-empty and
  * VOID-literal bugs; THIS fixture catches the divide-by-zero family under
  * ANSI mode (stddev=0 z-scores, doc-length-0 ratios, single-point time
  * grids) and degenerate-model shapes (1 distinct vector for k centroids).
  * Same contract: clean result or a deliberate require — never an
  * internal error.
  */
class PathologicalInputSpec extends SparkSpec {

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft-patho-sf").toString
    val src = sf("sf0.001")

    // TPC-H side: single-row fact/dim slices (valid rows, minimal mass)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"))
      spark.read.parquet(s"$src/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    // documents: empty text, whitespace-only, one repeated doc, punctuation
    // soup with zero letters — every text-quality denominator goes to 0
    val doc0 = spark.read.parquet(s"$src/documents.parquet").limit(1)
      .select(col("doc_id"), col("lang"), col("source"))
    doc0.sparkSession.range(0, 8).toDF("i")
      .crossJoin(broadcast(doc0.drop("doc_id")))
      .select(
        col("i").as("doc_id"),
        when(col("i") === 0, lit(""))
          .when(col("i") === 1, lit("   \t  \n "))
          .when(col("i") === 2, lit("!!! ??? ... ,,,"))
          .otherwise(lit("the the the the the")).as("text"),
        col("lang"), col("source"),
        length(when(col("i") === 0, lit("")).otherwise(lit("x"))).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: an all-zeros vector plus one identical vector repeated —
    // zero norms, zero spread, 1 distinct point for any k
    val dim = 8
    spark.range(0, 6).toDF("vec_id")
      .select(col("vec_id"),
        when(col("vec_id") === 0,
          array_repeat(lit(0.0f), dim))
          .otherwise(array_repeat(lit(0.25f), dim)).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: one user, one instant, one constant value — zero variance,
    // zero time span
    Tables.events(spark, src).limit(1)
      .crossJoin(spark.range(0, 5).toDF("i"))
      .select(col("i").as("event_id"), col("ts"), lit(7L).as("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("every registered gate is total on degenerate non-empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch {
        case e @ (_: IllegalArgumentException | _: IllegalStateException) => None
        case e: Throwable =>
          Option(e.getCause) match {
            case Some(_: IllegalArgumentException) | Some(_: IllegalStateException) => None
            case _ => Some(s"$name → ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ").take(200))
          }
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} gates die on degenerate input with internal errors:\n" +
        failures.mkString("\n"))
  }
}
