package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Third totality axis: NULLS everywhere the schema allows them.
  *
  * The shipped fixtures are fully populated, so no gate has ever seen a
  * null text, a null embedding, a null event timestamp or a null join
  * key — yet at corpus scale upstream extract jobs emit all of those
  * routinely. SQL semantics make most of this safe by construction
  * (null-safe expression plumbing, joins dropping null keys, aggregates
  * skipping nulls); what this sweep catches is the code that steps
  * OUTSIDE those semantics: `.getString` on a null field in a collected
  * row, UDF bodies assuming non-null, store ingest paths building ids
  * from null columns.
  *
  * Fixture: sf0.001 slices with every non-key column nulled on a
  * deterministic ~1/3 of rows (key/first columns kept so gates with
  * non-empty requirements still have mass). Contract as in
  * EmptyInputTotalitySpec / PathologicalInputSpec: clean result or a
  * deliberate require — never an internal error.
  */
class NullInjectionSpec extends SparkSpec {

  /** Null out every column except `keep` on rows where a hash of the
    * (untouched) first column lands in bucket 0 of 3 — deterministic,
    * column-dependent, so different columns go null on different rows. */
  private def nullify(df: DataFrame, keep: Set[String]): DataFrame = {
    val idc = df.columns.head
    df.columns.foldLeft(df) { (d, c) =>
      if (keep(c) || c == idc) d
      else d.withColumn(c,
        when(pmod(hash(col(idc), lit(c)), lit(3)) === 0,
          lit(null).cast(d.schema(c).dataType)).otherwise(col(c)))
    }
  }

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft-nulls-sf").toString
    val src = sf("sf0.001")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      nullify(spark.read.parquet(s"$src/$t.parquet").limit(60), Set.empty)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    nullify(Tables.events(spark, src).limit(60), Set.empty)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("every registered gate is total on null-riddled tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch {
        case _: IllegalArgumentException | _: IllegalStateException => None
        case e: Throwable =>
          Option(e.getCause) match {
            case Some(_: IllegalArgumentException) | Some(_: IllegalStateException) => None
            case _ => Some(s"$name → ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ").take(200))
          }
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} gates die on null-riddled input with internal errors:\n" +
        failures.mkString("\n"))
  }
}
