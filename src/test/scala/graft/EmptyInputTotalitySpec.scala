package graft

import java.nio.file.Files

import graft.core.Tables

/** Totality of the whole query surface on an EMPTY dataset.
  *
  * At corpus scale, empty inputs are routine — a partition filter that
  * matches nothing, a tenant with no documents yet, a decontamination
  * reference that's empty on the first run. A gate that dies on zero rows
  * with an internal error (ANSI DIVIDE_BY_ZERO from a count()-denominator,
  * `.head` on an empty frame, max(NULL) NPE downstream) is a production
  * incident; a gate that REQUIREs non-empty input must say so in a
  * deliberate, readable message.
  *
  * Contract pinned here, for every one of the 112 registered gates: on a
  * fixture directory whose tables all have zero rows, the gate either
  *   (a) returns (possibly zero rows) — the preferred shape, or
  *   (b) throws IllegalArgumentException/IllegalStateException with a
  *       message naming the gate's requirement (a deliberate `require`,
  *       e.g. pageRank's "empty graph") —
  * and NEVER an internal SparkException / ArithmeticException / NPE /
  * NoSuchElementException.
  */
class EmptyInputTotalitySpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty-sf").toString
    val src = sf("sf0.001")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    // events: write the NORMALIZED encoding (plain TIMESTAMP) — Tables.events
    // dispatches on the observed schema, so the empty fixture exercises the
    // TimestampType branch directly
    Tables.events(spark, src).limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every registered gate is total on zero-row tables (clean result or deliberate require)") {
    val outcomes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      val r = try {
        q(spark, emptyDir).collect()
        Right("ok")
      } catch {
        case e @ (_: IllegalArgumentException | _: IllegalStateException) =>
          Right(s"require: ${Option(e.getMessage).getOrElse("").linesIterator.next()}")
        case e: Throwable =>
          // unwrap one layer: Spark wraps task failures
          val cause = Option(e.getCause).getOrElse(e)
          cause match {
            case c @ (_: IllegalArgumentException | _: IllegalStateException) =>
              Right(s"require: ${Option(c.getMessage).getOrElse("").linesIterator.next()}")
            case _ => Left(s"$name → ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ").take(200))
          }
      }
      (name, r)
    }
    val failures = outcomes.collect { case (_, Left(msg)) => msg }
    assert(failures.isEmpty,
      s"\n${failures.size} gates die on empty input with internal errors:\n" +
        failures.mkString("\n"))
  }
}
