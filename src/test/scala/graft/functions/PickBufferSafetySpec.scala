package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Buffer-retention safety for the bounded pick aggregates: the
  * TypedImperativeAggregate contract says input rows MAY be reused, so a
  * value returned by eval() (an UnsafeArrayData / struct view into the
  * row's bytes) must be deep-copied before the buffer keeps it — a
  * retained view silently mutates into later rows' bytes (review r11;
  * fixed via InternalRow.copyValue). Whether the hazard manifests depends
  * on the exec's row-recycling internals, so these tests are the
  * contract's regression guard: shuffled non-atomic inputs, every pick
  * asserted bit-identical to a real input value. */
class PickBufferSafetySpec extends SparkSpec {
  import spark.implicits._

  test("sample/rand picks over an ARRAY column return real inputs, not mutated views") {
    // distinct arrays per row; groupBy forces an aggregation exec whose
    // input rows are reused UnsafeRows
    // repartition: the SHUFFLE READER deserializes into a reused row
    // buffer, which is what turns a retained view into corruption (a
    // LocalTableScan's materialized rows would mask the bug)
    val df = (1 to 500).map(i => (i % 7, Seq(i.toLong, i * 2L, i * 3L)))
      .toDF("g", "xs").repartition(4)
    val inputs = (1 to 500).map(i => List(i.toLong, i * 2L, i * 3L)).toSet
    val sampled = df.groupBy("g")
      .agg(PickExpressions.sample_picks(col("xs"), 3).as("picks"))
      .collect()
      .flatMap(_.getSeq[scala.collection.Seq[Long]](1).map(_.toList))
    assert(sampled.nonEmpty)
    sampled.foreach(p => assert(inputs.contains(p),
      s"pick $p is not an input value — a retained buffer view mutated"))
    val rand = df.groupBy("g")
      .agg(PickExpressions.rand_picks(col("xs"), 2).as("picks"))
      .collect()
      .flatMap(_.getSeq[scala.collection.Seq[Long]](1).map(_.toList))
    rand.foreach(p => assert(inputs.contains(p),
      s"rand pick $p is not an input value — a retained buffer view mutated"))
  }

  test("picks over a STRUCT column survive row-buffer reuse too") {
    val df = (1 to 300).map(i => (i % 5, (i.toLong, s"v$i"))).toDF("g", "s")
      .repartition(4)
    val inputs = (1 to 300).map(i => (i.toLong, s"v$i")).toSet
    val picked = df.groupBy("g")
      .agg(PickExpressions.sample_picks(col("s"), 2).as("picks"))
      .collect()
      .flatMap(_.getSeq[org.apache.spark.sql.Row](1))
      .map(r => (r.getLong(0), r.getString(1)))
    picked.foreach(p => assert(inputs.contains(p),
      s"struct pick $p is not an input value"))
  }
}
