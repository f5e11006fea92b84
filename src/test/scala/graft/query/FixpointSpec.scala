package graft.query

import graft.SparkSpec

class FixpointSpec extends SparkSpec {
  import spark.implicits._

  test("transitive closure of a chain") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = Fixpoint.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "c"), ("b", "d"), ("a", "d")))
  }

  test("closure terminates on cycles") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = Fixpoint.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")))
  }

  test("generic fixpoint: even reachability levels only") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val closure = Fixpoint.fixpoint(
      edges, d => d.as("d").join(edges.as("e"),
        org.apache.spark.sql.functions.col("d.dst") ===
          org.apache.spark.sql.functions.col("e.src"))
        .select(org.apache.spark.sql.functions.col("d.src").as("src"),
                org.apache.spark.sql.functions.col("e.dst").as("dst")),
      Seq("src", "dst"))
    assert(closure.count() === 6)
  }
}
