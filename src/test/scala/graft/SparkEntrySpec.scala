package graft

/** Driver-contract smoke checks: the flagship entry returns rows, every
  * registered query has either an oracle or a documented rows-only
  * rationale, and oracle keys never dangle. */
class SparkEntrySpec extends SparkSpec {

  test("entry (clean-corpus flagship) returns rows at sf0.001") {
    // release the Dedup caches the pipeline persists — this suite shares
    // the forked-JVM session with every other suite
    try assert(SparkEntry.entry(spark).count() > 0)
    finally graft.core.CacheRegistry.unpersistAll()
  }

  test("every oracleSql key is a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every registered query is DuckDB-oracled (no rows-only gates left)") {
    // every hash/LSH gate is oracle-portable arithmetic, and the stub
    // multimodal codecs are md5/byte-length arithmetic — so nothing is
    // exempt from the full rows+schema+hash gate
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: $rowsOnly")
  }
}
