package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The stale-model guard: ModelCache keys built with [[ModelCache.dirKey]]
  * must change when the data under the directory changes in place —
  * otherwise consumers silently serve centroids/weights trained on rows
  * that no longer exist (the round-8 ADVICE finding). Pure filesystem
  * test, no Spark session. */
class ModelCacheSpec extends AnyFunSuite {

  test("dirKey: stable for unchanged content, changes on regeneration, order-independent") {
    val dir = Files.createTempDirectory("modelcache").toString
    Files.write(java.nio.file.Paths.get(dir, "a.parquet"), "aaaa".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "b.parquet"), "bb".getBytes)
    val k1 = ModelCache.dirKey(dir)
    val k2 = ModelCache.dirKey(dir)
    assert(k1 == k2, "same content must key identically")
    assert(k1.startsWith(dir + "@") && k1.contains("2:6:"), s"count:bytes visible: $k1")

    // regenerate in place: same file NAME, different length → new key
    Files.write(java.nio.file.Paths.get(dir, "a.parquet"), "aaaaaaaa".getBytes)
    val k3 = ModelCache.dirKey(dir)
    assert(k3 != k1, "in-place regeneration must invalidate")

    // a new file invalidates too
    Files.write(java.nio.file.Paths.get(dir, "c.parquet"), "c".getBytes)
    assert(ModelCache.dirKey(dir) != k3)

    // absent dir is a distinct, stable sentinel
    assert(ModelCache.dirKey(dir + "-missing").endsWith("@absent"))
  }

  test("getOrTrain: trains once per key, retrains under a new dirKey") {
    ModelCache.clear()
    val dir = Files.createTempDirectory("modelcache-train").toString
    Files.write(java.nio.file.Paths.get(dir, "data"), "v1".getBytes)
    var trained = 0
    def model(): String =
      ModelCache.getOrTrain(ModelCache.key("m", ModelCache.dirKey(dir), 7)) {
        trained += 1; s"model-$trained"
      }
    assert(model() == "model-1" && model() == "model-1" && trained == 1,
      "second consumer shares the artifact")
    // regenerate the data: mtime granularity can be coarse, so change length
    Files.write(java.nio.file.Paths.get(dir, "data"), "v2-longer".getBytes)
    assert(model() == "model-2" && trained == 2,
      "regenerated input must retrain, not serve the stale model")
  }
}
