package graft

import java.nio.file.Files

import graft.registry.FunctionRegistry
import graft.stream.MemoryIO

/** End-to-end boot: create a stream function through the management
  * railway, restart the app from the persisted store, and verify the
  * rebooted topology processes live traffic — the reference's deploy/
  * restart lifecycle in one test. */
class GraftAppSpec extends SparkSpec {

  test("boot → create stream fn → process → restart → still processing") {
    val db = Files.createTempDirectory("graft-app").toString + "/db"
    val io = new MemoryIO(spark)
    val app = GraftApp(spark, db, io, new FunctionRegistry).start()
    try {
      // deploy the README pipeline through the management plane (F5 railway)
      assert(app.functions.create("stream", "input",
        """{"name":"kafka/input"}""").isRight)
      assert(app.functions.create("stream", "process",
        """{"name":"stream/process","upstream":["kafka/input"],
           "transducer":{"map":"TRY_CAST(value AS DOUBLE) + 1"},"buffer":100}"""
          .replaceAll("\n\\s*", "")).isRight)
      assert(app.functions.create("stream", "output",
        """{"name":"kafka/output","upstream":["stream/process"]}""").isRight)
      io.publish("kafka/input", "k1", "41")
      app.streams.processAllAvailable()
      assert(io.collected("output").map(_.getAs[Double]("value")) == Seq(42.0))
      app.stop()

      // cold restart: a NEW app over the same store re-wires everything
      val app2 = GraftApp(spark, db, io, new FunctionRegistry).start()
      try {
        assert(app2.topology.nodes.keySet ==
          Set("kafka/input", "stream/process", "kafka/output"),
          "persisted functions must re-wire on boot (T19)")
        io.publish("kafka/input", "k2", "9")
        app2.streams.processAllAvailable()
        assert(io.collected("output").map(_.getAs[Double]("value")).sorted ==
          Seq(10.0, 42.0), "rebooted topology processes new traffic, no reprocessing")
      } finally app2.stop()
    } finally app.stop()
  }
}
