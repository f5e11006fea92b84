package graft.api

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.{GraftApp, SparkSpec}
import graft.registry.FunctionRegistry
import graft.stream.MemoryIO

/** F3 end-to-end: collectors deployed through the management railway become
  * live HTTP endpoints (ingest → store, push → stream node, GET → Datalog),
  * hot-swap atomically, enforce duplicate-path rejection, and re-deploy on
  * cold restart (T19) — the reference's collector lifecycle
  * (`/root/reference/src/dataworks/collector.clj`) minus the eval. */
class CollectorServerSpec extends SparkSpec {

  private def http(method: String, url: String, body: Option[String] = None): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, text)
  }

  test("collector lifecycle: deploy → ingest → query → swap → delete → reboot") {
    val db = Files.createTempDirectory("graft-collector").toString + "/db"
    val io = new MemoryIO(spark)
    val app = GraftApp(spark, db, io, new FunctionRegistry).start()
    try {
      // create through the management plane: persisted + routed
      assert(app.functions.create("collector", "add-user",
        """{"name":"add-user","path":"/app/add-user",
           "handler":{"kind":"ingest","idField":"user_id"}}"""
          .replaceAll("\n\\s*", "")).isRight)
      val base = s"http://localhost:${app.collectors.port}"

      // ingest: POST a JSON doc → bitemporal put under the body's id field
      val (c1, _) = http("POST", s"$base/app/add-user",
        Some("""{"user_id":"u1","name":"ada","karma":7}"""))
      assert(c1 == 201)
      assert(app.store.entity("u1").exists(_.contains("\"ada\"")))

      // malformed body → 400, nothing stored
      assert(http("POST", s"$base/app/add-user", Some("""{"nope":1}"""))._1 == 400)
      // wrong method → 405; unknown path → 404
      assert(http("GET", s"$base/app/add-user")._1 == 405)
      assert(http("GET", s"$base/no/such")._1 == 404)

      // duplicate path under a DIFFERENT name is rejected by the railway
      // (no audit row written — entity absent)
      assert(app.functions.create("collector", "other",
        """{"name":"other","path":"/app/add-user","handler":{"kind":"ingest","idField":"x"}}""").isLeft)
      assert(app.store.entity(":collector/other").isEmpty)

      // query collector: EDN Datalog over the store's live snapshot
      http("POST", s"$base/app/add-user", Some("""{"user_id":"u2","name":"bob","karma":3}"""))
      assert(app.functions.create("collector", "users",
        """{"name":"users","path":"/app/users",
           "handler":{"kind":"query",
                      "edn":"{:find [?n ?k] :where [[?e :name ?n] [?e :karma ?k]]}",
                      "fields":{"name":"string","karma":"long"}}}"""
          .replaceAll("\n\\s*", "")).isRight)
      val (qc, qbody) = http("GET", s"$base/app/users")
      assert(qc == 200)
      assert(qbody.contains("\"ada\"") && qbody.contains("\"bob\""))

      // stream-push collector feeds a topology node (T16 through HTTP)
      assert(app.functions.create("stream", "events-in",
        """{"name":"kafka/events-in"}""").isRight)
      assert(app.functions.create("stream", "events-out",
        """{"name":"kafka/events-out","upstream":["kafka/events-in"]}""").isRight)
      assert(app.functions.create("collector", "track",
        """{"name":"track","path":"/app/track","handler":{"kind":"stream","node":"kafka/events-in"}}""").isRight)
      assert(http("POST", s"$base/app/track", Some("""{"event":"click"}"""))._1 == 202)
      // the freshly-created sink may still be starting on another thread
      // when processAllAvailable snapshots the running queries — poll
      // (observed flaking under full-suite load, passes in isolation)
      val streamDeadline = System.currentTimeMillis() + 30000
      def clicked() = io.collected("events-out")
        .exists(_.getAs[String]("value").contains("click"))
      while (!clicked() && System.currentTimeMillis() < streamDeadline) {
        app.streams.processAllAvailable()
        Thread.sleep(200)
      }
      assert(clicked(), "pushed event must reach the downstream topic")

      // transact collector: POST args → fire-and-forget registered transactor
      val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      app.registry.registerTransactor("notify", args => { sent.add(args.mkString("|")); () })
      assert(app.functions.create("collector", "notify",
        """{"name":"notify","path":"/app/notify","handler":{"kind":"transact","transactor":"notify"}}""").isRight)
      assert(http("POST", s"$base/app/notify",
        Some("""{"args":["u1","hello there"]}"""))._1 == 202)
      val deadline = System.currentTimeMillis() + 10000
      while (sent.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(sent.contains("u1|hello there"), s"transactor must run async: $sent")
      // unknown transactor name → 404 at request time
      assert(app.functions.create("collector", "ghost",
        """{"name":"ghost","path":"/app/ghost","handler":{"kind":"transact","transactor":"nope"}}""").isRight)
      assert(http("POST", s"$base/app/ghost", Some("""{"args":[]}"""))._1 == 404)

      // hot-swap: update moves the route; old path 404s, new path serves
      assert(app.functions.update("collector", "add-user",
        """{"name":"add-user","path":"/app/v2/add-user","handler":{"kind":"ingest","idField":"user_id"}}""").isRight)
      assert(http("POST", s"$base/app/add-user", Some("""{"user_id":"u3"}"""))._1 == 404)
      assert(http("POST", s"$base/app/v2/add-user", Some("""{"user_id":"u3"}"""))._1 == 201)

      // invalid specs rejected by the parse railway
      assert(app.functions.create("collector", "bad1",
        """{"name":"bad1","path":"nope","handler":{"kind":"ingest","idField":"x"}}""").isLeft)
      assert(app.functions.create("collector", "bad2",
        """{"name":"bad2","path":"/b2","handler":{"kind":"wat"}}""").isLeft)

      // delete: route removed, doc tombstoned
      assert(app.functions.delete("collector", "track").isRight)
      assert(http("POST", s"$base/app/track", Some("{}"))._1 == 404)

      app.stop()

      // cold restart: persisted collectors re-route (T19); the tombstoned
      // one stays gone; latest version (the moved path) wins
      val app2 = GraftApp(spark, db, io, new FunctionRegistry).start()
      try {
        val base2 = s"http://localhost:${app2.collectors.port}"
        assert(http("POST", s"$base2/app/v2/add-user",
          Some("""{"user_id":"u4"}"""))._1 == 201)
        assert(app2.collectors.deployed.keySet ==
          Set("/app/v2/add-user", "/app/users", "/app/notify", "/app/ghost"))
      } finally app2.stop()
    } finally app.stop()
  }

  test("hardening: reserved ids, body cap, query row cap, atomic path claim") {
    val db = Files.createTempDirectory("graft-collector-hard").toString + "/db"
    val io = new MemoryIO(spark)
    val registry = new FunctionRegistry
    val store = graft.store.DocumentStore(spark, db)
    val streams = new graft.stream.StreamManager(new graft.stream.Topology(io, registry))
    val srv = new CollectorServer(store, streams,
      maxBodyBytes = 256, maxQueryRows = 2)
    try {
      assert(srv.deploy(CollectorSpec("add", "/add",
        CollectorHandler.Ingest("user_id"))).isRight)
      val base = s"http://localhost:${srv.port}"

      // ':'-prefixed ids are the stored-function namespace: an ingest body
      // must NOT be able to overwrite ':collector/…'/':stream/…' docs that
      // bootstrap activates on restart (ADVICE r7, medium)
      val (rc, rbody) = http("POST", s"$base/add",
        Some("""{"user_id":":stream/evil","x":1}"""))
      assert(rc == 400 && rbody.contains("reserved"))
      assert(store.entity(":stream/evil").isEmpty)
      // plain ids still land
      assert(http("POST", s"$base/add", Some("""{"user_id":"ok1","karma":1}"""))._1 == 201)

      // oversized body → typed 413, nothing stored
      val big = s"""{"user_id":"big","pad":"${"x" * 300}"}"""
      assert(http("POST", s"$base/add", Some(big))._1 == 413)
      assert(store.entity("big").isEmpty)

      // query result above maxQueryRows → 413, not an unbounded collect
      http("POST", s"$base/add", Some("""{"user_id":"ok2","karma":2}"""))
      http("POST", s"$base/add", Some("""{"user_id":"ok3","karma":3}"""))
      assert(srv.deploy(CollectorSpec("q", "/q", CollectorHandler.Query(
        "{:find [?k] :where [[?e :karma ?k]]}", Seq("karma" -> "long")))).isRight)
      val (qc, qbody) = http("GET", s"$base/q")
      assert(qc == 413 && qbody.contains("maxRows"), s"got $qc $qbody")

      // crux :timeout through the REST face: a generous budget answers
      // (the eager-materialize path), an elapsed one is a clean 400 with
      // the timeout diagnosis — never a 500/hung handler
      assert(srv.deploy(CollectorSpec("qt", "/qt", CollectorHandler.Query(
        "{:find [?k] :where [[?e :karma ?k] [(> ?k 2)]] :timeout 300000}",
        Seq("karma" -> "long")))).isRight)
      val (tc, tbody) = http("GET", s"$base/qt")
      assert(tc == 200 && tbody.contains("3"), s"got $tc $tbody")
      assert(srv.deploy(CollectorSpec("qt0", "/qt0", CollectorHandler.Query(
        "{:find [?k] :where [[?e :karma ?k]] :timeout 1}",
        Seq("karma" -> "long")))).isRight)
      val (t0c, t0body) = http("GET", s"$base/qt0")
      assert(t0c == 400 && t0body.contains("timed out"), s"got $t0c $t0body")

      // atomic path claim: concurrent deploys of DIFFERENT names to the
      // same path — exactly one side may win each round (the check-then-put
      // race would let both return Right and silently unroute the loser)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        for (round <- 1 to 50) {
          val path = s"/race$round"
          val gate = new java.util.concurrent.CyclicBarrier(2)
          def attempt(n: String) = pool.submit { () =>
            gate.await()
            srv.deploy(CollectorSpec(n, path, CollectorHandler.Ingest("id")))
          }
          val (ra, rb) = (attempt("alpha"), attempt("beta"))
          val results = Seq(ra.get(), rb.get())
          assert(results.count(_.isRight) == 1,
            s"round $round: exactly one deploy may claim $path, got $results")
          val winner = results.collectFirst { case Right(s) => s.name }.get
          assert(srv.deployed(path).name == winner)
        }
        // SAME-name deploys racing to DIFFERENT paths (concurrent updates
        // of one collector): whatever interleaving, the collector must end
        // with exactly ONE live route — the unserialized sweep let each
        // removeIf the other's fresh route, leaving zero
        for (round <- 1 to 50) {
          val gate = new java.util.concurrent.CyclicBarrier(2)
          def attempt(path: String) = pool.submit { () =>
            gate.await()
            srv.deploy(CollectorSpec("mover", s"/m$round$path", CollectorHandler.Ingest("id")))
          }
          val (ra, rb) = (attempt("/a"), attempt("/b"))
          ra.get(); rb.get()
          val live = srv.deployed.values.count(_.name == "mover")
          assert(live == 1,
            s"round $round: same-name race left $live routes for 'mover'")
        }
      } finally pool.shutdownNow()
    } finally { srv.stop(); streams.stopAll() }
  }

  test("response-layer hardening: HEAD, push 404, transact arg totality (review r11)") {
    val db = Files.createTempDirectory("graft-collector-resp").toString + "/db"
    val io = new MemoryIO(spark)
    val registry = new FunctionRegistry
    val store = graft.store.DocumentStore(spark, db)
    val streams = new graft.stream.StreamManager(
      new graft.stream.Topology(io, registry))
    val srv = new CollectorServer(store, streams)
    try {
      assert(srv.deploy(CollectorSpec("add", "/add",
        CollectorHandler.Ingest("user_id"))).isRight)
      val base = s"http://localhost:${srv.port}"

      // HEAD: previously cascaded into a double-respond 500 that escaped
      // the dispatcher and tore the connection — now headers-only 405
      val (hc, _) = http("HEAD", s"$base/add")
      assert(hc == 405, s"HEAD must answer cleanly, got $hc")
      // the server must still be serving afterwards
      assert(http("POST", s"$base/add", Some("""{"user_id":"u1"}"""))._1 == 201)

      // push to a NONEXISTENT stream node: 404, not a 202 that silently
      // drops the data into an orphan MemoryStream
      assert(srv.deploy(CollectorSpec("pusher", "/push",
        CollectorHandler.StreamPush("kafka/nope"))).isRight)
      val (pc, pbody) = http("POST", s"$base/push", Some("x"))
      assert(pc == 404 && pbody.contains("kafka/nope"), s"got $pc $pbody")

      // transact: boolean args keep their POSITION (were silently dropped,
      // shifting later args); non-scalar args are a 400, not a silent skip
      val sent = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      registry.registerTransactor("t", args => { sent.add(args.mkString("|")); () })
      assert(srv.deploy(CollectorSpec("t", "/t",
        CollectorHandler.Transact("t"))).isRight)
      assert(http("POST", s"$base/t",
        Some("""{"args":["refund",true,"user7"]}"""))._1 == 202)
      val deadline = System.currentTimeMillis() + 5000
      while (!sent.contains("refund|true|user7") && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(sent.contains("refund|true|user7"), s"boolean arg must keep its position: $sent")
      val (tc, tbody) = http("POST", s"$base/t", Some("""{"args":[{"nested":1}]}"""))
      assert(tc == 400 && tbody.contains("scalars"), s"got $tc $tbody")
      val (ac, _) = http("POST", s"$base/t", Some("""{"args":"oops"}"""))
      assert(ac == 400, s"non-array args must 400, got $ac")
      // absent args = no-arg invocation, still accepted
      assert(http("POST", s"$base/t", Some("""{}"""))._1 == 202)
    } finally { srv.stop(); streams.stopAll() }
  }
}
