package graft.api

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.sql.Timestamp

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.{GraftApp, SparkSpec}
import graft.query.Functions
import graft.registry.FunctionRegistry
import graft.stream.MemoryIO

/** The reference's demo app (`/root/reference/doc/demo-app-1.org`) run
  * end-to-end on this engine: a `demo-app` collector accepts app events,
  * builds a `:app/log` document via the consume-time coercion matrix,
  * schedules a `:app/alert` at a FUTURE valid time (or never), and the
  * alert scheduler fires the registered `text-alert` transactor when the
  * alert becomes visible — the full collector → bitemporal store →
  * scheduler → transactor loop that is the reference's reason to exist.
  * The demo's one eval'd s-expression becomes a precompiled registry
  * handler (the no-eval stance); everything else is behavior-for-behavior. */
class DemoAppSpec extends SparkSpec {

  private implicit val fmts: Formats = DefaultFormats

  private def post(url: String, body: String): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(UTF_8))
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, text)
  }

  test("demo-app: event POST → log + scheduled alert → transactor text") {
    val db = Files.createTempDirectory("graft-demo").toString + "/db"
    val io = new MemoryIO(spark)
    val app = GraftApp(spark, db, io, new FunctionRegistry).start()
    try {
      // the demo's Twilio transactor, minus Twilio: record the "texts"
      val texts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      app.registry.registerTransactor("text-alert",
        args => { texts.add(args.mkString(" ")); () })

      // the demo collector's response fn (demo-app-1.org "Our collector"),
      // as a precompiled handler: body {app, event, details?, next-event?}
      // → log doc now + alert doc at consume-time(next-event) (default:
      // top of the NEXT hour via the ":hours" keyword arm), skipping the
      // alert entirely for :never — the reference's exact branching.
      app.registry.registerHttpHandler("demo-app", body => {
        val j = JsonMethods.parse(body)
        val appName = (j \ "app").extract[String]
        val now = app.store.now().toInstant
        val nextRaw: Any = (j \ "next-event") match {
          case JString(s) => s
          case JInt(i) => i.toLong
          case _ => ":hours" // demo default: top of the (next) hour
        }
        val next = Functions.consumeTime(nextRaw, now)
          .getOrElse(Functions.consumeTime(":hours", now).get)
        val log = JObject(
          "logEvent" -> (j \ "event"),
          "logTime" -> JString(now.toString),
          "appName" -> JString(appName),
          "appAlert" -> JString(s":$appName/alert")) merge
          ((j \ "details") match {
            case JNothing => JObject()
            case d => JObject("logDetails" -> d)
          })
        app.store.put(s":$appName/log", JsonMethods.compact(JsonMethods.render(log)))
        if (next != Functions.Never) {
          val alert = JObject("appName" -> JString(appName),
            "alertHandler" -> JString("text-alert"),
            "alertParams" -> JArray(List(JString(appName), JString("is waiting"))))
          app.store.put(s":$appName/alert",
            JsonMethods.compact(JsonMethods.render(alert)),
            validFrom = Some(Timestamp.from(next)))
        }
        (200, JsonMethods.compact(JsonMethods.render(log)))
      })

      // deploy the endpoint through the management plane — path + name,
      // exactly the demo's create-collector call
      assert(app.functions.create("collector", "demo-app",
        """{"name":"demo-app","path":"/app/demo-app","handler":{"kind":"named","fn":"demo-app"}}""").isRight)
      val base = s"http://localhost:${app.collectors.port}"

      // 3s-from-now event: the log doc is visible NOW, the alert is not
      // (a future valid time large enough to observe invisibility, small
      // enough that the running 1 s poll loop fires it within the test)
      val (c1, resp) = post(s"$base/app/demo-app",
        """{"app":"frobnicator","event":"started","details":"cold boot","next-event":3000}""")
      assert(c1 == 200 && resp.contains("cold boot"))
      assert(app.store.entity(":frobnicator/log").exists(_.contains("started")),
        "log doc must be visible immediately")
      assert(app.store.entity(":frobnicator/alert").isEmpty,
        "future-valid-time alert must NOT be visible yet (S2)")

      // the alert becomes visible when its valid time arrives; the app's
      // own scheduler (1 s poll, the reference's loop) claims and fires it
      val deadline = System.currentTimeMillis() + 30000
      while (texts.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(texts.asScala.exists(_.contains("frobnicator")),
        s"alert must fire the text transactor: $texts")
      // the transactor is fire-and-forget, so the text can land before the
      // scheduler thread's delete commits — poll for the tombstone
      val delDeadline = System.currentTimeMillis() + 10000
      while (app.store.entity(":frobnicator/alert").isDefined &&
             System.currentTimeMillis() < delDeadline) Thread.sleep(100)
      assert(app.store.entity(":frobnicator/alert").isEmpty,
        "fired alert is deleted (alert.clj:31)")

      // :never suppresses the alert entirely (the demo's other branch)
      post(s"$base/app/demo-app",
        """{"app":"quiet","event":"ping","next-event":":never"}""")
      assert(app.store.entity(":quiet/log").isDefined)
      assert(app.store.asOf(new Timestamp(Long.MaxValue >> 13))
        .filter("id = ':quiet/alert'").isEmpty,
        ":never must schedule nothing, ever")
    } finally app.stop()
  }

  private implicit class QAsScala[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Seq[A] = { val b = Seq.newBuilder[A]; q.forEach(a => b += a); b.result() }
  }

  private def httpReq(method: String, url: String, body: Option[String],
                      bearer: Option[String]): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    bearer.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
    body.foreach { b => conn.setDoOutput(true); conn.getOutputStream.write(b.getBytes(UTF_8)) }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, text)
  }

  /** README "Operator quickstart" — the ten walkthrough steps run verbatim
    * over HTTP (MemoryIO standing in for Kafka), in the README's order and
    * with the README's exact bodies, so the docs can't drift from the
    * engine. */
  test("README quickstart: boot → register → login → grant → deploy → ingest → query → hot-swap") {
    val db = Files.createTempDirectory("graft-quickstart").toString + "/db"
    val io = new MemoryIO(spark)
    // 1. boot, gated
    val app = GraftApp(spark, db, io, new FunctionRegistry,
      authSecret = Some("quickstart-secret")).start()
    try {
      val base = s"http://localhost:${app.collectors.port}"
      def post(url: String, body: String, tok: Option[String] = None) =
        httpReq("POST", url, Some(body), tok)
      def get(url: String, tok: Option[String] = None) =
        httpReq("GET", url, None, tok)
      def token(of: (Int, String)): String =
        (JsonMethods.parse(of._2) \ "token").extract[String]

      // 2-3. first registration is the admin; login mints its token
      assert(post(s"$base/user/new-user", """{"user":"root","pass":"R00T_PW"}""")._1 == 201)
      val root = token(post(s"$base/app/login", """{"user":"root","pass":"R00T_PW"}"""))
      // 4. a teammate registers role-less
      assert(post(s"$base/user/new-user", """{"user":"dev","pass":"DEV_PW"}""")._1 == 201)
      // 5. admin grants the developer planes; GET shows the public doc
      assert(post(s"$base/admin/user-roles/dev",
        """{"roles":["developer/stream","developer/collector"]}""",
        Some(root))._1 == 200)
      val (uc, doc) = get(s"$base/admin/user-roles/dev", Some(root))
      assert(uc == 200 && doc.contains("developer/stream") && !doc.contains("\"pass\""))
      val dev = token(post(s"$base/app/login", """{"user":"dev","pass":"DEV_PW"}"""))

      // 6. deploy the stream pipeline through /dev
      assert(post(s"$base/dev/stream/create", """{"name":"kafka/input"}""",
        Some(dev))._1 == 201)
      assert(post(s"$base/dev/stream/create",
        """{"name":"stream/process","upstream":["kafka/input"],
           "transducer":{"map":"TRY_CAST(value AS DOUBLE) + 1"},"buffer":100}"""
          .replaceAll("\n\\s*", ""), Some(dev))._1 == 201)
      assert(post(s"$base/dev/stream/create",
        """{"name":"kafka/output","upstream":["stream/process"]}""",
        Some(dev))._1 == 201)

      // 7. deploy the three collectors
      assert(post(s"$base/dev/collector/create",
        """{"name":"events","path":"/app/events","handler":{"kind":"stream","node":"kafka/input"}}""",
        Some(dev))._1 == 201)
      assert(post(s"$base/dev/collector/create",
        """{"name":"add-doc","path":"/app/add-doc","handler":{"kind":"ingest","idField":"doc_id"}}""",
        Some(dev))._1 == 201)
      assert(post(s"$base/dev/collector/create",
        """{"name":"docs","path":"/app/docs",
           "handler":{"kind":"query","edn":"{:find [?e ?s] :where [[?e :status ?s]]}",
                      "fields":{"status":"string"}}}"""
          .replaceAll("\n\\s*", ""), Some(dev))._1 == 201)

      // 8. ingest: stream push + document put (reserved ':' ids refused)
      assert(post(s"$base/app/events", "41", Some(dev))._1 == 202)
      assert(post(s"$base/app/add-doc", """{"doc_id":"d1","status":"ok"}""",
        Some(dev))._1 == 201)
      assert(post(s"$base/app/add-doc", """{"doc_id":":user/evil","status":"x"}""",
        Some(dev))._1 == 400, "stored-function namespace unreachable from HTTP")
      app.streams.processAllAvailable()
      assert(io.collected("output").map(_.getAs[Double]("value")) == Seq(42.0))

      // 9. the Datalog query door answers over the current snapshot
      val (qc, rows) = get(s"$base/app/docs", Some(dev))
      assert(qc == 200 && rows.contains("\"e\":\"d1\"") && rows.contains("\"s\":\"ok\""),
        s"query door: $qc $rows")

      // 10. hot-swap the processor, then list the stored streams
      assert(post(s"$base/dev/stream/update/process",
        """{"name":"stream/process","upstream":["kafka/input"],
           "transducer":{"map":"TRY_CAST(value AS DOUBLE) * 2"},"buffer":100}"""
          .replaceAll("\n\\s*", ""), Some(dev))._1 == 200)
      assert(post(s"$base/app/events", "10", Some(dev))._1 == 202)
      app.streams.processAllAvailable()
      assert(io.collected("output").map(_.getAs[Double]("value")).sorted == Seq(20.0, 42.0),
        "hot-swapped transducer processes new traffic; old output retained")
      val (lc, listing) = get(s"$base/dev/stream/create", Some(dev))
      assert(lc == 200 && listing.contains(":stream/process"))
    } finally app.stop()
  }
}
