package graft.api

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.{GraftApp, SparkSpec}
import graft.registry.FunctionRegistry
import graft.stream.MemoryIO

/** The /dev HTTP management plane
  * (`/root/reference/src/dataworks/resource/dev.clj`): stored-function
  * CRUD over HTTP through the same FunctionManager railway the Scala API
  * uses, plus the `developer/<type>` role gate when the server runs with
  * auth. */
class DevResourceSpec extends SparkSpec {

  private def http(method: String, url: String, body: Option[String] = None,
                   bearer: Option[String] = None): (Int, String) = {
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

  test("stored-function CRUD over HTTP: create, list, read, update, delete") {
    val db = Files.createTempDirectory("graft-dev").toString + "/db"
    val app = GraftApp(spark, db, new MemoryIO(spark), new FunctionRegistry).start()
    try {
      val base = s"http://localhost:${app.collectors.port}"
      val spec = """{"name":"add-user","path":"/app/add-user",
                    "handler":{"kind":"ingest","idField":"user_id"}}"""
        .replaceAll("\n\\s*", "")

      // create → 201, the endpoint is immediately live
      val (cc, cbody) = http("POST", s"$base/dev/collector/create", Some(spec))
      assert(cc == 201 && cbody.contains(":collector/add-user"), s"$cc $cbody")
      assert(http("POST", s"$base/app/add-user",
        Some("""{"user_id":"u1"}"""))._1 == 201)
      // duplicate create → the railway's 406, not a silent overwrite
      assert(http("POST", s"$base/dev/collector/create", Some(spec))._1 == 406)

      // list + read round-trip the stored doc
      val (lc, lbody) = http("GET", s"$base/dev/collector/create")
      assert(lc == 200 && lbody.contains(":collector/add-user") &&
        lbody.contains("/app/add-user"), s"$lbody")
      val (gc, gbody) = http("GET", s"$base/dev/collector/update/add-user")
      assert(gc == 200 && gbody.contains("/app/add-user"))
      assert(http("GET", s"$base/dev/collector/update/nope")._1 == 404)

      // update moves the route atomically
      val moved = spec.replace("/app/add-user", "/app/v2/add-user")
      assert(http("POST", s"$base/dev/collector/update/add-user", Some(moved))._1 == 200)
      assert(http("POST", s"$base/app/add-user", Some("""{"user_id":"u2"}"""))._1 == 404)
      assert(http("POST", s"$base/app/v2/add-user", Some("""{"user_id":"u2"}"""))._1 == 201)

      // a STREAM function deploys a live topology node through the same plane
      assert(http("POST", s"$base/dev/stream/create",
        Some("""{"name":"kafka/devin"}"""))._1 == 201)
      assert(http("POST", s"$base/dev/stream/create",
        Some("""{"name":"stream/devproc","upstream":["kafka/devin"],
                 "transducer":{"map":"TRY_CAST(value AS DOUBLE) + 1"},"buffer":10}"""
          .replaceAll("\n\\s*", "")))._1 == 201)
      assert(app.topology.nodes.keySet.contains("stream/devproc"),
        "HTTP-created stream function must wire into the live topology")

      // delete tombstones + unroutes
      assert(http("DELETE", s"$base/dev/collector/update/add-user")._1 == 200)
      assert(http("POST", s"$base/app/v2/add-user", Some("""{"user_id":"u3"}"""))._1 == 404)
      assert(http("GET", s"$base/dev/collector/update/add-user")._1 == 404)

      // F9 spec templating: deep find/replace, no side effects
      val (tc, tbody) = http("POST", s"$base/dev/collector/template",
        Some("""{"spec":{"name":"NAME","path":"PATH",
                 "handler":{"kind":"ingest","idField":"id"}},
                 "replace":[["NAME","orders"],["PATH","TMP"],["TMP","/app/v2/orders"]]}"""
          .replaceAll("\n\\s*", "")))
      assert(tc == 200 && tbody.contains("\"name\":\"orders\"") &&
        tbody.contains("\"path\":\"/app/v2/orders\""), s"$tc $tbody")
      assert(http("POST", s"$base/dev/collector/template",
        Some("""{"replace":[]}"""))._1 == 400, "missing spec field → 400")
      assert(http("POST", s"$base/dev/collector/template",
        Some("""{"spec":{},"replace":[["lonely"]]}"""))._1 == 400,
        "non-pair replace tuple → 400")
      assert(http("GET", s"$base/dev/collector/template")._1 == 405)

      // unknown type / malformed body stay on the railway
      assert(http("GET", s"$base/dev/bogus/create")._1 == 404)
      assert(http("POST", s"$base/dev/collector/create", Some("not json"))._1 == 400)
      // unknown ACTION is a 404; known action with the wrong verb is a 405
      assert(http("GET", s"$base/dev/collector/read")._1 == 404)
      assert(http("DELETE", s"$base/dev/collector/create")._1 == 405)

      // the management plane's address space cannot be squatted: a
      // collector deployed at /dev/* would shadow the plane and replace
      // the developer-role gate with its own roles
      assert(http("POST", s"$base/dev/collector/create",
        Some("""{"name":"squat","path":"/dev/stream/create",
                 "handler":{"kind":"ingest","idField":"x"}}""".replaceAll("\n\\s*", "")))._1 == 406)
      assert(http("POST", s"$base/dev/stream/create",
        Some("""{"name":"kafka/free"}"""))._1 == 201,
        "the management route must still answer after the squat attempt")

      // a stream update cannot RETARGET the doc to a different node: the
      // stored-function identity is the node's local name (else the
      // original node keeps running with no backing doc)
      assert(http("POST", s"$base/dev/stream/update/devin",
        Some("""{"name":"kafka/devin2"}"""))._1 == 406)
      // …and valid-update? rejects an IDENTICAL redeploy (the reference's
      // no-change-from-existing-% failure — no new doc version, no
      // needless hot-swap), while a real same-node change passes
      assert(http("POST", s"$base/dev/stream/update/devin",
        Some("""{"name":"kafka/devin"}"""))._1 == 406,
        "no-change redeploy is a railway failure")
      assert(http("POST", s"$base/dev/stream/update/devin",
        Some("""{"name":"kafka/devin","buffer":64}"""))._1 == 200,
        "same-node updates still pass")
    } finally app.stop()
  }

  test("dev plane under auth: developer/<type> (or admin) required") {
    val db = Files.createTempDirectory("graft-dev-auth").toString + "/db"
    val app = GraftApp(spark, db, new MemoryIO(spark), new FunctionRegistry,
      authSecret = Some("hush")).start()
    try {
      val base = s"http://localhost:${app.collectors.port}"
      def login(u: String, p: String): String = {
        http("POST", s"$base/user/new-user", Some(s"""{"user":"$u","pass":"$p"}"""))
        http("POST", s"$base/app/login", Some(s"""{"user":"$u","pass":"$p"}"""))._2
          .split("\"").find(_.count(_ == '.') == 2).get
      }
      val adminTok = login("root", "pw-root")   // first user = admin/all
      val plainTok = login("plain", "pw-plain") // roleless

      val spec = """{"name":"c1","path":"/app/c1","handler":{"kind":"ingest","idField":"id"}}"""
      // no token → uniform 401; roleless → 403; admin → 201
      assert(http("POST", s"$base/dev/collector/create", Some(spec))._1 == 401)
      assert(http("POST", s"$base/dev/collector/create", Some(spec),
        bearer = Some(plainTok))._1 == 403)
      assert(http("POST", s"$base/dev/collector/create", Some(spec),
        bearer = Some(adminTok))._1 == 201)
      // the type-scoped developer role unlocks exactly its type
      assert(app.users.get.grantRoles("plain", Set("developer/stream")).isRight)
      val devTok = login("plain", "pw-plain")
      assert(http("POST", s"$base/dev/stream/create",
        Some("""{"name":"kafka/gated"}"""), bearer = Some(devTok))._1 == 201)
      assert(http("GET", s"$base/dev/collector/create",
        bearer = Some(devTok))._1 == 403,
        "developer/stream must not open the collector plane")
      // an ILL-FORMED /dev path has no derivable role — it must 404
      // generically, NOT bypass the role gate via an empty required set
      // and leak the function-type list (review r11)
      val roleless = login("plain2", "pw-plain2")
      val (bc, bbody) = http("GET", s"$base/dev/bogus/create", bearer = Some(roleless))
      assert(bc == 404, s"ill-formed /dev path must 404, got $bc")
      assert(!bbody.contains("collector") && !bbody.contains("stream"),
        s"404 body must not enumerate function types: $bbody")
    } finally app.stop()
  }

  test("splitPlanes: management and data planes on separate listeners (core.clj layout)") {
    val db = Files.createTempDirectory("graft-split").toString + "/db"
    val app = GraftApp(spark, db, new MemoryIO(spark), new FunctionRegistry,
      authSecret = Some("hush"), splitPlanes = true).start()
    try {
      val user = s"http://localhost:${app.collectors.port}"
      val mgmt = s"http://localhost:${app.devServer.get.port}"
      assert(app.collectors.port != app.devServer.get.port, "two listeners")
      // doors mount on BOTH listeners (each reference server carries its
      // own register/login), so the management port mints tokens alone
      assert(http("POST", s"$mgmt/user/new-user",
        Some("""{"user":"root","pass":"pw"}"""))._1 == 201)
      val tok = http("POST", s"$mgmt/app/login",
        Some("""{"user":"root","pass":"pw"}"""))._2
        .split("\"").find(_.count(_ == '.') == 2).get
      // /dev lives ONLY on the management listener; the data plane 404s it
      // (with a valid token — unauthenticated probes get the uniform 401)
      val spec = """{"name":"c1","path":"/app/c1","handler":{"kind":"ingest","idField":"id"}}"""
      assert(http("POST", s"$mgmt/dev/collector/create", Some(spec),
        bearer = Some(tok))._1 == 201)
      assert(http("POST", s"$user/dev/collector/create", Some(spec),
        bearer = Some(tok))._1 == 404, "data plane must not serve /dev")
      // ...and the deployed collector serves ONLY on the data plane
      assert(http("POST", s"$user/app/c1", Some("""{"id":"x1"}"""),
        bearer = Some(tok))._1 == 201)
      assert(http("POST", s"$mgmt/app/c1", Some("""{"id":"x2"}"""),
        bearer = Some(tok))._1 == 404, "management plane must not serve collectors")
      // admin plane rides the management listener only
      assert(http("GET", s"$mgmt/admin/user-roles/root", bearer = Some(tok))._1 == 200)
      assert(http("GET", s"$user/admin/user-roles/root", bearer = Some(tok))._1 == 404)
      // direct deploy() on the management listener is refused loudly
      assert(app.devServer.get.deploy(graft.api.CollectorSpec("sq", "/app/sq",
        graft.api.CollectorHandler.Ingest("id"))).swap
        .exists(_.contains("management plane")))
    } finally app.stop()
  }

  test("F9 deepReplace: reference recursive-replace semantics over JSON") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.{parse, compact, render}
    import DevResource.deepReplace
    val spec = parse("""{"a":{"x":[1,2,{"x":"x"}]},"ys":["x",2,[2]]}""")
    // leaves replaced at any depth; FIELD NAMES participate (a Clojure
    // MapEntry is a vector, so the reference renames matching keys too)
    assert(compact(render(deepReplace(spec, JString("x"), JString("z")))) ==
      """{"a":{"z":[1,2,{"z":"z"}]},"ys":["z",2,[2]]}""")
    assert(compact(render(deepReplace(spec, JInt(2), JInt(9)))) ==
      """{"a":{"x":[1,9,{"x":"x"}]},"ys":["x",9,[9]]}""")
    // containers are recursed into, never compared wholesale
    val arr = parse("""[[1,2],[1,2]]""")
    assert(deepReplace(arr, parse("[1,2]"), JInt(0)) == arr)
    // a non-string replacement landing on a key is stringified (JSON keys
    // must be strings — the one divergence from EDN, documented)
    assert(compact(render(deepReplace(parse("""{"x":1}"""), JString("x"), JInt(7)))) ==
      """{"7":1}""")
  }
}
