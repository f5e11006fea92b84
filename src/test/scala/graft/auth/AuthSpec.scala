package graft.auth

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.time.{Duration, Instant}

import graft.SparkSpec
import graft.api.{BearerAuth, CollectorHandler, CollectorServer, CollectorSpec}
import graft.registry.FunctionRegistry
import graft.store.DocumentStore
import graft.stream.{MemoryIO, StreamManager, Topology}

/** X10 + the reference's auth subsystem
  * (`/root/reference/src/dataworks/utils/auth.clj`): bcrypt derive/check,
  * HS256 tokens with a timeout, `:user/…` docs with first-user-is-admin,
  * and the bearer/role gate in front of collector routes. */
class AuthSpec extends SparkSpec {

  // ------------------------------------------------------------- bcrypt

  test("bcrypt: OpenBSD-compatible $2a$ vectors (public reference test data)") {
    // canonical public bcrypt test vectors (OpenBSD/jBCrypt suite): the
    // cross-implementation interop proof, covering the empty password, a
    // 1-char password, and a 26-char one (cyclic key wrap)
    val vectors = Seq(
      ("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.",
        "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
      ("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO",
        "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
      ("abcdefghijklmnopqrstuvwxyz", "$2a$06$.rCVZVOThsIa97pEDOxvGu",
        "$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC"))
    for ((pw, salt, want) <- vectors)
      assert(Bcrypt.hashWith(pw, salt) == want, s"vector for '$pw'")
  }

  test("bcrypt: derive/check roundtrip, salting, rejection, malformed stores") {
    val h1 = Bcrypt.derive("s3cret", cost = 6)
    val h2 = Bcrypt.derive("s3cret", cost = 6)
    assert(h1 != h2, "fresh salts must differ")
    assert(h1.startsWith("$2a$06$") && h1.length == 60)
    assert(Bcrypt.check("s3cret", h1) && Bcrypt.check("s3cret", h2))
    assert(!Bcrypt.check("s3cret!", h1), "wrong password must fail")
    assert(!Bcrypt.check("s3cret", "not-a-hash"), "garbage store must fail, not throw")
    assert(!Bcrypt.check("s3cret", "$2a$06$é" + "A" * 50),
      "non-ASCII in a stored hash must fail closed, not throw out of bounds")
    // $2b/$2y hashes share the algorithm — interop accepted
    assert(Bcrypt.check("s3cret", "$2b" + h1.drop(3)))
  }

  // --------------------------------------------------------------- tokens

  test("tokens: sign/verify roundtrip, tamper, expiry, role authorization") {
    val tok = Tokens.sign("ada", Set("ops/reader"), "hush")
    val claims = Tokens.verify(tok, "hush")
    assert(claims.exists(c => c.user == "ada" && c.roles == Set("ops/reader")))
    assert(Tokens.verify(tok, "wrong-secret").isEmpty, "bad secret must fail")
    assert(Tokens.verify(tok.dropRight(2) + "xx", "hush").isEmpty, "tampered sig must fail")
    val expired = Tokens.sign("ada", Set.empty, "hush",
      ttl = Duration.ofDays(30), now = Instant.now().minus(Duration.ofDays(31)))
    assert(Tokens.verify(expired, "hush").isEmpty, "expired token must fail")
    // role expansion: ns role implies ns/all; admin/all always passes
    assert(Tokens.authorized(Set("ops/all"), Set("ops/writer")))
    assert(Tokens.authorized(Set("admin/all"), Set("anything/at-all")))
    assert(!Tokens.authorized(Set("ops/reader"), Set("billing/reader")))
    assert(Tokens.authorized(Set.empty, Set.empty), "no requirement = any authenticated user")
  }

  // ------------------------------------------------------------ user flow

  test("users: first registration is admin, duplicates rejected, login mints a working token") {
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-auth").toString + "/db")
    val users = new UserAuth(store, "hush")
    val first = users.newUser("ada", "pw-ada", email = "ada@example.com")
    assert(first.exists(_.contains("admin/all")), s"first user ever is the admin: $first")
    assert(first.exists(!_.contains("pw-ada")) && first.exists(!_.contains("pass")),
      "the public view must never carry the hash")
    val second = users.newUser("bob", "pw-bob")
    assert(second.exists(!_.contains("admin/all")), "later users start roleless")
    assert(users.newUser("ada", "again").left.exists(_.contains("taken")))
    // names that would be unaddressable on the admin plane (path segment)
    // or could nest the reserved ':' namespace are refused up front
    for (bad <- Seq("a/b", "a b", "x:y", "tab\tname"))
      assert(users.newUser(bad, "pw").isLeft, s"'$bad' must be rejected")
    assert(users.checkCred("ada", "nope") == Left("Incorrect Password"))
    assert(users.checkCred("ghost", "x") == Left("User: ghost Not Found"))
    val token = users.checkCred("ada", "pw-ada")
    assert(token.isRight)
    assert(Tokens.verify(token.toOption.get, "hush")
      .exists(c => c.user == "ada" && c.roles == Set("admin/all")))
    // role grant flows into the NEXT minted token
    assert(users.grantRoles("bob", Set("ops/reader")).isRight)
    val bobTok = users.checkCred("bob", "pw-bob").toOption.get
    assert(Tokens.verify(bobTok, "hush").exists(_.roles == Set("ops/reader")))
    // a grant must LAND even when the stored doc never had a roles field
    // (hand-written/migrated user doc) — json4s replace() silently no-ops
    // on a missing path, which is the bug class this pins
    store.put(":user/legacy", """{"user-name":"legacy","pass":"""" +
      Bcrypt.derive("pw-legacy", cost = 6) + """"}""")
    assert(users.grantRoles("legacy", Set("ops/reader")).exists(_.contains("ops/reader")))
    val legacyTok = users.checkCred("legacy", "pw-legacy").toOption.get
    assert(Tokens.verify(legacyTok, "hush").exists(_.roles == Set("ops/reader")),
      "granted role must mint into the token for a roles-less legacy doc")
    // setRoles is the admin-endpoint semantics: REPLACE, so an admin can
    // REVOKE (the reference CASes :user/roles to the posted set wholesale);
    // merge-only semantics could never strip a compromised role
    assert(users.setRoles("bob", Set("viewer/basic")).isRight)
    val bobTok2 = users.checkCred("bob", "pw-bob").toOption.get
    assert(Tokens.verify(bobTok2, "hush").exists(_.roles == Set("viewer/basic")),
      "setRoles must replace: ops/reader revoked, viewer/basic the only role")
    assert(users.setRoles("bob", Set.empty).isRight)
    val bobTok3 = users.checkCred("bob", "pw-bob").toOption.get
    assert(Tokens.verify(bobTok3, "hush").exists(_.roles.isEmpty),
      "posting an empty set strips every role")
  }

  // ------------------------------------- end-to-end bearer-gated collector

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

  test("bearer gate: register + login endpoints public, data routes 401/403/200 by role") {
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-auth-e2e").toString + "/db")
    val registry = new FunctionRegistry
    val streams = new StreamManager(new Topology(new MemoryIO(spark), registry))
    val users = new UserAuth(store, "hush")
    users.registerHandlers(registry)
    val srv = new CollectorServer(store, streams,
      auth = Some(BearerAuth("hush", publicPaths = Set("/user/new-user", "/app/login"))))
    try {
      // doors claim their public paths through the boot-only path — the
      // public deploy() refuses them (reserved-door protection, below)
      assert(srv.deploy(CollectorSpec("register", "/user/new-user",
        CollectorHandler.Named("auth/register"))).isLeft,
        "public deploy must not claim a publicPaths door")
      assert(srv.deployDoor(CollectorSpec("register", "/user/new-user",
        CollectorHandler.Named("auth/register"))).isRight)
      assert(srv.deployDoor(CollectorSpec("login", "/app/login",
        CollectorHandler.Named("auth/login"))).isRight)
      // the hijack ADVICE pinned: same-name replacement on a door path,
      // and a same-name deploy elsewhere (which would sweep the door's
      // route away) — both refused for reserved door identities
      assert(srv.deploy(CollectorSpec("login", "/app/login",
        CollectorHandler.Ingest("doc_id"))).isLeft,
        "a collector must not replace the login door in place")
      assert(srv.deploy(CollectorSpec("login", "/app/steal",
        CollectorHandler.Ingest("doc_id"))).isLeft,
        "a reserved door name deployed elsewhere must not sweep the door route")
      srv.remove("login")
      assert(srv.deployed.contains("/app/login"),
        "remove() must not tear down a reserved door either")
      // a data-ingest route open to any authenticated user, and an
      // ops-restricted one
      assert(srv.deploy(CollectorSpec("add", "/app/add",
        CollectorHandler.Ingest("doc_id"))).isRight)
      assert(srv.deploy(CollectorSpec("ops", "/app/ops",
        CollectorHandler.Ingest("doc_id"), roles = Set("ops/writer"))).isRight)
      val base = s"http://localhost:${srv.port}"

      // registration + login are reachable without a token
      val (rc, _) = http("POST", s"$base/user/new-user",
        Some("""{"user":"ada","pass":"pw-ada"}"""))
      assert(rc == 201)
      http("POST", s"$base/user/new-user", Some("""{"user":"bob","pass":"pw-bob"}"""))
      val (lc, lbody) = http("POST", s"$base/app/login",
        Some("""{"user":"bob","pass":"pw-bob"}"""))
      assert(lc == 200 && lbody.contains("token"))
      val bobTok = lbody.split("\"").find(_.count(_ == '.') == 2).get
      // the public door answers wrong-password and unknown-user with ONE
      // uniform body — distinct messages are a username-enumeration oracle
      val wrongPass = http("POST", s"$base/app/login",
        Some("""{"user":"bob","pass":"wrong"}"""))
      val noUser = http("POST", s"$base/app/login",
        Some("""{"user":"ghost","pass":"wrong"}"""))
      assert(wrongPass == noUser && wrongPass._1 == 401,
        s"login errors must be indistinguishable: $wrongPass vs $noUser")
      // unauthenticated probes cannot map the route table: unknown paths
      // 401 exactly like deployed ones; only a valid token sees the 404
      assert(http("GET", s"$base/no/such/path")._1 == 401)
      assert(http("GET", s"$base/no/such/path", bearer = Some(bobTok))._1 == 404)

      // data routes: no token → 401; bob (roleless) → 200 on the open
      // route, 403 on the ops route; ada (admin/all) → 200 on both
      assert(http("POST", s"$base/app/add", Some("""{"doc_id":"d1"}"""))._1 == 401)
      assert(http("POST", s"$base/app/add", Some("""{"doc_id":"d1"}"""),
        bearer = Some(bobTok))._1 == 201)
      assert(http("POST", s"$base/app/ops", Some("""{"doc_id":"d2"}"""),
        bearer = Some(bobTok))._1 == 403)
      assert(store.entity("d2").isEmpty, "a 403'd write must not land")
      val adaTok = http("POST", s"$base/app/login",
        Some("""{"user":"ada","pass":"pw-ada"}"""))._2
        .split("\"").find(_.count(_ == '.') == 2).get
      assert(http("POST", s"$base/app/ops", Some("""{"doc_id":"d2"}"""),
        bearer = Some(adaTok))._1 == 201)
      assert(store.entity("d2").nonEmpty)
      // a garbage token is a 401, not a 500
      assert(http("POST", s"$base/app/add", Some("""{"doc_id":"d3"}"""),
        bearer = Some("garbage.token.here"))._1 == 401)
    } finally { srv.stop(); streams.stopAll() }
  }

  test("admin plane e2e: grant over HTTP opens /dev; non-admin grant 403s") {
    val db = Files.createTempDirectory("graft-admin-e2e").toString + "/db"
    val app = graft.GraftApp(spark, db, new MemoryIO(spark),
      new FunctionRegistry, authSecret = Some("hush")).start()
    try {
      val base = s"http://localhost:${app.collectors.port}"
      def login(u: String, p: String): String =
        http("POST", s"$base/app/login", Some(s"""{"user":"$u","pass":"$p"}"""))
          ._2.split("\"").find(_.count(_ == '.') == 2).get
      assert(http("POST", s"$base/user/new-user",
        Some("""{"user":"root","pass":"pw-root"}"""))._1 == 201)
      assert(http("POST", s"$base/user/new-user",
        Some("""{"user":"dev2","pass":"pw-dev2"}"""))._1 == 201)
      val devTok = login("dev2", "pw-dev2")
      // before the grant, the dev plane refuses dev2
      assert(http("POST", s"$base/dev/stream/create",
        Some("""{"name":"kafka/input"}"""), bearer = Some(devTok))._1 == 403)
      // …and dev2 cannot grant themselves anything (admin plane is gated)
      assert(http("POST", s"$base/admin/user-roles/dev2",
        Some("""{"roles":["developer/stream"]}"""), bearer = Some(devTok))._1 == 403)
      // the admin grants developer/stream over HTTP (reference admin-resource)
      val rootTok = login("root", "pw-root")
      val (gc, gbody) = http("POST", s"$base/admin/user-roles/dev2",
        Some("""{"roles":["developer/stream"]}"""), bearer = Some(rootTok))
      assert(gc == 200 && gbody.contains("user-roles-updated"), s"$gc $gbody")
      // GET returns the public doc — roles visible, hash never
      val (uc, ubody) = http("GET", s"$base/admin/user-roles/dev2",
        bearer = Some(rootTok))
      assert(uc == 200 && ubody.contains("developer/stream") && !ubody.contains("pass"),
        s"$uc $ubody")
      assert(http("GET", s"$base/admin/user-roles/ghost",
        bearer = Some(rootTok))._1 == 404)
      assert(http("POST", s"$base/admin/user-roles/ghost",
        Some("""{"roles":["x/y"]}"""), bearer = Some(rootTok))._1 == 404)
      assert(http("POST", s"$base/admin/user-roles/dev2",
        Some("""{"nope":1}"""), bearer = Some(rootTok))._1 == 400)
      // the granted role lands in dev2's NEXT token and opens exactly the
      // granted plane type
      val devTok2 = login("dev2", "pw-dev2")
      assert(http("POST", s"$base/dev/stream/create",
        Some("""{"name":"kafka/input"}"""), bearer = Some(devTok2))._1 == 201,
        "post-grant, /dev/stream/create must succeed")
      assert(http("POST", s"$base/dev/transactor/create",
        Some("""{"name":"transactor/t"}"""), bearer = Some(devTok2))._1 == 403,
        "developer/stream must not open other plane types")
      // management-plane hijack of the doors stays refused end to end
      assert(http("POST", s"$base/dev/collector/create",
        Some("""{"name":"auth-login","path":"/app/login",
                 "handler":{"kind":"ingest","idField":"id"}}"""
          .replaceAll("\n\\s*", "")), bearer = Some(rootTok))._1 == 406,
        "even an admin-held token cannot redeploy the login door route")
    } finally app.stop()
  }

  test("requireRole: deny-by-default gate stops roleless tokens on role-less routes") {
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-auth-reqrole").toString + "/db")
    val registry = new FunctionRegistry
    val streams = new StreamManager(new Topology(new MemoryIO(spark), registry))
    val users = new UserAuth(store, "hush")
    users.registerHandlers(registry)
    val srv = new CollectorServer(store, streams,
      auth = Some(BearerAuth("hush",
        publicPaths = Set("/user/new-user", "/app/login"), requireRole = true)))
    try {
      assert(srv.deployDoor(CollectorSpec("register", "/user/new-user",
        CollectorHandler.Named("auth/register"))).isRight)
      assert(srv.deployDoor(CollectorSpec("login", "/app/login",
        CollectorHandler.Named("auth/login"))).isRight)
      assert(srv.deploy(CollectorSpec("add", "/app/add",
        CollectorHandler.Ingest("doc_id"))).isRight)
      val base = s"http://localhost:${srv.port}"
      http("POST", s"$base/user/new-user", Some("""{"user":"root","pass":"pw"}"""))
      http("POST", s"$base/user/new-user", Some("""{"user":"walkin","pass":"pw"}"""))
      val walkTok = http("POST", s"$base/app/login",
        Some("""{"user":"walkin","pass":"pw"}"""))._2
        .split("\"").find(_.count(_ == '.') == 2).get
      // self-registered (roleless) token: refused even on the role-less route
      assert(http("POST", s"$base/app/add", Some("""{"doc_id":"d1"}"""),
        bearer = Some(walkTok))._1 == 403,
        "requireRole must stop a roleless token on a role-less route")
      assert(store.entity("d1").isEmpty)
      // any granted role opens role-less routes again
      assert(users.grantRoles("walkin", Set("ops/reader")).isRight)
      val walkTok2 = http("POST", s"$base/app/login",
        Some("""{"user":"walkin","pass":"pw"}"""))._2
        .split("\"").find(_.count(_ == '.') == 2).get
      assert(http("POST", s"$base/app/add", Some("""{"doc_id":"d1"}"""),
        bearer = Some(walkTok2))._1 == 201)
    } finally { srv.stop(); streams.stopAll() }
  }

  test("GraftApp with a secret boots gated: auth doors live, everything else 401s") {
    val db = Files.createTempDirectory("graft-auth-app").toString + "/db"
    val app = graft.GraftApp(spark, db, new MemoryIO(spark),
      new FunctionRegistry, authSecret = Some("hush")).start()
    try {
      val base = s"http://localhost:${app.collectors.port}"
      // doors are up without any management-plane action
      assert(http("POST", s"$base/user/new-user",
        Some("""{"user":"root","pass":"pw"}"""))._1 == 201)
      val tok = http("POST", s"$base/app/login",
        Some("""{"user":"root","pass":"pw"}"""))._2
        .split("\"").find(_.count(_ == '.') == 2).get
      // a management-deployed route is gated
      assert(app.functions.create("collector", "add",
        """{"name":"add","path":"/app/add","handler":{"kind":"ingest","idField":"id"}}""").isRight)
      assert(http("POST", s"$base/app/add", Some("""{"id":"x"}"""))._1 == 401)
      assert(http("POST", s"$base/app/add", Some("""{"id":"x"}"""),
        bearer = Some(tok))._1 == 201)
      app.stop()
      // reboot: doors re-deploy from code, not the store; the first user
      // persisted, so the SECOND registration is not admin
      val app2 = graft.GraftApp(spark, db, new MemoryIO(spark),
        new FunctionRegistry, authSecret = Some("hush")).start()
      try {
        val base2 = s"http://localhost:${app2.collectors.port}"
        val (c2, body2) = http("POST", s"$base2/user/new-user",
          Some("""{"user":"second","pass":"pw2"}"""))
        assert(c2 == 201 && !body2.contains("admin/all"),
          s"post-reboot registration must not be admin: $body2")
      } finally app2.stop()
    } finally app.stop()
  }

  test("auth-door hardening: qPublic isolation, size caps, degenerate hashes (review r11)") {
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-auth-hard").toString + "/db")
    val users = new UserAuth(store, "hush")
    assert(users.newUser("root", "pw-root").isRight)
    // a QUERY over the store must not be able to bind :user docs (bcrypt
    // hashes) or control-plane docs — the data-plane read face excludes
    // the reserved ':' namespace even on a combined store
    store.put("plain1", """{"karma": 7}""")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pass",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("karma",
        org.apache.spark.sql.types.LongType)))
    val leak = store.qPublic("{:find [?e ?p] :where [[?e :pass ?p]]}", schema)
      .fold(e => fail(e), identity)
    assert(leak.count() == 0, "qPublic must never surface a :user doc's hash")
    val ok = store.qPublic("{:find [?k] :where [[?e :karma ?k]]}", schema)
      .fold(e => fail(e), identity)
    assert(ok.count() == 1, "plain data docs still query")
    // register caps: oversized names/emails are a clean Left, not a
    // permanent junk doc
    assert(users.newUser("x" * 65, "pw").isLeft)
    assert(users.newUser("y", "pw", email = "e" * 257).isLeft)
    assert(store.entity(s":user/${"x" * 65}").isEmpty)
    // a stored doc with an absent or malformed hash fails CLEANLY (and
    // burns the decoy — timing is asserted structurally, not by clock)
    store.put(":user/nohash", """{"user-name":"nohash"}""")
    store.put(":user/badhash", """{"user-name":"badhash","pass":"not-a-bcrypt"}""")
    assert(users.checkCred("nohash", "x") == Left("Incorrect Password"))
    assert(users.checkCred("badhash", "x") == Left("Incorrect Password"))
  }
}
