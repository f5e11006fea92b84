package graft.auth

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.store.DocumentStore

/** User accounts + credential flow over the bitemporal store — the
  * reference's user auth (`/root/reference/src/dataworks/utils/auth.clj`):
  * `:user/<name>` docs carrying user-name / display-name / email / roles /
  * bcrypt'd pass, first-ever user gets `admin/all`
  * (`new-user`, auth.clj:93-102), `check-cred` verifies and mints a token.
  *
  * Documents live under the reserved `:user/` namespace, isolated from the
  * data plane BOTH ways: the HTTP ingest path rejects ':'-prefixed ids
  * (no writing), and query collectors run [[DocumentStore.qPublic]], which
  * excludes the reserved namespace from the relation (no reading the
  * bcrypt hashes back out) — plus the opt-in user-db store split isolates
  * them physically, like the reference's separate user-db node.
  *
  * Token revocation caveat (reference-faithful JWT design): roles are
  * BAKED into a token at sign time with a 30-day TTL — [[setRoles]] takes
  * effect for tokens minted AFTER the change; outstanding tokens keep
  * their roles until expiry. A deployment that must revoke instantly
  * rotates the signing secret (invalidating every live token).
  */
class UserAuth(store: DocumentStore, secret: String) {
  private implicit val fmts: Formats = DefaultFormats

  private def userId(name: String) = s":user/$name"

  /** The stored user doc (pass hash INCLUDED — internal read). */
  private def userDoc(name: String): Option[JValue] =
    store.entity(userId(name)).flatMap(s => JsonMethods.parseOpt(s))

  /** Public view of a user (never the hash), as `add-user` returns. */
  def getUser(name: String): Option[String] =
    userDoc(name).map(j => JsonMethods.compact(JsonMethods.render(
      j.removeField { case (k, _) => k == "pass" })))

  // monotonic once true — without the cache every anonymous /register
  // would re-run a full-snapshot window scan just to re-learn users exist
  @volatile private var seenUser = false
  private def anyUserExists(): Boolean = seenUser || {
    import store.spark.implicits._
    val any = !store.db().filter("id LIKE ':user/%'").select("id").as[String].isEmpty
    if (any) seenUser = true
    any
  }

  /** `add-user`: store the doc with a freshly derived hash. */
  private def addUser(name: String, pass: String, email: String,
                      displayName: String, roles: Set[String]): String = {
    store.put(userId(name), JsonMethods.compact(JsonMethods.render(JObject(
      "user-name" -> JString(name),
      "display-name" -> JString(displayName),
      "email" -> JString(email),
      "roles" -> JArray(roles.toList.sorted.map(JString(_))),
      "pass" -> JString(Bcrypt.derive(pass))))))
    seenUser = true
    getUser(name).get
  }

  /** `new-user`: the FIRST account ever created is the admin (`admin/all`);
    * later registrations get no roles until an admin grants them; a taken
    * username is an error. Returns Right(public user json) | Left(error). */
  def newUser(name: String, pass: String, email: String = "",
              displayName: String = ""): Either[String, String] = store.synchronized {
    if (name.isEmpty || pass.isEmpty) Left("user and pass are required")
    // the username becomes a store id (:user/<name>) AND an admin-plane
    // path segment (/admin/user-roles/<name>): '/' or whitespace in it
    // would mint an account the admin plane can never address (its GET/
    // POST route would parse as a different user), and ':' could nest the
    // reserved namespace — reject all three up front
    else if (name.exists(c => c == '/' || c == ':' || c.isWhitespace))
      Left("user name must not contain '/', ':' or whitespace")
    // size caps: the name becomes a store id and an admin-plane path
    // segment, and every register persists a PERMANENT bitemporal doc —
    // without caps an anonymous client bloats the store one maxBodyBytes
    // doc at a time
    else if (name.length > 64) Left("user name must be at most 64 characters")
    else if (email.length > 256 || displayName.length > 256)
      Left("email and display-name must be at most 256 characters")
    else if (!anyUserExists())
      Right(addUser(name, pass, email, displayName, Set("admin/all")))
    else if (userDoc(name).isDefined) {
      // a taken name answers WITHOUT a derive — a ~250 ms timing gap that
      // would re-open the username oracle the login door's decoy closes;
      // burn the same bcrypt work on this path (response text stays the
      // reference's, auth.clj:99)
      Bcrypt.check(pass, timingDecoy)
      Left(s"username: $name is taken.")
    }
    else Right(addUser(name, pass, email, displayName, Set.empty))
  }

  /** A real cost-12 hash of nothing anyone knows: burned on unknown-user
    * logins so "no such user" costs the same bcrypt work as "wrong
    * password" — without it, response TIME alone is a username oracle.
    * Derived EAGERLY at construction: were it lazy, the first unknown-user
    * login would pay derive+check (double bcrypt) and stand out from every
    * later one — a one-shot timing tell on exactly the path the decoy
    * exists to flatten. */
  private val timingDecoy: String =
    Bcrypt.derive(java.util.UUID.randomUUID().toString)

  /** `check-cred`: verify the password, mint a 30-day token. Errors use the
    * reference's messages (auth.clj:70-75) — an API caller may distinguish
    * them; the HTTP login door collapses both to one uniform 401
    * ([[registerHandlers]]), and the decoy check equalizes timing. */
  def checkCred(name: String, pass: String): Either[String, String] =
    userDoc(name) match {
      case None =>
        Bcrypt.check(pass, timingDecoy)
        Left(s"User: $name Not Found")
      case Some(doc) =>
        (doc \ "pass").extractOpt[String].filter(_.nonEmpty) match {
          // a migrated/hand-written doc without a usable hash must cost
          // the same bcrypt work as a wrong password — a fast-fail here
          // is a timing tell distinguishing exactly these accounts
          case None =>
            Bcrypt.check(pass, timingDecoy)
            Left("Incorrect Password")
          case Some(stored) =>
            // a MALFORMED stored hash throws fast inside check — burn the
            // decoy then, same uniform-cost contract as the absent case
            val ok =
              try Bcrypt.check(pass, stored)
              catch { case _: Exception => Bcrypt.check(pass, timingDecoy); false }
            if (ok)
              Right(Tokens.sign(name,
                (doc \ "roles").extractOpt[List[String]].getOrElse(Nil).toSet, secret))
            else Left("Incorrect Password")
        }
    }

  /** Set a user's roles to exactly `roles` (the admin-resource mutation).
    * REPLACE, not merge: the reference admin POST CASes :user/roles to the
    * posted set wholesale (`utils/auth.clj:139-146`), which is what lets an
    * admin *revoke* a role (strip a compromised user's developer/all) —
    * merge-only semantics could never remove anything (ADVICE r9).
    * Serialized on the store's lock: the reference's cas is unsynchronized;
    * two concurrent role posts there could interleave and one would lose. */
  def setRoles(name: String, roles: Set[String]): Either[String, String] = store.synchronized {
    userDoc(name) match {
      case None => Left(s"User: $name Not Found")
      case Some(doc) =>
        // removeField+merge (not JSON replace()): replace() is a no-op when
        // the doc has no `roles` field (a migrated/hand-written user doc)
        // and would report a grant that never landed
        store.put(userId(name), JsonMethods.compact(JsonMethods.render(
          doc.removeField { case (k, _) => k == "roles" } merge
            JObject("roles" -> JArray(roles.toList.sorted.map(JString(_)))))))
        Right(getUser(name).get)
    }
  }

  /** Additive convenience kept for callers that want merge semantics
    * explicitly (NOT the reference admin endpoint — that one replaces). */
  def grantRoles(name: String, roles: Set[String]): Either[String, String] = store.synchronized {
    userDoc(name) match {
      case None => Left(s"User: $name Not Found")
      case Some(doc) =>
        setRoles(name,
          (doc \ "roles").extractOpt[List[String]].getOrElse(Nil).toSet ++ roles)
    }
  }

  /** Register the reference's register/login endpoints as precompiled
    * `named` HTTP handlers (`register-resource` / `login-resource`) —
    * deploy them on a CollectorServer as
    * `{"handler":{"kind":"named","fn":"auth/register"}}` etc. These two
    * must be PUBLIC routes (a bearer gate can't guard the door people get
    * their tokens from). */
  /** Bounds concurrent bcrypt work on the PUBLIC doors: each anonymous
    * request costs a cost-12 derive (~250 ms of CPU by design), so without
    * a bound a handful of concurrent unauthenticated POSTs monopolizes the
    * HTTP pool — a free CPU-exhaustion DoS. Excess callers get a 429
    * instead of queueing unboundedly. */
  private val bcryptGate = new java.util.concurrent.Semaphore(4)
  private def gated(f: => (Int, String)): (Int, String) =
    if (!bcryptGate.tryAcquire(2, java.util.concurrent.TimeUnit.SECONDS))
      (429, """{"error":"too many authentication requests; retry shortly"}""")
    else try f finally bcryptGate.release()

  def registerHandlers(registry: graft.registry.FunctionRegistry): Unit = {
    registry.registerHttpHandler("auth/register", body => gated {
      val j = JsonMethods.parseOpt(body).getOrElse(JNothing)
      newUser(
        (j \ "user").extractOpt[String].getOrElse(""),
        (j \ "pass").extractOpt[String].getOrElse(""),
        (j \ "email").extractOpt[String].getOrElse(""),
        (j \ "display-name").extractOpt[String].getOrElse("")) match {
        case Right(user) => (201, user)
        case Left(err) =>
          (400, JsonMethods.compact(JsonMethods.render(JObject("error" -> JString(err)))))
      }
    })
    registry.registerHttpHandler("auth/login", body => gated {
      val j = JsonMethods.parseOpt(body).getOrElse(JNothing)
      checkCred(
        (j \ "user").extractOpt[String].getOrElse(""),
        (j \ "pass").extractOpt[String].getOrElse("")) match {
        case Right(token) =>
          (200, JsonMethods.compact(JsonMethods.render(JObject("token" -> JString(token)))))
        case Left(_) =>
          // ONE uniform error on the public door: "Not Found" vs
          // "Incorrect Password" is a username-enumeration oracle
          (401, """{"error":"invalid credentials"}""")
      }
    })
  }
}
