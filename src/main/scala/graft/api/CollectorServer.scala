package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.types._

import graft.store.DocumentStore
import graft.stream.StreamManager

/** A deployed collector: a named HTTP endpoint whose behavior is a
  * declarative [[CollectorHandler]], the engine's replacement for the
  * reference's eval'd yada resource
  * (`/root/reference/src/dataworks/collector.clj:85-96` "CURRENTLY UNSAFE
  * (but necessary)" — here it IS safe, because handlers are data).
  *
  * The reference registers `{path → name}` and `{name → resource}` in two
  * atoms (`collector.clj:98-112` add-collector!); we keep one route table
  * keyed by path with the spec inline.
  */
case class CollectorSpec(name: String, path: String, handler: CollectorHandler,
                         roles: Set[String] = Set.empty)

/** The declarative handler surface. The reference's demo collectors do one
  * of three things with a request: transact a document into the app db,
  * push onto a stream node, or answer a Datalog query
  * (`/root/reference/doc/demo-app-1.org`, `src/dataworks/resource/user.clj`).
  * Each becomes a data-described handler — validated at deploy time
  * ("evalidate", minus the eval), executed at request time.
  */
sealed trait CollectorHandler
object CollectorHandler {
  /** POST: body is a JSON document; `idField` names the body field holding
    * the entity id. Stored via the bitemporal put (S1). */
  case class Ingest(idField: String) extends CollectorHandler
  /** POST: body is pushed onto stream node `node` (T16 stream!). */
  case class StreamPush(node: String) extends CollectorHandler
  /** GET: run EDN Datalog `edn` against the store's current snapshot with
    * document schema `fields` (name → string|long|double|boolean) and
    * return rows as a JSON array. */
  case class Query(edn: String, fields: Seq[(String, String)]) extends CollectorHandler
  /** POST: body `{"args": [...]}` invokes registered transactor `name`
    * fire-and-forget (`transact!` over HTTP — the reference's Twilio-style
    * side-effect endpoints, `/root/reference/src/dataworks/transactor.clj`). */
  case class Transact(name: String) extends CollectorHandler
  /** POST: body handed to the registered http handler `fn` (a precompiled
    * Scala function in the FunctionRegistry) — full composite behavior
    * (multi-doc puts, scheduling, transact! calls) without runtime eval:
    * the demo-app collector class (`/root/reference/doc/demo-app-1.org`). */
  case class Named(fn: String) extends CollectorHandler
}

object CollectorSpec {
  private implicit val fmts: Formats = DefaultFormats

  /** Parse + validate a collector spec JSON:
    * {"name":"add-user","path":"/app/add-user",
    *  "handler":{"kind":"ingest","idField":"user_id"}}
    * Returns Left(reason) on anything malformed — the deploy-time
    * validation railway the reference runs (valid-path?, evalidate). */
  def parse(json: String): Either[String, CollectorSpec] =
    try {
      val j = JsonMethods.parse(json)
      for {
        name <- (j \ "name").extractOpt[String].toRight("collector spec needs a name")
        path <- (j \ "path").extractOpt[String].toRight("collector spec needs a path")
        _ <- if (path.startsWith("/") && !path.contains("//") && path.length > 1) Right(())
             else Left(s"invalid path '$path' (absolute, non-empty, no //)")
        _ <- if (!path.startsWith("/dev/") && path != "/dev") Right(())
             else Left("the /dev/ prefix is reserved for the management plane")
        _ <- if (!path.startsWith(CollectorServer.adminPrefix) &&
                 path != CollectorServer.adminPrefix.stripSuffix("/")) Right(())
             else Left("the /admin/user-roles/ prefix is reserved for the admin plane")
        h <- parseHandler(j \ "handler")
        // optional role requirement, honored when the server runs with a
        // bearer gate (the reference's make-authorize on user resources)
        roles <- j \ "roles" match {
          case JNothing => Right(Set.empty[String])
          case JArray(rs) if rs.forall(_.isInstanceOf[JString]) =>
            Right(rs.collect { case JString(r) => r }.toSet)
          case _ => Left("roles must be an array of strings")
        }
      } yield CollectorSpec(name, path, h, roles)
    } catch { case e: Exception => Left(s"unparseable collector spec: ${e.getMessage}") }

  private def parseHandler(j: JValue): Either[String, CollectorHandler] =
    (j \ "kind").extractOpt[String] match {
      case Some("ingest") =>
        (j \ "idField").extractOpt[String].toRight("ingest handler needs idField")
          .map(CollectorHandler.Ingest(_))
      case Some("stream") =>
        (j \ "node").extractOpt[String].toRight("stream handler needs node")
          .map(CollectorHandler.StreamPush(_))
      case Some("transact") =>
        (j \ "transactor").extractOpt[String]
          .toRight("transact handler needs transactor")
          .map(CollectorHandler.Transact(_))
      case Some("named") =>
        (j \ "fn").extractOpt[String]
          .toRight("named handler needs fn")
          .map(CollectorHandler.Named(_))
      case Some("query") =>
        for {
          edn <- (j \ "edn").extractOpt[String].toRight("query handler needs edn")
          fields <- j \ "fields" match {
            case JObject(fs) =>
              val bad = fs.collect { case (n, JString(t)) if !typeNames(t) => s"$n:$t" }
              if (bad.nonEmpty) Left(s"unknown field types: ${bad.mkString(", ")}")
              else Right(fs.collect { case (n, JString(t)) => (n, t) })
            case _ => Left("query handler needs fields: {name: type, ...}")
          }
        } yield CollectorHandler.Query(edn, fields)
      case other => Left(s"unknown handler kind $other (ingest|stream|query|transact|named)")
    }

  private val typeNames = Set("string", "long", "double", "boolean")
  private[api] def toType(t: String): DataType = t match {
    case "string" => StringType
    case "long" => LongType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case other => throw new IllegalArgumentException(s"unknown type $other")
  }
}

/** F3: the dynamic REST collector surface
  * (`/root/reference/src/dataworks/collector.clj:48-156`), on the JDK's
  * built-in [[com.sun.net.httpserver.HttpServer]] — zero added
  * dependencies, which matters because the engine itself must not drag a
  * web stack onto 1000 executors; this runs on the driver (or a separate
  * management host) only.
  *
  * Routing is the reference's atomic-routes table: a concurrent map from
  * exact path to deployed spec, consulted per request, swapped atomically
  * on deploy/update/remove — a collector hot-swap never drops requests.
  * Duplicate-path protection (`other-collector-with-path?`,
  * `collector.clj:69-83`) is enforced here because this map is the one
  * place every live path is known.
  */
/** Optional bearer gate for a [[CollectorServer]]: when present, every
  * route outside `publicPaths` requires a valid unexpired HS256 token
  * (`Authorization: Bearer …`), and a spec's `roles` authorize via the
  * reference's role-expansion rule (`graft.auth.Tokens.authorized`).
  * `publicPaths` is where the register/login endpoints live — the door
  * people get their tokens from can't itself demand one.
  *
  * SECURITY NOTE (matches the reference's semantics, so it is loud here):
  * a collector spec with EMPTY `roles` admits ANY authenticated user, and
  * registration is public and unlimited — with the default
  * `requireRole = false`, anyone who can reach the port can self-register
  * and mint a token that passes every role-less route. Deployments that
  * want deny-by-default set `requireRole = true`: a token with NO roles
  * then fails role-less routes too, so nothing is reachable until an
  * admin grants the caller at least one role over the admin plane
  * (`/admin/user-roles/<user>`). */
case class BearerAuth(secret: String, publicPaths: Set[String] = Set.empty,
                      requireRole: Boolean = false)

class CollectorServer(store: DocumentStore, streams: StreamManager,
                      bindHost: String = "127.0.0.1",
                      maxBodyBytes: Int = 1 << 20,
                      maxQueryRows: Int = 10000,
                      auth: Option[BearerAuth] = None,
                      /** false = a MANAGEMENT-plane listener (the reference
                        * runs dev and user servers on separate ports,
                        * `core.clj:11-25`): user collector routes 404 here,
                        * only the boot-deployed auth doors (register/login)
                        * and whatever planes GraftApp enables (/dev, admin)
                        * are served. */
                      serveUser: Boolean = true,
                      /** The DATA-plane store for ingest writes and query
                        * reads — the reference keeps user data in its own
                        * crux node (`db/user_db.clj`) apart from the
                        * stored-function app db. Defaults to `store` (one
                        * combined universe, the rebuild's historical
                        * layout). */
                      userStore: Option[DocumentStore] = None) {

  /** Where collector ingest/query operate: the user-db when split. */
  private val dataStore: DocumentStore = userStore.getOrElse(store)

  /** The /dev management plane, attached post-construction (GraftApp wires
    * it at boot — DevResource needs the FunctionManager, which needs this
    * server). */
  @volatile private var dev: Option[DevResource] = None
  def enableDev(d: DevResource): Unit = { dev = Some(d) }
  /** The admin plane (reference: `admin/user-roles/` routes,
    * `resource/dev.clj:111` / `resource/user.clj:53`) — attached when the
    * app runs with user auth. */
  @volatile private var adminUsers: Option[graft.auth.UserAuth] = None
  def enableAdmin(u: graft.auth.UserAuth): Unit = { adminUsers = Some(u) }
  private val routes = new ConcurrentHashMap[String, CollectorSpec]()
  /** Names claimed by boot-deployed door collectors ([[deployDoor]]): a
    * regular deploy may neither replace them in place nor sweep their
    * routes away via the same-name move — the login/register doors are
    * served UNAUTHENTICATED (publicPaths), so letting a developer-role
    * caller claim one would hand them a credential-capture endpoint. */
  private val reservedNames = ConcurrentHashMap.newKeySet[String]()
  @volatile private var server: HttpServer = _
  @volatile private var pool: java.util.concurrent.ExecutorService = _

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** A request body larger than [[maxBodyBytes]] — surfaced as HTTP 413
    * instead of buffering an unbounded payload on the management host. */
  private class BodyTooLarge extends Exception
  /** A body trickled in slower than the read deadline — HTTP 408 (the
    * slow-POST half of the slowloris guard; the header half is the
    * maxReqTime knob in [[ensureStarted]]). */
  private class BodyTimeout extends Exception

  /** Lazily started: an engine with no collectors binds no port. */
  private def ensureStarted(): Unit = deployLock.synchronized {
    if (server == null) {
      // Slowloris guard, layer 1: the JDK server has NO request/response
      // time bound by default — 4 idle slow-POST connections to the
      // UNAUTHENTICATED auth doors would pin a small pool forever. These
      // are JVM-global ServerConfig knobs read at class init, so set them
      // only if the deployment didn't; layer 2 is the body() read
      // deadline, layer 3 the larger pool below.
      for ((k, v) <- Seq("sun.net.httpserver.maxReqTime" -> "60",
                         "sun.net.httpserver.maxRspTime" -> "60"))
        if (System.getProperty(k) == null) System.setProperty(k, v)
      // loopback by default: these endpoints WRITE to the store and fire
      // transactors with no authentication layer — exposing them beyond
      // the management host is an explicit deployment decision (pass the
      // interface address, put a real gateway in front)
      val s = HttpServer.create(new InetSocketAddress(bindHost, 0), 0)
      s.createContext("/", (ex: HttpExchange) => handle(ex))
      // fixed pool (not the default single-threaded dispatcher): one slow
      // query or oversized upload must not stall every other endpoint —
      // and the pool must outnumber the handful of connections a trivial
      // slow-POST attacker holds open within the read deadline
      pool = java.util.concurrent.Executors.newFixedThreadPool(16, r => {
        val t = new Thread(r, "graft-collector"); t.setDaemon(true); t
      })
      s.setExecutor(pool)
      s.start()
      server = s
    }
  }

  def port: Int = deployLock.synchronized { ensureStarted(); server.getAddress.getPort }

  /** Deploy (create semantics): rejects a path already owned by a DIFFERENT
    * collector; same-name redeploy is the update path and swaps in place. */
  private val deployLock = new Object

  def deploy(spec: CollectorSpec): Either[String, CollectorSpec] = deployLock.synchronized {
    // a management-plane listener serves no user collectors at all — only
    // the boot doors (deployDoor) and the /dev + admin planes
    if (!serveUser)
      return Left("this listener is the management plane; deploy collectors on the user server")
    // /dev/* is the management plane's address space: a collector deployed
    // there would SHADOW the plane (dispatch checks routes first) and swap
    // the developer-role gate for the collector's own roles. parse()
    // rejects it too; this guards direct deploy() callers.
    if (spec.path.startsWith("/dev/") || spec.path == "/dev")
      return Left("the /dev/ prefix is reserved for the management plane")
    // same shadow risk for the admin plane's prefix
    if (spec.path.startsWith(CollectorServer.adminPrefix) ||
        spec.path == CollectorServer.adminPrefix.stripSuffix("/"))
      return Left("the /admin/user-roles/ prefix is reserved for the admin plane")
    reservationConflict(spec) match {
      case Some(reason) => Left(reason)
      case None => deployImpl(spec)
    }
  }

  /** The auth doors' identities are reserved BOTH ways: their paths are in
    * publicPaths (served unauthenticated — a foreign handler there captures
    * plaintext credentials), and their NAMES own those routes (a same-name
    * deploy elsewhere would sweep the door's route away). Only the boot
    * path ([[deployDoor]]) may claim either. Exposed so the management
    * plane can refuse pre-commit (no stored doc for a spec [[deploy]] will
    * never accept); [[deploy]] re-checks authoritatively under its lock. */
  def reservationConflict(spec: CollectorSpec): Option[String] =
    if (auth.exists(_.publicPaths(spec.path)))
      Some(s"path ${spec.path} is a reserved public auth door")
    else if (reservedNames.contains(spec.name))
      Some(s"collector name '${spec.name}' is a reserved auth door")
    else None

  /** Boot-only deploy of a fixed auth door: claims the name as reserved so
    * no later [[deploy]] can replace or sweep it. Not reachable from the
    * HTTP management plane (FunctionManager/DevResource go through
    * [[deploy]]). */
  private[graft] def deployDoor(spec: CollectorSpec): Either[String, CollectorSpec] =
    deployLock.synchronized {
      reservedNames.add(spec.name)
      deployImpl(spec)
    }

  private def deployImpl(spec: CollectorSpec): Either[String, CollectorSpec] = {
    // deploys are fully serialized (management-plane rate): the claim-check
    // and the old-route sweep must be ONE atomic step — a bin-level
    // compute() alone still lets two same-name deploys to different paths
    // each removeIf the other's fresh route, leaving the collector
    // unrouted while both callers got Right
    val owner = routes.get(spec.path)
    if (owner != null && owner.name != spec.name)
      Left(s"collector-with-path-already-exists: ${spec.path} owned by ${owner.name}")
    else {
      // an update may move the collector to a new path — drop the old route
      routes.entrySet().removeIf(e => e.getValue.name == spec.name && e.getKey != spec.path)
      routes.put(spec.path, spec)
      ensureStarted()
      Right(spec)
    }
  }

  def remove(name: String): Unit =
    // a reserved door can't be removed either — delete would be the cheap
    // two-step version of the replace attack (remove, then redeploy freely)
    if (!reservedNames.contains(name))
      routes.entrySet().removeIf(_.getValue.name == name)

  def deployed: Map[String, CollectorSpec] = {
    val b = Map.newBuilder[String, CollectorSpec]
    routes.forEach((p, s) => b += p -> s)
    b.result()
  }

  /** Under deployLock, the SAME monitor deploy/deployImpl/ensureStarted
    * hold: with a split lock a racing deploy could pass its route-table
    * work, lose the stop() interleaving, then resume into ensureStarted
    * and bind a brand-new listener AFTER stop() returned — an orphaned
    * live server nothing would ever stop. */
  def stop(): Unit = deployLock.synchronized {
    if (server != null) { server.stop(0); server = null }
    if (pool != null) { pool.shutdownNow(); pool = null }
    routes.clear()
  }

  // ------------------------------------------------------------- dispatch

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      val spec = routes.get(path)
      val isPublic = spec != null && auth.exists(_.publicPaths(spec.path))
      // gate BEFORE the 404: on an auth'd server an unauthenticated probe
      // must not be able to distinguish deployed from undeployed paths
      // (401 uniformly); only a valid token sees 404s and role 403s
      authenticate(ex, isPublic) match {
        case Left(()) => () // 401 already written
        case Right(claims) =>
          val roles = claims.map(_.roles).getOrElse(Set.empty[String])
          if (spec != null) {
            // deny-by-default knob: with requireRole on, a role-less route
            // still demands SOME granted role — self-registered tokens
            // (empty roles) stop at every non-public door
            if (auth.isDefined && !isPublic &&
                (!graft.auth.Tokens.authorized(roles, spec.roles) ||
                 (auth.exists(_.requireRole) && roles.isEmpty)))
              respond(ex, 403, s"""{"status":"failure","message":"insufficient role"}""")
            else (spec.handler, ex.getRequestMethod) match {
              case (h: CollectorHandler.Ingest, "POST") => ingest(ex, h)
              case (h: CollectorHandler.StreamPush, "POST") => push(ex, spec, h)
              case (h: CollectorHandler.Query, "GET") => query(ex, h)
              case (h: CollectorHandler.Transact, "POST") => transact(ex, h)
              case (h: CollectorHandler.Named, "POST") => named(ex, h)
              case (_, m) =>
                respond(ex, 405, s"""{"status":"failure","message":"method $m not allowed"}""")
            }
          } else (dev, adminUsers) match {
            // the management plane needs the developer/<type> role when
            // the server is gated (make-authorize-by-fn, dev.clj)
            case (Some(d), _) if path.startsWith("/dev/") =>
              d.requiredRole(path) match {
                // an ill-formed /dev path has NO derivable role — it must
                // 404 generically, not fall through with an EMPTY required
                // set (authorized(roles, ∅) is true for any valid token,
                // bypassing requireRole) and leak the function-type list
                case None =>
                  respond(ex, 404, s"""{"status":"failure","message":"no such endpoint"}""")
                case Some(role) =>
                  if (auth.isDefined &&
                      !graft.auth.Tokens.authorized(roles, Set(role)))
                    respond(ex, 403, s"""{"status":"failure","message":"insufficient role"}""")
                  else {
                    val (code, json) = d.handle(ex.getRequestMethod, path, body(ex))
                    respond(ex, code, json)
                  }
              }
            // the admin plane (reference admin-resource, utils/auth.clj:115):
            // GET /admin/user-roles/<user> → public user doc, POST with
            // {"roles":[…]} → grant. Gated on admin/user-roles, which the
            // reference's role expansion opens to admin/all + developer/all
            // holders only (make-authorize with no roles = the same pair).
            case (_, Some(u)) if path.startsWith(CollectorServer.adminPrefix) =>
              if (auth.isDefined &&
                  !graft.auth.Tokens.authorized(roles, Set(CollectorServer.adminRole)))
                respond(ex, 403, s"""{"status":"failure","message":"insufficient role"}""")
              else admin(ex, u, path.stripPrefix(CollectorServer.adminPrefix))
            case _ =>
              respond(ex, 404, s"""{"status":"failure","message":"no such endpoint"}""")
          }
      }
    } catch {
      case _: BodyTooLarge =>
        tryRespond(ex, 413,
          s"""{"status":"failure","message":"request body exceeds $maxBodyBytes bytes"}""")
      case _: BodyTimeout =>
        tryRespond(ex, 408,
          s"""{"status":"failure","message":"request body read timed out"}""")
      case e: Exception =>
        // generic body: exception messages embed filesystem paths and
        // engine internals — that belongs in the server log, not in a
        // response any self-registered token (or, on an ungated server,
        // anyone) can read
        log.warn(s"request ${ex.getRequestMethod} ${ex.getRequestURI.getPath} failed", e)
        tryRespond(ex, 500, s"""{"status":"failure","message":"internal error"}""")
    } finally { responded.remove(ex); ex.close() }

  /** Exchanges whose response headers already went out. NOT an exchange
    * attribute: HttpExchange.setAttribute stores in the shared HttpContext
    * map, so one response would poison every later exchange of the
    * context. Identity-keyed; handle()'s finally removes the entry. */
  private val responded = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[HttpExchange, java.lang.Boolean]())

  /** The catch-all variant of [[respond]]: if headers already went out
    * (client disconnected mid-write, or the failure happened after a
    * response started), a second sendResponseHeaders would itself throw
    * and escape the dispatcher — skip it instead. */
  private def tryRespond(ex: HttpExchange, code: Int, json: String): Unit =
    if (!responded.contains(ex))
      try respond(ex, code, json)
      catch { case _: java.io.IOException => () } // connection already gone

  /** Bearer authentication (reference: `bearer-auth`, `utils/auth.clj:39`).
    * Right(claims) = proceed (None claims ⇔ ungated or public route);
    * Left(()) = a uniform 401 has been written. Role authorization happens
    * at the dispatch site, where the route's (or dev plane's) requirement
    * is known. */
  private def authenticate(ex: HttpExchange,
                           isPublic: Boolean): Either[Unit, Option[graft.auth.TokenClaims]] =
    auth match {
      case None => Right(None)
      case Some(_) if isPublic => Right(None)
      case Some(gate) =>
        val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val claims =
          if (header.startsWith("Bearer "))
            graft.auth.Tokens.verify(header.stripPrefix("Bearer "), gate.secret)
          else None
        claims match {
          case None =>
            ex.getResponseHeaders.set("WWW-Authenticate", "Bearer")
            respond(ex, 401, s"""{"status":"failure","message":"valid bearer token required"}""")
            Left(())
          case some => Right(some)
        }
    }

  /** Bounded body read: never buffers more than [[maxBodyBytes]] + 1 bytes
    * regardless of what the client streams (readAllBytes on an unbounded
    * request is a driver-OOM vector). */
  private def body(ex: HttpExchange): String = {
    val in = ex.getRequestBody
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    // total-time deadline: a client trickling one byte per minute keeps
    // each read() returning (so maxReqTime's idle detection never fires)
    // while pinning this pool thread — bound the WHOLE body read
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var n = in.read(chunk)
    while (n >= 0) {
      buf.write(chunk, 0, n)
      if (buf.size() > maxBodyBytes) throw new BodyTooLarge
      if (System.nanoTime() > deadline) throw new BodyTimeout
      n = in.read(chunk)
    }
    new String(buf.toByteArray, UTF_8)
  }

  private def ingest(ex: HttpExchange, h: CollectorHandler.Ingest): Unit = {
    val doc = body(ex)
    JsonMethods.parseOpt(doc).flatMap(j => (j \ h.idField) match {
      case JString(s) => Some(s)
      case JInt(i) => Some(i.toString)
      case _ => None
    }) match {
      case None =>
        // idField is spec-controlled text — escape it or a crafted field
        // name forges/breaks the JSON error body
        respond(ex, 400, s"""{"status":"failure","message":${
          JsonMethods.compact(JsonMethods.render(
            JString(s"body must be JSON with field ${h.idField}")))}}""")
      // ':'-prefixed ids are the stored-function namespace (':collector/…',
      // ':stream/…', ':transactor/…' docs that GraftApp.init bootstraps and
      // ACTIVATES on restart) — an HTTP client must not be able to plant
      // control-plane documents through a data-ingest endpoint. The
      // reference keeps user docs in a separate user-db Crux node for the
      // same reason (`/root/reference/src/dataworks/db/user_db.clj`).
      case Some(id) if id.startsWith(":") =>
        respond(ex, 400,
          s"""{"status":"failure","message":"ids starting with ':' are reserved for stored functions"}""")
      case Some(id) =>
        val tx = dataStore.put(id, doc)
        respond(ex, 201,
          s"""{"status":"success","id":${JsonMethods.compact(JsonMethods.render(JString(id)))},"txTime":${tx.getTime}}""")
    }
  }

  private def push(ex: HttpExchange, spec: CollectorSpec, h: CollectorHandler.StreamPush): Unit =
    // existence check, like transact's: a 202 for a node that doesn't
    // exist (typo in the spec, node deleted since) is silent data loss —
    // and with MemoryIO the publish computeIfAbsent-creates an orphan
    // stream no query consumes, accumulating driver memory client-rate
    if (streams.topology.node(h.node).isEmpty)
      respond(ex, 404, s"""{"status":"failure","message":${
        JsonMethods.compact(JsonMethods.render(JString(s"no stream node ${h.node}")))}}""")
    else {
      streams.stream(h.node, spec.name, body(ex))
      respond(ex, 202, s"""{"status":"success","message":"pushed"}""")
    }

  private def transact(ex: HttpExchange, h: CollectorHandler.Transact): Unit = {
    // args parse TOTALLY or the request fails: silently DROPPING an
    // unsupported element (a boolean, a null, a nested object) shifts
    // every later positional argument while still answering 202 — the
    // fire-and-forget side effect then runs with corrupted arity. An
    // absent "args" key means a no-arg invocation (fine); a present one
    // must be an array of scalars.
    val parsed: Either[String, Seq[String]] = JsonMethods.parseOpt(body(ex)) match {
      case None => Right(Nil) // empty body = no args (reference go-block call)
      case Some(j) => (j \ "args") match {
        case JNothing => Right(Nil)
        case JArray(vs) =>
          vs.foldLeft[Either[String, Vector[String]]](Right(Vector.empty)) {
            case (acc, v) => acc.flatMap { xs => v match {
              case JString(s) => Right(xs :+ s)
              case JInt(i) => Right(xs :+ i.toString)
              case JDouble(d) => Right(xs :+ d.toString)
              case JBool(b) => Right(xs :+ b.toString)
              case other => Left(s"unsupported args element $other (scalars only)")
            }}
          }
        case other => Left(s""""args" must be an array, got $other""")
      }
    }
    parsed match {
      case Left(reason) =>
        respond(ex, 400, s"""{"status":"failure","message":${
          JsonMethods.compact(JsonMethods.render(JString(reason)))}}""")
        return
      case Right(_) => ()
    }
    val args = parsed.toOption.get
    // transactors ONLY: registry.names also lists transformers/column fns,
    // and answering 202 for one of those would report success for a side
    // effect that then dies on a discarded Future
    if (!streams.topology.registry.transactorExists(h.name))
      respond(ex, 404, s"""{"status":"failure","message":${
        JsonMethods.compact(JsonMethods.render(JString(s"no transactor ${h.name}")))}}""")
    else {
      // fire-and-forget (the reference's go-block semantics): failures
      // surface on the Future, not the HTTP caller
      streams.topology.registry.transact(h.name, args)
      respond(ex, 202, s"""{"status":"success","message":"transacting"}""")
    }
  }

  private def named(ex: HttpExchange, h: CollectorHandler.Named): Unit =
    streams.topology.registry.httpHandler(h.fn) match {
      case None =>
        respond(ex, 404, s"""{"status":"failure","message":"no handler ${h.fn}"}""")
      case Some(f) =>
        val (code, json) = f(body(ex))
        respond(ex, code, json)
    }

  private def query(ex: HttpExchange, h: CollectorHandler.Query): Unit = {
    val schema = StructType(h.fields.map { case (n, t) => StructField(n, CollectorSpec.toType(t)) })
    // qPublic: a deployed query collector must not be able to bind
    // reserved ':' docs — on a combined store, :user/* docs carry bcrypt
    // hashes and :collector/:stream docs map the control plane
    // a :timeout query hands back a CacheRegistry-persisted result; a
    // long-lived server must release it per request or each hit leaks a
    // strong ref + executor storage. The release is SCOPED to this
    // handler thread's registrations: a global drain here would unpersist
    // a concurrent request's in-flight :timeout result, whose collect
    // would then recompute outside its cancellable job group. Long-lived
    // staged indexes are pinned via Resident, OUTSIDE the registry.
    graft.core.CacheRegistry.scoped {
      dataStore.qPublic(h.edn, schema) match {
        case Left(err) => respond(ex, 400, s"""{"status":"failure","message":${JsonMethods.compact(JsonMethods.render(JString(err)))}}""")
        case Right(df) =>
          // management-plane result sizes (entity lookups, registry listings);
          // large analytical results belong on the query API, not REST — so
          // the collect is LIMIT-bounded and an over-limit result is a typed
          // 413, never an unbounded driver buffer
          val rows = df.limit(maxQueryRows + 1).toJSON.collect()
          if (rows.length > maxQueryRows)
            respond(ex, 413,
              s"""{"status":"failure","message":"result exceeds maxRows=$maxQueryRows; narrow the query"}""")
          else respond(ex, 200, rows.mkString("[", ",", "]"))
      }
    }
  }

  /** The reference's admin-resource body (`utils/auth.clj:115-152`): GET
    * returns the user's public doc (hash never leaves [[graft.auth.UserAuth]]);
    * POST `{"roles": ["ns/role", …]}` grants — its reply uses the
    * reference's exact status/message vocabulary (`user-roles-updated` /
    * `user-not-found`). */
  private def admin(ex: HttpExchange, u: graft.auth.UserAuth, user: String): Unit =
    if (user.isEmpty || user.contains("/"))
      respond(ex, 404, s"""{"status":"failure","message":"user-not-found"}""")
    else ex.getRequestMethod match {
      case "GET" => u.getUser(user) match {
        case Some(doc) => respond(ex, 200, doc)
        case None => respond(ex, 404, s"""{"status":"failure","message":"user-not-found"}""")
      }
      case "POST" =>
        JsonMethods.parseOpt(body(ex)).map(_ \ "roles") match {
          case Some(JArray(rs)) if rs.forall(_.isInstanceOf[JString]) =>
            // replace, not merge: the reference CASes :user/roles to exactly
            // the posted set, which is how an admin revokes a role
            u.setRoles(user, rs.collect { case JString(r) => r }.toSet) match {
              case Right(_) =>
                respond(ex, 200, s"""{"status":"success","message":"user-roles-updated"}""")
              case Left(_) =>
                respond(ex, 404, s"""{"status":"failure","message":"user-not-found"}""")
            }
          case _ =>
            respond(ex, 400,
              s"""{"status":"failure","message":"body must be JSON with roles: [\\"ns/role\\", ...]"}""")
        }
      case m =>
        respond(ex, 405, s"""{"status":"failure","message":"method $m not allowed"}""")
    }

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    responded.add(ex)
    // HEAD: the JDK forces content-length 0 and throws on any body write —
    // send headers only (a HEAD probe previously cascaded into a
    // double-respond 500 that escaped the dispatcher)
    if (ex.getRequestMethod == "HEAD") { ex.sendResponseHeaders(code, -1); return }
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}

object CollectorServer {
  /** The admin plane's route prefix — the reference mounts `auth/admin` at
    * `admin/user-roles/` on both its dev and user servers
    * (`resource/dev.clj:111`, `resource/user.clj:53`). */
  val adminPrefix = "/admin/user-roles/"
  /** Role gating the admin plane. `Tokens.expandAccepted` opens it to
    * `admin/all` and `developer/all` holders — exactly the set the
    * reference's no-arg `make-authorize` accepts — plus an explicitly
    * granted `admin/user-roles` (delegated user administration). */
  val adminRole = "admin/user-roles"
}
