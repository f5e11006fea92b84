package graft

import org.apache.spark.sql.SparkSession

import graft.registry.{FunctionManager, FunctionRegistry}
import graft.store.DocumentStore
import graft.stream.{AlertScheduler, NodeSpec, StreamIO, StreamManager, Topology}

/** The assembled engine — the analog of the reference's app boot
  * (`/root/reference/src/dataworks/core.clj` wiring: app db + function
  * registry + stream graph + control plane + alert scheduler, started in
  * dependency order). A reference user's whole runtime surface hangs off
  * this one object:
  *
  * {{{
  *   val app = GraftApp(spark, "/data/appdb", new KafkaIO(spark, brokers, ckpt))
  *   app.start()                                   // bootstrap + control plane + alerts
  *   app.functions.create("stream", "process", """{"name":"stream/process", …}""")
  *   app.store.q("{:find [?e] :where [[?e :stored-function/type]]}", schema)
  *   app.stop()
  * }}}
  *
  * Start order mirrors the reference: the store must serve the bootstrap
  * read; sinks start from their checkpoints (hot-swap contract holds
  * across restarts); the control plane subscribes last so an update can't
  * race the bootstrap; the alert poll is independent. Stop is the reverse.
  */
class GraftApp(val spark: SparkSession, val store: DocumentStore,
               val io: StreamIO, val registry: FunctionRegistry,
               authSecret: Option[String] = None,
               requireRole: Boolean = false,
               /** true = the reference's two-listener layout (`core.clj:
                 * 11-25`): user collectors on one port, the /dev + admin
                 * management planes on a SEPARATE one ([[devServer]]), so
                 * network policy can firewall the management plane
                 * independently of the data plane. Default keeps the
                 * single-server layout (one port, role-gated /dev). */
               splitPlanes: Boolean = false,
               /** The reference's user-db/app-db split (`db/user_db.clj` vs
                 * `db/app_db.clj`): when set, collector ingest writes and
                 * query reads operate on THIS store while stored functions,
                 * accounts, and alerts stay in [[store]]. GraftApp owns it
                 * once handed in (closed on [[stop]]). Default: one
                 * combined document universe. */
               val userStore: Option[DocumentStore] = None) {

  val topology = new Topology(io, registry)
  val streams = new StreamManager(topology)
  private val bearer = authSecret.map(s => graft.api.BearerAuth(s,
    publicPaths = Set(GraftApp.registerPath, GraftApp.loginPath),
    requireRole = requireRole))
  /** With a secret, the REST surface runs behind the bearer gate — only
    * the register/login doors stay public (the reference's auth wiring,
    * `/root/reference/src/dataworks/core.clj` + `utils/auth.clj`).
    * `requireRole` is the deny-by-default knob (see [[graft.api.BearerAuth]]). */
  val collectors = new graft.api.CollectorServer(store, streams, auth = bearer,
    userStore = userStore)
  /** The management-plane listener when [[splitPlanes]] — serves ONLY
    * /dev, the admin plane, and the auth doors; user collector routes
    * 404 and deploys are refused. */
  val devServer: Option[graft.api.CollectorServer] =
    if (splitPlanes)
      Some(new graft.api.CollectorServer(store, streams, auth = bearer,
        serveUser = false))
    else None
  /** User accounts + credential flow (present iff the gate is on). */
  val users: Option[graft.auth.UserAuth] =
    authSecret.map(new graft.auth.UserAuth(store, _))
  val functions = new FunctionManager(store, streams, Some(collectors))
  /** The /dev HTTP management plane (`resource/dev.clj`): stored-function
    * CRUD over the same railway as [[functions]]; `developer/<type>`-gated
    * when the server runs with auth. */
  val devResource = new graft.api.DevResource(store, functions)
  locally {
    // management planes live on the dev listener when split, else ride
    // the single server; the user-plane server then 404s /dev and admin
    val mgmt = devServer.getOrElse(collectors)
    mgmt.enableDev(devResource)
    // the admin plane (role grants over HTTP) — the /dev developer/<type>
    // gating is only administrable remotely with it
    users.foreach(mgmt.enableAdmin)
  }
  val alerts = new AlertScheduler(store, registry)

  /** T19 boot: wire persisted stream functions, start sinks, subscribe the
    * control plane, start the alert poll. Idempotent per component. */
  def start(): GraftApp = {
    // sessions built without spark.sql.extensions=graft.GraftExtensions
    // still get the SQL function surface — op-spec strings like
    // {"filter": "text_quality_score(value) >= 0.6"} must resolve on any
    // GraftApp runtime. Names already registered (a user's own temp
    // function, or a previous start()) are left alone: silently replacing
    // a user's vec_dot with ours would change their SQL's answers.
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name, builder, "built-in")
    }
    streams.bootstrapFromStore(store)
    // T19 for collectors: persisted `:collector/…` docs re-deploy their
    // routes, same as the reference's bootstrap starting every stored fn
    locally {
      import spark.implicits._
      val log = org.slf4j.LoggerFactory.getLogger(getClass)
      store.db().filter("id LIKE ':collector/%'")
        .select("doc").as[String].collect()
        .foreach(json => graft.api.CollectorSpec.parse(json) match {
          // a persisted collector that fails to come back is an operator
          // page, not a silent drop — the doc survives in the store either
          // way, so a fixed redeploy can still revive it
          case Left(err) =>
            log.warn(s"collector bootstrap: dropping unparseable spec: $err")
          case Right(spec) => collectors.deploy(spec).left.foreach(err =>
            log.warn(s"collector bootstrap: '${spec.name}' not redeployed: $err"))
        })
    }
    // auth doors: register/login deployed as fixed routes at boot, like
    // the reference's static yada resources — not stored functions, so a
    // store wipe can't lock every operator out of their own engine
    users.foreach { u =>
      u.registerHandlers(registry)
      // a failed door deploy is BOOT-FATAL, never logged-and-ignored: the
      // only way it fails is a foreign collector squatting on a public
      // path — which would be served UNAUTHENTICATED (publicPaths exempts
      // the path) while locking every operator out of token minting
      // the doors mount on EVERY listener (the reference's dev and user
      // servers each carry their own register/login): a split management
      // plane must be able to mint tokens without the data-plane port
      for {
        srv <- Seq(collectors) ++ devServer
        door <- Seq(
          graft.api.CollectorSpec("auth-register",
            GraftApp.registerPath, graft.api.CollectorHandler.Named("auth/register")),
          graft.api.CollectorSpec("auth-login",
            GraftApp.loginPath, graft.api.CollectorHandler.Named("auth/login")))
      } srv.deployDoor(door).left.foreach(err =>
        throw new IllegalStateException(
          s"auth door '${door.name}' cannot claim ${door.path}: $err — " +
            "remove the conflicting collector before enabling auth"))
    }
    streams.startControlPlane(store, NodeSpec.parse)
    alerts.start()
    this
  }

  def stop(): Unit = {
    alerts.stop()
    streams.stopAll()
    collectors.stop()
    devServer.foreach(_.stop())
    userStore.foreach(_.close())
    // release the store's single-driver lock so a successor app on the same
    // path can boot (crash recovery without this is the stale-pid reclaim)
    store.close()
  }
}

object GraftApp {
  /** The fixed auth door routes (reference: `auth/dev.clj` resources). */
  val registerPath = "/user/new-user"
  val loginPath = "/app/login"

  def apply(spark: SparkSession, dbPath: String, io: StreamIO,
            registry: FunctionRegistry = FunctionRegistry.default,
            authSecret: Option[String] = None,
            requireRole: Boolean = false,
            splitPlanes: Boolean = false,
            userDbPath: Option[String] = None): GraftApp = {
    val appStore = DocumentStore(spark, dbPath)
    // a user-db that fails to open (e.g. locked by another driver) must
    // release the app store's just-taken driver lock, or a same-JVM retry
    // with a fixed path dies on "already open" until restart
    val userStore =
      try userDbPath.map(DocumentStore(spark, _))
      catch { case e: Throwable => appStore.close(); throw e }
    new GraftApp(spark, appStore, io, registry,
      authSecret, requireRole, splitPlanes, userStore)
  }
}
