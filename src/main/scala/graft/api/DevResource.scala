package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.registry.FunctionManager
import graft.store.DocumentStore

/** The developer management plane over HTTP — the reference's dev
  * resources (`/root/reference/src/dataworks/resource/dev.clj`):
  *
  *   GET    /dev/<type>/create         → all stored functions of the type
  *   POST   /dev/<type>/create         → create! (name from the body spec)
  *   GET    /dev/<type>/update/<name>  → the stored doc
  *   POST   /dev/<type>/update/<name>  → update!
  *   DELETE /dev/<type>/update/<name>  → delete! (extension: the reference
  *                                       has no HTTP delete; ours reuses
  *                                       the same railway)
  *   POST   /dev/<type>/template       → F9 spec templating: deep
  *                                       find/replace over a spec body
  *                                       (the reference's recursive-replace
  *                                       as its dev macros use it), no
  *                                       side effects
  *
  * Bodies are the SAME JSON specs the Scala `FunctionManager` takes —
  * one management format everywhere. Failures return the reference's 406
  * (`if-failure-response`, dev.clj:56-58). Role gating (`developer/<type>`
  * per `make-authorize-by-fn`, with `developer/all`/`admin/all` implied)
  * is enforced by [[CollectorServer]] when it runs with a [[BearerAuth]].
  */
object DevResource {
  /** F9 over the management plane's JSON specs: deep find/replace with the
    * reference's `recursive-replace` semantics (`utils/common.clj:505-522`
    * — used by its dev macros to template spec forms before shipping,
    * `utils/dev.clj:140,151`): containers are recursed into, never
    * compared wholesale; only leaves are replaced — and FIELD NAMES
    * participate (a Clojure MapEntry is a vector, so its map pass renames
    * matching keys too). */
  def deepReplace(j: JValue, find: JValue, repl: JValue): JValue = j match {
    case JObject(fields) => JObject(fields.map { case (k, v) =>
      val key =
        if (find == JString(k)) repl match {
          case JString(r) => r
          case other => JsonMethods.compact(JsonMethods.render(other))
        } else k
      (key, deepReplace(v, find, repl))
    })
    case JArray(items) => JArray(items.map(deepReplace(_, find, repl)))
    case leaf => if (leaf == find) repl else leaf
  }
}

class DevResource(store: DocumentStore, functions: FunctionManager) {
  private implicit val fmts: Formats = DefaultFormats

  /** The role a request on `path` needs when the server is gated. */
  def requiredRole(path: String): Option[String] =
    parsePath(path).map { case (tpe, _) => s"developer/$tpe" }

  /** (type, action-rest) for a well-formed /dev path. */
  private def parsePath(path: String): Option[(String, String)] =
    path.split("/").toList match {
      case "" :: "dev" :: tpe :: rest if functions.functionTypes(tpe) =>
        Some((tpe, rest.mkString("/")))
      case _ => None
    }

  private def err(code: Int, msg: String): (Int, String) =
    (code, JsonMethods.compact(JsonMethods.render(
      JObject("status" -> JString("failure"), "message" -> JString(msg)))))

  private def ok(code: Int, fields: (String, JValue)*): (Int, String) =
    (code, JsonMethods.compact(JsonMethods.render(
      JObject(("status" -> JString("success")) :: fields.toList: _*))))

  /** Management name = the spec name's local part ("kafka/input" → "input")
    * — the convention every FunctionManager caller in the codebase uses. */
  private def mgmtName(specJson: String): Option[String] =
    JsonMethods.parseOpt(specJson)
      .flatMap(j => (j \ "name").extractOpt[String])
      .map(n => n.substring(n.lastIndexOf('/') + 1))

  import DevResource.deepReplace

  /** `replace-these` over a spec: `{"spec": <spec>, "replace":
    * [[find, repl], ...]}` → the templated spec. Tuples apply
    * left-to-right (later tuples see earlier results). */
  private def template(body: String): (Int, String) =
    JsonMethods.parseOpt(body) match {
      case None => err(400, "body must be JSON")
      case Some(j) => (j \ "spec") match {
        case JNothing => err(400, "body must carry a 'spec' field")
        case spec =>
          val tuples = (j \ "replace") match {
            case JArray(ts) => ts.map {
              case JArray(List(f, r)) => Right((f, r))
              case other => Left(JsonMethods.compact(JsonMethods.render(other)))
            }
            case JNothing => scala.collection.immutable.Nil
            case _ => List(Left("'replace' must be an array of [find, replace] pairs"))
          }
          tuples.collectFirst { case Left(bad) => bad } match {
            case Some(bad) => err(400, s"bad replace tuple: $bad")
            case None =>
              val templated = tuples.collect { case Right((f, r)) => (f, r) }
                .foldLeft(spec) { case (s, (f, r)) => deepReplace(s, f, r) }
              ok(200, "spec" -> templated)
          }
      }
    }

  def handle(method: String, path: String, body: String): (Int, String) =
    parsePath(path) match {
      case None => err(404, "no such dev resource (types: " +
        functions.functionTypes.toSeq.sorted.mkString(", ") + ")")
      case Some((tpe, action)) => (method, action.split("/").toList) match {
        case ("GET", "create" :: Nil) => list(tpe)
        case ("POST", "template" :: Nil) => template(body)
        case ("POST", "create" :: Nil) =>
          mgmtName(body) match {
            case None => err(400, "spec body must be JSON with a name field")
            case Some(name) => functions.create(tpe, name, body) match {
              case Right(id) => ok(201, "id" -> JString(id))
              case Left(e) => err(406, e) // the reference's if-failure-response
            }
          }
        case ("GET", "update" :: name :: Nil) =>
          store.entity(graft.query.Functions.namespacedId(tpe, name)) match {
            case Some(doc) => (200, doc)
            case None => err(404, s"no stored $tpe '$name'")
          }
        case ("POST", "update" :: name :: Nil) =>
          functions.update(tpe, name, body) match {
            case Right(id) => ok(200, "id" -> JString(id))
            case Left(e) => err(406, e)
          }
        case ("DELETE", "update" :: name :: Nil) =>
          functions.delete(tpe, name) match {
            case Right(id) => ok(200, "id" -> JString(id))
            case Left(e) => err(406, e)
          }
        // known actions with the wrong verb are 405; anything else under
        // the type is an unknown resource — 404, like the rest of the plane
        case (m, "create" :: Nil) =>
          err(405, s"method $m not allowed on /dev/$tpe/create")
        case (m, "update" :: _ :: Nil) =>
          err(405, s"method $m not allowed on /dev/$tpe/update")
        case (m, "template" :: Nil) =>
          err(405, s"method $m not allowed on /dev/$tpe/template")
        case _ => err(404, s"no such dev resource /dev/$tpe/$action " +
          "(actions: create, update/<name>, template)")
      }
    }

  /** `get-stored-functions`: every live doc of the type, as a JSON array
    * of {id, spec}. Management-plane cardinality (a registry listing). */
  private def list(tpe: String): (Int, String) = {
    import store.spark.implicits._
    val docs = store.db()
      .filter(s"id LIKE ':$tpe/%'")
      .select("id", "doc").as[(String, String)].collect()
    (200, docs.map { case (id, doc) =>
      s"""{"id":${JsonMethods.compact(JsonMethods.render(JString(id)))},"spec":$doc}"""
    }.mkString("[", ",", "]"))
  }
}
