package graft.registry

import graft.query.Functions
import graft.store.DocumentStore
import graft.stream.{NodeSpec, StreamManager}

/** Stored-function management plane: the create!/update!/delete lifecycle
  * the reference exposes per function type
  * (`/root/reference/src/dataworks/resource/dev.clj:22-86`), with the `->?`
  * validation railway (`/root/reference/src/dataworks/utils/common.clj:8-27`)
  * as an Either chain (F5) and the reference's validators (F6):
  * `valid-name?`, `parseable?`, duplicate-check on create,
  * `updating-correct-function?` on update.
  *
  * Persistence is the bitemporal app db (every deploy is a new doc version
  * — full audit history, time-travel debuggable); activation is the
  * control-plane broadcast (T18) every node consumes.
  */
class FunctionManager(store: DocumentStore, manager: StreamManager,
                      collectors: Option[graft.api.CollectorServer] = None) {

  val functionTypes = Set("collector", "transformer", "transactor", "stream")

  private def validName(name: String): Either[String, String] =
    if (name.matches("[A-Za-z][A-Za-z0-9._-]*")) Right(name)
    else Left(s"invalid name '$name' (letters, digits, . _ - ; must start with a letter)")

  private def validType(tpe: String): Either[String, String] =
    if (functionTypes.contains(tpe)) Right(tpe)
    else Left(s"unknown stored-function type '$tpe' (one of ${functionTypes.mkString(", ")})")

  private def parseableSpec(tpe: String, name: String, specJson: String): Either[String, String] =
    tpe match {
      case "stream" =>
        NodeSpec.parse(specJson).toRight(s"unparseable stream spec: $specJson")
          .flatMap(manager.topology.validate)
          .flatMap { n =>
            // same identity rule as collectors: the stored-function name IS
            // the node's local name. Without it, update/<name> could
            // silently retarget the doc to a DIFFERENT node — the original
            // keeps running with no backing doc (unmanageable, and gone
            // after restart). Consequence: stream functions are keyed by
            // local name, unique across kafka/ and stream/ namespaces
            // (which the :stream/<name> doc id already forces).
            val local = n.name.full.substring(n.name.full.lastIndexOf('/') + 1)
            if (local == name) Right(specJson)
            else Left(s"stream spec node '${n.name.full}' must have local " +
              s"name '$name' (the stored-function identity)")
          }
      case "collector" if collectors.isDefined =>
        // deploy-time "evalidate" (handler shape) + duplicate-path check
        // (`/root/reference/src/dataworks/collector.clj:69-83`) BEFORE the
        // store transaction, so a rejected deploy leaves no audit row
        graft.api.CollectorSpec.parse(specJson).flatMap { spec =>
          collectors.get.deployed.get(spec.path) match {
            case Some(owner) if owner.name != spec.name =>
              Left(s"collector-with-path-already-exists: ${spec.path} (${owner.name})")
            case _ => Right(spec)
          }
        }.flatMap { spec =>
          // reserved auth-door identities (login/register paths + names)
          // are refused pre-commit too — deploy() would reject them, and a
          // stored doc for an undeployable route is a ghost (ADVICE r8: the
          // credential-capture hijack went through exactly this gap)
          collectors.get.reservationConflict(spec).toLeft(spec)
        }.flatMap { spec =>
          // the stored-function identity and the route identity must be ONE
          // name: otherwise delete/update key the route table under a name
          // deploy never registered — ghost endpoints that outlive their doc
          if (spec.name == name) Right(specJson)
          else Left(s"collector spec name '${spec.name}' must equal the " +
            s"stored-function name '$name'")
        }
      case _ => // non-stream types carry opaque registry references
        if (specJson != null && specJson.trim.startsWith("{")) Right(specJson)
        else Left("spec must be a JSON object")
    }

  /** create!: railway — name → type → parse → must-not-exist (the
    * reference's duplicate check + `match nil` create transaction,
    * `/root/reference/src/dataworks/db/app_db.clj:95-113`). */
  def create(tpe: String, name: String, specJson: String): Either[String, String] =
    for {
      _ <- validType(tpe)
      _ <- validName(name)
      _ <- parseableSpec(tpe, name, specJson)
      id = Functions.namespacedId(tpe, name)
      _ <- if (store.matchPut(id, None, specJson)) Right(id)
           else Left(s"$id already exists (use update)")
    } yield {
      activate(tpe, id, specJson)
      id
    }

  /** update!: must exist (`updating-correct-function?` — fixes the
    * silent-create hole), must actually CHANGE something (`valid-update?`,
    * `utils/common.clj:valid-update?` — an identical redeploy is a
    * failure, not a new doc version; without this an idempotent re-POST
    * would hot-swap the node and rotate its checkpoint for nothing),
    * compare-and-swap the doc, then broadcast. */
  def update(tpe: String, name: String, specJson: String): Either[String, String] =
    for {
      _ <- validType(tpe)
      _ <- validName(name)
      _ <- parseableSpec(tpe, name, specJson)
      id = Functions.namespacedId(tpe, name)
      current <- store.entity(id).toRight(s"$id does not exist (use create)")
      _ <- if (current == specJson) Left(s"no-change-from-existing-$tpe")
           else Right(id)
      _ <- if (store.cas(id, current, specJson)) Right(id)
           else Left(s"$id changed concurrently; retry")
    } yield {
      activate(tpe, id, specJson)
      id
    }

  /** delete: tombstone the doc (history preserved), tear down the local
    * node + everything downstream, broadcast. */
  def delete(tpe: String, name: String): Either[String, String] = {
    val id = Functions.namespacedId(tpe, name)
    store.entity(id).toRight(s"$id does not exist").map { spec =>
      store.delete(id)
      if (tpe == "stream")
        NodeSpec.parse(spec).foreach(n => manager.deleteNode(n.name.full))
      if (tpe == "collector")
        collectors.foreach(_.remove(name))
      broadcast(id)
      id
    }
  }

  /** Local activation + cluster broadcast (SURVEY.md §3.1 steps 5-6). */
  private def activate(tpe: String, id: String, specJson: String): Unit = {
    if (tpe == "stream")
      NodeSpec.parse(specJson).foreach(manager.updateNode)
    if (tpe == "collector")
      collectors.foreach(c =>
        graft.api.CollectorSpec.parse(specJson).foreach { spec =>
          // validation passed pre-commit, but a concurrent same-path deploy
          // can still win the race to the route table — surface it loudly
          // instead of leaving an active doc with no endpoint
          c.deploy(spec).left.foreach(err => System.err.println(
            s"[graft] collector $id validated but failed to deploy: $err"))
        })
    broadcast(id)
  }

  private def broadcast(id: String): Unit =
    try manager.topology.io.publish(manager.controlTopic, "function-update", id)
    catch { case _: Throwable => () } // broadcast is best-effort; local applied
}
