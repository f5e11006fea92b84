package graft.auth

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Verified bearer-token claims: who, with which roles, until when. */
final case class TokenClaims(user: String, roles: Set[String], timeout: Instant)

/** HS256 JWT sign/verify — the reference's `buddy.sign.jwt` surface
  * (`/root/reference/src/dataworks/utils/auth.clj:11-27`): `create-token`
  * signs `{claims: {user, roles}, timeout: now+30d}`, `token-verify`
  * unsigns and honors the timeout. JDK crypto only (HmacSHA256).
  */
object Tokens {
  private implicit val fmts: Formats = DefaultFormats

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  private def unb64url(s: String): Array[Byte] = Base64.getUrlDecoder.decode(s)

  private def hmac(data: String, secret: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Sign claims for `user`/`roles`, valid for `ttl` (reference default:
    * 30 days, `auth.clj:15-17`). */
  def sign(user: String, roles: Set[String], secret: String,
           ttl: java.time.Duration = java.time.Duration.ofDays(30),
           now: Instant = Instant.now()): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val payload = b64url(JsonMethods.compact(JsonMethods.render(JObject(
      "claims" -> JObject(
        "user" -> JString(user),
        "roles" -> JArray(roles.toList.sorted.map(JString(_)))),
      "timeout" -> JString(now.plus(ttl).toString)))).getBytes(UTF_8))
    val body = s"$header.$payload"
    s"$body.${b64url(hmac(body, secret))}"
  }

  /** Verify signature AND timeout; None on any failure (tamper, expiry,
    * malformed) — the `token-verify` contract. */
  def verify(token: String, secret: String,
             now: Instant = Instant.now()): Option[TokenClaims] =
    try {
      val parts = token.split('.')
      if (parts.length != 3) return None
      val expected = hmac(s"${parts(0)}.${parts(1)}", secret)
      if (!java.security.MessageDigest.isEqual(expected, unb64url(parts(2))))
        return None
      val j = JsonMethods.parse(new String(unb64url(parts(1)), UTF_8))
      val timeout = Instant.parse((j \ "timeout").extract[String])
      if (now.isAfter(timeout)) return None
      Some(TokenClaims(
        (j \ "claims" \ "user").extract[String],
        (j \ "claims" \ "roles").extract[List[String]].toSet,
        timeout))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Role expansion (`get-roles`, `auth.clj:28-37`): a namespaced role
    * `ns/role` implies `ns/all`; `admin/all` and `developer/all` are
    * always acceptable (admins and developers may touch everything). */
  def expandAccepted(required: Set[String]): Set[String] =
    required ++ required.collect {
      case r if r.contains('/') => r.takeWhile(_ != '/') + "/all"
    } ++ Set("admin/all", "developer/all")

  /** `make-authorize`: the claim roles authorize iff they intersect the
    * expanded accepted set; empty `required` means any authenticated user. */
  def authorized(claimRoles: Set[String], required: Set[String]): Boolean =
    required.isEmpty || claimRoles.intersect(expandAccepted(required)).nonEmpty
}
