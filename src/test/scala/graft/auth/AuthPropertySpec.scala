package graft.auth

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.store.DocumentStore

/** Property-style coverage of the auth primitives (generated inputs, fixed
  * seed for reproducibility) plus the one concurrency invariant that
  * matters operationally: exactly ONE first-registered admin. */
class AuthPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0).map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(v) => v }.take(n).toSeq

  test("bcrypt property: derive/check roundtrip holds for arbitrary passwords") {
    // printable-unicode passwords incl. >72-byte ones (the cap boundary)
    val pwGen = Gen.chooseNum(0, 90).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        9 -> Gen.asciiPrintableChar,
        1 -> Gen.oneOf('é', 'λ', '中', '☃'))).map(_.mkString))
    for (pw <- samples(pwGen, 12)) {
      val h = Bcrypt.derive(pw, cost = 4) // min cost: the property is about
                                          // the codec + key schedule, not work
      assert(Bcrypt.check(pw, h), s"roundtrip failed for ${pw.take(20)}…")
      // …but only below the 72-byte cap: past it, appended chars are
      // IGNORED by $2a$ semantics (pinned separately below)
      if (pw.getBytes("UTF-8").length < 72) // strict: at 71 bytes the appended char still displaces the NUL inside the window
        assert(!Bcrypt.check(pw + "x", h),
          s"appending a char must break the check (len ${pw.length})")
    }
    // the 72-byte cap is REAL $2a$ semantics: two passwords equal through
    // byte 72 hash identically — pin it so interop never silently changes
    val base = "a" * 72
    val h = Bcrypt.derive(base, cost = 4)
    assert(Bcrypt.check(base + "different-tail", h),
      "bytes past 72 must be ignored, like every $2a$ implementation")
  }

  test("token property: any verified claim set equals what was signed") {
    val roleGen = Gen.listOf(Gen.oneOf(
      "admin/all", "developer/stream", "ops/reader", "billing/writer"))
      .map(_.toSet)
    val userGen = Gen.alphaNumStr.suchThat(_.nonEmpty)
    for ((user, roles) <- samples(Gen.zip(userGen, roleGen), 15)) {
      val tok = Tokens.sign(user, roles, "secret-1")
      val claims = Tokens.verify(tok, "secret-1")
      assert(claims.exists(c => c.user == user && c.roles == roles),
        s"roundtrip failed for $user/$roles")
      assert(Tokens.verify(tok, "secret-2").isEmpty)
      // flipping any single payload character must kill the signature
      val mid = tok.indexOf('.') + 2
      val flipped = tok.updated(mid, if (tok(mid) == 'A') 'B' else 'A')
      assert(Tokens.verify(flipped, "secret-1").isEmpty,
        s"one-char payload flip must invalidate: $flipped")
    }
  }

  test("concurrent first registrations mint exactly one admin") {
    // 8 threads race newUser on a FRESH store: the first-user-is-admin rule
    // must hold under contention — two admins would be a privilege bug,
    // zero would lock the engine out of administration forever
    val store = DocumentStore(spark,
      Files.createTempDirectory("graft-auth-race").toString + "/db")
    val users = new UserAuth(store, "hush")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val gate = new java.util.concurrent.CyclicBarrier(8)
      val results = (1 to 8).map { i =>
        pool.submit { () =>
          gate.await()
          users.newUser(s"user$i", s"pw$i")
        }
      }.map(_.get())
      assert(results.forall(_.isRight), s"all distinct names must register: $results")
      val admins = results.collect { case Right(doc) if doc.contains("admin/all") => doc }
      assert(admins.size == 1,
        s"exactly one admin may be minted, got ${admins.size}: $admins")
    } finally pool.shutdownNow()
  }
}
