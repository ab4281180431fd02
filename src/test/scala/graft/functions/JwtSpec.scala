package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mint/verify/expiry spec for the dd_login JWT surface (reference
  * /root/reference/src/scalar_function/dd_login.cpp — server-minted
  * accessToken; here the server is LocalAuthProvider). */
class JwtSpec extends AnyFunSuite {
  private val secret = "test-secret"
  private val t0 = 1700000000L

  test("mint → verify round-trip with claims") {
    val tok = Jwt.mint("alice", Seq("database" -> "db1", "table" -> "t"), secret, t0)
    val payload = Jwt.verify(tok, secret, t0 + 10)
    assert(payload.isDefined)
    assert(Jwt.field(payload.get, "sub") === Some("alice"))
    assert(Jwt.field(payload.get, "database") === Some("db1"))
    assert(Jwt.field(payload.get, "table") === Some("t"))
  }

  test("expired token rejected; boundary is inclusive") {
    val tok = Jwt.mint("bob", Nil, secret, t0, ttlSec = 60)
    assert(Jwt.verify(tok, secret, t0 + 59).isDefined)
    assert(Jwt.verify(tok, secret, t0 + 60).isDefined) // exp >= now
    assert(Jwt.verify(tok, secret, t0 + 61).isEmpty)
  }

  test("tampered payload or wrong secret rejected") {
    val tok = Jwt.mint("alice", Nil, secret, t0)
    val Array(h, p, s) = tok.split('.')
    assert(Jwt.verify(s"$h.${p}x.$s", secret, t0).isEmpty)
    assert(Jwt.verify(tok, "other-secret", t0).isEmpty)
    assert(Jwt.verify("not-a-token", secret, t0).isEmpty)
  }

  test("token without parseable exp claim is rejected (no valid-forever)") {
    // forge an exp-less payload signed with the right secret
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    val header = enc.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
    val payload = enc.encodeToString("""{"sub":"eve"}""".getBytes("UTF-8"))
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    val sig = enc.encodeToString(mac.doFinal(s"$header.$payload".getBytes("UTF-8")))
    assert(Jwt.verify(s"$header.$payload.$sig", secret, t0).isEmpty)
  }

  test("overflow-length exp digits rejected, not thrown") {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    val header = enc.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
    val payload = enc.encodeToString("""{"sub":"eve","exp":99999999999999999999999999}""".getBytes("UTF-8"))
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    val sig = enc.encodeToString(mac.doFinal(s"$header.$payload".getBytes("UTF-8")))
    assert(Jwt.verify(s"$header.$payload.$sig", secret, t0).isEmpty)
  }

  test("LocalAuthProvider login checks credentials") {
    val p = new LocalAuthProvider(secret, Map("alice" -> "pw1"))
    assert(p.login("alice", "pw1", Seq("database" -> "d"), t0).isDefined)
    assert(p.login("alice", "wrong", Nil, t0).isEmpty)
    assert(p.login("nobody", "pw1", Nil, t0).isEmpty)
    val tok = p.login("alice", "pw1", Nil, t0).get
    assert(Jwt.verify(tok, secret, t0 + 1).isDefined)
  }
}
