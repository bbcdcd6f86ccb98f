package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Auth

/** OAuth client-credentials seam (pulsar_remote_inspector.py:43-84):
  * request shape, response parsing, expiry-aware caching. */
class AuthSpec extends AnyFunSuite with Matchers {

  private val cfg = Auth.OAuthConfig(
    "https://issuer.example/", "pulsar://cluster", "cid", "sec")

  test("tokenRequest builds the client-credentials POST the reference sends") {
    val (url, params) = Auth.tokenRequest(cfg)
    url shouldBe "https://issuer.example/oauth/token"
    params("grant_type") shouldBe "client_credentials"
    params("client_id") shouldBe "cid"
    params("audience") shouldBe "pulsar://cluster"
  }

  test("parseTokenResponse reads access_token and expiry; fails without a token") {
    val ok = Auth.parseTokenResponse(
      """{"access_token":"abc.def","token_type":"Bearer","expires_in":120}""",
      nowMs = 1000L)
    ok shouldBe Right(Auth.Token("abc.def", 1000L + 120000L))
    Auth.parseTokenResponse("""{"error":"denied"}""", 0L).isLeft shouldBe true
  }

  test("parseTokenResponse accepts a QUOTED expires_in (common issuer quirk)") {
    // silently defaulting to 3600 here would cache a 120s token for an hour
    Auth.parseTokenResponse(
      """{"access_token":"t","expires_in":"120"}""", nowMs = 0L) shouldBe
      Right(Auth.Token("t", 120000L))
  }

  test("parseTokenResponse rejects tokens the regex parse would mangle") {
    // an escaped quote truncates the [^\"]+ match at the escape; an
    // escaped backslash survives un-unescaped — both must fail loudly
    // rather than hand back a token that will fail auth downstream
    Auth.parseTokenResponse(
      """{"access_token":"abc\"def","expires_in":60}""", 0L)
      .isLeft shouldBe true
    Auth.parseTokenResponse(
      """{"access_token":"abc\\def","expires_in":60}""", 0L)
      .isLeft shouldBe true
  }

  test("TokenProvider caches until the skew window and then refreshes") {
    var now = 0L
    var served = 0
    val provider = new Auth.TokenProvider(cfg, (_, _) => {
      served += 1
      s"""{"access_token":"tok$served","expires_in":100}"""
    }, () => now, skewMs = 10000L)
    provider.token() shouldBe "tok1"
    provider.token() shouldBe "tok1" // cached
    provider.fetchCount shouldBe 1
    now = 80000L // 80s: 20s left < ... still outside the 10s skew window
    provider.token() shouldBe "tok1"
    now = 95000L // 5s to expiry, inside the 10s skew window: refresh
    provider.token() shouldBe "tok2"
    provider.fetchCount shouldBe 2
  }

  test("TokenProvider fails loudly on a malformed issuer response") {
    val provider = new Auth.TokenProvider(
      cfg, (_, _) => """{"nope":true}""", () => 0L)
    an[IllegalStateException] should be thrownBy provider.token()
  }
}
