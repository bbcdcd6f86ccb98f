package graft.sources

/** Control-plane OAuth2 client-credentials token acquisition
  * (pulsar_remote_inspector.py:43-84): the reference POSTs a
  * client-credentials grant to the issuer, reads `access_token` /
  * `expires_in` from the JSON response, and caches the token until
  * shortly before expiry.
  *
  * The HTTP POST itself is INJECTED (`post`), like every other remote
  * seam in this zero-egress build — what this module owns is the
  * contract around it: request construction, response parsing, and
  * expiry-aware caching with a refresh-skew margin so a token is never
  * used within `skewMs` of its expiry. Driver-side pure Scala: token
  * acquisition is one tiny authenticated call, not dataflow.
  */
object Auth {

  final case class OAuthConfig(
      issuerUrl: String, audience: String,
      clientId: String, clientSecret: String)

  final case class Token(accessToken: String, expiresAtMs: Long)

  /** The token endpoint and form parameters of the client-credentials
    * grant (the reference's exact request shape). */
  def tokenRequest(cfg: OAuthConfig): (String, Map[String, String]) = (
    cfg.issuerUrl.stripSuffix("/") + "/oauth/token",
    Map(
      "grant_type" -> "client_credentials",
      "client_id" -> cfg.clientId,
      "client_secret" -> cfg.clientSecret,
      "audience" -> cfg.audience))

  private val accessTokenRe = """"access_token"\s*:\s*"([^"]+)"""".r
  // number OR quoted number: OAuth issuers serialize expires_in both
  // ways, and silently defaulting on the quoted form would cache a
  // short-lived token for an hour
  private val expiresInRe = """"expires_in"\s*:\s*"?(\d+)"?""".r

  /** Parse the issuer's JSON response. Only the two fields the
    * reference reads are modeled; a missing access_token is an error
    * (fail loudly, never return an unauthenticated client).
    *
    * Contract: the regex parse is sound for real issuers' base64url
    * tokens. A token containing a JSON escape (backslash) would be
    * TRUNCATED at the escape — rejected loudly instead of handing the
    * caller a token that will fail auth downstream. */
  def parseTokenResponse(json: String, nowMs: Long): Either[String, Token] =
    accessTokenRe.findFirstMatchIn(json) match {
      case None => Left("token response has no access_token")
      case Some(m) if m.group(1).contains("\\") =>
        Left("access_token contains JSON escapes; regex parse would mangle it")
      case Some(m) =>
        val expiresIn = expiresInRe.findFirstMatchIn(json)
          .map(_.group(1).toLong).getOrElse(3600L)
        Right(Token(m.group(1), nowMs + expiresIn * 1000L))
    }

  /** Expiry-aware token cache: refreshes through the injected `post`
    * only when no token is cached or the cached one is within `skewMs`
    * of expiry. `clock` is injected for testability. */
  final class TokenProvider(cfg: OAuthConfig,
      post: (String, Map[String, String]) => String,
      clock: () => Long, skewMs: Long = 30000L) {
    @volatile private var cached: Option[Token] = None
    @volatile private var fetches: Int = 0

    /** Number of actual issuer round-trips performed (observability —
      * the reference logs each acquisition). */
    def fetchCount: Int = fetches

    def token(): String = synchronized {
      val now = clock()
      cached match {
        case Some(t) if t.expiresAtMs - skewMs > now => t.accessToken
        case _ =>
          val (url, params) = tokenRequest(cfg)
          val response = post(url, params)
          fetches += 1 // the round-trip happened whether or not it parses
          val t = parseTokenResponse(response, now).fold(
            err => throw new IllegalStateException(s"OAuth refresh failed: $err"),
            identity)
          cached = Some(t)
          t.accessToken
      }
    }
  }
}
