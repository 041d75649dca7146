package graft.sources.lakesim

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

/** OAuth2 token lifecycle for the HTTP transport seam — the reference's
  * refresh loop (`oauth/datalakeoauth.py:125-229`) re-expressed for a
  * distributed engine:
  *
  *  - a token is (access_token, refresh_token, expires_at) where
  *    `expires_at = issued_at + 0.9 · expires_in` (the reference's early
  *    -refresh skew, `datalakeoauth.py:150-156`);
  *  - every access checks expiry and refreshes through the token
  *    endpoint first (`oauth_token` property, `:139-145`);
  *  - a refresh rejected as invalid/expired falls back to a brand-new
  *    credentials grant (`refresh_access_token` → `new_access_token`,
  *    `:204-215`); any other token-endpoint failure raises with the
  *    body text;
  *  - the refresh response keeps the PREVIOUS refresh token (the
  *    reference merges it back in, `:186`) unless the server rotates it.
  *
  * Distribution model: the provider is Serializable and rides to the
  * executors inside their [[HttpTransport]] (the DSv2 split model); the
  * token itself is `@transient` per-JVM state guarded by a lock — each
  * executor acquires and refreshes its own token, exactly as each of the
  * reference's worker processes holds its own token cache (the
  * reference's token FILE is a single-process convenience this engine
  * does not need). Credentials are never rendered by `toString`.
  *
  * `clock` is injectable for deterministic expiry tests; production uses
  * wall time.
  */
final class OAuthTokenProvider(
    val tokenUrl: String,
    newTokenForm: Map[String, String],
    refreshExtraForm: Map[String, String] = Map.empty,
    expirySkew: Double = 0.9,
    clock: () => Long = () => System.currentTimeMillis() / 1000L,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends Serializable {

  require(expirySkew > 0 && expirySkew <= 1,
    s"expirySkew must be in (0, 1], got $expirySkew")

  private case class Token(accessToken: String, refreshToken: String,
                           expiresAt: Long)

  @transient private var current: Token = _

  override def toString: String =
    s"OAuthTokenProvider($tokenUrl, form=***, skew=$expirySkew)"

  /** The current access token, refreshing (or re-granting) first when
    * expired — the reference's `oauth_token` property. Thread-safe: one
    * refresh per JVM, concurrent readers wait. */
  def token(): String = synchronized {
    if (current == null) current = grantNew()
    else if (current.expiresAt <= clock()) current = refresh(current)
    current.accessToken
  }

  /** Drop the cached token so the next [[token]] call re-acquires — the
    * 401 hardening hook: a server-side revocation invalidates a token
    * the clock still believes in. `stale` is the token the caller
    * observed rejected: under concurrent readers, only the FIRST
    * rejection clears the cache — a thread racing in after another
    * already re-granted must not null the fresh token and trigger a
    * redundant grant storm against a rate-limited endpoint. */
  def invalidate(stale: String): Unit = synchronized {
    if (current != null && current.accessToken == stale) current = null
  }

  private def grantNew(): Token =
    parseToken(post(newTokenForm), previousRefresh = "")

  private def refresh(old: Token): Token =
    // no refresh token held (RFC 6749 lets a credentials grant omit it:
    // the client_credentials norm) — renewal IS a fresh grant; POSTing
    // refresh_token="" and sniffing the error text would hard-fail on
    // any server whose message lacks the words 'refresh token'
    if (old.refreshToken.isEmpty) grantNew()
    else
      try parseToken(
        post(refreshExtraForm ++ Map(
          "grant_type" -> "refresh_token",
          "refresh_token" -> old.refreshToken)),
        previousRefresh = old.refreshToken)
      catch {
        // the reference's InvalidRefreshTokenError path: an expired or
        // invalid refresh token demotes to a fresh credentials grant
        case e: java.io.IOException
            if e.getMessage != null &&
              (e.getMessage.contains("refresh token") ||
                e.getMessage.contains("refresh_token")) =>
          grantNew()
      }

  private def parseToken(body: String, previousRefresh: String): Token = {
    val node = new ObjectMapper().readTree(body)
    val access = Option(node.get("access_token")).map(_.asText())
      .getOrElse(throw new java.io.IOException(
        s"OAuthTokenProvider: token response carries no access_token"))
    val refreshTok = Option(node.get("refresh_token")).map(_.asText())
      .filter(_.nonEmpty).getOrElse(previousRefresh)
    val expiresIn = Option(node.get("expires_in")).map(_.asLong())
      .getOrElse(3600L)
    Token(access, refreshTok,
      clock() + math.max(1L, (expiresIn * expirySkew).toLong))
  }

  private def post(form: Map[String, String]): String = {
    val body = form.map { case (k, v) =>
      s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}"
    }.mkString("&").getBytes(UTF_8)
    val conn = URI.create(tokenUrl).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type",
      "application/x-www-form-urlencoded")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body) finally out.close()
    val code = conn.getResponseCode
    val stream =
      if (code == 200) conn.getInputStream else conn.getErrorStream
    val text = Option(stream).map { s =>
      try scala.io.Source.fromInputStream(s, "UTF-8").mkString
      finally s.close()
    }.getOrElse("")
    if (code != 200)
      throw new java.io.IOException(
        s"OAuthTokenProvider: POST $tokenUrl returned $code: $text")
    text
  }
}
