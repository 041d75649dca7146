package graft.sources.lakesim

import java.io.{ByteArrayOutputStream, File, FileInputStream, InputStream}
import java.net.{HttpURLConnection, URI}

/** Transport seam between the lake planners/readers and wherever the lake
  * actually lives. The reference extracts over REST — a paged
  * data-object-properties query (`datalakewrapper.py:88-102`) and a
  * `_links`-following cursor walk (`fsmwrapper.py:38-115`) — while this
  * engine's gates exercise the same protocol against local files. The
  * planners ([[LakeIndex]], [[CursorIndex]]) speak ONLY this interface, so
  * binding them to a live lake is a constructor argument, not a planner
  * change. Implementations must be Serializable: partitions carry their
  * transport to the executors (the DSv2 split model — each split fetches
  * its own page, exactly like the reference's per-thread extract loop).
  */
trait LakeTransport extends Serializable {
  /** Open the resource at `path`, relative to this transport's base.
    * Callers close the stream. Fails loudly (the reference raises on any
    * non-200: `datalakewrapper.py:83-84`). */
  def open(path: String): InputStream

  /** Human-readable base for plan descriptions / error messages. */
  def base: String
}

object LakeTransport {
  /** Drain a resource fully (index/header-sized payloads). */
  def readAll(t: LakeTransport, path: String): Array[Byte] = {
    val in = t.open(path)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}

/** Local-filesystem binding — the gate/test transport. */
final case class FileTransport(baseDir: String) extends LakeTransport {
  override def open(path: String): InputStream =
    new FileInputStream(new File(baseDir, path))
  override def base: String = baseDir
}

/** Live-HTTP binding: GET `baseUrl/path` with an optional bearer token —
  * the reference's authenticated extract call (`fsmwrapper.py:30-36`
  * `get`, `datalakewrapper.py:94-97`). A non-200 response raises with the
  * body text, mirroring `datalakewrapper.py:83-84`.
  *
  * Authentication, either/both optional:
  *  - `bearerToken`: a static token (short-lived jobs, pre-issued creds);
  *  - `tokenProvider`: the refreshing [[OAuthTokenProvider]] lifecycle
  *    (reference `oauth/datalakeoauth.py`) — consulted per request, so an
  *    expiring token refreshes mid-scan without touching the planners;
  *    takes precedence over `bearerToken`. A 401 additionally forces one
  *    provider invalidate + retry (server-side revocation beats the
  *    client clock). */
final case class HttpTransport(baseUrl: String,
                               bearerToken: Option[String] = None,
                               connectTimeoutMs: Int = 10000,
                               readTimeoutMs: Int = 60000,
                               tokenProvider: Option[OAuthTokenProvider] = None)
    extends LakeTransport {

  // a case-class toString would render the raw bearer token into task
  // failure messages, Spark UI partition dumps, and logs — redact it
  override def toString: String =
    s"HttpTransport($baseUrl, token=${bearerToken.map(_ => "***")}, " +
      s"connectTimeoutMs=$connectTimeoutMs, readTimeoutMs=$readTimeoutMs, " +
      s"provider=${tokenProvider.map(_ => "oauth")})"

  override def open(path: String): InputStream =
    openOnce(path, retryOn401 = tokenProvider.isDefined)

  private def authHeader(): Option[String] =
    tokenProvider.map(p => s"Bearer ${p.token()}")
      .orElse(bearerToken.map(t => s"Bearer $t"))

  private def openOnce(path: String, retryOn401: Boolean): InputStream = {
    val url = URI.create(s"${baseUrl.stripSuffix("/")}/$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    val auth = authHeader()
    auth.foreach(conn.setRequestProperty("Authorization", _))
    val code = conn.getResponseCode
    if (code == 401 && retryOn401) {
      conn.disconnect()
      // invalidate only the token THIS request used: a concurrent
      // thread's fresh grant must survive the race
      for (p <- tokenProvider; a <- auth)
        p.invalidate(a.stripPrefix("Bearer "))
      openOnce(path, retryOn401 = false)
    } else if (code != 200) {
      val err = Option(conn.getErrorStream).map { es =>
        try scala.io.Source.fromInputStream(es, "UTF-8").mkString
        finally es.close()
      }.getOrElse("")
      conn.disconnect()
      throw new java.io.IOException(
        s"HttpTransport: GET $url returned $code: $err")
    } else conn.getInputStream
  }

  override def base: String = baseUrl
}
