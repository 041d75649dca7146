package graft.sources.lakesim

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** The OAuth refresh lifecycle (reference `oauth/datalakeoauth.py`)
  * against a LIVE in-process token server: credentials grant on first
  * use, 0.9-skew early refresh on expiry, old refresh token preserved
  * when the server does not rotate it, invalid-refresh demotion to a new
  * grant, and the 401 invalidate-retry ride through [[HttpTransport]]. */
class OAuthTokenProviderSpec extends SparkSpec {

  /** Token server: every POST to /token mints tok-N; records grants. */
  private class TokenServer {
    val grants = mutable.ArrayBuffer[Map[String, String]]()
    val n = new AtomicInteger(0)
    var rejectRefresh = false
    var rotateRefresh = false
    var omitRefresh = false
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", (ex: HttpExchange) => {
      val form = scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8")
        .mkString.split("&").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, UTF_8) ->
            java.net.URLDecoder.decode(v, UTF_8)
        }.toMap
      synchronized { grants += form }
      val isRefresh = form.get("grant_type").contains("refresh_token")
      val body =
        if (isRefresh && rejectRefresh)
          """{"error_description": "invalid_request: Invalid refresh_token"}"""
        else {
          val i = n.incrementAndGet()
          val rt =
            if (omitRefresh || (isRefresh && !rotateRefresh)) ""
            else s""", "refresh_token": "rt-$i""""
          s"""{"access_token": "tok-$i"$rt, "token_type": "Bearer",
             | "expires_in": 100}""".stripMargin
        }
      val code = if (isRefresh && rejectRefresh) 400 else 200
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/token"
    def stop(): Unit = server.stop(0)
  }

  private def provider(s: TokenServer, clock: AtomicLong) =
    new OAuthTokenProvider(s.url,
      newTokenForm = Map("grant_type" -> "client_credentials",
        "client_id" -> "cid", "client_secret" -> "sec"),
      refreshExtraForm = Map("client_id" -> "cid"),
      clock = () => clock.get())

  test("first use runs the credentials grant; the token is cached until " +
      "the 0.9-skew expiry, then refreshed with the held refresh token") {
    val s = new TokenServer
    try {
      val clock = new AtomicLong(1000L)
      val p = provider(s, clock)
      assert(p.token() == "tok-1")
      assert(p.token() == "tok-1") // cached, no second grant
      assert(s.grants.size == 1 &&
        s.grants.head("grant_type") == "client_credentials")
      // expires_in=100, skew 0.9: expiry at 1090
      clock.set(1089L)
      assert(p.token() == "tok-1")
      clock.set(1090L)
      assert(p.token() == "tok-2")
      val refresh = s.grants(1)
      assert(refresh("grant_type") == "refresh_token" &&
        refresh("refresh_token") == "rt-1" && refresh("client_id") == "cid")
      // the server omitted a rotated refresh token: the old one is kept
      clock.set(10000L)
      assert(p.token() == "tok-3")
      assert(s.grants(2)("refresh_token") == "rt-1")
    } finally s.stop()
  }

  test("a grant with NO refresh token (the client_credentials norm) " +
      "renews via a fresh grant, never an empty-refresh POST") {
    val s = new TokenServer
    try {
      s.omitRefresh = true
      val clock = new AtomicLong(0L)
      val p = provider(s, clock)
      assert(p.token() == "tok-1")
      clock.set(5000L)
      assert(p.token() == "tok-2")
      // both grants were credentials grants; no refresh_token= POST ever
      assert(s.grants.map(_("grant_type")).toSeq ==
        Seq("client_credentials", "client_credentials"))
    } finally s.stop()
  }

  test("a rejected refresh token demotes to a fresh credentials grant") {
    val s = new TokenServer
    try {
      val clock = new AtomicLong(0L)
      val p = provider(s, clock)
      assert(p.token() == "tok-1")
      s.rejectRefresh = true
      clock.set(5000L)
      assert(p.token() == "tok-2") // refresh 400 -> new grant succeeded
      assert(s.grants.map(_("grant_type")).toSeq ==
        Seq("client_credentials", "refresh_token", "client_credentials"))
    } finally s.stop()
  }

  test("refresh-token rotation is honored when the server issues one") {
    val s = new TokenServer
    try {
      s.rotateRefresh = true
      val clock = new AtomicLong(0L)
      val p = provider(s, clock)
      assert(p.token() == "tok-1")
      clock.set(5000L)
      assert(p.token() == "tok-2")
      clock.set(10000L)
      assert(p.token() == "tok-3")
      assert(s.grants(2)("refresh_token") == "rt-2") // the rotated one
    } finally s.stop()
  }

  test("HttpTransport consults the provider per request and retries a " +
      "401 once after invalidating") {
    val s = new TokenServer
    try {
      val clock = new AtomicLong(0L)
      val p = provider(s, clock)
      // data server: accepts only the CURRENT token the token server minted
      val data = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val served = new AtomicInteger(0)
      data.createContext("/", (ex: HttpExchange) => {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val want = s"Bearer tok-${s.n.get()}"
        if (auth.contains(want)) {
          val b = "payload".getBytes(UTF_8)
          served.incrementAndGet()
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        } else {
          val b = "revoked".getBytes(UTF_8)
          ex.sendResponseHeaders(401, b.length)
          ex.getResponseBody.write(b)
        }
        ex.close()
      })
      data.start()
      try {
        val t = HttpTransport(
          s"http://127.0.0.1:${data.getAddress.getPort}",
          tokenProvider = Some(p))
        assert(new String(LakeTransport.readAll(t, "x"), UTF_8) == "payload")
        // server-side revocation: mint tok-2 behind the client's back —
        // the client clock still trusts tok-1, the data server now 401s,
        // the transport must invalidate + re-acquire + retry
        s.n.incrementAndGet() // the data server now wants tok-2
        assert(new String(LakeTransport.readAll(t, "y"), UTF_8) == "payload")
        assert(served.get() == 2)
      } finally data.stop(0)
    } finally s.stop()
  }

  test("invalidate is stale-guarded: only the rejected token clears " +
      "the cache, a racing thread's fresh grant survives") {
    val s = new TokenServer
    try {
      val clock = new AtomicLong(0L)
      val p = provider(s, clock)
      assert(p.token() == "tok-1")
      p.invalidate("some-older-token") // a loser of the 401 race
      assert(p.token() == "tok-1")     // fresh token NOT discarded
      assert(s.n.get() == 1)           // no redundant grant fired
      p.invalidate("tok-1")            // the genuine rejection
      assert(p.token() == "tok-2")
    } finally s.stop()
  }

  test("the cursorsim DSv2 source acquires OAuth tokens through its " +
      "tokenUrl/clientId/clientSecret options") {
    val s = new TokenServer
    try {
      // data server: serves the cursor pages only to the CURRENT token
      val page =
        """[{"_count": 2, "_links": [{"href": "p0.json"}, {"href": "p0.json"}]},
          | {"_fields": {"id": 1}}, {"_fields": {"id": 2}}]""".stripMargin
      val data = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      data.createContext("/", (ex: HttpExchange) => {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val (code, body) =
          if (auth.contains(s"Bearer tok-${s.n.get()}")) (200, page)
          else (401, "bad token")
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      })
      data.start()
      try {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))
        val out = spark.read.format(classOf[CursorSimSource].getName)
          .schema(schema)
          .option("url", s"http://127.0.0.1:${data.getAddress.getPort}")
          .option("tokenUrl", s.url)
          .option("clientId", "cid").option("clientSecret", "sec")
          .option("start", "p0.json").load()
          .orderBy("id").collect().map(_.getLong(0)).toSeq
        assert(out == Seq(1L, 2L))
        assert(s.grants.nonEmpty &&
          s.grants.head("grant_type") == "client_credentials")
      } finally data.stop(0)
    } finally s.stop()
  }

  test("the provider survives serialization; a deserialized copy " +
      "acquires its own token (the per-executor model)") {
    val s = new TokenServer
    try {
      val clock = new AtomicLong(0L)
      val p = provider(s, clock)
      assert(p.token() == "tok-1")
      val bytes = {
        val bo = new java.io.ByteArrayOutputStream()
        val oo = new java.io.ObjectOutputStream(bo)
        oo.writeObject(p); oo.close(); bo.toByteArray
      }
      val p2 = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes))
        .readObject().asInstanceOf[OAuthTokenProvider]
      assert(p2.token() == "tok-2") // its own grant, not the cached one
      assert(p.token() == "tok-1")  // the original's cache is untouched
    } finally s.stop()
  }
}
