package graft.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Target of an external HTTP JSON API (the engine's only external-call
  * boundary — the reference's OpenAI embedding and chat calls,
  * `/root/reference/micro-infobot/app.py:122,246-250`).
  *
  * The struct is pure serializable configuration so it ships inside
  * `mapPartitions` closures; the client itself is per-JVM ([[HttpCall]]).
  * Credentials are NEVER part of the plan: `apiKeyName` names an
  * environment variable (or JVM system property, checked second — that is
  * the offline-test seam) resolved on the EXECUTOR at request time, so no
  * secret is serialized into closures, plans, or logs.
  */
final case class HttpTarget(
    endpoint: String,
    apiKeyName: Option[String] = None,
    connectTimeoutMs: Int = 10000,
    requestTimeoutMs: Int = 60000,
    maxRetries: Int = 5,
    backoffBaseMs: Long = 200L) {

  def resolveApiKey(): Option[String] =
    apiKeyName.flatMap(n => sys.env.get(n).orElse(sys.props.get(n)))
}

/** Minimal blocking JSON-POST helper over the JDK 11+ [[HttpClient]] —
  * no extra dependencies, TLS and connection pooling included.
  *
  * Retry policy: HTTP 429 and 5xx (transient server side) and local
  * `IOException`s retry with exponential backoff (`base × 2^attempt`,
  * capped at 30 s); any other non-2xx status fails fast — a 4xx repeats
  * deterministically, so retrying it only burns quota. One request is in
  * flight per Spark partition (callers run inside `mapPartitions`), so
  * cluster-wide concurrency is exactly the partition count — repartition
  * the input to match the remote service's rate budget.
  */
object HttpCall {

  /** Per-partition request pacer: sleeps so consecutive requests from one
    * partition are at least `minIntervalMs` apart. Combined with
    * partition-count concurrency this gives a hard cluster-wide ceiling of
    * `partitions × 1000/minIntervalMs` requests/second against the remote
    * service — the client-side half of rate-limit compliance (the
    * server-side half is [[postJson]]'s 429 backoff).
    */
  final class Pacer(minIntervalMs: Long) {
    private var lastNs = 0L
    def pace(): Unit = if (minIntervalMs > 0) {
      val waitNs = lastNs + minIntervalMs * 1000000L - System.nanoTime()
      if (waitNs > 0) Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
      lastNs = System.nanoTime()
    }
  }

  /** One client per executor JVM: it is thread-safe and holds the
    * connection pool — per-task clients would re-handshake TLS per batch.
    */
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  final class HttpStatusException(val status: Int, body: String)
    extends RuntimeException(s"HTTP $status: ${body.take(300)}")

  private def transient(status: Int): Boolean =
    status == 429 || status >= 500

  def postJson(target: HttpTarget, body: String): String = {
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(target.endpoint))
      .timeout(Duration.ofMillis(target.requestTimeoutMs.toLong))
      .header("Content-Type", "application/json")
    target.resolveApiKey().foreach(k => builder.header("Authorization", s"Bearer $k"))
    val request = builder.POST(HttpRequest.BodyPublishers.ofString(body)).build()

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= target.maxRetries) {
      if (attempt > 0) {
        val backoff = math.min(target.backoffBaseMs << (attempt - 1), 30000L)
        Thread.sleep(backoff)
      }
      try {
        val resp = client.send(request, HttpResponse.BodyHandlers.ofString())
        val status = resp.statusCode()
        if (status / 100 == 2) return resp.body()
        val e = new HttpStatusException(status, resp.body())
        if (!transient(status)) throw e
        lastErr = e
      } catch {
        case e: HttpStatusException if !transient(e.status) => throw e
        case e: java.io.IOException => lastErr = e
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"HTTP POST to ${target.endpoint} failed after ${target.maxRetries + 1} attempts",
      lastErr)
  }
}
